"""Multimodal columns (north-star surface): image/audio/video as opaque
``binary`` payloads with typed metadata, processed by Arrow-batched
Pandas-UDF stages over ``mapInPandas``.

The container ships no media libraries (no PIL/librosa/ffmpeg), so the
*decode* step is stubbed two ways, per the build contract:

- ``decode_backend='stub'`` raises ``NotImplementedError`` naming the
  missing dependency — the honest production placeholder.
- ``decode_backend='fake'`` produces a deterministic feature vector from
  the payload bytes, so the Spark-side plumbing — schema evolution,
  partition-preserving mapInPandas, Arrow batch shapes, fixed-size float
  array outputs — is real and testable end-to-end.

Scale notes: payloads never route through the driver; mapInPandas streams
Arrow batches, so one task holds O(batch) payload bytes, not O(partition).
Feature extraction fans out embarrassingly — repartition by asset_id hash
upstream if payload sizes are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Magic-byte prefixes for MIME sniffing (expression-level, no UDF).
_MAGIC = {
    "89504e47": "image/png",
    "ffd8ff": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav",  # RIFF container (also webp/avi; refined below)
    "494433": "audio/mpeg",
    "1a45dfa3": "video/webm",
}


def with_payload_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Expression-level metadata: byte length, sha256 content id, sniffed
    MIME from magic bytes. All JVM-side — no Python for pure metadata.
    RIFF is a container, not a format: its MIME is refined by the form
    type at bytes 9-12 (WAVE/AVI /WEBP)."""
    p = F.col(payload_col)
    hexpfx = F.lower(F.hex(F.substring(p, 1, 4)))
    riff_form = F.decode(F.substring(p, 9, 4), "UTF-8")
    mime = F.lit("application/octet-stream")
    for magic, m in _MAGIC.items():
        mime = F.when(hexpfx.startswith(magic), F.lit(m)).otherwise(mime)
    mime = F.when(
        hexpfx.startswith("52494646"),
        F.when(riff_form == "WAVE", F.lit("audio/wav"))
        .when(riff_form == "AVI ", F.lit("video/x-msvideo"))
        .when(riff_form == "WEBP", F.lit("image/webp"))
        .otherwise(F.lit("application/x-riff")),
    ).otherwise(mime)
    return (
        df.withColumn("payload_bytes", F.length(p).cast("long"))
        .withColumn("content_sha256", F.sha2(p, 256))
        .withColumn("sniffed_mime", mime)
    )


def build_wav(
    pcm: bytes,
    sample_rate: int,
    channels: int = 1,
    bits: int = 16,
    extra_chunk: bytes | None = None,
) -> bytes:
    """Construct a valid RIFF/WAVE container around raw PCM bytes (pure
    Python, no media library). ``extra_chunk`` (a complete chunk, id+size+
    payload) is inserted BEFORE ``fmt `` so a reader that assumes fixed
    offsets instead of walking chunks breaks — used by tests to prove
    ``parse_container_headers`` really walks the chunk list."""
    import struct

    block_align = channels * bits // 8
    if len(pcm) % block_align:
        raise ValueError("pcm length must be a multiple of block align")
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = b""
    if extra_chunk is not None:
        body += extra_chunk
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) % 2:
        body += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def build_bmp(width: int, height: int, pixel_bytes: bytes) -> bytes:
    """Construct a valid 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER)
    around raw pixel rows. ``pixel_bytes`` must already be row-padded to
    the 4-byte stride ``((width*3 + 3) // 4) * 4``."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    if len(pixel_bytes) != stride * height:
        raise ValueError("pixel_bytes must be stride * height bytes")
    offset = 14 + 40
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0,
        len(pixel_bytes), 2835, 2835, 0, 0,
    )
    head = b"BM" + struct.pack(
        "<IHHI", offset + len(pixel_bytes), 0, 0, offset
    )
    return head + info + pixel_bytes


_CONTAINER_FIELDS = [
    ("container", T.StringType()),
    ("sample_rate", T.LongType()),
    ("channels", T.LongType()),
    ("bits_per_sample", T.LongType()),
    ("n_samples", T.LongType()),
    ("duration_micros", T.LongType()),
    ("width", T.LongType()),
    ("height", T.LongType()),
    ("bpp", T.LongType()),
    ("data_bytes", T.LongType()),
]


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    """One PNG chunk: big-endian length + type + data + CRC32(type+data)."""
    import struct
    import zlib

    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def build_png(width: int, height: int, *idat_chunks: bytes) -> bytes:
    """Construct a structurally-valid PNG (signature + IHDR + one IDAT
    chunk per argument + IEND, with correct lengths and CRCs). Multiple
    ``idat_chunks`` produce a split IDAT stream — legal PNG that defeats
    single-chunk readers. The bytes stand in for the compressed stream —
    chunk GRAMMAR is what the parser reads; zlib decode is out of scope
    like WAV sample decode."""
    import struct

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + b"".join(_png_chunk(b"IDAT", d) for d in idat_chunks)
        + _png_chunk(b"IEND", b"")
    )


def build_gif(width: int, height: int, n_frames: int = 1) -> bytes:
    """Construct a structurally-valid GIF89a: header + logical screen
    descriptor (little-endian dims), ``n_frames`` image descriptors each
    with a 2x2-subblock LZW stand-in body, and the 0x3B trailer. Frame
    sub-images defeat readers that stop at the screen descriptor when
    counting frames."""
    import struct

    head = b"GIF89a" + struct.pack("<HHBBB", width, height, 0, 0, 0)
    frame = (
        b"\x2c" + struct.pack("<HHHHB", 0, 0, min(width, 2), min(height, 2), 0)
        + b"\x02"            # LZW min code size
        + b"\x02\x44\x01"    # one 2-byte sub-block
        + b"\x00"            # block terminator
    )
    return head + frame * n_frames + b"\x3b"


def build_jpeg(width: int, height: int, n_app_segments: int = 1) -> bytes:
    """Construct a minimal well-formed JPEG byte stream: SOI, ``n_app
    _segments`` APPn padding segments (so dims are NOT at a fixed offset),
    an SOF0 frame header carrying the real dimensions (big-endian), a
    zero-length entropy stand-in, EOI. A reader must walk marker segments
    to find SOF — exactly what ``_parse_one_container`` does."""
    import struct

    out = b"\xff\xd8"
    for i in range(n_app_segments):
        seg = b"PAD" + bytes([i % 251])
        out += b"\xff\xe0" + struct.pack(">H", 2 + len(seg)) + seg
    sof = struct.pack(">BHHB", 8, height, width, 3) + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    return out + b"\xff\xd9"


def _parse_one_container(payload: bytes) -> dict:
    """Real header parse of one payload: walk RIFF chunks for WAVE
    (fmt /data may sit anywhere in the chunk list), walk PNG chunks
    (big-endian lengths; IDAT may be split into several chunks), read the
    two BMP headers, walk GIF blocks counting frames, walk JPEG marker
    segments to the SOF frame header. Unknown or truncated payloads
    degrade to container='unknown' with null fields — never an exception
    (a 100 TB scan WILL contain corrupt blobs)."""
    import struct

    out = {k: None for k, _ in _CONTAINER_FIELDS}
    out["container"] = "unknown"
    if payload is None:
        return out
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            pos, ihdr, idat_bytes = 8, None, 0
            while pos + 8 <= len(payload):
                (size,) = struct.unpack_from(">I", payload, pos)
                ctype = payload[pos + 4: pos + 8]
                if ctype == b"IHDR":
                    ihdr = struct.unpack_from(">IIBBBBB", payload, pos + 8)
                elif ctype == b"IDAT":
                    idat_bytes += size
                elif ctype == b"IEND":
                    break
                pos += 12 + size  # len + type + data + crc
            if ihdr is None:
                return out
            width, height, depth, color, _, _, _ = ihdr
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
            out.update(
                container="png", width=width, height=height,
                bpp=(depth * channels) if channels else None,
                data_bytes=idat_bytes,
            )
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            pos, fmt, data_size = 12, None, None
            while pos + 8 <= len(payload):
                cid = payload[pos: pos + 4]
                (size,) = struct.unpack_from("<I", payload, pos + 4)
                if cid == b"fmt ":
                    fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
                elif cid == b"data":
                    data_size = size
                pos += 8 + size + (size % 2)  # chunks are word-aligned
            if fmt is None or data_size is None:
                return out
            _, channels, rate, _, block_align, bits = fmt
            if block_align <= 0 or rate <= 0:
                return out  # corrupt fmt: no divisible sample geometry
            n = data_size // block_align
            # round half AWAY from zero (the SQL round semantics) — not
            # Python round()'s half-to-even, which breaks hash parity on
            # exact .5 microsecond ties
            import math

            out.update(
                container="wav", sample_rate=rate, channels=channels,
                bits_per_sample=bits, n_samples=n,
                duration_micros=int(
                    math.floor(n * 1_000_000.0 / rate + 0.5)
                ),
                data_bytes=data_size,
            )
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            width, height = struct.unpack_from("<HH", payload, 6)
            flags = payload[10]
            pos = 13
            if flags & 0x80:  # global color table present
                pos += 3 * (2 << (flags & 0x07))
            frames = 0
            while pos < len(payload):
                block = payload[pos]
                if block == 0x3B:  # trailer
                    break
                if block == 0x21:  # extension: label then sub-blocks
                    pos += 2
                elif block == 0x2C:  # image descriptor
                    frames += 1
                    lflags = payload[pos + 9]
                    pos += 10
                    if lflags & 0x80:  # local color table
                        pos += 3 * (2 << (lflags & 0x07))
                    pos += 1  # LZW minimum code size
                else:
                    return out  # unknown block type: corrupt
                while pos < len(payload) and payload[pos] != 0:
                    pos += 1 + payload[pos]  # skip data sub-blocks
                pos += 1  # block terminator
            out.update(
                container="gif", width=width, height=height, bpp=8,
                n_samples=frames,
            )
        elif payload[:2] == b"\xff\xd8":
            pos, sof = 2, None
            while pos + 4 <= len(payload):
                if payload[pos] != 0xFF:
                    return out
                marker = payload[pos + 1]
                if marker == 0xD9:  # EOI
                    break
                (size,) = struct.unpack_from(">H", payload, pos + 2)
                is_sof = 0xC0 <= marker <= 0xCF and marker not in (
                    0xC4, 0xC8, 0xCC
                )
                if is_sof:
                    sof = struct.unpack_from(">BHHB", payload, pos + 4)
                    break
                pos += 2 + size
            if sof is None:
                return out
            precision, height, width, n_comp = sof
            out.update(
                container="jpeg", width=width, height=height,
                bpp=precision * n_comp,
            )
        elif payload[:2] == b"BM" and len(payload) >= 54:
            file_size, _, _, offset = struct.unpack_from("<IHHI", payload, 2)
            _, width, height, _, bpp = struct.unpack_from("<IiiHH", payload, 14)
            out.update(
                container="bmp", width=width, height=abs(height), bpp=bpp,
                data_bytes=file_size - offset,
            )
    except (struct.error, IndexError, ZeroDivisionError, OverflowError):
        out = {k: None for k, _ in _CONTAINER_FIELDS}
        out["container"] = "unknown"
    return out


def synthesize_containers(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic media-container synthesis from a text corpus (test
    fixture — the driver ships no media table): ids ≡ 0 (mod 4) become
    PNGs (IDAT split into TWO chunks so single-chunk readers fail), the
    remaining odd ids RIFF/WAVE payloads whose PCM is the UTF-8 text
    zero-padded to a 4-byte block, the remaining even ids 24-bit BMPs
    whose dimensions derive from the id and whose pixels are a sha256
    keystream. WAV ids divisible by 3 get a junk ``LIST`` chunk ahead of
    ``fmt `` so fixed-offset readers fail. Every header field is pure
    integer arithmetic on (id, text length) — which is what makes
    ``parse_container_headers`` SQL-oracle-checkable."""
    import struct

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("payload", T.BinaryType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                rid = int(rid)
                raw = (text or "").encode("utf-8")
                if rid % 4 == 0:
                    w, h = 1 + rid % 128, 1 + rid % 96
                    n_idat = 1 + (len(raw) % 512)
                    stream = (
                        hashlib.sha256(raw).digest() * (n_idat // 32 + 1)
                    )[:n_idat]
                    # split IDAT at a deterministic point: multi-chunk
                    # IDAT is legal PNG and defeats single-chunk readers
                    cut = n_idat // 2
                    payload = build_png(w, h, stream[:cut], stream[cut:])
                elif rid % 2 == 1:
                    rate = 8000 + (rid % 5) * 2000
                    channels = 2 if rid % 4 == 3 else 1
                    pcm = raw + b"\x00" * (-len(raw) % 4)
                    extra = (
                        b"LIST" + struct.pack("<I", 8) + b"INFOjunk"
                        if rid % 3 == 0
                        else None
                    )
                    payload = build_wav(
                        pcm, rate, channels, 16, extra_chunk=extra
                    )
                else:
                    w, h = 1 + rid % 64, 1 + rid % 48
                    stride = ((w * 3 + 3) // 4) * 4
                    need = stride * h
                    digest = hashlib.sha256(raw).digest()
                    payload = build_bmp(
                        w, h, (digest * (need // len(digest) + 1))[:need]
                    )
                rows.append({id_col: rid, "payload": payload})
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def synthesize_gif_jpeg(
    df: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic GIF/JPEG synthesis from an id column: even ids
    become multi-frame GIF89a (w = 1 + id % 200, h = 1 + id % 150,
    frames = 1 + id % 4), odd ids become JPEGs whose SOF0 sits behind
    1 + id % 3 APP0 padding segments (w = 1 + id % 320, h = 1 + id % 240)
    — so a fixed-offset reader fails on every odd id. Every field is
    integer arithmetic on the id, which is what makes the parse
    SQL-oracle-checkable."""
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("payload", T.BinaryType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid in pdf[id_col]:
                rid = int(rid)
                if rid % 2 == 0:
                    payload = build_gif(
                        1 + rid % 200, 1 + rid % 150, n_frames=1 + rid % 4
                    )
                else:
                    payload = build_jpeg(
                        1 + rid % 320, 1 + rid % 240,
                        n_app_segments=1 + rid % 3,
                    )
                rows.append({id_col: rid, "payload": payload})
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return df.select(id_col).mapInPandas(run, out_schema)


def parse_container_headers(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
) -> DataFrame:
    """REAL media-container metadata extraction — not a fake decoder: a
    pure-Python RIFF/WAVE chunk walker plus BMP header reader over
    mapInPandas (Arrow-batched; payloads never visit the driver). Output:
    one row per asset with (container, audio fields, image fields,
    data_bytes) — nulls where the format has no such field.

    This retires the 'decode is stubbed' caveat for header-grade
    metadata; sample/pixel DECODING (the part that genuinely needs
    PIL/librosa) remains behind the fake/stub backends in
    extract_features/resize_images."""
    out_schema = T.StructType(
        [df.schema[id_col]]
        + [T.StructField(k, t, True) for k, t in _CONTAINER_FIELDS]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [id_col] + [k for k, _ in _CONTAINER_FIELDS]
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                rec = _parse_one_container(payload)
                rec[id_col] = rid
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    from big_data_analysis_for_stock_market_data_spark.operators import ensure_parallelism

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        run, schema=out_schema
    )


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-feature: sha256-seeded byte statistics. Stands in
    for a real encoder while exercising identical Spark plumbing."""
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    digest = hashlib.sha256(payload).digest()
    reps = (dim * 4 // len(digest)) + 1
    raw = (digest * reps)[: dim * 4]
    arr = np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
    return ((arr % 1000) / 1000.0).astype(np.float32)


def extract_features(
    df: DataFrame,
    dim: int = 32,
    payload_col: str = "payload",
    out: str = "features",
    decode_backend: str = "fake",
    batch_size_hint: int = 64,
) -> DataFrame:
    """Decode + featurize payloads via mapInPandas. Output schema = input +
    ``features: array<float>`` (fixed ``dim``).

    ``decode_backend='stub'`` documents the real integration point: replace
    ``_fake_feature`` with the actual decoder (PIL/torchvision/librosa) —
    the surrounding iterator/batch/schema code is production-shaped already.
    """
    if decode_backend not in ("fake", "stub"):
        raise ValueError("decode_backend must be 'fake' or 'stub'")

    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out, T.ArrayType(T.FloatType()), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode_backend == "stub":
            raise NotImplementedError(
                "media decode requires an image/audio library (e.g. pillow, "
                "librosa) which is not installed in this environment; use "
                "decode_backend='fake' for plumbing tests"
            )
        for pdf in batches:
            pdf[out] = [
                _fake_feature(p, dim) for p in pdf[payload_col]
            ]
            yield pdf

    from big_data_analysis_for_stock_market_data_spark.operators import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int = 32,
    height: int = 32,
    payload_col: str = "payload",
    out: str = "resized_payload",
    decode_backend: str = "fake",
) -> DataFrame:
    """Image resize stage. Output schema = input + ``resized_payload:
    binary`` (exactly width*height*3 bytes) + ``resized_width``/
    ``resized_height``.

    ``decode_backend='stub'`` marks the real integration point (PIL
    ``Image.open(...).resize(...)``); 'fake' emits a deterministic
    sha256-keystream "bitmap" of the right SIZE and SHAPE so downstream
    stages (fixed-size binary handling, Arrow batch memory, partitioning)
    are exercised for real."""
    if decode_backend not in ("fake", "stub"):
        raise ValueError("decode_backend must be 'fake' or 'stub'")
    n_bytes = width * height * 3

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField(out, T.BinaryType(), True),
            T.StructField("resized_width", T.IntegerType(), False),
            T.StructField("resized_height", T.IntegerType(), False),
        ]
    )

    def fake_bitmap(payload: bytes) -> bytes:
        if payload is None:
            return b"\x00" * n_bytes
        digest = hashlib.sha256(payload).digest()
        reps = (n_bytes // len(digest)) + 1
        return (digest * reps)[:n_bytes]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode_backend == "stub":
            raise NotImplementedError(
                "image resize requires an imaging library (e.g. pillow) "
                "which is not installed in this environment; use "
                "decode_backend='fake' for plumbing tests"
            )
        for pdf in batches:
            pdf[out] = [fake_bitmap(p) for p in pdf[payload_col]]
            pdf["resized_width"] = width
            pdf["resized_height"] = height
            yield pdf

    from big_data_analysis_for_stock_market_data_spark.operators import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema=out_schema)


def frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    payload_col: str = "payload",
    id_col: str = "asset_id",
) -> DataFrame:
    """Video frame sampling (stub semantics: evenly-spaced byte slices stand
    in for decoded frames). Output: one row per (asset, frame_idx) with the
    frame payload — the explode shape a real ffmpeg-backed sampler needs."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[payload_col] or b""
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    rows.append(
                        {
                            id_col: r[id_col],
                            "frame_idx": i,
                            "frame_payload": payload[i * step: (i + 1) * step],
                        }
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_payload"])

    from big_data_analysis_for_stock_market_data_spark.operators import ensure_parallelism

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        run, schema=out_schema
    )
