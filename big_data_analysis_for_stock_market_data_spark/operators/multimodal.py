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
    MIME from magic bytes. All JVM-side — no Python for pure metadata."""
    p = F.col(payload_col)
    hexpfx = F.lower(F.hex(F.substring(p, 1, 4)))
    mime = F.lit("application/octet-stream")
    for magic, m in _MAGIC.items():
        mime = F.when(hexpfx.startswith(magic), F.lit(m)).otherwise(mime)
    return (
        df.withColumn("payload_bytes", F.length(p).cast("long"))
        .withColumn("content_sha256", F.sha2(p, 256))
        .withColumn("sniffed_mime", mime)
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
