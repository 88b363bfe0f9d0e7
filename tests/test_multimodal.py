"""Multimodal binary-column tests (operators/multimodal.py)."""

import hashlib

import pytest
from pyspark.sql import Row

from big_data_analysis_for_stock_market_data_spark.operators import multimodal as M

PNG = bytes.fromhex("89504e470d0a1a0a") + b"fakepngdata"
JPG = bytes.fromhex("ffd8ffe0") + b"fakejpgdata"


def _assets(spark):
    return spark.createDataFrame(
        [
            Row(asset_id=1, payload=PNG),
            Row(asset_id=2, payload=JPG),
            Row(asset_id=3, payload=b"plain bytes"),
        ],
        schema="asset_id long, payload binary",
    )


def test_payload_meta_expression_level(spark):
    rows = {r.asset_id: r for r in M.with_payload_meta(_assets(spark)).collect()}
    assert rows[1].sniffed_mime == "image/png"
    assert rows[2].sniffed_mime == "image/jpeg"
    assert rows[3].sniffed_mime == "application/octet-stream"
    assert rows[1].payload_bytes == len(PNG)
    assert rows[1].content_sha256 == hashlib.sha256(PNG).hexdigest()


def test_fake_features_deterministic_fixed_dim(spark):
    out1 = {r.asset_id: list(r.features)
            for r in M.extract_features(_assets(spark), dim=8).collect()}
    out2 = {r.asset_id: list(r.features)
            for r in M.extract_features(_assets(spark), dim=8).collect()}
    assert out1 == out2                       # deterministic
    assert all(len(v) == 8 for v in out1.values())
    assert out1[1] != out1[2]                 # content-sensitive


def test_stub_backend_raises_not_implemented(spark):
    df = M.extract_features(_assets(spark), decode_backend="stub")
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        df.collect()


def test_frame_sample_explode_shape(spark):
    out = M.frame_sample(_assets(spark), n_frames=4).collect()
    assert len(out) == 12
    by_asset = {}
    for r in out:
        by_asset.setdefault(r.asset_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_asset.values())


def test_resize_fake_shape_and_determinism(spark):
    from pyspark.sql import functions as F

    from big_data_analysis_for_stock_market_data_spark.operators import (
        multimodal as mm,
    )

    df = spark.createDataFrame(
        [(1, b"abc" * 50), (2, b"xyz" * 9), (3, None)], "asset_id long, payload binary"
    )
    out = mm.resize_images(df, width=8, height=4).collect()
    for r in sorted(out, key=lambda r: r.asset_id):
        assert len(r.resized_payload) == 8 * 4 * 3
        assert (r.resized_width, r.resized_height) == (8, 4)
    # deterministic across runs
    again = mm.resize_images(df, width=8, height=4).collect()
    assert {r.asset_id: bytes(r.resized_payload) for r in out} == {
        r.asset_id: bytes(r.resized_payload) for r in again
    }


def test_resize_stub_raises(spark):
    import pytest as _pytest

    from big_data_analysis_for_stock_market_data_spark.operators import (
        multimodal as mm,
    )

    df = spark.createDataFrame([(1, b"abc")], "asset_id long, payload binary")
    with _pytest.raises(Exception, match="NotImplementedError|imaging"):
        mm.resize_images(df, decode_backend="stub").collect()
