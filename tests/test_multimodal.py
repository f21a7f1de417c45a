"""Tests for the multimodal column plumbing (operators/multimodal.py):
schema contract, Arrow-batched mapInPandas feature pass (deterministic
fake decoder), frame sampling, and the stubbed real-decode path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_pipeline_financial_streamlit_dashboard_spark.operators.multimodal import (
    attach_media_meta,
    extract_media_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, bytes(range(256)) * 8),           # 2 KiB structured payload
        (2, b"\x00" * 1024),                   # constant payload → entropy 0
        (3, b"png-ish header" + b"\x89PNG" * 100),
        (4, b""),                              # empty payload edge
    ]
    return spark.createDataFrame(rows, ["asset_id", "payload"])


def test_attach_media_meta_schema(assets):
    df = attach_media_meta(assets, media_type="image", fmt="png")
    meta = df.select("media_meta.*")
    assert set(meta.columns) == {
        "media_type", "format", "width", "height", "duration_ms", "n_bytes"
    }
    rows = {r["asset_id"]: r for r in df.select("asset_id", "media_meta.n_bytes").collect()}
    assert rows[1]["n_bytes"] == 2048
    assert rows[4]["n_bytes"] == 0


def test_feature_extraction_fake_decoder(assets):
    out = extract_media_features(assets, fake=True, feat_dim=8)
    rows = {r["asset_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert len(rows[1]["feature"]) == 8
    assert rows[2]["byte_entropy"] == 0.0           # constant payload
    assert rows[1]["byte_entropy"] == pytest.approx(8.0)  # uniform 0..255
    assert rows[4]["n_bytes"] == 0                  # empty payload survives
    # determinism across runs (same plan, fresh execution)
    again = {r["asset_id"]: r for r in
             extract_media_features(assets, fake=True, feat_dim=8).collect()}
    assert rows[1]["feature"] == again[1]["feature"]


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    _pil_available(), reason="Pillow present: real decode path active instead"
)
def test_real_decoder_is_stubbed_without_pillow(assets):
    with pytest.raises(Exception) as exc_info:
        extract_media_features(assets, fake=False).collect()
    assert "NotImplementedError" in repr(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


@pytest.mark.skipif(
    not _pil_available(), reason="Pillow not installed in this container"
)
def test_real_decoder_with_pillow(spark):
    """With Pillow importable, fake=False must decode real image bytes:
    a synthetic PNG yields a feat_dim column-mean feature; corrupt
    bytes yield a NULL feature (continue-on-failure), not a crash."""
    import io

    import numpy as np
    from PIL import Image

    buf = io.BytesIO()
    arr = np.tile(np.arange(32, dtype=np.uint8) * 8, (32, 1))  # gradient
    Image.fromarray(arr, mode="L").save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [(1, png), (2, b"not an image")], ["asset_id", "payload"]
    )
    rows = {
        r["asset_id"]: r
        for r in extract_media_features(df, fake=False, feat_dim=8).collect()
    }
    feat = rows[1]["feature"]
    assert feat is not None and len(feat) == 8
    # gradient image: column means increase left to right
    assert feat[0] < feat[-1]
    assert all(0.0 <= v <= 1.0 for v in feat)
    assert rows[2]["feature"] is None  # undecodable row survives as NULL


def test_frame_sampling(assets):
    frames = sample_frames(assets, every_n_bytes=512, max_frames=3)
    by_asset = (
        frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()
    )
    counts = {r["asset_id"]: r["n"] for r in by_asset}
    assert counts[1] == 3   # 2 KiB → capped at 3 frames
    assert counts[4] == 1   # empty payload → single zero-offset frame
    row = frames.filter("asset_id = 1 AND frame_idx = 1").first()
    assert row["byte_offset"] == 512
    assert len(row["frame_bytes"]) == 512
