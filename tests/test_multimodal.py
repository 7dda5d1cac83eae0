"""Multimodal column plumbing: schema, bounded-batch decode, frame
sampling from metadata, and codec selection (PIL-gated real decode)."""

import numpy as np
import pytest

from algebird_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, n=48).repartition(4).persist()


def test_feature_extraction_shape_and_determinism(media):
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert len(feats) == 48
    for r in feats.values():
        assert len(r["feature"]) == 16
        assert all(0.0 <= x < 1.0 for x in r["feature"])
    # batching must not change results (mapInPandas chunking invariance)
    again = {r["media_id"]: r["feature"] for r in
             mm.extract_features(media, batch_rows=5).collect()}
    for mid, r in feats.items():
        assert again[mid] == r["feature"], mid


def test_frame_sampling_is_metadata_only(spark, tmp_path_factory):
    # parquet-backed: column pruning must reach the scan so no payload
    # byte is read for a metadata-only operation (an in-memory
    # ExistingRDD scan can't prune, so test the storage path users run)
    path = str(tmp_path_factory.mktemp("media") / "media.parquet")
    mm.synthetic_media(spark, n=48).write.mode("overwrite").parquet(path)
    out = mm.sample_frames(spark.read.parquet(path), every_ms=1000)
    rows = out.collect()
    assert rows and all(r["frame_ts_ms"] % 1000 == 0 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan_line = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_line and all("payload" not in ln for ln in scan_line), plan


def test_default_codec_fallback_without_pil():
    codec = mm.default_image_codec()
    try:
        import PIL  # noqa: F401
        assert isinstance(codec, mm.PILImageCodec)
    except ImportError:
        assert isinstance(codec, mm.DeterministicFakeCodec)
    f = codec.decode_features if isinstance(codec, mm.DeterministicFakeCodec) \
        else mm.DeterministicFakeCodec().decode_features
    v = f(b"payload bytes")
    assert v.shape == (16,) and v.dtype == np.float32


def test_real_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.real_decode_stub(b"x")


@pytest.mark.skipif(
    not pytest.importorskip if False else
    __import__("importlib").util.find_spec("PIL") is None,
    reason="Pillow not installed in this container")
def test_pil_codec_decodes_real_png():
    from io import BytesIO

    from PIL import Image
    img = Image.new("RGB", (32, 20), color=(120, 30, 200))
    buf = BytesIO()
    img.save(buf, format="PNG")
    feats = mm.PILImageCodec(16).decode_features(buf.getvalue())
    assert feats.shape == (16,)
    assert (feats >= 0).all() and (feats <= 1).all()
