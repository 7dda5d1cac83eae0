"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata. The Spark-side plumbing — schemas,
Arrow-batched UDF signatures, partition sizing — is real and tested;
the codec kernels are STUBBED (image/audio libraries are not in this
container) behind ``DeterministicFakeCodec`` so pipelines exercise the
exact dataflow a real decoder would see.

Pattern: ``mapInPandas`` with a bounded batch size so a partition of
large blobs never materializes at once; metadata stays in columns so
filters prune *before* any decode.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),        # image|audio|video
    StructField("mime", StringType(), False),
    StructField("width", IntegerType(), True),       # images/video
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True), # audio/video
    StructField("payload", BinaryType(), False),     # opaque bytes
])

FEATURE_SCHEMA = "media_id string, kind string, n_bytes int, feature array<float>"


class DeterministicFakeCodec:
    """Stand-in for a real decoder: derives a fixed-size float feature
    deterministically from the payload bytes. Replace with a real
    image/audio decode when the libs exist.

    A real decoder would raise NotImplementedError here; the fake keeps
    the pipeline testable end-to-end."""

    def __init__(self, feat_dim: int = 16):
        self.feat_dim = feat_dim

    def decode_features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer((digest * ((self.feat_dim * 4) // len(digest) + 1))
                            [: self.feat_dim * 4], dtype=np.uint32)
        return (raw.astype(np.float32) / np.float32(2**32)).astype(np.float32)


def real_decode_stub(payload: bytes) -> np.ndarray:
    """The real codec hook — intentionally unimplemented in this
    container (no PIL/ffmpeg). Wire actual decoding here."""
    raise NotImplementedError(
        "image/audio decoding requires codec libraries not present in "
        "this container; use DeterministicFakeCodec for pipeline tests")


class PILImageCodec:
    """Real image decode when Pillow is installed: decode -> grayscale
    -> thumbnail resize -> normalized pixel features. Raises
    ImportError at CONSTRUCTION (not per row) when PIL is absent, so
    callers can fall back explicitly; :func:`default_image_codec`
    does that probe once."""

    def __init__(self, feat_dim: int = 16):
        from PIL import Image  # noqa: F401 - probe the dependency
        self._Image = Image
        self.feat_dim = feat_dim
        # square thumbnail whose pixel count covers feat_dim
        self._side = int(np.ceil(np.sqrt(feat_dim)))

    def decode_features(self, payload: bytes) -> np.ndarray:
        import io
        img = self._Image.open(io.BytesIO(payload)).convert("L")
        img = img.resize((self._side, self._side))
        px = np.asarray(img, dtype=np.float32).ravel() / np.float32(255.0)
        return px[: self.feat_dim]


def default_image_codec(feat_dim: int = 16):
    """The best codec the environment supports: Pillow-backed real
    decode when importable, else the deterministic fake (this
    container has no image libraries — the Spark-side plumbing is
    identical either way)."""
    try:
        return PILImageCodec(feat_dim)
    except ImportError:
        return DeterministicFakeCodec(feat_dim)


def extract_features(df: DataFrame, codec: DeterministicFakeCodec | None = None,
                     batch_rows: int = 64) -> DataFrame:
    """payload -> feature vector, Arrow-batched with a small batch size
    so big blobs never pile up in one pandas frame."""
    codec = codec or DeterministicFakeCodec()

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo:lo + batch_rows]
                feats = [codec.decode_features(bytes(p)).tolist()
                         for p in chunk["payload"]]
                yield pd.DataFrame({
                    "media_id": chunk["media_id"].values,
                    "kind": chunk["kind"].values,
                    "n_bytes": [len(bytes(p)) for p in chunk["payload"]],
                    "feature": feats,
                })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  id_col: str = "media_id") -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_ts_ms) rows
    from duration metadata only — the actual frame decode is the
    stubbed codec. Metadata-only explode means pruning happens before
    any byte is touched."""
    return (df.filter(F.col("kind") == "video")
              .select(id_col, F.explode(
                  F.sequence(F.lit(0), F.col("duration_ms"),
                             F.lit(every_ms))).alias("frame_ts_ms")))


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(128 + (i % 5) * 64)
        rows.append((f"m{i:05d}", kind,
                     {"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[kind],
                     64 if kind != "audio" else None,
                     48 if kind != "audio" else None,
                     None if kind == "image" else 4000 + 250 * (i % 7),
                     bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
