"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.
The Spark-side plumbing (schemas, batch shapes, ``mapInPandas`` UDF
signatures, partitioning) is real and tested; the actual media decoding is
STUBBED — the image/audio libraries are not available in this container —
behind ``FakeMediaDecoder`` (deterministic, seeded by payload hash) and a
clearly marked ``NotImplementedError`` in ``RealMediaDecoder``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_DDL = "media_type string, width int, height int, n_bytes bigint"
FEATURE_DDL = (
    "doc_id bigint, media_type string, feat array<float>, feat_dim int, "
    "payload_bytes bigint"
)


try:  # media extra: present on a production cluster image, not here
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - sandbox has no PIL
    _PILImage = None


def pil_available() -> bool:
    return _PILImage is not None


class RealMediaDecoder:
    """Production image decoder (PIL), import-guarded.

    Instantiable only when PIL is installed; ``default_decoder`` selects it
    automatically, else falls back to ``FakeMediaDecoder`` so the Spark
    plumbing stays exercised in environments without media libraries."""

    def __init__(self):
        if _PILImage is None:
            raise NotImplementedError(
                "media decode requires PIL; install the media extras on the "
                "cluster image (pip install pillow) or use FakeMediaDecoder"
            )

    def decode(self, payload: bytes) -> np.ndarray:
        import io

        img = _PILImage.open(io.BytesIO(payload))
        return np.asarray(img.convert("RGB"), dtype=np.uint8)


class FakeMediaDecoder:
    """Deterministic stand-in: 'decodes' payload bytes to a fake HxWx3 image
    whose pixels are a seeded function of the payload digest."""

    def __init__(self, h: int = 16, w: int = 16):
        self.h, self.w = h, w

    def decode(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (self.h, self.w, 3), dtype=np.uint8)


def default_decoder():
    """RealMediaDecoder when PIL is installed, else the deterministic fake —
    the Spark-side plumbing (schema, batch shape, partitioning) is identical
    either way."""
    return RealMediaDecoder() if pil_available() else FakeMediaDecoder()


def extract_features(df: DataFrame, payload_col: str = "html", id_col: str = "doc_id",
                     decoder=None, feat_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads.

    Batch shape: iterator of pandas frames; each batch decodes payloads and
    emits a fixed-dim float feature (here: per-channel mean/std pooling of
    the decoded array). Partitioning is whatever the caller set upstream —
    the op is embarrassingly parallel and preserves it.
    """
    dec = decoder or default_decoder()

    def run(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            feats, nbytes = [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload)
                img = dec.decode(raw)
                f = np.concatenate([
                    img.mean(axis=(0, 1)), img.std(axis=(0, 1)),
                    [img.shape[0], img.shape[1]],
                ]).astype(np.float32)[:feat_dim]
                feats.append(f)
                nbytes.append(len(raw))
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": "image/fake",
                "feat": feats,
                "feat_dim": np.int32(feat_dim),
                "payload_bytes": pd.Series(nbytes, dtype="int64"),
            })

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_DDL)


def media_metadata(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Typed metadata over opaque binary columns — all JVM built-ins."""
    p = F.col(payload_col)
    return df.select(
        F.lit("text/html").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(p).cast("bigint").alias("n_bytes"),
    )
