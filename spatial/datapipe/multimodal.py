"""Multimodal binary columns: schema + Spark-side plumbing, decode stubbed.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
(the Iceberg/parquet-native representation at 100TB: bytes stay columnar and
compressed, metadata prunes without touching them). The decode/resize/
frame-sample kernels run as Arrow-batched ``mapInPandas`` so the bytes cross
into Python exactly once per batch.

The actual codec step is STUBBED in this environment (no PIL/ffmpeg/soundfile
in the container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a clearly-marked deterministic fake derives
"pixels" from the byte content -- so the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape, feature pipeline) is fully real and
tested end-to-end, and swapping in a real codec is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, feat array<double>, feat_dim int, "
    "decode_ok boolean"
)

_FEAT_DIM = 16


def decode_image(payload: bytes, meta, fake: bool = False) -> np.ndarray:
    """Decode payload -> (H, W) grayscale array.

    STUB: real decoding needs an image codec that is not installed here."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires a codec library (PIL/turbojpeg) not "
            "available in this environment; pass fake=True for the "
            "deterministic test fake")
    # deterministic fake: tile the payload bytes into the declared shape
    w = int(meta["width"] or 8)
    h = int(meta["height"] or 8)
    raw = np.frombuffer(bytes(payload), dtype=np.uint8)
    if len(raw) == 0:
        raw = np.zeros(1, dtype=np.uint8)
    return np.resize(raw, (h, w)).astype(np.float64)


def extract_features(df: DataFrame, fake_decode: bool = False) -> DataFrame:
    """media table -> per-item feature vector (histogram of the decoded
    pixels, _FEAT_DIM bins). Bad/undecodable rows yield decode_ok=false and
    a null feature instead of failing the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    img = decode_image(payload, meta, fake=fake_decode)
                    hist, _ = np.histogram(img, bins=_FEAT_DIM, range=(0, 256))
                    total = hist.sum() or 1
                    feats.append((hist / total).tolist())
                    oks.append(True)
                except Exception:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feat": feats,
                "feat_dim": np.full(len(pdf), _FEAT_DIM, dtype=np.int32),
                "decode_ok": oks,
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table exercising the schema + batch path."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        k = kinds[i % 3]
        size = int(rng.integers(64, 512))
        payload = bytes(rng.integers(0, 256, size, dtype=np.uint8).tolist())
        rows.append((i, k, payload,
                     {"mime": f"{k}/x-fake", "width": 16, "height": 16,
                      "duration_ms": 1000 if k != "image" else None}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
