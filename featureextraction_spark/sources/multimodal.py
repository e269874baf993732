"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schema, partition-friendly layout, Arrow batch
shapes, mapInPandas signatures, frame sampling — is real and tested. The
actual media DECODE is stubbed: the decode libraries (PIL/cv2/av) are not in
this container, so ``decode_features`` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a clearly-marked deterministic byte-level
kernel (same shapes, same plumbing) so the pipeline is exercisable
end-to-end.

Reference analog: the tarball image scan + per-file decode
(``src/preparation/iamloader.py:10-53``) — there the payload was a 2-D
grayscale array; here it is an opaque ``binary`` cell plus metadata struct,
the layout that scales: payloads never pass through Python except inside
Arrow batches, and metadata-only queries prune the binary column entirely
(columnar parquet scan reads just the struct).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

_DECODE_LIBS_AVAILABLE = False  # PIL / cv2 / av are not baked into this env


def make_multimodal_fixture(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic multimodal table (no external data)."""
    rng = np.random.default_rng(seed)
    rows = []
    modalities = ["image", "audio", "video"]
    for i in range(n):
        m = modalities[i % 3]
        payload = rng.integers(0, 256, int(rng.integers(64, 512))).astype(np.uint8).tobytes()
        meta = {
            "width": int(rng.integers(16, 512)) if m != "audio" else None,
            "height": int(rng.integers(16, 512)) if m != "audio" else None,
            "sample_rate": 16000 if m != "image" else None,
            "duration_ms": int(rng.integers(100, 60000)) if m != "image" else None,
            "codec": {"image": "png", "audio": "pcm16", "video": "h264-stub"}[m],
        }
        rows.append((i, m, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MULTIMODAL_SCHEMA)


def _fake_decode_batch(payloads: pd.Series) -> np.ndarray:
    """DETERMINISTIC FAKE decode kernel (clearly marked — not a real codec):
    md5-seeded byte statistics standing in for decoded-media features.
    Replace with a real vectorized decode when media libs are present."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float64)
    for i, b in enumerate(payloads):
        if b is None or len(b) == 0:
            out[i, :] = np.nan
            continue
        arr = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.float64)
        digest = hashlib.md5(bytes(b)).digest()
        out[i, 0] = float(len(arr))
        out[i, 1] = float(arr.mean())
        out[i, 2] = float(arr.std())
        out[i, 3] = float(arr.min())
        out[i, 4] = float(arr.max())
        out[i, 5:13] = np.frombuffer(digest[:8], dtype=np.uint8).astype(np.float64)
        out[i, 13] = float((arr > 127).mean())
        out[i, 14] = float(np.abs(np.diff(arr)).mean() if len(arr) > 1 else 0.0)
        out[i, 15] = float(arr.sum() % 997)
    return out


def decode_features(df: DataFrame, fake: bool = False, batch_note: bool = True) -> DataFrame:
    """payload → fixed-dim feature vector via Arrow-batched mapInPandas.

    With real decode libs absent, ``fake=False`` raises NotImplementedError
    (the honest path); ``fake=True`` runs the deterministic byte-stat stub
    through the REAL plumbing: per-batch Arrow transfer, bounded batch
    memory, binary column never touches row-at-a-time Python.
    """
    if not fake and not _DECODE_LIBS_AVAILABLE:
        raise NotImplementedError(
            "media decode libraries (PIL/cv2/av) are not available in this "
            "environment; pass fake=True for the deterministic stub kernel"
        )

    out_schema = T.StructType(
        [
            T.StructField("sample_id", T.LongType()),
            T.StructField("modality", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("batch_rows", T.IntegerType()),  # observability: Arrow batch shape
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_decode_batch(pdf["payload"])
            yield pd.DataFrame(
                {
                    "sample_id": pdf["sample_id"].astype("int64"),
                    "modality": pdf["modality"],
                    "features": [row.tolist() for row in feats],
                    "batch_rows": np.int32(len(pdf)),
                }
            )

    cols = df.select("sample_id", "modality", "payload")
    return cols.mapInPandas(gen, schema=out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video/audio rows: one output row per sampled
    frame timestamp — pure relational explode over metadata (the payload
    column is pruned from the scan: check .explain for ReadSchema)."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
        F.lit(int(every_ms)),
    )
    return (
        df.filter(F.col("modality").isin("video", "audio"))
        .select(
            "sample_id",
            "modality",
            F.explode(frames).alias("frame_ts_ms"),
        )
    )


def resize_meta(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize PLAN (metadata transform): computes target dims preserving
    aspect ratio; actual pixel resize happens inside the (stubbed) decode
    kernel. Expression-only — demonstrates that geometry logic needn't
    touch the binary payload."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        (w.isNotNull()) & (h.isNotNull()) & (F.greatest(w, h) > max_side),
        F.lit(float(max_side)) / F.greatest(w, h).cast("double"),
    ).otherwise(F.lit(1.0))
    return df.select(
        "*",
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
    )
