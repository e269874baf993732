"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schema, partition-friendly layout, Arrow batch
shapes, mapInPandas signatures, frame sampling — is real and tested. The
media DECODE is native for PNG and WAV PCM (``sources/codecs.py``: pure
stdlib zlib inflate + numpy unfilter; stdlib ``wave``), so
``decode_features(fake=False)`` returns true pixel/PCM-derived features
for those codecs. Codecs with no pure-stdlib decoder (JPEG entropy
decode, video) still raise ``NotImplementedError`` honestly; ``fake=True``
substitutes a clearly-marked deterministic byte-level kernel (same shapes,
same plumbing) so any-payload pipelines are exercisable end-to-end.

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


def _real_decode_batch(payloads: pd.Series, on_unsupported: str = "raise") -> np.ndarray:
    """REAL decode kernel: PNG → pixel-array features, WAV PCM → sample
    features (``sources/codecs.py`` — pure stdlib+numpy, no codec libs).
    Codecs without a native decoder (JPEG entropy decode, video) raise
    ``NotImplementedError`` (``on_unsupported="raise"``, the honest
    default) or yield an all-NaN row (``on_unsupported="null"``).

    Reference analog: per-file pixel decode at
    ``src/preparation/iamloader.py:37`` (cv2.imread grayscale)."""
    from featureextraction_spark.sources.codecs import (
        PNG_SIGNATURE,
        audio_features,
        decode_png,
        decode_wav,
        image_features,
    )

    out = np.full((len(payloads), FEATURE_DIM), np.nan)
    for i, raw in enumerate(payloads):
        if raw is None or len(raw) == 0:
            continue
        b = bytes(raw)
        if b[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
            out[i] = image_features(decode_png(b), dim=FEATURE_DIM)
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            pcm, sr = decode_wav(b)
            out[i] = audio_features(pcm, sr, dim=FEATURE_DIM)
        elif on_unsupported == "raise":
            sig = b[:4].hex()
            raise NotImplementedError(
                f"no native decoder for payload with signature 0x{sig}: only "
                "PNG and WAV PCM decode natively (pure stdlib+numpy, "
                "sources/codecs.py); pass fake=True for the deterministic "
                "byte-stat stub or on_unsupported='null' to skip"
            )
    return out


def decode_features(
    df: DataFrame,
    fake: bool = False,
    batch_note: bool = True,
    on_unsupported: str = "raise",
) -> DataFrame:
    """payload → fixed-dim feature vector via Arrow-batched mapInPandas.

    ``fake=False`` (default) decodes PNG and WAV PCM natively
    (``sources/codecs.py``) and applies ``on_unsupported`` to anything
    else; ``fake=True`` runs the deterministic byte-stat stub instead.
    Either way the plumbing is identical: per-batch Arrow transfer,
    bounded batch memory, the binary column never touches row-at-a-time
    Python outside the kernel loop.
    """
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
            if fake:
                feats = _fake_decode_batch(pdf["payload"])
            else:
                feats = _real_decode_batch(pdf["payload"], on_unsupported)
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


_EXT_MODALITY = {
    "png": "image", "jpg": "image", "jpeg": "image", "gif": "image",
    "bmp": "image", "tif": "image", "tiff": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio", "ogg": "audio",
    "mp4": "video", "mkv": "video", "avi": "video", "webm": "video", "mov": "video",
}


def _parse_media_header(b: bytes | None) -> dict:
    """Header-only metadata from raw bytes — pure byte parsing, no codec
    libraries (PNG IHDR dims; WAV fmt/data → sample rate + duration).
    Unknown containers return all-null metadata; the payload itself stays
    opaque either way."""
    meta = {"width": None, "height": None, "sample_rate": None,
            "duration_ms": None, "codec": None}
    if not b:
        return meta
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        meta["codec"] = "png"
        meta["width"] = int.from_bytes(b[16:20], "big")
        meta["height"] = int.from_bytes(b[20:24], "big")
    elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        meta["codec"] = "wav"
        # walk RIFF chunks for fmt (sample rate, byte rate) and data (size)
        pos, byte_rate = 12, None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            csz = int.from_bytes(b[pos + 4 : pos + 8], "little")
            if cid == b"fmt " and pos + 16 <= len(b):
                meta["sample_rate"] = int.from_bytes(b[pos + 12 : pos + 16], "little")
                byte_rate = int.from_bytes(b[pos + 16 : pos + 20], "little")
            elif cid == b"data" and byte_rate:
                meta["duration_ms"] = int(csz * 1000 // byte_rate)
            pos += 8 + csz + (csz % 2)
    elif b[:3] == b"\xff\xd8\xff":
        meta["codec"] = "jpeg"
        # SOF-marker scan for dimensions — pure bytes, no codec library.
        # Walk marker segments: 0xFF <marker> <len16 payload>; SOF0-SOF15
        # (except DHT/JPG/DAC 0xC4/0xC8/0xCC) carry precision(1) +
        # height(2) + width(2) at the start of their payload.
        pos = 2
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                break
            marker = b[pos + 1]
            if marker == 0xFF:  # fill byte
                pos += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers, no length field
                continue
            if marker == 0xD9 or marker == 0xDA:  # EOI / start of scan
                break
            seg_len = int.from_bytes(b[pos + 2 : pos + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if pos + 9 <= len(b):
                    meta["height"] = int.from_bytes(b[pos + 5 : pos + 7], "big")
                    meta["width"] = int.from_bytes(b[pos + 7 : pos + 9], "big")
                break
            pos += 2 + seg_len
    return meta


def _to_multimodal_rows(pdf: pd.DataFrame) -> pd.DataFrame:
    """(path, content) pandas batch → MULTIMODAL_SCHEMA-shaped batch."""
    metas = [_parse_media_header(bytes(c) if c is not None else None)
             for c in pdf["content"]]
    ext = pdf["path"].map(lambda p: p.rsplit(".", 1)[-1].lower() if "." in p else "")
    return pd.DataFrame(
        {
            "sample_id": [
                int(hashlib.md5(p.encode("utf-8")).hexdigest()[:15], 16)
                for p in pdf["path"]
            ],
            "modality": ext.map(lambda e: _EXT_MODALITY.get(e, "unknown")),
            "payload": pdf["content"],
            "meta": metas,
            "source_path": pdf["path"],
        }
    )


_INGEST_SCHEMA = T.StructType(
    list(MULTIMODAL_SCHEMA.fields) + [T.StructField("source_path", T.StringType())]
)


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """S1 ingestion: a directory (or glob) of media files → MULTIMODAL_SCHEMA
    (+ ``source_path``) via Spark's ``binaryFile`` source.

    Reference analog ``src/preparation/iamloader.py:10-53`` (tarball image
    scan + per-file decode); here the scan is the distributed binaryFile
    reader (one task per file split, driver never touches payloads),
    sample_id is the 60-bit md5 of the file path (stable across runs and
    cluster layouts), and metadata comes from the pure-byte header parse —
    the decode stays stubbed (``decode_features``)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path).select(F.col("path"), F.col("content"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _to_multimodal_rows(pdf)

    return raw.mapInPandas(gen, schema=_INGEST_SCHEMA)


def read_tarballs(spark: SparkSession, path: str, glob: str = "*.tar*") -> DataFrame:
    """S1 ingestion, tar flavor: each ``.tar``/``.tar.gz`` under ``path``
    expands to one row per member file, same MULTIMODAL_SCHEMA (+
    ``source_path`` = ``tarpath::member``).

    Distribution contract: one Arrow row per ARCHIVE enters the Python
    worker (binaryFile), the expansion happens inside the task — tarballs
    parallelize across the cluster; no driver-side unpacking. Archives are
    assumed executor-memory-sized (tar archives of many small media files,
    the reference's layout); huge single archives should be split upstream."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import tarfile

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                with tarfile.open(fileobj=io.BytesIO(bytes(row.content))) as tf:
                    paths, contents = [], []
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        fh = tf.extractfile(m)
                        if fh is None:
                            continue
                        paths.append(f"{row.path}::{m.name}")
                        contents.append(fh.read())
                if paths:
                    yield _to_multimodal_rows(
                        pd.DataFrame({"path": paths, "content": contents})
                    )

    return raw.mapInPandas(gen, schema=_INGEST_SCHEMA)


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
