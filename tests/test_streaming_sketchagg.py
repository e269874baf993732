"""Streaming twin of the Misra–Gries heavy-hitters summary: the
foreachBatch exact-count maintainer must be row-equal to the batch
operator over the same rows, and replay-idempotent (per-batch overwrite
state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from featureextraction_spark.operators.sketches import heavy_hitters
from featureextraction_spark.streaming.sketchagg import (
    read_heavy_hitters,
    streaming_heavy_hitters,
)


def _tok_df(spark, n=900):
    # zipf-ish: token r appears ~ n/r times, spread over 5 shards
    rows = []
    i = 0
    for r in range(1, 40):
        for _ in range(900 // r):
            rows.append((i, i % 5, f"tok{r:02d}"))
            i += 1
    return spark.createDataFrame(rows, "row_id long, shard long, item string")


def _as_stream(spark, df, tmp_path, chunks=4):
    src = str(tmp_path / "src")
    for c in range(chunks):
        df.where(F.pmod(F.col("row_id"), F.lit(chunks)) == c).coalesce(
            1
        ).write.mode("append").parquet(src)
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_heavy_hitters_matches_batch(spark, tmp_path):
    df = _tok_df(spark)
    stream = _as_stream(spark, df, tmp_path)
    state = str(tmp_path / "hh_state")
    q = streaming_heavy_hitters(
        stream, state_dir=state, col="item", shard_col="shard",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    got = _rows(read_heavy_hitters(spark, state, k=8))
    want = _rows(heavy_hitters(df, "item", F.col("shard"), k=8))
    assert got == want and len(got) == 8


def test_streaming_heavy_hitters_replay_idempotent(spark, tmp_path):
    # re-running the same availableNow drive over the same source with a
    # FRESH checkpoint replays every batch id; per-batch overwrite means
    # the state (and the summary) must not double-count
    df = _tok_df(spark)
    stream1 = _as_stream(spark, df, tmp_path)
    state = str(tmp_path / "hh_state")
    q = streaming_heavy_hitters(
        stream1, state_dir=state, col="item", shard_col="shard",
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(180)
    first = _rows(read_heavy_hitters(spark, state, k=8))
    stream2 = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
    )
    q2 = streaming_heavy_hitters(
        stream2, state_dir=state, col="item", shard_col="shard",
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(180)
    assert _rows(read_heavy_hitters(spark, state, k=8)) == first
