"""Bucketed transcript tables — co-located joins with ZERO shuffle.

At 10^12 turns the dominant recurring cost is re-shuffling the fact table
on ``conv_id`` for every join/window job. Hive-style bucketing pays that
shuffle ONCE at write time: both sides of a ``conv_id`` join (transcripts
× per-conversation features, transcripts × probe sets) read pre-hashed
buckets and join with no Exchange at all — the plan-audit test asserts
it. This is the storage-layout leg of the engine's partitioning story
(salting handles skew WITHIN a job; bucketing removes the shuffle ACROSS
jobs).

Bucket count guidance: pick ``buckets`` ≈ cluster cores × small factor at
the TARGET scale (buckets are fixed at write time; too few caps join
parallelism, too many makes small files). Iceberg's
``bucket(N, conv_id)`` partition transform is the same layout with
relocatable metadata — the migration path off Hive-style tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_bucket_db(spark: SparkSession, name: str, location: str) -> None:
    """Create (idempotently) a database whose tables live under ``location``
    — keeps bucketed warehouse data out of the default spark-warehouse."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{location}'")


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    bucket_col: str = "conv_id",
    sort_cols: tuple[str, ...] = ("ts", "turn_idx"),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed by ``bucket_col`` and
    sorted within buckets by ``sort_cols`` (the per-conversation window
    order — sorted buckets also cut the window sort's spill)."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, bucket_col)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str = "conv_id",
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on ``on`` — with equal bucket counts the
    planner reads matching buckets side by side: no Exchange on either
    input (verify with .explain / tests/test_bucketed.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
