"""Training-corpus shard writer — the release-side sink that turns a
curated document table into a deterministic, evenly-sized shard layout.

A pre-training data release ships as N shards whose membership must be
reproducible (re-running the release on the same corpus must produce the
same shard for every document, independent of cluster size or input
partitioning) and whose sizes must be balanced (downstream loaders
stream shards in parallel). The content-addressed 60-bit md5 shard
assignment gives both: membership depends only on (id, seed, n_shards),
and md5 uniformity balances sizes to ~±1/√(rows/shard).

Scale design: one hash shuffle of the final (already curated, already
deduplicated) table, one file per shard via ``partitionBy`` +
``repartition(n_shards, shard)``; rows within a shard are sorted by the
shard-local hash rank, so a shard's byte stream is itself deterministic
— content-stable re-releases (same rows, same order, per shard; file
NAMES carry Spark task uuids and are not stable). A manifest table (one
row per shard: row count, id range) is written next to the data for
loader-side integrity checks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from featureextraction_spark.operators.sampling import _seed_hash


def with_shard(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Append ``shard`` (0..n_shards−1) and ``shard_rank`` (dense order of
    the document WITHIN its shard by the same hash) — the deterministic,
    content-addressed assignment: md5(id:seed) mod n_shards.

    Pure map-side except the one rank window per shard (single shuffle on
    ``shard``); membership never depends on input partitioning.
    """
    from pyspark.sql import Window

    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = _seed_hash(id_col, seed)
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
        .withColumn("shard_rank", (F.row_number().over(w) - 1).cast("long"))
        .drop("__h")
    )


def write_corpus_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Write ``df`` as ``n_shards`` deterministic parquet shards under
    ``path`` (``shard=K/`` directories, one file each, rows in shard-rank
    order) plus a ``_manifest`` parquet (shard → row count, min/max id).

    Returns the manifest DataFrame (already written). Overwrites any
    previous release at ``path``; re-running on the same input
    reproduces every shard's rows and row order exactly.
    """
    sharded = with_shard(df, n_shards, id_col=id_col, seed=seed)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_rank")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(path, "data"))
    )
    spark = df.sparkSession
    manifest = (
        spark.read.parquet(os.path.join(path, "data"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_manifest")
    )
    return manifest


def read_corpus_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read a shard release back; ``shards`` restricts to specific shard
    ids via partition pruning (the loader-parallelism path — each worker
    reads only its shards' directories)."""
    df = spark.read.parquet(os.path.join(path, "data"))
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df
