"""Rank-based feature transforms: per-group normalized rank, winsorize.

Two classic tabular-feature transforms a training pipeline applies before
a model sees raw numerics:

- :func:`group_normalized_rank` — the quantile/rank transform ("rank
  gauss" first stage): each row's 0-based rank within its group under a
  TOTAL order (value, tie), normalized to [0, 1] by (n−1). Deterministic
  under ties by construction (the tie column is a unique id), unlike SQL
  ``percent_rank`` whose tied rows collapse.
- :func:`winsorize` — clip a numeric at exact per-group percentiles
  (default p05/p95), the standard outlier guard. Reuses the
  :func:`~featureextraction_spark.operators.curation.group_quantiles`
  interpolation expression SHAPE bit-for-bit so a DuckDB oracle replaying
  the same doubles computes identical bounds.

Scale design (the whole point — a per-group Window sort would serialize
each group into one task, and groups here are languages: few and huge):

``group_normalized_rank`` is the per-group generalization of
``blockpair.with_global_rank``'s two-phase rank. Phase 1:
``repartitionByRange(by, value, tie)`` gives contiguous (group, value)
ranges per partition. Phase 2: per-(partition, group) counts — a tiny
``n_parts × |groups touched|``-row aggregate — turn into per-(partition,
group) OFFSETS with a window over the counts table itself (partitioned by
group, ordered by partition id: thousands of rows, not data-sized).
Phase 3: local rank within (partition, group) + broadcast-joined offset.
No stage sorts a whole group in one task; the biggest single sort is one
range partition. The local-rank window's hash exchange keys on
(partition-id, group), whose cells are bounded by the range-partition
size — skew-free even when one group is 99% of the data.

``winsorize`` is two broadcast joins around one rank shuffle (the
quantile probe machinery of ``group_quantiles``) — the clip itself is a
pure projection.

No reference counterpart; these are the tabular-preprocessing siblings of
the leakage-free ``standard_scale`` (``operators/encoding.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cache import persist_tracked
from .curation import group_quantiles


def group_normalized_rank(
    df: DataFrame,
    value: str,
    by: str,
    tie: str,
    out_prefix: str = "",
) -> DataFrame:
    """Append ``rank`` (0-based, long), ``n`` (group size, long) and
    ``norm_rank`` = rank/(n−1) (double; 0.0 for singleton groups — the
    caller nudge-rounds) to every row.

    (value, tie) must be a total order within each group (tie unique).
    """
    v = F.col(value).cast("double")
    # persisted so the offsets aggregate and the final ranked pass observe
    # the SAME physical range boundaries (RangePartitioner samples; a
    # recompute may draw different bounds) — the with_global_rank contract.
    # Cache lifecycle is caller-owned via operators.cache.
    dfp = (
        df.withColumn("__v", v)
        .repartitionByRange(F.col(by), F.col("__v"), F.col(tie))
        .withColumn("__pid", F.spark_partition_id())
        .transform(persist_tracked)
    )

    counts = dfp.groupBy("__pid", by).agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = (
        Window.partitionBy(by)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        F.col("__pid").alias("__o_pid"),
        F.col(by).alias("__o_by"),
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(Window.partitionBy(by)).alias("__n"),
    )

    w_local = Window.partitionBy("__pid", by).orderBy("__v", tie)
    ranked = (
        dfp.join(
            F.broadcast(offsets),
            (F.col("__pid") == F.col("__o_pid")) & (F.col(by) == F.col("__o_by")),
        )
        .withColumn(
            f"{out_prefix}rank",
            (F.row_number().over(w_local) - 1 + F.col("__off")).cast("long"),
        )
        .withColumn(f"{out_prefix}n", F.col("__n").cast("long"))
        .withColumn(
            f"{out_prefix}norm_rank",
            F.when(F.col("__n") > 1,
                   F.col(f"{out_prefix}rank").cast("double")
                   / (F.col("__n") - F.lit(1)).cast("double"))
            .otherwise(F.lit(0.0)),
        )
    )
    return ranked.drop("__v", "__pid", "__o_pid", "__o_by", "__off", "__n")


def winsorize(
    df: DataFrame,
    value: str,
    by: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Clip ``value`` at exact per-group quantiles [lo_q, hi_q].

    Appends ``w_lo`` / ``w_hi`` (the unrounded-interpolation bounds,
    double), ``winsorized`` (the clipped value, double) and
    ``clipped_lo`` / ``clipped_hi`` (0/1 longs, STRICT comparisons so a
    value exactly on the bound is untouched on every engine).

    Bounds come from ``group_quantiles`` (rank shuffle + two broadcast
    probe joins) but UNROUNDED — the clip must compare against the same
    double bits the oracle interpolates, not a 6-digit rounding of them.
    """
    # Bounds are group_quantiles' ROUNDED values on both engines: the
    # oracle replays the same round(interp, 6), so the clip comparisons
    # see identical double bits (the group_quantiles green contract).
    q = group_quantiles(df, value=value, by=by, quantiles=(lo_q, hi_q))
    bounds = q.groupBy(by).agg(
        F.first(
            F.when(F.col("q") == F.lit(float(lo_q)), F.col("quantile_value")),
            ignorenulls=True,
        ).alias("w_lo"),
        F.first(
            F.when(F.col("q") == F.lit(float(hi_q)), F.col("quantile_value")),
            ignorenulls=True,
        ).alias("w_hi"),
    ).withColumnRenamed(by, "__b_by")
    v = F.col(value).cast("double")
    return (
        df.join(F.broadcast(bounds), df[by] == F.col("__b_by"))
        .withColumn("winsorized", F.greatest(F.col("w_lo"), F.least(F.col("w_hi"), v)))
        .withColumn("clipped_lo", (v < F.col("w_lo")).cast("long"))
        .withColumn("clipped_hi", (v > F.col("w_hi")).cast("long"))
        .drop("__b_by")
    )


def top_per_group(
    df: DataFrame,
    by: tuple[str, ...],
    value: str,
    tie: str,
    k: int = 3,
    strategy: str = "auto",
    n_salts: int = 8,
    two_phase_min_rows: int = 1_000_000,
) -> DataFrame:
    """Top-``k`` rows per group by (``value`` DESC, ``tie`` ASC), with a
    ``rnk`` column (1-based long) — the per-domain "best documents" cut.

    Physical strategies (identical rows by construction AND by test):

    - ``window``: one hash exchange on the group key + row_number. Fine
      when no single group dominates an executor's memory.
    - ``two_phase``: the skew-proof plan for 100 TB — phase 1 takes the
      top-k within (group, salt = pmod(hash60(tie), n_salts)) so every
      window partition is ~1/n_salts of the group, phase 2 re-ranks the
      ≤ k·n_salts survivors per group. A mega-group (one domain holding
      half the corpus) never lands on one task. Correct because the
      global top-k within a group is a subset of the union of per-salt
      top-k's (each salt bucket can contribute at most k of them).
    - ``auto``: ``two_phase`` when the input exceeds
      ``two_phase_min_rows`` (a count — one cheap scan), else ``window``.
    """
    from .sampling import _seed_hash

    if strategy == "auto":
        strategy = (
            "two_phase" if df.count() >= two_phase_min_rows else "window"
        )
    order = [F.col(value).desc(), F.col(tie).asc()]
    if strategy == "two_phase":
        salt = F.pmod(_seed_hash(tie, 0), F.lit(n_salts))
        w1 = Window.partitionBy(*by, "__salt").orderBy(*order)
        df = (
            df.withColumn("__salt", salt)
            .withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= k)
            .drop("__salt", "__r1")
        )
    elif strategy != "window":
        raise ValueError(f"unknown top_per_group strategy: {strategy!r}")
    w = Window.partitionBy(*by).orderBy(*order)
    return df.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).where(F.col("rnk") <= k)
