"""CART decision-stump split scan — exact Gini split search per group.

The classic first step of tree induction (Breiman et al., CART 1984):
for a numeric feature and a binary label, scan every candidate
threshold t and score the split ``x <= t`` by the weighted Gini
impurity of the two children. The winning stump is the strongest
single-feature signal — the standard feature-importance screen and
weak learner in a training-data pipeline.

Reference parity: the reference stops at hand-written per-feature
aggregates (``src/training/statistics.py``); the split scan is the
supervised generalisation a model-training pipeline needs.

Bit-portability: with integer counts (pos_l, neg_l, n_l | pos_r,
neg_r, n_r), the weighted impurity

    cost(t) = pos_l*neg_l/n_l + pos_r*neg_r/n_r          (x2/n dropped:
    both are monotone transforms shared by every candidate in a group)

is carried as the exact BIGINT pair

    cost_num = pos_l*neg_l*n_r + pos_r*neg_r*n_l
    cost_den = n_l*n_r

and the float ``cost`` is ONE correctly-rounded IEEE division of those
two integers — bit-identical on any engine, no accumulation order in
sight. int64 budget: cost_num <= n^3/8, so per-group n up to ~4.2e6
rows; beyond that pre-aggregate the feature onto a coarser grid
(``quant``) — candidate count, not row count, is what the scan pays
for.

Scale: one (group)-keyed exchange serves the per-value collapse, the
cumulative scan and the group totals (windows share the partitioning);
the scan table is |distinct quantized values| rows per group, never the
raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gini_split_scan(
    df: DataFrame,
    feature: str,
    label,
    by: str,
    quant: float = 1.0,
) -> DataFrame:
    """One row per (group, candidate threshold): left/right counts and
    the exact-rational Gini cost of splitting at ``feature <= t``.

    ``label`` is a Column evaluating to 0/1; ``quant`` scales the
    feature onto the integer candidate grid (``floor(x*quant + 0.5)``)
    — coarser grids mean fewer candidates and a smaller int64 budget.
    The last (rightmost) value of each group is not a candidate (its
    right side would be empty).
    """
    fq = F.floor(F.col(feature).cast("double") * F.lit(float(quant)) + F.lit(0.5)).cast(
        "long"
    )
    per_val = (
        df.select(
            F.col(by).alias("grp"),
            fq.alias("threshold"),
            label.cast("long").alias("__y"),
        )
        .groupBy("grp", "threshold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__cnt"),
            F.sum("__y").cast("long").alias("__pos"),
        )
    )
    scan_w = (
        Window.partitionBy("grp")
        .orderBy("threshold")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("grp")
    s = per_val.select(
        "grp",
        "threshold",
        F.sum("__cnt").over(scan_w).alias("n_l"),
        F.sum("__pos").over(scan_w).alias("pos_l"),
        F.sum("__cnt").over(tot_w).alias("__n"),
        F.sum("__pos").over(tot_w).alias("__p"),
    )
    n_l, pos_l = F.col("n_l"), F.col("pos_l")
    n_r = (F.col("__n") - n_l).alias("n_r")
    pos_r = (F.col("__p") - pos_l).alias("pos_r")
    neg_l = (n_l - pos_l).alias("neg_l")
    neg_r = ((F.col("__n") - n_l) - (F.col("__p") - pos_l)).alias("neg_r")
    num = (
        pos_l * (n_l - pos_l) * (F.col("__n") - n_l)
        + (F.col("__p") - pos_l)
        * ((F.col("__n") - n_l) - (F.col("__p") - pos_l))
        * n_l
    )
    den = n_l * (F.col("__n") - n_l)
    return s.where(F.col("__n") > n_l).select(
        "grp",
        "threshold",
        n_l.alias("n_l"),
        pos_l.alias("pos_l"),
        neg_l,
        n_r,
        pos_r,
        neg_r,
        num.cast("long").alias("cost_num"),
        den.cast("long").alias("cost_den"),
        (num.cast("double") / den.cast("double")).alias("cost"),
    )


def best_gini_split(scan: DataFrame) -> DataFrame:
    """The winning stump per group: the scan row minimizing ``cost``
    (ties broken by the smaller threshold — two candidates colliding to
    the same double resolve deterministically).

    Spark plans the rank-1 filter with a map-side WindowGroupLimit, so
    at most one row per (group, partition) reaches the shuffle.
    """
    w = Window.partitionBy("grp").orderBy("cost", "threshold")
    return (
        scan.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
