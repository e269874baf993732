"""Distributed 2-D skyline (Pareto frontier) over integer criteria.

A row survives iff no other row strictly dominates it: ``x' >= x`` and
``y' >= y`` with at least one strict — the classic skyline operator
(Börzsönyi et al., ICDE'01 "The Skyline Operator"), maximizing both
axes. The feature-selection read: the non-dominated (value, recency) /
(quality, length) frontier of a corpus, the rows no trade-off argument
can discard.

Physical design (the bucket-local/merge scheme distributed skyline
papers use): bucket rows by ``x`` range, so every dominance witness
with a strictly larger ``x`` lives either in a HIGHER bucket — reduced
to a suffix-max over the tiny per-bucket max-y table — or in the SAME
bucket, handled by a bucket-partitioned descending RANGE window (the
``1 PRECEDING`` bound on integers means "strictly greater x"). Equal-x
dominance is a (bucket, x)-partitioned max. Nothing global: the only
non-partitioned window runs over the ≤ ``n_buckets``-row bucket table,
and the suffix table is broadcast back. One wide-table exchange total.

No reference counterpart; public-knowledge skyline semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    keep: list[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Rows of ``df`` not strictly dominated on integer columns
    (``x``, ``y``), both maximized. ``keep`` columns ride along.

    The bucket-bound fit collects exactly two longs (min/max of x) —
    a bounded driver fetch, same class as the k-means/codebook fits.
    Duplicate (x, y) points are all kept (neither strictly dominates).
    """
    lo, hi = df.agg(F.min(x), F.max(x)).first()
    if lo is None:
        return df.select(*keep, x, y).limit(0)
    width = max(1, (int(hi) - int(lo)) // n_buckets + 1)
    d = df.select(
        *keep,
        F.col(x).cast("long").alias(x),
        F.col(y).cast("long").alias(y),
        F.floor((F.col(x).cast("long") - F.lit(int(lo))) / F.lit(width))
        .cast("long")
        .alias("__b"),
    )
    bmax = d.groupBy("__b").agg(F.max(y).alias("__by"))
    # suffix max over strictly higher buckets: every row there has x' > x
    w_suf = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    suf = bmax.select(
        "__b", F.max("__by").over(w_suf).alias("__sufy")
    )
    d = d.join(F.broadcast(suf), "__b")
    # strictly-greater x inside the bucket (integer RANGE, desc order)
    w_m1 = (
        Window.partitionBy("__b")
        .orderBy(F.col(x).desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_m2 = Window.partitionBy("__b", x)
    d = d.withColumn("__m1", F.max(y).over(w_m1)).withColumn(
        "__m2", F.max(y).over(w_m2)
    )
    kept = d.where(
        (F.col("__m2") == F.col(y))
        & (F.col("__m1").isNull() | (F.col("__m1") < F.col(y)))
        & (F.col("__sufy").isNull() | (F.col("__sufy") < F.col(y)))
    )
    return kept.select(*keep, x, y)
