"""Leakage-free (point-in-time) cumulative target encoding.

Classic feature-engineering encoder: each row's category (role, tool,
event type) is replaced by the mean of a numeric target over all
STRICTLY EARLIER rows of the same category — the value a model could
have known at that row's timestamp. Zero temporal leakage by
construction (the frame is ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1
PRECEDING`` under a total (ts, tie) order); the first occurrence of a
category encodes to NULL (no prior evidence), which callers blend with
a global prior if desired.

Why not one global window per category: category cardinality is small
(roles/tools), so ``Window.partitionBy(category)`` puts the WHOLE
100-TB history of a category through one task — the single-reducer
anti-pattern. The scalable formulation here is the same two-phase shape
as ``packing.with_global_cumsum``, specialised per category and with
time buckets instead of range partitions:

1. bucket each row: ``b = epoch_us div bucket_us``;
2. per ``(category, bucket)``: exact integer count/sum partials — one
   map-side-combinable aggregation, output ~|categories|x|buckets| rows;
3. EXCLUSIVE prefix over buckets within category — a window over the
   tiny partial table only;
4. broadcast the offsets back onto the facts;
5. within ``(category, bucket)`` — bounded partitions — an exclusive
   ROWS window ordered by ``(ts, tie)`` adds the in-bucket prior;
6. prior = bucket offset + in-bucket prior.

The facts are shuffled ONCE (hash on (category, bucket)); every other
exchange moves the bounded partial table. Mega-categories degrade only
the per-(category, bucket) sort, and ``bucket_sec`` is the knob that
bounds it.

Exactness: the target is quantized to integer micro-units
(``rolling.quantize_q6``) so both engines sum the same integers; the
encoded mean is ONE integer/integer division, nudge-rounded by the
caller (the shared hash vehicle).

No reference counterpart; standard supervised-feature practice (e.g.
the CatBoost "ordered target statistics" formulation, Prokhorenkova et
al., NeurIPS'18 — public knowledge) re-expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.time import epoch_us
from .rolling import quantize_q6

US = 1_000_000


def _with_prior_cols(out: DataFrame) -> DataFrame:
    return out.withColumn(
        "te_mean",
        F.when(
            F.col("prior_n") > 0,
            F.col("prior_sum_q") / (F.lit(float(US)) * F.col("prior_n")),
        ),
    )


def cumulative_target_encode(
    df: DataFrame,
    category: str = "role",
    ts: str = "ts",
    tie: tuple = ("turn_idx",),
    value: str = "value",
    bucket_sec: int = 86_400,
) -> DataFrame:
    """Append ``prior_n`` / ``prior_sum_q`` / ``te_mean`` per row: count,
    exact quantized sum, and mean of ``value`` over all strictly-earlier
    rows of the same ``category`` under the total order ``(ts, *tie)``.

    Assumes non-negative epochs (bucket id via integer ``div``) and a
    total order — ``(ts, *tie)`` must be unique within a category.
    """
    bucket_us = bucket_sec * US
    t = (
        df.withColumn("__us", epoch_us(df, ts))
        .withColumn("__vq", quantize_q6(F.col(value)))
        .withColumn("__b", F.expr(f"__us div {bucket_us}L"))
    )

    partials = t.groupBy(category, "__b").agg(
        F.count(F.lit(1)).alias("__cnt_b"),
        F.sum("__vq").alias("__sum_b"),
    )
    wprev = (
        Window.partitionBy(category)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        category,
        "__b",
        F.coalesce(F.sum("__cnt_b").over(wprev), F.lit(0)).alias("__off_n"),
        F.coalesce(F.sum("__sum_b").over(wprev), F.lit(0)).alias("__off_sum"),
    )

    wloc = (
        Window.partitionBy(category, "__b")
        .orderBy("__us", *tie)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        t.join(F.broadcast(offsets), [category, "__b"], "left")
        .withColumn(
            "prior_n",
            (F.col("__off_n") + F.count(F.lit(1)).over(wloc)).cast("long"),
        )
        .withColumn(
            "prior_sum_q",
            (
                F.col("__off_sum")
                + F.coalesce(F.sum("__vq").over(wloc), F.lit(0))
            ).cast("long"),
        )
    )
    return _with_prior_cols(out).drop(
        "__us", "__vq", "__b", "__off_n", "__off_sum"
    )


def cumulative_target_encode_simple(
    df: DataFrame,
    category: str = "role",
    ts: str = "ts",
    tie: tuple = ("turn_idx",),
    value: str = "value",
) -> DataFrame:
    """Single-window twin of :func:`cumulative_target_encode` — the
    direct ``Window.partitionBy(category)`` formulation. Semantically
    identical (tests assert row equality); kept as the readable spec and
    the small-category fast path."""
    t = df.withColumn("__us", epoch_us(df, ts)).withColumn(
        "__vq", quantize_q6(F.col(value))
    )
    w = (
        Window.partitionBy(category)
        .orderBy("__us", *tie)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = t.withColumn(
        "prior_n", F.count(F.lit(1)).over(w).cast("long")
    ).withColumn(
        "prior_sum_q", F.coalesce(F.sum("__vq").over(w), F.lit(0)).cast("long")
    )
    return _with_prior_cols(out).drop("__us", "__vq")
