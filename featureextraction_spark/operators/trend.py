"""Robust per-key trend statistics: Mann–Kendall S and the Theil–Sen
slope estimator.

The outlier-proof answer to "is this series drifting, and how fast" —
OLS (``operators/contour.py``) is exact but one wild point owns it;
Mann–Kendall counts concordant minus discordant pairs (pure sign
arithmetic, distribution-free), Theil–Sen takes the MEDIAN of all
pairwise slopes (breakdown point 29%). Both run off ONE pairwise
self-join per key:

    mk_s     = Σ_{i<j} sign(q_j − q_i)                (exact BIGINT)
    slope_q  = ((q_j − q_i)·scale) div (t_j − t_i)    (t_j > t_i only)
    med2     = slope_q at ⌈m/2⌉ + slope_q at ⌈(m+1)/2⌉
    theil_sen = med2 / (2·scale·quant)                (ONE closing div)

``div`` truncates toward zero in BOTH Spark and DuckDB (verified), so
the quantized slope is bit-identical cross-engine even when negative —
no float slope ever enters the hash gate. ``med2`` sums the two middle
order statistics (equal for odd m), keeping the median integer-exact.

Scale: the pair fan-out is Σ_key n_k² — bounded per key, the same
budget as the reference-style per-entity kernels; everything rides one
HashPartitioning(key) exchange (ordered window → self-join on the key
→ slope-rank window → final agg all reuse it). int64 budget:
|slope_q| ≤ |Δq|·scale, so quantized values within ±9.2e18/scale are
safe; timestamps in SECONDS keep single-step slopes representable.

Public-knowledge semantics (Mann 1945, Kendall 1975, Sen 1968, Theil
1950); no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def trend_stats(
    df: DataFrame,
    value: str,
    key: str,
    t_s: Column,
    order_id: str,
    quant: float = 1000.0,
    slope_scale: int = 1_000_000,
) -> DataFrame:
    """Per-key Mann–Kendall S and Theil–Sen slope. ``t_s`` is a Column
    of epoch seconds; ``order_id`` breaks same-second ordering ties.
    Keys with a single row emit nothing (no pairs, no trend); keys
    whose rows all share one timestamp emit ``mk_s`` with NULL slope.
    """
    w = Window.partitionBy(key).orderBy("__t", F.col("__oid"))
    base = df.select(
        F.col(key),
        t_s.cast("long").alias("__t"),
        F.floor(F.col(value).cast("double") * F.lit(quant) + F.lit(0.5))
        .cast("long")
        .alias("__q"),
        F.col(order_id).alias("__oid"),
    ).select(
        key, "__t", "__q", F.row_number().over(w).alias("__rn")
    )
    a = base.select(
        key, F.col("__t").alias("__ta"), F.col("__q").alias("__qa"),
        F.col("__rn").alias("__ra"),
    )
    b = base.select(
        key, F.col("__t").alias("__tb"), F.col("__q").alias("__qb"),
        F.col("__rn").alias("__rb"),
    )
    pairs = a.join(b, key).where(F.col("__ra") < F.col("__rb"))
    dq = F.col("__qb") - F.col("__qa")
    dt = F.col("__tb") - F.col("__ta")
    pairs = pairs.select(
        key,
        F.signum(dq.cast("double")).cast("long").alias("__sgn"),
        F.when(dt > 0, F.expr(f"((__qb - __qa) * {int(slope_scale)}) div (__tb - __ta)"))
        .alias("__slope_q"),
    )
    mk = pairs.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("__sgn").cast("long").alias("mk_s"),
        F.count("__slope_q").cast("long").alias("n_slopes"),
    )
    slopes = pairs.where(F.col("__slope_q").isNotNull()).select(
        key, "__slope_q"
    )
    ws = Window.partitionBy(key).orderBy("__slope_q")
    wc = Window.partitionBy(key)
    ranked = slopes.select(
        key,
        "__slope_q",
        F.row_number().over(ws).alias("__sr"),
        F.count(F.lit(1)).over(wc).alias("__m"),
    )
    r1 = F.expr("(__m + 1) div 2")
    r2 = F.expr("(__m + 2) div 2")
    med = ranked.groupBy(key).agg(
        (
            F.sum(F.when(F.col("__sr") == r1, F.col("__slope_q")).otherwise(0))
            + F.sum(
                F.when(F.col("__sr") == r2, F.col("__slope_q")).otherwise(0)
            )
        )
        .cast("long")
        .alias("med2")
    )
    n_rows = df.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("n"))
    out = (
        mk.join(n_rows, key)
        .join(med, key, "left")
    )
    denom = float(2 * slope_scale) * quant
    return out.select(
        key,
        "n",
        "n_pairs",
        "n_slopes",
        "mk_s",
        "med2",
        (F.col("med2").cast("double") / F.lit(denom)).alias("theil_sen"),
    )
