"""Linear-interpolation resampling of irregular event series onto a
regular epoch-aligned grid.

The time-series regularization read: models want evenly-spaced inputs,
logs arrive whenever. For every grid instant ``t`` between a key's
first and last observation, the value is the linear interpolation
between the nearest observations at ``t_prev ≤ t`` and ``t_next ≥ t``:

    interp = (q_prev·(t_next − t) + q_next·(t − t_prev)) / (t_next − t_prev)

With values quantized to integers, numerator and denominator are exact
BIGINTs (``interp_num`` / ``interp_den`` are the hash vehicles; the
float is ONE closing division). A grid instant landing exactly on an
observation has ``t_prev = t_next``; the vehicles collapse to
``(q_prev, 1)`` — the observation itself, no 0/0.

Physical design: observations collapse to one row per (key, t_ms)
(latest event id wins — deterministic under duplicates), the per-key
grid is a ``sequence()`` explode between the key's min/max, and both
neighbors come from RANGE-framed window functions over the UNION of
observations and grid rows — ``last/first(... ignorenulls)`` with
``RANGE UNBOUNDED PRECEDING→CURRENT ROW`` (and mirrored) so same-ms
ties are frame peers and the result is partition-order independent.
ONE key exchange serves the collapse, both windows and the final
filter; per-key work is linear in observations + grid points.

No reference counterpart; standard public time-series semantics
(pandas ``interpolate(method='time')`` discretized to a grid).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interp_resample(
    df: DataFrame,
    value: str,
    key: str,
    t_ms: Column,
    order_id: str,
    grid_ms: int,
    quant: float = 1000.0,
) -> DataFrame:
    """Resample ``value`` (quantized by ``quant``) per ``key`` onto the
    epoch-aligned ``grid_ms`` grid. ``t_ms`` is a Column of epoch
    milliseconds; ``order_id`` breaks same-millisecond ties (max wins).

    int64 headroom: |interp_num| ≤ q_max · max_gap_ms — values ≤ 1e6
    units with gaps ≤ ~100 days are safe.
    """
    q = F.floor(F.col(value).cast("double") * F.lit(quant) + F.lit(0.5)).cast(
        "long"
    )
    obs = (
        df.select(
            F.col(key), t_ms.cast("long").alias("t_ms"), q.alias("__q"),
            F.col(order_id).alias("__oid"),
        )
        .groupBy(key, "t_ms")
        .agg(F.max_by("__q", "__oid").alias("__q"))
    )
    h = F.lit(int(grid_ms))
    bounds = obs.groupBy(key).agg(
        F.min("t_ms").alias("__lo"), F.max("t_ms").alias("__hi")
    )
    start = (F.expr(f"(__lo + {int(grid_ms) - 1}) div {int(grid_ms)}") * h).cast(
        "long"
    )
    stop = (F.expr(f"__hi div {int(grid_ms)}") * h).cast("long")
    grid = (
        bounds.select(key, start.alias("__s"), stop.alias("__e"))
        .where(F.col("__s") <= F.col("__e"))
        .select(
            key,
            F.explode(F.sequence(F.col("__s"), F.col("__e"), h)).alias(
                "t_ms"
            ),
        )
    )
    u = obs.select(key, "t_ms", "__q", F.lit(0).alias("__is_grid")).unionByName(
        grid.select(
            key, "t_ms", F.lit(None).cast("long").alias("__q"),
            F.lit(1).alias("__is_grid"),
        )
    )
    w_prev = (
        Window.partitionBy(key)
        .orderBy("t_ms")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(key)
        .orderBy("t_ms")
        .rangeBetween(0, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("__q").isNotNull(), F.col("t_ms"))
    d = u.select(
        key,
        "t_ms",
        "__is_grid",
        F.last("__q", ignorenulls=True).over(w_prev).alias("prev_q"),
        F.last(obs_t, ignorenulls=True).over(w_prev).alias("prev_t"),
        F.first("__q", ignorenulls=True).over(w_next).alias("next_q"),
        F.first(obs_t, ignorenulls=True).over(w_next).alias("next_t"),
    ).where(
        (F.col("__is_grid") == 1)
        & F.col("prev_q").isNotNull()
        & F.col("next_q").isNotNull()
    )
    gap = F.col("next_t") - F.col("prev_t")
    num = F.when(
        gap > 0,
        F.col("prev_q") * (F.col("next_t") - F.col("t_ms"))
        + F.col("next_q") * (F.col("t_ms") - F.col("prev_t")),
    ).otherwise(F.col("prev_q"))
    den = F.when(gap > 0, gap).otherwise(F.lit(1))
    return d.select(
        key,
        "t_ms",
        "prev_q",
        F.col("prev_t").cast("long").alias("prev_t"),
        "next_q",
        F.col("next_t").cast("long").alias("next_t"),
        num.cast("long").alias("interp_num"),
        den.cast("long").alias("interp_den"),
        (num.cast("double") / den.cast("double")).alias("interp"),
    )
