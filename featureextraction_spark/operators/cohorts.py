"""Cohort retention matrix and seasonal (hour-of-day) baseline residuals.

Two corpus-health reports a transcript/event warehouse serves daily:

- :func:`cohort_retention` — the classic triangle: users cohorted by the
  integer week of their FIRST event; each (cohort_week, week_offset)
  cell counts distinct users active that many weeks later. Weeks are
  pure integer division of epoch µs (no calendar/timezone functions —
  engine-portable and exactly the partition-pruning key a 10^12-row
  Iceberg table would use).
- :func:`seasonal_baseline` — per (event_type, hour-of-day) mean/std
  from exact integer milli-moments, broadcast back onto every event as a
  residual z-score. Same integer-moment + IEEE-sqrt arithmetic as the
  leakage-free ``standard_scale`` (its green contract); hour is integer
  µs arithmetic, not a calendar function.

Scale design: cohort assignment is one groupBy(user) min + one shuffle
join back on the user key; the matrix aggregate first reduces to
DISTINCT (cohort, offset, user) triples (map-side combinable) and then
counts — never ``count_distinct`` over an unreduced stream. The seasonal
profile is a ≤ |types|·24-row aggregate broadcast to a pure projection.

No reference counterpart; standard warehouse analytics (public
knowledge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.time import epoch_us

WEEK_US = 7 * 86_400 * 1_000_000
HOUR_US = 3_600 * 1_000_000
DAY_US = 24 * HOUR_US


def cohort_retention(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset) → distinct active users + cohort size.

    ``retained_frac`` is ONE integer÷integer division (caller
    nudge-rounds). ``week_offset`` 0 row is the cohort itself.
    """
    t = df.select(F.col(by), epoch_us(df, ts).alias("__us")).withColumn(
        # integer division — epoch µs exceed double's exact range, a float
        # floor(us / week) could edge-flip at exact multiples
        "week",
        F.expr(f"CAST(__us div {WEEK_US} AS BIGINT)"),
    )
    first = t.groupBy(by).agg(F.min("week").alias("cohort_week"))
    j = t.join(first, by)
    triples = j.select(
        "cohort_week",
        (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        F.col(by),
    ).distinct()
    cells = triples.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("long").alias("active_users")
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    out = cells.join(F.broadcast(sizes), "cohort_week")
    return out.select(
        "cohort_week",
        "week_offset",
        "active_users",
        "cohort_users",
        (
            F.col("active_users").cast("double")
            / F.col("cohort_users").cast("double")
        ).alias("retained_frac"),
    )


def seasonal_baseline(
    df: DataFrame,
    value: str = "value",
    group: str = "event_type",
    ts: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event residual z against its (group, hour-of-day) baseline.

    Fit: exact integer milli-moments per (group, hour) — n, Σq, Σq² with
    q = floor(value·1e3 + 0.5) (the ``standard_scale`` int64 budget).
    Transform: z = (q − μq) / σq with sample variance, both spelled in
    the same double expression order on every engine; groups with n ≤ 1
    or zero variance yield NULL z.
    """
    us = epoch_us(df, ts)
    q = F.floor(F.col(value) * F.lit(1e3) + F.lit(0.5)).cast("long")
    t = df.select(
        F.col(id_col),
        F.col(group),
        F.pmod(us, F.lit(DAY_US)).alias("__day_us"),
        q.alias("__q"),
    ).withColumn("hour", F.expr(f"CAST(__day_us div {HOUR_US} AS BIGINT)"))
    prof = t.groupBy(group, "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__q").cast("long").alias("sum_q"),
        F.sum(F.col("__q") * F.col("__q")).cast("long").alias("sum_sq_q"),
    )
    j = t.join(F.broadcast(prof), [group, "hour"])
    nd = F.col("n").cast("double")
    mu = F.col("sum_q").cast("double") / nd
    var = (
        F.col("sum_sq_q").cast("double")
        - F.col("sum_q").cast("double") * F.col("sum_q").cast("double") / nd
    ) / (nd - F.lit(1.0))
    z = F.when(
        (F.col("n") > 1) & (var > 0),
        (F.col("__q").cast("double") - mu) / F.sqrt(var),
    )
    return j.select(
        id_col,
        group,
        "hour",
        F.col("__q").alias("vq"),
        "n",
        z.alias("seasonal_z"),
    )


def survival_table(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    censor_horizon_days: int = 7,
) -> DataFrame:
    """Kaplan-Meier risk table over per-entity lifetimes with right
    censoring: one row per distinct lifetime t (days between an entity's
    first and last event) carrying n_risk (entities surviving ≥ t),
    d (death/churn events at t), c (censored at t) and the discrete
    hazard d/n_risk. An entity still active within ``censor_horizon_days``
    of the dataset's end is censored, not churned — the standard
    KM treatment of the observation boundary.

    Scale shape: one key collapse of the log (map-combinable min/max),
    one broadcast of the single-row dataset-end scalar, one groupBy onto
    the tiny distinct-lifetime table, and the at-risk counts via
    :func:`..packing.with_global_cumsum`'s two-phase exclusive cumsum —
    no single-partition window anywhere. d and n_risk stay integers (the
    hash vehicle); the hazard is the one closing division. The KM
    survival curve itself is the running product of (1 - hazard) — left
    to the caller because float products are order-sensitive; every
    input to it here is exact.
    """
    us = epoch_us(df, ts)
    # exact integer day: (x - x % d) is a multiple of d, the double
    # divide of an exact multiple < 2^53 is exact — no floor flips
    day = ((us - F.pmod(us, F.lit(DAY_US))) / F.lit(DAY_US)).cast("long")
    t = df.select(F.col(key).alias("__k"), day.alias("__day"))
    per = t.groupBy("__k").agg(
        F.min("__day").alias("first_day"),
        F.max("__day").alias("last_day"),
    )
    end = per.agg(F.max("last_day").alias("__end_day"))
    per = per.join(F.broadcast(end)).select(
        (F.col("last_day") - F.col("first_day")).alias("t"),
        F.when(
            F.col("__end_day") - F.col("last_day")
            > F.lit(censor_horizon_days),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("__churned"),
    )
    by_t = per.groupBy("t").agg(
        F.sum("__churned").cast("long").alias("d"),
        (F.count(F.lit(1)) - F.sum("__churned")).cast("long").alias("c"),
        F.count(F.lit(1)).cast("long").alias("__leave"),
    )
    from .packing import with_global_cumsum

    cum = with_global_cumsum(by_t, ["t"], "__leave", out_col="__left_before")
    # total entities = Σ leave(t) over the tiny lifetime table — a 1-row
    # broadcast, not a second driver action over the log
    total = cum.groupBy().agg(F.sum("__leave").cast("long").alias("__total"))
    return cum.join(F.broadcast(total)).select(
        "t",
        (F.col("__total") - F.col("__left_before")).cast("long").alias("n_risk"),
        "d",
        "c",
        (F.col("d").cast("double")
         / (F.col("__total") - F.col("__left_before")).cast("double")
         ).alias("hazard"),
    )
