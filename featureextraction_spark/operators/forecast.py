"""Forecast baseline evaluation: seasonal-naive error metrics (MAE /
MASE) over per-key daily series.

Before any model earns its keep, the pipeline needs the benchmark it
must beat: the seasonal-naive forecast ("tomorrow looks like the same
day last week", Hyndman & Koehler, IJF 2006 — the MASE paper) and its
in-sample error. MASE = MAE(forecast) / MAE(one-step naive), the
scale-free skill score that works on counts, revenue, or any unit.

Everything is exact integers until two closing divisions:

    sae        = SUM |y(d) - y(d - season)|      (BIGINT)
    sae_naive  = SUM |y(d) - y(d - 1)|           (BIGINT)
    mae        = sae / n_eval                     (one division)
    mase       = (sae * n_naive) / (n_eval * sae_naive)

Gaps in the day grid follow the standard sparse-series convention: a
day only scores if its lag-``season`` (resp. lag-1) day is PRESENT —
lags resolve by value (an equi-join on ``day - k``), never by row
offset, so a missing Tuesday can't silently shift the season.

Scale: one map-combinable daily collapse, two hash equi-joins on
(key, day) — the daily table is |keys|·|days|, tiny next to the event
log — and one final per-key aggregate. No windows, no skew risk beyond
the initial collapse. No reference counterpart (public-knowledge
semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def forecast_eval(
    daily: DataFrame,
    by: str = "grp",
    day: str = "day",
    y: str = "y",
    season: int = 7,
) -> DataFrame:
    """Seasonal-naive evaluation over a per-key daily table
    ``(by, day:int, y:long)`` with one row per present (key, day).

    One output row per key: ``n_days``, ``n_eval``/``sae`` (days whose
    day-``season`` exists; sum of absolute errors), ``n_naive``/
    ``sae_naive`` (same for lag-1), and the closing ``mae``/``mase``
    doubles (NULL when the denominator is empty or zero).
    """
    base = daily.select(
        F.col(by).alias("__k"),
        F.col(day).cast("long").alias("__d"),
        F.col(y).cast("long").alias("__y"),
    )
    lagged = base.select(
        "__k",
        (F.col("__d") + F.lit(int(season))).alias("__d"),
        F.col("__y").alias("__f"),
    )
    prev = base.select(
        "__k",
        (F.col("__d") + F.lit(1)).alias("__d"),
        F.col("__y").alias("__p"),
    )
    scored = (
        base.join(lagged, ["__k", "__d"], "left")
        .join(prev, ["__k", "__d"], "left")
    )
    agg = scored.groupBy(F.col("__k").alias(by)).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.count("__f").cast("long").alias("n_eval"),
        F.coalesce(
            F.sum(F.abs(F.col("__y") - F.col("__f"))), F.lit(0)
        ).cast("long").alias("sae"),
        F.count("__p").cast("long").alias("n_naive"),
        F.coalesce(
            F.sum(F.abs(F.col("__y") - F.col("__p"))), F.lit(0)
        ).cast("long").alias("sae_naive"),
    )
    mae = F.when(
        F.col("n_eval") > 0,
        F.col("sae").cast("double") / F.col("n_eval").cast("double"),
    )
    mase = F.when(
        (F.col("n_eval") > 0) & (F.col("sae_naive") > 0),
        (F.col("sae").cast("double") * F.col("n_naive").cast("double"))
        / (F.col("n_eval").cast("double") * F.col("sae_naive").cast("double")),
    )
    return agg.select(
        by,
        "n_days",
        "n_eval",
        "sae",
        "n_naive",
        "sae_naive",
        mae.alias("mae"),
        mase.alias("mase"),
    )
