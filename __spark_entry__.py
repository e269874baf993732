"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Conventions used throughout so Spark and DuckDB hash identically:
- timestamps are emitted as epoch microseconds (``unix_micros`` /
  ``epoch_us``) — immune to session-timezone rendering differences;
- floating-point outputs are rounded (2–6 dp) on BOTH sides;
- every computed column is aliased to the same name on both sides;
- sums of integers are cast to BIGINT (DuckDB would return HUGEINT).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from featureextraction_spark.operators.asof import asof_join  # noqa: E402
from featureextraction_spark.operators.backfill import forward_fill  # noqa: E402
from featureextraction_spark.operators.joins import membership_join  # noqa: E402
from featureextraction_spark.operators.ordering import with_lag_lead  # noqa: E402
from featureextraction_spark.operators.runlength import run_length_encode  # noqa: E402
from featureextraction_spark.operators.sessionize import sessionize  # noqa: E402
from featureextraction_spark.operators.transitions import transition_count  # noqa: E402
from featureextraction_spark.functions.time import epoch_us, epoch_seconds  # noqa: E402
from featureextraction_spark.operators.contour import (  # noqa: E402
    ols_aggregate,
    with_characteristic_contour,
)
from featureextraction_spark.plans.feature_pipeline import point_in_time_features  # noqa: E402

SESSION_GAP_SECONDS = 1800


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------------
# queries — each maps a SURVEY.md §2 operator onto the driver's test tables
# (events ~ transcripts: user_id≈conv_id, event_id≈turn_idx tie-break)
# --------------------------------------------------------------------------


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11 lag/lead over the event stream (order: ts, event_id)."""
    ev = _load(spark, sf_dir, "events")
    out = with_lag_lead(ev, ["event_type"], by="user_id", order=("ts", "event_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return out.select(
        "user_id",
        "event_id",
        "prev_event_type",
        "next_event_type",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("value_delta"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 gap-based sessionization + per-session aggregates."""
    ev = _load(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", tie="event_id", gap_seconds=SESSION_GAP_SECONDS)
    us, sec = epoch_us(s, "ts"), epoch_seconds(s, "ts")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        F.round(F.max(sec) - F.min(sec), 6).alias("duration_sec"),
    )


def q_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W12 rolling backfill: last purchase value carried forward per user."""
    ev = _load(spark, sf_dir, "events").withColumn(
        "purchase_value", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    out = forward_fill(
        ev, ["purchase_value"], key="user_id", order=("ts", "event_id")
    )
    return out.select(
        "user_id", "event_id", F.round("last_purchase_value", 4).alias("last_purchase_value")
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 as-of backward join: each purchase ← latest click at ts' <= ts."""
    ev = _load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("value", "event_id").alias("click_value"),
            F.max("event_id").alias("click_event_id"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    res = asof_join(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        tie="click_event_id",
        value_cols=["click_value"],
        matched_cols=True,
    )
    return res.select(
        "user_id",
        "event_id",
        epoch_us(res, "ts").alias("ts_us"),
        epoch_us(res, "matched_ts").alias("matched_ts_us"),
        F.round("click_value", 4).alias("click_value"),
    )


def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 transition counts: event_type switches per user along (ts, event_id)."""
    ev = _load(spark, sf_dir, "events")
    return transition_count(ev, "event_type", key="user_id", order=("ts", "event_id"))


def q_run_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 run-length encoding: islands of equal event_type per user."""
    ev = _load(spark, sf_dir, "events")
    runs = run_length_encode(ev, "event_type", key="user_id", order=("ts", "event_id"))
    return runs.select(
        "user_id",
        F.col("run_id").cast("long").alias("run_id"),
        F.col("run_value").alias("run_value"),
        "run_length",
        epoch_us(runs, "run_start").alias("run_start_us"),
        epoch_us(runs, "run_end").alias("run_end_us"),
    )


def q_membership_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/P6 membership join with 'unknown' default (categoriser semantics)."""
    cust = _load(spark, sf_dir, "customer")
    dim = (
        cust.filter(F.col("c_custkey") % 5 != 0)
        .select(
            "c_custkey",
            F.element_at(
                F.array(F.lit("train"), F.lit("test"), F.lit("validation_1"), F.lit("validation_2")),
                (F.col("c_custkey") % 4 + 1).cast("int"),
            ).alias("type"),
        )
    )
    joined = membership_join(cust, dim, key="c_custkey", label="type")
    return joined.groupBy("type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18 partial/final aggregation showcase (TPC-H Q1 shape) over lineitem."""
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


def q_contour_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3+A10 relational: clamped-cumsum contour + OLS slant via regr_*
    aggregates — pure expressions, zero Python, whole-stage codegen."""
    ev = _load(spark, sf_dir, "events")
    c = with_characteristic_contour(ev, "value", key="user_id", order=("ts", "event_id"))
    return ols_aggregate(c, "contour", "contour_x", key="user_id", ndigits=6)


def q_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full point-in-time feature pipeline (rows-only check: the numeric
    families are not SQL-expressible; their correctness gate is the pandas
    oracle in tests/test_feature_pipeline.py). Events are mapped onto the
    transcript shape; probes = purchase timestamps."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.coalesce(F.col("props"), F.lit("")).alias("text"),
        F.when(F.col("event_type") == "error", F.col("event_type")).alias("tool"),
        "ts",
    )
    probes = tr.filter(F.col("role") == "purchase").select("conv_id", "ts")
    return point_in_time_features(tr, probes)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: point-in-time feature lookup — for every purchase probe,
    the session id, running state and latest click value as of that ts,
    leakage-free. Runs on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    ev = _load(spark, sf_dir, "events")
    enriched = sessionize(ev, key="user_id", ts="ts", tie="event_id")
    enriched = forward_fill(
        enriched.withColumn(
            "purchase_value", F.when(F.col("event_type") == "purchase", F.col("value"))
        ),
        ["purchase_value"],
        key="user_id",
        order=("ts", "event_id"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    data = enriched.select(
        "user_id",
        F.col("event_id").alias("data_event_id"),
        "ts",
        "event_type",
        "session_id",
        "last_purchase_value",
    )
    return asof_join(
        probes,
        data,
        on="ts",
        by="user_id",
        tie="data_event_id",
        value_cols=["event_type", "session_id", "last_purchase_value"],
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "lag_lead": q_lag_lead,
        "sessionize": q_sessionize,
        "backfill": q_backfill,
        "asof_join": q_asof_join,
        "transitions": q_transitions,
        "run_length": q_run_length,
        "membership_join": q_membership_join,
        "pricing_summary": q_pricing_summary,
        "contour_ols": q_contour_ols,
        "feature_vectors": q_feature_vectors,
    }


def oracle_sql() -> dict[str, str]:
    win = "PARTITION BY user_id ORDER BY ts, event_id"
    cum = f"{win} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    return {
        "lag_lead": f"""
            SELECT user_id, event_id,
                   lag(event_type) OVER ({win}) AS prev_event_type,
                   lead(event_type) OVER ({win}) AS next_event_type,
                   round(value - lag(value) OVER ({win}), 4) AS value_delta
            FROM events
        """,
        "sessionize": f"""
            WITH flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER ({win}) IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER ({win})) > {SESSION_GAP_SECONDS}
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
            ), sess AS (
                SELECT user_id, ts,
                       CAST(sum(new_sess) OVER ({cum}) AS BIGINT) AS session_id
                FROM flagged
            )
            SELECT user_id, session_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   epoch_us(min(ts)) AS start_us,
                   epoch_us(max(ts)) AS end_us,
                   round(epoch(max(ts)) - epoch(min(ts)), 6) AS duration_sec
            FROM sess GROUP BY user_id, session_id
        """,
        "backfill": f"""
            SELECT user_id, event_id,
                   round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                         OVER ({cum}), 4) AS last_purchase_value
            FROM events
        """,
        "asof_join": """
            WITH clicks AS (
                SELECT user_id, ts, max_by(value, event_id) AS click_value
                FROM events WHERE event_type = 'click' GROUP BY user_id, ts
            ), purch AS (
                SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
            )
            SELECT p.user_id, p.event_id,
                   epoch_us(p.ts) AS ts_us,
                   epoch_us(c.ts) AS matched_ts_us,
                   round(c.click_value, 4) AS click_value
            FROM purch p ASOF LEFT JOIN clicks c
              ON p.user_id = c.user_id AND c.ts <= p.ts
        """,
        "transitions": f"""
            WITH flagged AS (
                SELECT user_id,
                       CASE WHEN lag(event_type) OVER ({win}) IS NOT NULL
                                 AND lag(event_type) OVER ({win}) IS DISTINCT FROM event_type
                            THEN 1 ELSE 0 END AS chg
                FROM events
            )
            SELECT user_id, CAST(sum(chg) AS BIGINT) AS event_type_transitions
            FROM flagged GROUP BY user_id
        """,
        "run_length": f"""
            WITH flagged AS (
                SELECT user_id, ts, event_id, event_type,
                       CASE WHEN lag(event_type) OVER ({win}) IS DISTINCT FROM event_type
                            THEN 1 ELSE 0 END AS chg
                FROM events
            ), runs AS (
                SELECT user_id, ts, event_type,
                       CAST(sum(chg) OVER ({cum}) AS BIGINT) AS run_id
                FROM flagged
            )
            SELECT user_id, run_id,
                   min(event_type) AS run_value,
                   CAST(count(*) AS BIGINT) AS run_length,
                   epoch_us(min(ts)) AS run_start_us,
                   epoch_us(max(ts)) AS run_end_us
            FROM runs GROUP BY user_id, run_id
        """,
        "membership_join": """
            WITH dim AS (
                SELECT c_custkey,
                       (['train', 'test', 'validation_1', 'validation_2'])[(c_custkey % 4 + 1)::INT] AS type
                FROM customer WHERE c_custkey % 5 <> 0
            )
            SELECT coalesce(dim.type, 'unknown') AS type,
                   CAST(count(*) AS BIGINT) AS n,
                   round(avg(c_acctbal), 4) AS avg_acctbal
            FROM customer LEFT JOIN dim USING (c_custkey)
            GROUP BY 1
        """,
        "contour_ols": f"""
            WITH s AS (
                SELECT user_id,
                       row_number() OVER ({win}) - 1 AS x,
                       coalesce(sign(value - lag(value) OVER ({win})), 0)
                         + CASE WHEN row_number() OVER ({win}) = 1 THEN value ELSE 0 END AS inc
                FROM events
            ), c0 AS (
                SELECT user_id, x,
                       sum(inc) OVER (PARTITION BY user_id ORDER BY x
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS raw
                FROM s
            ), c AS (
                SELECT user_id, x,
                       raw - least(0, min(raw) OVER (PARTITION BY user_id)) AS contour
                FROM c0
            )
            SELECT user_id,
                   round(regr_slope(contour, x), 6) AS slant,
                   round(CASE WHEN count(*) > 2 AND regr_sxx(contour, x) <> 0
                              THEN (regr_syy(contour, x)
                                    - regr_sxy(contour, x) * regr_sxy(contour, x)
                                      / regr_sxx(contour, x)) / (count(*) - 2)
                         END, 6) AS slant_mse,
                   CAST(count(*) AS BIGINT) AS n_points
            FROM c GROUP BY user_id
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
    }
