"""SCD2 (slowly-changing-dimension type 2) validity-interval builder.

The WRITE side of a point-in-time feature store: turn an append-only
state-change event log into the half-open validity intervals
``[valid_from, valid_to)`` a warehouse dimension stores — the table an
as-of/range join then reads. One window family (lead + row_number) over
the per-entity total order, i.e. exactly one ``HashPartitioning(by)``
exchange and one sort; the open (current) row has ``valid_to = NULL``.

Half-open semantics: a state is valid from its own event µs up to but
NOT including the next change's µs — the convention that makes
``valid_from <= ts < valid_to`` containment unambiguous when changes
share a µs with a probe. (Backward as-of at ts then equals the interval
row containing ts — the two read paths agree by construction.)

Reference analog: the memoized "latest derived state"
(``src/preparation/models.py:21-24``) is the in-memory special case of
reading this dimension at NOW.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.time import epoch_us


def scd2_intervals(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    tie: str = "event_id",
    state: str = "event_type",
) -> DataFrame:
    """One row per state-change event: (by, tie, state, valid_from_us,
    valid_to_us NULL-when-open, version 1..n)."""
    t = df.withColumn("__us", epoch_us(df, ts))
    w = Window.partitionBy(by).orderBy("__us", tie)
    return t.select(
        F.col(by),
        F.col(tie),
        F.col(state).alias("state"),
        F.col("__us").cast("long").alias("valid_from_us"),
        F.lead("__us").over(w).cast("long").alias("valid_to_us"),
        F.row_number().over(w).cast("long").alias("version"),
    )
