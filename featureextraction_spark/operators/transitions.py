"""Transition counts along an ordered sequence (SURVEY.md A7).

Reference: ``count_transitions`` walks a pixel row comparing each value to
the previous and counts changes (``src/preparation/utils.py:64-76``).
Transposed: per-conversation count of role/tool switches — expressed as
``lag`` + conditional sum, fully JVM-side (whole-stage codegen, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _change_flag(col: str, w) -> Column:
    prev = F.lag(col).over(w)
    # null-safe inequality: a transition is a change between two observed
    # values; the first row (prev is null) is not a transition — same as the
    # reference seeding `previous = sequence[0]` (utils.py:66-69).
    return F.when(prev.isNotNull() & ~F.col(col).eqNullSafe(prev), F.lit(1)).otherwise(F.lit(0))


def transition_count(
    df: DataFrame,
    col: str,
    key: str = "conv_id",
    order: tuple[str, ...] = ("turn_idx",),
    out: str | None = None,
) -> DataFrame:
    """Per-key total number of value changes of ``col`` along ``order``."""
    out = out or f"{col}_transitions"
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("__chg", _change_flag(col, w))
        .groupBy(key)
        .agg(F.sum("__chg").cast("long").alias(out))
    )


def running_transitions(
    df: DataFrame,
    col: str,
    key: str = "conv_id",
    order: tuple[str, ...] = ("turn_idx",),
    out: str | None = None,
) -> DataFrame:
    """Running transition count at each row (point-in-time safe: the count
    at row i uses rows <= i only)."""
    out = out or f"{col}_transitions"
    w = Window.partitionBy(key).orderBy(*order)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("__chg", _change_flag(col, w)).withColumn(
        out, F.sum("__chg").over(cum).cast("long")
    ).drop("__chg")
