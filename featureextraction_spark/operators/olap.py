"""OLAP shapes: ROLLUP multi-granularity aggregates and wide pivots.

Thin, citable wrappers over Spark's native grouping-sets machinery —
the point is the CONTRACT (engine-portable output for the driver's
DuckDB replay), not reimplementation:

- :func:`rollup_counts` — (group₁, group₂) → counts + exact quantized
  sums at every rollup granularity, with ``grouping()`` flags so NULL
  group keys are distinguishable from the subtotal rows they ride in.
  Spark plans ONE Expand + one map-combinable aggregate — the
  multi-granularity report costs one shuffle, not one per level.
- :func:`pivot_counts` — entity × category counts pivoted wide with an
  EXPLICIT category list (never the implicit two-pass distinct scan),
  zero-filled; one aggregate.

No reference counterpart; standard warehouse reporting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_counts(
    df: DataFrame,
    g1: str,
    g2: str,
    value_q: str,
) -> DataFrame:
    """ROLLUP(g1, g2): n + Σ value_q (exact long) + grouping flags."""
    # grouping() is only legal INSIDE the rollup aggregate, not a
    # downstream projection
    return df.rollup(g1, g2).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(value_q).cast("long").alias("sum_q"),
        F.grouping(g1).cast("long").alias("g1_total"),
        F.grouping(g2).cast("long").alias("g2_total"),
    )


def pivot_counts(
    df: DataFrame,
    by: str,
    category: str,
    values: Sequence[str],
) -> DataFrame:
    """Entity × category count matrix, wide: one column ``n_<value>`` per
    category in ``values`` (explicit list — no extra distinct pass),
    zeros where absent."""
    wide = (
        df.groupBy(by)
        .pivot(category, list(values))
        .agg(F.count(F.lit(1)))
    )
    sel = [F.col(by)]
    for v in values:
        sel.append(F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long").alias(f"n_{v}"))
    return wide.select(*sel)


def cube_counts(
    df: DataFrame,
    g1: str,
    g2: str,
    value: str,
) -> DataFrame:
    """CUBE(g1, g2): all four grouping levels — (g1,g2), g1 subtotals,
    g2 subtotals, grand total — in ONE pass. Where :func:`rollup_counts`
    gives the drill-down hierarchy, CUBE adds the cross-slice (per-g2
    totals across all g1), the shape a curation dashboard wants for a
    lang × source coverage matrix. Spark plans it as a single Expand
    (4 rows per input row) + one map-side-combinable aggregate — the
    input is scanned ONCE, never four times; grouping() flags (exact
    integers) disambiguate real NULL keys from subtotal rows.
    ``value`` must be an exact integer column (sum is a BIGINT vehicle).
    """
    return df.cube(g1, g2).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(value).cast("long").alias("sum_v"),
        F.grouping(g1).cast("long").alias("g1_total"),
        F.grouping(g2).cast("long").alias("g2_total"),
    )
