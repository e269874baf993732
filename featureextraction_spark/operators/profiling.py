"""Corpus profiling: fixed-width integer-bin histograms.

The first thing a curation pipeline renders over a new 100-TB corpus is
the length/score distribution per slice (language, source) — it drives
the filter thresholds everything downstream uses. This computes a
fixed-width histogram over an INTEGER column with pure integer bin
arithmetic (``bin = x div bin_width``), so bin membership is exact and
engine-portable — no float edges, no half-open-interval ambiguity, no
approximate-percentile nondeterminism.

One row per (group, bin): count, exact integer bin bounds, and the
bin's share of its group as ONE integer/integer division (nudge-rounded
by the caller — the shared hash vehicle).

Plan: a map-side-combinable groupBy onto ~|groups|x|bins| rows, then a
whole-partition window over that bounded result for the group totals —
the turns themselves are shuffled once, as aggregation partials.
Negative inputs would need floor (not trunc) division; lengths/counts
are non-negative, asserted in the doccontract.

No reference counterpart (the reference profiles nothing); standard
data-quality profiling re-expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def length_histogram(
    df: DataFrame,
    col: str = "n_chars",
    group: str = "lang",
    bin_width: int = 200,
) -> DataFrame:
    """Fixed-width histogram of integer ``col`` per ``group``."""
    binned = df.select(
        F.col(group),
        F.expr(f"`{col}` div {bin_width}L").alias("bin"),
    )
    counts = binned.groupBy(group, "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wg = Window.partitionBy(group)
    return counts.select(
        group,
        "bin",
        (F.col("bin") * bin_width).cast("long").alias("bin_lo"),
        ((F.col("bin") + 1) * bin_width - 1).cast("long").alias("bin_hi"),
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wg)).alias("share"),
    )
