"""Point-in-time recency, expanding, and lookahead-label features.

Three leakage-disciplined window families over the transcript shape
``(conv_id, turn_idx, role, text, tool, ts)`` — the per-turn state a
feature store serves at training time (BASELINE.json north rule:
windowed operators over multi-turn transcripts):

- :func:`recency_features` — "how long since X last happened" state at
  every turn, from STRICTLY-PRIOR rows only (frame upper bound ``-1``):
  zero temporal leakage by construction, same discipline as the
  ``cumulative_target_encode`` prior-window.
- :func:`expanding_features` — leakage-free expanding (prior-only)
  count / exact quantized sum / min / max / mean of a numeric column.
- :func:`lookahead_labels` — DELIBERATE forward windows for label
  construction ("will a tool fire within the next h turns"). Labels may
  read the future — that is their definition — but they live in a
  separate function with a separate name so a feature pipeline can never
  pull them in by accident.

All outputs are integers (µs gaps, counts, quantized sums) except the
expanding mean — one integer÷integer division the caller nudge-rounds —
so the driver hash gate is boundary-flake-free (the ``dsir.weight_q`` /
``unigram_lm.lm_num`` vehicle pattern).

Scale design: every window in a family shares ONE
``HashPartitioning(by)`` exchange and one ``(order)`` sort; frames are
running aggregates (constant state per row — Spark's incremental
UnboundedPreceding evaluation), so mega-conversations cost O(n log n)
sort only. Skew escape hatch: the sessionize/backfill salted variants
(``operators/sessionize.py``, ``operators/backfill.py``) — the same
bucket-and-carry decomposition applies to any of these frames.

No reference counterpart (the reference pipeline is per-image); the
closest analog is its memoized latest-derived-state lookup
(``src/preparation/models.py:21-24``), which ``us_since_tool`` is the
relational, point-in-time form of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.time import epoch_us
from .rolling import quantize_q6


def _ordered(by: str, order: str) -> Window:
    return Window.partitionBy(by).orderBy(order)


def recency_features(
    df: DataFrame,
    by: str = "conv_id",
    order: str = "turn_idx",
    ts: str = "ts",
    role: str = "role",
    tool: str = "tool",
    anchor_role: str = "user",
) -> DataFrame:
    """Append strictly-prior recency state to every turn.

    - ``us_since_conv_start`` — µs since the conversation's first turn
      (0 on the first turn);
    - ``us_since_tool``       — µs since the latest STRICTLY-prior turn
      with a non-null ``tool`` (NULL if none yet);
    - ``turns_since_anchor``  — turns since the latest strictly-prior
      turn with ``role == anchor_role`` (NULL if none yet);
    - ``prior_tool_turns``    — count of strictly-prior tool turns.

    ``order`` must be a total order within ``by`` (turn_idx is); because
    ts is non-decreasing along it, "latest prior tool ts" ≡
    ``max(CASE tool IS NOT NULL THEN ts END)`` over the prior frame —
    max, not last-ignorenulls, so the exact same aggregate runs on any
    SQL engine.
    """
    us = epoch_us(df, ts)
    t = df.withColumn("__us", us)
    w_all = _ordered(by, order).rowsBetween(Window.unboundedPreceding, 0)
    w_prev = _ordered(by, order).rowsBetween(Window.unboundedPreceding, -1)
    tool_us = F.when(F.col(tool).isNotNull(), F.col("__us"))
    anchor_ord = F.when(F.col(role) == anchor_role, F.col(order))
    return (
        t.withColumn(
            "us_since_conv_start",
            (F.col("__us") - F.min("__us").over(w_all)).cast("long"),
        )
        .withColumn(
            "us_since_tool",
            (F.col("__us") - F.max(tool_us).over(w_prev)).cast("long"),
        )
        .withColumn(
            "turns_since_anchor",
            (F.col(order) - F.max(anchor_ord).over(w_prev)).cast("long"),
        )
        .withColumn(
            "prior_tool_turns",
            F.coalesce(F.count(F.col(tool)).over(w_prev), F.lit(0)).cast("long"),
        )
        .drop("__us")
    )


def expanding_features(
    df: DataFrame,
    value: str,
    by: str = "conv_id",
    order: str = "turn_idx",
) -> DataFrame:
    """Leakage-free expanding stats of ``value`` over strictly-prior turns.

    - ``prior_n``     — prior row count;
    - ``prior_sum_q`` — exact integer sum of the 1e-6-quantized value
      (0 when no prior rows);
    - ``prior_min_q`` / ``prior_max_q`` — quantized extremes (NULL when
      no prior rows);
    - ``expanding_mean`` — ``prior_sum_q / (1e6 · prior_n)`` (NULL when
      no prior rows): ONE integer/integer division, nudge-rounded by the
      caller.
    """
    t = df.withColumn("__vq", quantize_q6(F.col(value)))
    w_prev = _ordered(by, order).rowsBetween(Window.unboundedPreceding, -1)
    prior_n = F.count(F.col("__vq")).over(w_prev)
    prior_sum = F.sum("__vq").over(w_prev)
    return (
        t.withColumn("prior_n", F.coalesce(prior_n, F.lit(0)).cast("long"))
        .withColumn("prior_sum_q", F.coalesce(prior_sum, F.lit(0)).cast("long"))
        .withColumn("prior_min_q", F.min("__vq").over(w_prev).cast("long"))
        .withColumn("prior_max_q", F.max("__vq").over(w_prev).cast("long"))
        .withColumn(
            "expanding_mean",
            F.when(
                F.col("prior_n") > 0,
                F.col("prior_sum_q") / (F.lit(1e6) * F.col("prior_n").cast("double")),
            ),
        )
        .drop("__vq")
    )


def lookahead_labels(
    df: DataFrame,
    by: str = "conv_id",
    order: str = "turn_idx",
    ts: str = "ts",
    role: str = "role",
    tool: str = "tool",
    horizon: int = 5,
) -> DataFrame:
    """Training-label construction: DELIBERATE forward windows.

    - ``next_role``         — role of the following turn (NULL at end);
    - ``tool_within_h``     — 1 iff any of the next ``horizon`` turns has
      a non-null tool, else 0 (end-of-conversation counts as 0);
    - ``us_to_next_tool``   — µs until the NEXT tool turn anywhere ahead
      (NULL if the conversation never fires another tool).

    These read ts' > ts by definition — they are labels, not features;
    a point-in-time feature pipeline must join them by key only, never
    mix them into the feature window set.
    """
    us = epoch_us(df, ts)
    t = df.withColumn("__us", us)
    w = _ordered(by, order)
    w_h = w.rowsBetween(1, horizon)
    w_fut = w.rowsBetween(1, Window.unboundedFollowing)
    tool_us = F.when(F.col(tool).isNotNull(), F.col("__us"))
    return (
        t.withColumn("next_role", F.lead(role).over(w))
        .withColumn(
            "tool_within_h",
            F.coalesce(
                F.max(F.col(tool).isNotNull().cast("int")).over(w_h), F.lit(0)
            ).cast("long"),
        )
        .withColumn(
            "us_to_next_tool",
            (F.min(tool_us).over(w_fut) - F.col("__us")).cast("long"),
        )
        .drop("__us")
    )
