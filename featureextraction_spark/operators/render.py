"""Chat-template rendering of multi-turn transcripts: collapse each
conversation into one training-ready text under stable (conv_id,
turn_idx) ordering — the step that turns a turn-level transcript table
into SFT/pretraining samples.

This is also the north-rule invariant made executable: the rendered
string is the concatenation of every per-turn text in stable turn order,
so a bit-exact hash match against the SQL oracle proves per-turn text
byte-equality AND ordering stability in one gate.

Expression-only: sort_array(collect_list(struct)) + transform +
array_join — one conversation-keyed aggregate, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def render_conversations(
    tr: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role: str = "role",
    text: str = "text",
    last_k: int | None = None,
    delim: str = "\n",
) -> DataFrame:
    """Render each conversation to ``<|role|>text`` lines joined by
    ``delim``, turns in ascending ``turn_col`` order.

    ``last_k`` keeps only the final K turns per conversation (the usual
    context-window truncation): implemented as a pre-aggregation filter
    against the per-conversation max turn, NOT a post-hoc slice — so the
    collected array is bounded by K rows per conversation and
    mega-conversation skew cannot blow an executor at 10^12-turn scale.

    Output: (conv_col, turn_count, n_chars, rendered) with
    ``turn_count`` = kept turns and ``n_chars`` = length of the render.

    Scale: with ``last_k`` set this is one bounded conversation-keyed
    aggregate (one shuffle; zero-exchange over conv_id-bucketed tables).
    Unbounded renders of pathological conversations are the caller's
    explicit opt-in (last_k=None).
    """
    t = tr
    if last_k is not None:
        if last_k <= 0:
            raise ValueError("last_k must be positive")
        w = Window.partitionBy(conv_col)
        t = t.withColumn("__maxt", F.max(turn_col).over(w)).filter(
            F.col(turn_col) > F.col("__maxt") - F.lit(last_k)
        )
    line = F.concat(F.lit("<|"), F.col(role), F.lit("|>"), F.col(text))
    sorted_lines = F.array_sort(
        F.collect_list(F.struct(F.col(turn_col).alias("t"), line.alias("l")))
    )
    rendered = F.array_join(
        F.transform(sorted_lines, lambda x: x["l"]), delim
    )
    return t.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("long").alias("turn_count"),
        rendered.alias("rendered"),
    ).select(
        conv_col,
        "turn_count",
        F.length("rendered").cast("long").alias("n_chars"),
        "rendered",
    )
