"""Token-window document chunking — the standard pretraining / RAG
shard-prep step: split each document into fixed-size overlapping token
windows (size ``window``, step ``stride``).

Entirely expression-based (split → sequence → explode → slice →
array_join inside whole-stage codegen): a pure per-document map with NO
shuffle — at 100 TB this is embarrassingly parallel and limited only by
scan + write throughput. Overlap (window − stride tokens) is the usual
context-continuity margin for next-token-prediction training.

No reference counterpart (the reference has no text corpus ops); the
operator is the chunking stage every large-scale LLM data pipeline runs
between cleaning and packing (`pack_sequences` consumes its output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# single-space normalization shared with the DuckDB oracle: collapse every
# whitespace run (the explicit class — Java \s includes \x0B, RE2 does not)
# to one space, trim, then split on the single space. Cross-engine
# byte-identical by construction.
_WS_RUN = "[ \\t\\n\\r\\f\\u000B]+"


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode each document into overlapping ``window``-token chunks
    every ``stride`` tokens (1-based starts 1, 1+stride, 1+2·stride, …,
    clamped so the last chunk still starts inside the document).

    Output: (id_col, chunk_id, n_tokens, chunk_text) where ``chunk_id``
    is the 0-based window ordinal, ``n_tokens`` the actual token count of
    the (possibly short, final) chunk, and ``chunk_text`` the
    space-joined window. Documents with zero tokens emit no chunks.
    Chunking stops once a window reaches the end of the document (the
    HF/LangChain covering rule): the last start is the smallest grid
    point 1 + k·stride with start + window − 1 ≥ n, so the tail is
    covered exactly once and no fully-redundant fragment is emitted.

    Scale: map-only — no exchange in the plan; chunk multiplication is
    bounded by ceil(n/stride) per doc, so output size is a constant
    factor of input tokens regardless of corpus size or skew.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.col(text), _WS_RUN, " ")), " "),
        lambda x: x != "",
    )
    d = df.select(id_col, toks.alias("__toks")).withColumn(
        "__n", F.size("__toks")
    )
    # last start L = 1 + ceil(max(n−window, 0)/stride)·stride, computed with
    # integer ops only ((x − x % stride) is stride-divisible, so the final
    # division is exact) — the same arithmetic the DuckDB oracle replays
    x = F.greatest(F.col("__n") - F.lit(window), F.lit(0)) + F.lit(stride - 1)
    last_start = (
        F.lit(1) + ((x - (x % F.lit(stride))) / F.lit(stride)).cast("int") * F.lit(stride)
    )
    d = d.filter(F.col("__n") > 0).withColumn(
        "__start", F.explode(F.sequence(F.lit(1), last_start, F.lit(stride)))
    )
    chunk = F.slice(F.col("__toks"), F.col("__start"), F.lit(window))
    return d.select(
        id_col,
        ((F.col("__start") - 1) / F.lit(stride)).cast("int").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def truncate_context(
    df: DataFrame,
    key: str = "conv_id",
    order: str = "turn_idx",
    text: str = "text",
    budget_tokens: int = 512,
) -> DataFrame:
    """Serving-side context-window truncation: keep the longest SUFFIX of
    each conversation whose total token count fits ``budget_tokens`` —
    the "drop the oldest turns" rule every chat-serving stack applies
    before rendering a prompt. The newest turn is always kept, even when
    it alone exceeds the budget (a request must carry at least the
    current message).

    Output: the kept turns only, as (key, order, n_tokens,
    cum_tokens_from_end) — ``cum_tokens_from_end`` is the running token
    total walking backwards from the newest turn, so the kept set is
    exactly the rows with ``cum_tokens_from_end ≤ budget`` plus the
    newest turn.

    Scale: one window pass partitioned by conversation (descending turn
    order), then a filter — one exchange, map-side prunable; the
    reverse-cumulative-sum is the same pattern as the backfill family
    and inherits its salted escape hatch for mega-conversations.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.col(text), _WS_RUN, " ")), " "),
        lambda x: x != "",
    )
    w = Window.partitionBy(key).orderBy(F.col(order).desc())
    d = (
        df.select(key, order, toks.alias("__toks"))
        .withColumn("n_tokens", F.size("__toks").cast("long"))
        .withColumn(
            "cum_tokens_from_end",
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("__rn", F.row_number().over(w))
    )
    return d.filter(
        (F.col("cum_tokens_from_end") <= budget_tokens) | (F.col("__rn") == 1)
    ).select(key, order, "n_tokens", "cum_tokens_from_end")
