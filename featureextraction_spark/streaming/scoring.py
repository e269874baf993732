"""Streaming twins for the doc-local quality scorers: line-level dedup
features and CCNet-style unigram-LM scoring on a LIVE document stream.

Both batch operators (``functions/textstats.py``) are per-document
computations that the batch engine happens to express with explode +
groupBy for map-side combining. On a stream that shape would be a
stateful aggregation (watermarks, update mode); but the per-document
semantics are STATELESS given the right inputs, so the streaming twins
re-express them as pure row projections over higher-order array
expressions — append mode, zero state, and therefore also zero-cost to
run inside any existing streaming pipeline:

- line dedup: within-document duplication needs nothing outside the row.
  ``Σ (count−1) over identical lines = n_lines − n_distinct_lines`` and
  ``Σ (count−1)·len = total_chars − Σ_distinct len``, so
  ``array_distinct`` + two ``aggregate`` folds replace the explode.
- unigram LM: the LM is corpus state, but CCNet-style scoring uses a
  FIXED reference LM — fit once in batch (``unigram_lm_snapshot``), ship
  it as a one-row broadcast (map<token,count>, N, V), and every arriving
  document scores against the snapshot row-locally. This mirrors the
  production shape: refit the snapshot periodically in batch; score the
  live stream against the latest snapshot. For vocabularies too large to
  broadcast as a single map cell, the alternative is a stream-static
  equi-join against the LM table (supported by Structured Streaming);
  the snapshot map keeps the hot path to one per-token hash lookup.

Row-equality with the batch operators is pytest-gated
(tests/test_streaming.py::test_streaming_line_dedup_matches_batch,
::test_streaming_unigram_lm_matches_batch) — integer columns bit-equal;
``avg_logprob``/``ppl`` tolerance-equal (multi-term float sums are
accumulation-order-dependent, the same contract the batch driver query
documents).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from featureextraction_spark.functions.textstats import TOKEN_REGEX


def line_dedup_exprs(text: str = "text") -> list[Column]:
    """The line-dedup feature family as pure row expressions (no explode,
    no shuffle): identical semantics to ``line_dedup_features`` —
    ``\\n``-split with trailing empties kept, Σ(count−1) duplication
    counts, char-mass fractions with the zero-char guard."""
    lines = F.split(F.coalesce(F.col(text), F.lit("")), "\n", -1)
    distinct = F.array_distinct(lines)
    zero = F.lit(0).cast("long")
    chars = F.aggregate(lines, zero, lambda a, x: a + F.length(x))
    dchars = F.aggregate(distinct, zero, lambda a, x: a + F.length(x))
    n_lines = F.size(lines).cast("long")
    dup_lines = (F.size(lines) - F.size(distinct)).cast("long")
    return [
        n_lines.alias("n_lines"),
        dup_lines.alias("dup_lines"),
        (dup_lines.cast("double") / n_lines).alias("dup_line_frac"),
        F.when(chars == 0, F.lit(0.0))
        .otherwise((chars - dchars).cast("double") / chars)
        .alias("dup_char_frac"),
    ]


def streaming_line_dedup(
    stream: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Per-document line-duplication features on a stream: a stateless
    projection (append mode, no watermark, no state store)."""
    return stream.select(F.col(id_col), *line_dedup_exprs(text))


def unigram_lm_snapshot(ref: DataFrame, text: str = "text") -> DataFrame:
    """Fit the add-one unigram LM on a reference corpus slice and pack it
    into ONE broadcast-able row: (lm map<token,count>, N token mass, V
    vocabulary size). The same token regex, lowercasing, and counts as
    ``unigram_lm_score``'s internal fit, so scoring against the snapshot
    is bit-identical on the integer columns."""
    toks = ref.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text)), F.lit(TOKEN_REGEX), F.lit(0)
            )
        ).alias("__t")
    )
    lm = toks.groupBy("__t").agg(F.count(F.lit(1)).cast("long").alias("__c"))
    return lm.agg(
        F.map_from_entries(F.collect_list(F.struct("__t", "__c"))).alias("lm"),
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("N"),
        F.count(F.lit(1)).cast("long").alias("V"),
    )


def streaming_unigram_lm(
    stream: DataFrame,
    snapshot: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Score every arriving document under a broadcast LM snapshot
    (``unigram_lm_snapshot``): p(t) = (c_t + 1)/(N + V + 1) with one
    Laplace OOV bucket — the same formulas and output columns as the
    batch ``unigram_lm_score``, evaluated as a stateless per-row
    projection (one broadcast cross join against the one-row snapshot,
    then higher-order folds over the token array; append mode, no
    state)."""
    snap = snapshot.select(
        F.col("lm").alias("__lm"),
        F.col("N").alias("__N"),
        F.col("V").alias("__V"),
    )
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text), F.lit(""))), F.lit(TOKEN_REGEX), F.lit(0)
    )
    d = stream.crossJoin(F.broadcast(snap)).withColumn("__toks", toks)
    lm = F.col("__lm")
    zero_l = F.lit(0).cast("long")
    n_tokens = F.size("__toks").cast("long")
    oov = F.size(
        F.filter(F.col("__toks"), lambda t: F.element_at(lm, t).isNull())
    ).cast("long")
    lm_num = F.aggregate(
        F.col("__toks"),
        zero_l,
        lambda a, t: a + F.coalesce(F.element_at(lm, t), zero_l) + 1,
    )
    sumlogc = F.aggregate(
        F.col("__toks"),
        F.lit(0.0),
        lambda a, t: a
        + F.log((F.coalesce(F.element_at(lm, t), zero_l) + 1).cast("double")),
    )
    denom = (F.col("__N") + F.col("__V") + 1).cast("long")
    avg_logprob = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        sumlogc / n_tokens - F.log(denom.cast("double"))
    )
    return d.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        oov.alias("oov_tokens"),
        lm_num.alias("lm_num"),
        F.when(n_tokens == 0, F.lit(0.0))
        .otherwise(lm_num.cast("double") / (n_tokens * denom))
        .alias("mean_tok_prob"),
        avg_logprob.alias("avg_logprob"),
        F.when(n_tokens == 0, F.lit(1.0))
        .otherwise(F.exp(-avg_logprob))
        .alias("ppl"),
    )
