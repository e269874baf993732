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


def hashed_features_exprs(
    text: str = "text", n_buckets: int = 64, seed: int = 17
) -> list[Column]:
    """The hashing-trick vectorizer as a pure row projection — the
    streaming twin of ``operators/encoding.hashed_features``.

    The batch operator explodes tokens and groupBys (doc, bucket) for
    map-side combining; per-document the semantics are row-local, so a
    stream computes the DENSE ``n_buckets``-vector with two higher-order
    folds and zero state / zero shuffle: tokens → (bucket, sign) structs
    (one md5 per token), then fold into an integer vector.  Same md5
    bits, same pure-modulo sign as batch — row-equality pytest-gated.

    Returns ``hash_vec`` (signed sums), ``hash_cnt`` (unsigned counts),
    ``n_tokens``.
    """
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text), F.lit(""))),
        F.lit("[^ \\t\\n\\r\\f\\x0B]+"),
        0,
    )
    def h60(t: Column) -> Column:
        s = F.concat_ws(":", t, F.lit(str(seed)))
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")

    bs = F.transform(
        toks,
        lambda t: F.struct(
            (h60(t) % n_buckets).cast("int").alias("b"),
            F.when(h60(t) % (2 * n_buckets) < n_buckets, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("s"),
        ),
    )
    zeros = F.array_repeat(F.lit(0).cast("long"), n_buckets)
    vec = F.aggregate(
        bs,
        zeros,
        lambda acc, e: F.transform(
            acc, lambda v, i: v + F.when(e["b"] == i, e["s"]).otherwise(F.lit(0))
        ),
    )
    cnt = F.aggregate(
        bs,
        zeros,
        lambda acc, e: F.transform(
            acc,
            lambda v, i: v + F.when(e["b"] == i, F.lit(1)).otherwise(F.lit(0)),
        ),
    )
    return [
        vec.alias("hash_vec"),
        cnt.alias("hash_cnt"),
        F.size(toks).cast("long").alias("n_tokens"),
    ]


def streaming_hashed_features(
    stream: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n_buckets: int = 64,
    seed: int = 17,
) -> DataFrame:
    """Append-mode, stateless: one dense hash vector per arriving doc."""
    return stream.select(
        F.col(id_col), *hashed_features_exprs(text, n_buckets, seed)
    )


def scale_snapshot(
    train: DataFrame, value: str = "value"
) -> DataFrame:
    """One-row (n_train, sum_q, sum_sq_q) integer-moment snapshot fitted
    in BATCH on the train slice — the fitted state
    ``operators/encoding.standard_scale`` derives internally, exported
    so a stream can transform against it (refit periodically in batch,
    score live rows against the latest snapshot — the same
    snapshot-shipping shape as ``unigram_lm_snapshot``)."""
    vq3 = F.floor(F.col(value) * F.lit(1e3) + F.lit(0.5)).cast("long")
    return train.select(vq3.alias("__vq")).agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum("__vq").alias("sum_q"),
        F.sum(F.col("__vq") * F.col("__vq")).alias("sum_sq_q"),
    )


def streaming_standard_scale(
    stream: DataFrame,
    snapshot: DataFrame,
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Stateless stream-side z-transform against the broadcast one-row
    snapshot — identical arithmetic to the batch operator's transform
    half (double-spelled sums product, IEEE sqrt), so batch/stream rows
    are bit-equal (pytest-gated)."""
    vq3 = F.floor(F.col(value) * F.lit(1e3) + F.lit(0.5)).cast("long")
    j = stream.withColumn("__vq", vq3).join(F.broadcast(snapshot))
    nd = F.col("n_train").cast("double")
    mu = F.col("sum_q").cast("double") / nd
    var = (
        F.col("sum_sq_q").cast("double")
        - F.col("sum_q").cast("double") * F.col("sum_q").cast("double") / nd
    ) / (nd - F.lit(1.0))
    return j.select(
        F.col(id_col),
        F.col("__vq").alias("vq"),
        "n_train",
        "sum_q",
        "sum_sq_q",
        ((F.col("__vq").cast("double") - mu) / F.sqrt(var)).alias("z"),
    )
