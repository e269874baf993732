"""Text analysis for large-scale training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All expression-only (whole-stage codegen, zero Python) except nothing —
these are the JVM-side fast path. Hashes use md5 so every value is
reproducible bit-for-bit in DuckDB/pandas oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from featureextraction_spark.plans.feature_pipeline import TOKEN_REGEX

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic — deliberately minimal and hardcoded (deterministic, no external
# data); matched as whole lowercase tokens.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"),
    "es": ("el", "la", "los", "las", "de", "y", "que", "es", "en", "por"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu"),
}


def token_count(text: str | Column) -> Column:
    """Whitespace token count (maximal non-whitespace runs)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(TOKEN_REGEX)).cast("long")


# GPT-2-style pre-tokenizer shape, restricted to constructs Java regex
# (Spark) and RE2 (DuckDB) evaluate IDENTICALLY — no lookahead, and the
# whitespace class spelled out explicitly ([ \t\n\r\f\x0B]) because Java's
# \s includes \x0B while RE2's does not:
# contractions | space?+letters | space?+digits | space?+other | whitespace.
# Counts approximate real BPE pre-token counts (the usual LLM-pipeline
# budget proxy); the cross-engine agreement is verified by the
# text_quality oracle.
_WS = r" \t\n\r\f\x0B"
BPE_ISH_REGEX = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^"
    + _WS
    + r"\p{L}\p{N}]+|["
    + _WS
    + r"]+"
)


def bpe_ish_token_count(text: str | Column) -> Column:
    """BPE-pre-tokenizer-shaped token count (LLM token-budget proxy)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_ISH_REGEX)).cast("long")


def fingerprint(text: str | Column) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalized,
    lowercased text. Exact-duplicate detection key; portable to any SQL
    engine with md5."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.lower(F.trim(F.regexp_replace(c, "[ \\t\\n\\r\\f\\u000B]+", " ")))
    return F.md5(normalized)


def with_quality_features(df: DataFrame, text: str = "text") -> DataFrame:
    """Length/punctuation/alpha/stopword quality signals + composite score.

    score = mean of four [0,1] subscores: length sweet spot, alpha ratio,
    low punct ratio, stopword presence (an en-weighted heuristic — high for
    natural prose, low for boilerplate/garbage).
    """
    c = F.col(text)
    n_chars = F.length(c).cast("double")
    n_tok = token_count(text).cast("double")
    alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", "")).cast("double")
    punct = F.length(F.regexp_replace(c, "[^.,;:!?'\"()\\[\\]{}-]", "")).cast("double")
    en_stop = F.lit("|".join(STOPWORDS["en"]))
    stop_hits = F.regexp_count(
        F.lower(c), F.concat(F.lit("(^|[ ])("), en_stop, F.lit(")([ ]|$)"))
    ).cast("double")

    d = (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("alpha_ratio", F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0)))
        .withColumn("punct_ratio", F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0)))
        .withColumn(
            "mean_token_len", F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
        )
        .withColumn(
            "stopword_ratio", F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
        )
    )
    len_score = F.least(F.col("n_tokens").cast("double") / F.lit(20.0), F.lit(1.0))
    alpha_score = F.col("alpha_ratio")
    punct_score = F.lit(1.0) - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))
    stop_score = F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0))
    return d.withColumn(
        "quality_score", (len_score + alpha_score + punct_score + stop_score) / 4.0
    )


def language_id(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", out: str = "lang_pred"
) -> DataFrame:
    """Stopword-voting language ID.

    Tokenize → explode → broadcast-join the (word, lang) stopword dimension
    → per-(doc, lang) hit counts → argmax with deterministic tie-break
    (most hits, then lexicographically smallest lang); zero hits → 'unknown'.
    One narrow shuffle on doc id; the dimension is broadcast.
    """
    spark = df.sparkSession
    dim_rows = [(w, lang) for lang, ws in sorted(STOPWORDS.items()) for w in ws]
    dim = spark.createDataFrame(dim_rows, schema="word string, cand_lang string")

    toks = df.select(
        id_col,
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text)), F.lit(TOKEN_REGEX), 0)
        ).alias("word"),
    )
    hits = (
        toks.join(F.broadcast(dim), "word")
        .groupBy(id_col, "cand_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    best = hits.groupBy(id_col).agg(
        F.min_by(
            "cand_lang",
            F.struct((-F.col("hits")).alias("nh"), F.col("cand_lang").alias("l")),
        ).alias(out)
    )
    return df.join(best, id_col, "left").withColumn(
        out, F.coalesce(F.col(out), F.lit("unknown"))
    )


def repetition_features(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Repetition-based quality filters (the Gopher/RefinedWeb family,
    word-level): documents dominated by repeated words/bigrams are
    low-quality training data.

    Per document:
    - ``n_words``            whitespace tokens;
    - ``frac_dup_words``     1 − distinct/total (0 when no repetition);
    - ``top_word_frac``      occurrences of the most frequent word / total;
    - ``frac_dup_bigrams``   fraction of word-bigram INSTANCES whose bigram
                             occurs more than once in the document.

    All JVM-side: per-doc explode → count aggregation → ratios; the only
    shuffle key is the document id. NULL/empty text → zeros.
    """
    toks = F.split(
        F.trim(F.regexp_replace(F.coalesce(F.col(text), F.lit("")), r"\s+", " ")),
        " ",
    )
    toks = F.filter(toks, lambda t: t != "")
    base = df.select(F.col(id_col), toks.alias("__toks"))
    base = base.withColumn("__n", F.size("__toks"))

    words = base.select(id_col, "__n", F.explode_outer("__toks").alias("__w"))
    wc = (
        words.groupBy(id_col, "__n", "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col, "__n")
        .agg(
            F.count(F.when(F.col("__w").isNotNull(), 1)).alias("__distinct"),
            F.max(F.when(F.col("__w").isNotNull(), F.col("__c"))).alias("__topc"),
        )
    )

    # guard: Spark's sequence(1, 0) counts DOWN — only build bigrams when
    # there are at least two tokens
    # positions-explode (see dedup.char_shingles): explode_outer the integer
    # positions and build each bigram string once, post-generate — exploding
    # a pre-built string array re-evaluates the whole transform per element
    bigrams = base.select(
        id_col,
        "__toks",
        F.greatest(F.col("__n") - 1, F.lit(0)).alias("__nb"),
        F.explode_outer(
            F.when(
                F.col("__n") >= 2, F.expr("sequence(1, size(__toks) - 1)")
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__i"),
    ).select(
        id_col,
        "__nb",
        F.when(
            F.col("__i").isNotNull(),
            F.expr("concat(__toks[__i - 1], ' ', __toks[__i])"),
        ).alias("__b"),
    )
    bc = (
        bigrams.groupBy(id_col, "__nb", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col, "__nb")
        .agg(
            F.sum(
                F.when((F.col("__b").isNotNull()) & (F.col("__c") > 1), F.col("__c"))
            ).alias("__dupinst")
        )
    )

    return (
        wc.join(bc, id_col)
        .select(
            id_col,
            F.col("__n").cast("long").alias("n_words"),
            F.round(
                F.when(
                    F.col("__n") > 0,
                    1.0 - F.col("__distinct") / F.col("__n"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("frac_dup_words"),
            F.round(
                F.when(F.col("__n") > 0, F.col("__topc") / F.col("__n")).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("top_word_frac"),
            F.round(
                F.when(
                    F.col("__nb") > 0,
                    F.coalesce(F.col("__dupinst"), F.lit(0)) / F.col("__nb"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("frac_dup_bigrams"),
        )
    )


def line_dedup_features(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Line-level within-document duplication (the Gopher repetition
    family at LINE granularity, Rae et al. 2021 §A1.1): documents whose
    lines repeat — boilerplate menus, chat-log echo, scraped nav bars —
    are low-quality training data.

    Per document:
    - ``n_lines``         line occurrences (``\\n``-split, trailing empty
                          parts KEPT — an empty line is a line);
    - ``dup_lines``       occurrences beyond the first of each identical
                          line (Σ count−1);
    - ``dup_line_frac``   dup_lines / n_lines;
    - ``dup_char_frac``   characters inside repeated occurrences /
                          total line characters (0 when the document has
                          no characters).

    Integer counts with one final division per ratio — bit-stable across
    engines. Two doc-keyed shuffles (per-line count, per-doc rollup),
    both map-side combinable.
    """
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.coalesce(F.col(text), F.lit("")), "\n", -1)).alias(
            "__line"
        ),
    )
    per = lines.groupBy(id_col, "__line").agg(F.count(F.lit(1)).alias("__c"))
    agg = per.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_lines"),
        F.sum(F.col("__c") - 1).cast("long").alias("dup_lines"),
        F.sum(F.col("__c") * F.length("__line")).cast("long").alias("__chars"),
        F.sum((F.col("__c") - 1) * F.length("__line"))
        .cast("long")
        .alias("__dup_chars"),
    )
    return agg.select(
        id_col,
        "n_lines",
        "dup_lines",
        (F.col("dup_lines").cast("double") / F.col("n_lines")).alias(
            "dup_line_frac"
        ),
        F.when(F.col("__chars") == 0, F.lit(0.0))
        .otherwise(F.col("__dup_chars").cast("double") / F.col("__chars"))
        .alias("dup_char_frac"),
    )


def unigram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    ref: Column | None = None,
) -> DataFrame:
    """CCNet-style LM quality proxy (Wenzek et al. 2020): fit an add-one
    (Laplace) unigram LM on a REFERENCE slice of the corpus (``ref``
    boolean column; None = the whole corpus) and score every document's
    tokens under it. Out-of-vocabulary mass is one extra Laplace bucket:
    p(t) = (c_t + 1) / (N + V + 1), p(oov) = 1 / (N + V + 1).

    Per document:
    - ``n_tokens``, ``oov_tokens``  integer counts;
    - ``lm_num``         Σ (c_t + 1) over the doc's tokens — the exact
                         INTEGER numerator of the mean token probability
                         (order-independent, bit-stable across engines);
    - ``mean_tok_prob``  lm_num / (n_tokens · (N + V + 1)) — one float
                         division of exact integers;
    - ``avg_logprob``    mean ln p(t) — the CCNet headline. A multi-term
                         FLOAT sum, so only tolerance-comparable across
                         engines (pytest-oracled; excluded from the
                         hash-compared driver query);
    - ``ppl``            exp(−avg_logprob).

    Scale design: the LM is one token-keyed count aggregate
    (map-side-combinable; vocabulary-sized, NOT corpus-sized); totals are
    a broadcast single row; scoring is one token-keyed left join (AQE
    broadcasts the LM when the vocabulary is small) and one doc-keyed
    rollup. No Python anywhere.
    """
    flag = (ref if ref is not None else F.lit(True)).alias("__ref")
    toks = df.select(
        F.col(id_col),
        flag,
        F.explode_outer(
            F.regexp_extract_all(F.lower(F.col(text)), F.lit(TOKEN_REGEX), F.lit(0))
        ).alias("__t"),
    )
    lm = (
        toks.filter(F.col("__ref") & F.col("__t").isNotNull())
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    totals = lm.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("__N"),
        F.count(F.lit(1)).cast("long").alias("__V"),
    )
    scored = (
        toks.drop("__ref")
        .join(lm, "__t", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.when(F.col("__t").isNotNull(), 1)).alias("n_tokens"),
            F.count(
                F.when(F.col("__t").isNotNull() & F.col("__c").isNull(), 1)
            ).alias("oov_tokens"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__t").isNotNull(), F.coalesce(F.col("__c"), F.lit(0)) + 1
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("lm_num"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__t").isNotNull(),
                        F.log((F.coalesce(F.col("__c"), F.lit(0)) + 1).cast("double")),
                    )
                ),
                F.lit(0.0),
            ).alias("__sumlogc"),
        )
    )
    denom = (F.col("__N") + F.col("__V") + 1).cast("long")
    out = scored.crossJoin(F.broadcast(totals)).select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("oov_tokens").cast("long").alias("oov_tokens"),
        "lm_num",
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.col("lm_num").cast("double") / (F.col("n_tokens") * denom)
        )
        .alias("mean_tok_prob"),
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.col("__sumlogc") / F.col("n_tokens")
            - F.log(denom.cast("double"))
        )
        .alias("avg_logprob"),
    )
    return out.withColumn(
        "ppl", F.when(F.col("n_tokens") == 0, F.lit(1.0)).otherwise(F.exp(-F.col("avg_logprob")))
    )


def ngram_repetition_features(
    df: DataFrame, id_col: str = "doc_id", text: str = "text", n: int = 3
) -> DataFrame:
    """Within-document n-gram repetition coverage (the remaining Gopher
    §A1.1 filters: "fraction of characters in the most frequent n-gram" /
    "in duplicated n-grams"), measured at TOKEN granularity as the UNION
    of covered positions — exact integers, no overlap double-counting,
    bit-stable across engines (the char-based variant divides float
    char sums; this is the same signal on token offsets).

    Per document:
    - ``n_tokens``        whitespace tokens;
    - ``top_gram``        most frequent n-gram (count desc, gram asc
                          tie-break; NULL when the doc has < n tokens);
    - ``top_gram_count``  its occurrence count;
    - ``top_cover_frac``  tokens covered by any of its occurrences / n_tokens;
    - ``dup_cover_frac``  tokens covered by any occurrence of any n-gram
                          that repeats within the doc / n_tokens.

    Scale design: everything is keyed by document — positional gram
    explode, per-(doc, gram) count, a per-doc window for the top gram,
    and a position-union explode of n rows per repeated occurrence. No
    global state, no Python.
    """
    from featureextraction_spark.operators.dedup import token_ngrams_pos

    base = df.select(
        F.col(id_col),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text)), F.lit(TOKEN_REGEX), F.lit(0))
        )
        .cast("long")
        .alias("n_tokens"),
    )
    pos = token_ngrams_pos(df, id_col=id_col, text=text, n=n)
    counts = pos.groupBy(id_col, "ngram").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy(id_col).orderBy(F.desc("__c"), F.asc("ngram"))
    top = (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            F.col("ngram").alias("top_gram"),
            F.col("__c").cast("long").alias("top_gram_count"),
        )
    )
    tagged = pos.join(counts, [id_col, "ngram"]).join(
        top.select(id_col, "top_gram"), id_col
    )
    cover = (
        tagged.select(
            id_col,
            (F.col("ngram") == F.col("top_gram")).alias("__is_top"),
            (F.col("__c") > 1).alias("__is_dup"),
            F.explode(F.expr(f"sequence(pos, pos + {n - 1})")).alias("__ri"),
        )
        .groupBy(id_col)
        .agg(
            F.count_distinct(F.when(F.col("__is_top"), F.col("__ri"))).alias(
                "__top_cov"
            ),
            F.count_distinct(F.when(F.col("__is_dup"), F.col("__ri"))).alias(
                "__dup_cov"
            ),
        )
    )
    return (
        base.join(top, id_col, "left")
        .join(cover, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "top_gram",
            "top_gram_count",
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce(F.col("__top_cov"), F.lit(0)).cast("double")
                / F.col("n_tokens")
            )
            .alias("top_cover_frac"),
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce(F.col("__dup_cov"), F.lit(0)).cast("double")
                / F.col("n_tokens")
            )
            .alias("dup_cover_frac"),
        )
    )


# fixed, public, hand-set logistic weights for the expression-only quality
# classifier — the shape of a fastText/linear quality model (features →
# w·x + b → sigmoid) with deterministic hardcoded weights instead of
# trained ones (no external data in this environment). Positive weight on
# alpha/stopword prose signals, negative on punctuation soup, a mild
# sweet-spot prior on token length via log1p.
QUALITY_CLF_WEIGHTS: dict[str, float] = {
    "bias": -2.0,
    "alpha_ratio": 2.5,
    "stopword_ratio": 4.0,
    "punct_ratio": -6.0,
    "log1p_tokens": 0.35,
}


def quality_classifier(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Linear (logistic) document-quality classifier over the
    ``with_quality_features`` signals — the standard "model-based quality
    filter" stage of an LLM data pipeline (CCNet/GPT-3 style), expressed
    entirely as Catalyst expressions: featurize → dot product with fixed
    ``QUALITY_CLF_WEIGHTS`` → sigmoid → threshold at 0.5.

    Output: (id_col, n_tokens, logit, prob, keep). ``logit``/``prob``
    are float expressions (hash-gated queries round them through the
    shared nudged vehicle); ``keep`` is the boolean decision.

    Scale: map-only scoring — no shuffle, whole-stage codegen, trivially
    100-TB-parallel; a trained model swaps in by replacing the weight
    dict (same plan shape).
    """
    w = QUALITY_CLF_WEIGHTS
    q = with_quality_features(df.select(id_col, text), text=text)
    logit = (
        F.lit(w["bias"])
        + F.lit(w["alpha_ratio"]) * F.col("alpha_ratio")
        + F.lit(w["stopword_ratio"]) * F.col("stopword_ratio")
        + F.lit(w["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(w["log1p_tokens"]) * F.log(F.col("n_tokens").cast("double") + 1.0)
    )
    return q.select(
        id_col,
        "n_tokens",
        logit.alias("logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("prob"),
        (logit > 0).alias("keep"),
    )


def bpe_pair_counts(
    df: DataFrame, text: str = "text", top: int = 50
) -> DataFrame:
    """First-iteration BPE merge statistics: the ``top`` most frequent
    adjacent character pairs inside words, corpus-wide — the pair the
    byte-pair-encoding trainer would merge first, plus its runners-up.

    Output: (pair, n_words, pair_count) ordered deterministically by
    (pair_count DESC, pair ASC) and limited to ``top`` rows —
    ``pair_count`` counts occurrences weighted by word frequency (the
    BPE trainer's objective), ``n_words`` counts distinct words
    containing the pair.

    Scale design — the classic BPE-trainer optimization, distributed:
    aggregate the corpus to DISTINCT WORDS WITH COUNTS first (the heavy
    shuffle is word-keyed and map-side combinable; vocabulary, not
    corpus, sized), then explode each distinct word into its
    length−1 adjacent pairs and re-aggregate pair-keyed — the pair
    shuffle is vocabulary-bounded regardless of corpus size. Counts are
    exact integers (hash-gate safe with no rounding vehicle); the
    top-``top`` is orderBy+limit = TakeOrderedAndProject, never a
    single-partition sort.
    """
    toks = F.filter(
        F.split(
            F.lower(
                F.trim(
                    F.regexp_replace(
                        F.col(text), "[ \\t\\n\\r\\f\\u000B]+", " "
                    )
                )
            ),
            " ",
        ),
        lambda x: x != "",
    )
    words = (
        df.select(F.explode(toks).alias("__w"))
        .filter(F.length("__w") >= 2)
        .groupBy("__w")
        .agg(F.count(F.lit(1)).cast("long").alias("__wc"))
    )
    pairs = words.select(
        "__w",
        "__wc",
        F.explode(
            F.expr(
                "transform(sequence(1, length(__w) - 1),"
                " i -> substring(__w, i, 2))"
            )
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(
        F.countDistinct("__w").cast("long").alias("n_words"),
        F.sum("__wc").cast("long").alias("pair_count"),
    )
    return (
        agg.orderBy(F.col("pair_count").desc(), F.col("pair"))
        .limit(top)
        .select("pair", "n_words", "pair_count")
    )


def vocab_growth(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    bin_width: int = 150,
) -> DataFrame:
    """Heaps-law vocabulary-growth profile: per corpus-position bin, how
    many token TYPES appear for the first time, plus cumulative types /
    tokens and the running type-token ratio — the curve that tells a
    curation pipeline whether a corpus keeps contributing new vocabulary
    or has gone stale (duplicated/templated corpora flatten early).

    Corpus position is the stable ``id_col`` order (``bin = doc_id div
    bin_width`` — integer arithmetic, no rank window over the corpus).
    First sight of a type is ``min(doc_id)`` per token — one map-side-
    combinable token-keyed aggregation (the same shuffle family as
    ``tfidf_top_terms``); everything after runs on the ≤ n_docs/bin_width
    bin table, where the cumulative window's single partition is bounded
    by construction (documented exception to the no-partitionless-window
    rule, like packing's per-partition offsets).

    All counts exact integers; ``ttr`` is one integer/integer division
    on the nudged rounding.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text)), F.lit(TOKEN_REGEX), 0)
        ).alias("tok"),
    )
    binc = F.expr(f"`{id_col}` div {bin_width}L")
    first = toks.groupBy("tok").agg(F.min(id_col).alias("first_doc"))
    new_by_bin = first.groupBy(
        F.expr(f"first_doc div {bin_width}L").alias("bin")
    ).agg(F.count(F.lit(1)).alias("new_types"))
    tok_by_bin = toks.groupBy(binc.alias("bin")).agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    bins = tok_by_bin.join(new_by_bin, "bin", "left").na.fill({"new_types": 0})
    cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    return bins.select(
        "bin",
        "n_tokens",
        "new_types",
        F.sum("new_types").over(cum).alias("cum_types"),
        F.sum("n_tokens").over(cum).alias("cum_tokens"),
        (
            F.sum("new_types").over(cum).cast("double")
            / F.sum("n_tokens").over(cum).cast("double")
        ).alias("ttr"),
    )


def pmi_collocations(
    df: DataFrame,
    text: str = "text",
    min_count: int = 5,
    top: int = 50,
) -> DataFrame:
    """Top-``top`` adjacent-token collocations ranked by LIFT —
    ``P(a,b) / (P(a)·P(b))`` — the association statistic behind PMI
    (PMI = log lift; the log is omitted deliberately: lift is a RATIONAL
    function of exact integer counts, monotone with PMI, so the ranking
    is identical and no libm log touches the hash path).

    Counts: adjacent pairs via ``zip_with`` of two array slices (map-only
    — no self-join, no position explode), then one pair-keyed groupBy;
    unigram counts via one token-keyed groupBy; the two corpus totals via
    one bounded aggregate.  Pair scores join the unigram table twice on
    the token key — vocabulary-sized equi-joins, never broadcast-mandated
    (AQE may choose to broadcast at small scale; at 100 TB they stay
    shuffle joins on the token key, each side pre-aggregated).

    lift = (n_ab / N_pairs) / ((n_a / N_toks) · (n_b / N_toks))
         = n_ab · N_toks² / (N_pairs · n_a · n_b)

    — all products exact in double while n_ab·N_toks² < 2^53 (N_toks ≤
    ~3e7 at min_count-filtered gate scales; at true corpus scale compute
    the ratio in log-space OFF the hash path or quantize, documented).
    ``min_count`` keeps rare-pair noise out (the standard collocation
    floor); the rank orders by the NUDGE-ROUNDED lift with the pair
    string as tiebreak, so the k-set is engine-stable (the
    ``bm25_topk`` pattern).
    """
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text), F.lit(""))), F.lit(TOKEN_REGEX), 0
    )
    t = df.select(toks.alias("__t"))
    n = F.size("__t")
    pairs = t.select(
        F.explode(
            F.zip_with(
                F.slice("__t", 1, F.greatest(n - 1, F.lit(0))),
                F.slice("__t", 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("pair")
    )
    uni = t.select(F.explode("__t").alias("tok"))
    pair_counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n_ab"))
    uni_counts = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    totals = uni_counts.agg(
        F.sum("n_tok").alias("n_toks_total"),
    ).crossJoin(pair_counts.agg(F.sum("n_ab").alias("n_pairs_total")))
    scored = (
        pair_counts.filter(F.col("n_ab") >= min_count)
        .withColumn("a", F.split_part("pair", F.lit(" "), F.lit(1)))
        .withColumn("b", F.split_part("pair", F.lit(" "), F.lit(2)))
        .join(uni_counts.withColumnRenamed("tok", "a").withColumnRenamed("n_tok", "n_a"), "a")
        .join(uni_counts.withColumnRenamed("tok", "b").withColumnRenamed("n_tok", "n_b"), "b")
        .crossJoin(F.broadcast(totals))
    )
    lift = (
        F.col("n_ab").cast("double")
        * F.col("n_toks_total").cast("double")
        * F.col("n_toks_total").cast("double")
        / (
            F.col("n_pairs_total").cast("double")
            * F.col("n_a").cast("double")
            * F.col("n_b").cast("double")
        )
    )
    out = scored.select(
        "pair",
        "n_ab",
        "n_a",
        "n_b",
        F.round(lift + F.lit(1e-9), 6).alias("lift"),
    )
    return out.orderBy(F.col("lift").desc(), F.col("pair").asc()).limit(top)


def bpe_train(
    df: DataFrame,
    text: str = "text",
    n_merges: int = 10,
    min_len: int = 2,
) -> "list[tuple[int, str, str, str, int]]":
    """Full byte-pair-encoding trainer: learn ``n_merges`` merge rules
    (rank, left, right, merged, pair_count) from the corpus — the
    vocabulary-induction step of an LLM tokenizer pipeline.

    Distributed shape (the classic trainer optimization, Sennrich
    ACL'16, re-expressed relationally): the corpus collapses ONCE to
    distinct words with counts (word-keyed, map-side combinable — the
    only corpus-sized shuffle); every iteration then runs on the
    vocabulary-sized symbol table: adjacent-pair explode → pair-keyed
    weighted count → argmax (count DESC, then lexicographic — fully
    deterministic) → a JVM-side fold rewrites each word's symbol array
    with greedy left-to-right non-overlapping merging (no Python in the
    loop). Each iteration is persisted and the predecessor released, so
    lineage stays O(1) per step; the driver sees exactly one 1-row
    collect per merge. Iterative by nature — no single-statement SQL
    replay exists, so the driver gate records this rows-only; pytest
    holds the bit-exact naive oracle.
    """
    toks = F.filter(
        F.split(
            F.lower(
                F.trim(
                    F.regexp_replace(
                        F.col(text), "[ \\t\\n\\r\\f\\u000B]+", " "
                    )
                )
            ),
            " ",
        ),
        lambda x: x != "",
    )
    cur = (
        df.select(F.explode(toks).alias("__w"))
        .filter(F.length("__w") >= min_len)
        .groupBy("__w")
        .agg(F.count(F.lit(1)).cast("long").alias("__wc"))
        .select(
            "__wc",
            F.filter(F.split("__w", ""), lambda s: s != "").alias("__syms"),
        )
        .persist()
    )
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for rank in range(n_merges):
            pair_counts = (
                cur.where(F.size("__syms") >= 2)
                .select(
                    "__wc",
                    F.explode(
                        F.expr(
                            "transform(sequence(0, size(__syms) - 2),"
                            " i -> struct(__syms[i] AS l,"
                            " __syms[i + 1] AS r))"
                        )
                    ).alias("__p"),
                )
                .groupBy(F.col("__p.l").alias("l"), F.col("__p.r").alias("r"))
                .agg(F.sum("__wc").cast("long").alias("cnt"))
            )
            best = pair_counts.orderBy(
                F.col("cnt").desc(), F.col("l"), F.col("r")
            ).limit(1).collect()
            if not best:
                break
            left, right, cnt = best[0].l, best[0].r, int(best[0].cnt)
            merged = left + right
            merges.append((rank, left, right, merged, cnt))
            # greedy left-to-right non-overlapping rewrite, JVM-side fold
            fold = F.aggregate(
                F.col("__syms"),
                F.struct(
                    F.array().cast("array<string>").alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
                lambda acc, s: F.when(
                    acc.pend.isNull(),
                    F.struct(acc.out.alias("out"), s.alias("pend")),
                )
                .when(
                    (acc.pend == F.lit(left)) & (s == F.lit(right)),
                    F.struct(
                        F.concat(
                            acc.out, F.array(F.lit(merged))
                        ).alias("out"),
                        F.lit(None).cast("string").alias("pend"),
                    ),
                )
                .otherwise(
                    F.struct(
                        F.concat(acc.out, F.array(acc.pend)).alias("out"),
                        s.alias("pend"),
                    )
                ),
                lambda acc: F.when(
                    acc.pend.isNull(), acc.out
                ).otherwise(F.concat(acc.out, F.array(acc.pend))),
            )
            nxt = cur.select("__wc", fold.alias("__syms")).persist()
            nxt.count()  # materialize before dropping the predecessor
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def bpe_merge_table(
    df: DataFrame, text: str = "text", n_merges: int = 10
) -> DataFrame:
    """:func:`bpe_train` packaged as a DataFrame of merge rules —
    (rank, left, right, merged, pair_count), all integers/strings."""
    spark = df.sparkSession
    rows = bpe_train(df, text=text, n_merges=n_merges)
    return spark.createDataFrame(
        rows or [],
        "rank long, left string, right string, merged string, "
        "pair_count long",
    )


def readability_features(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade per document (Flesch
    1948; Kincaid 1975 — the navy-manual recalibration), the classic
    audience-level screen in corpus quality scoring.

    Heuristic counts, all deterministic and cross-engine portable:

    - words      = whitespace tokens (the shared ``TOKEN_REGEX``)
    - sentences  = maximal ``[.!?]+`` runs, floored at 1
    - syllables  = per word, ``max(1, vowel-group runs)`` — the standard
      [aeiouy]+ grouping heuristic (no dictionary, no libm)

    The formulas ride exact BIGINT vehicles (coefficients in
    thousandths, cleared by the S·W denominator):

        flesch·1000 = 206835 − 1015·W/S − 84600·Syl/W
        flesch_num  = 206835·S·W − 1015·W² − 84600·Syl·S
        fk·1000     = 390·W/S + 11800·Syl/W − 15590
        fk_num      = 390·W² + 11800·Syl·S − 15590·S·W
        den         = 1000·S·W

    so the hash gate compares integers; the float columns are single
    closing divisions. Empty documents (0 words) emit NULL metrics.

    Scale: sentence/word counts are doc-local expressions on the scan;
    syllables need the one token explode every text operator here pays,
    collapsed by a map-combinable groupBy(doc). int64 budget: terms are
    ~2e5·W·S — safe beyond 10⁶-word documents.
    """
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text), F.lit(""))), F.lit(TOKEN_REGEX), 0
    )
    base = df.select(
        F.col(id_col),
        F.greatest(
            F.regexp_count(
                F.coalesce(F.col(text), F.lit("")), F.lit(r"[.!?]+")
            ),
            F.lit(1),
        ).cast("long").alias("sentences"),
        F.explode_outer(toks).alias("__tok"),
    )
    agg = base.groupBy(id_col, "sentences").agg(
        F.count("__tok").cast("long").alias("words"),
        F.coalesce(
            F.sum(
                # explode_outer emits one NULL token for empty docs;
                # greatest() skips NULLs, so guard or it counts a syllable
                F.when(
                    F.col("__tok").isNotNull(),
                    F.greatest(
                        F.regexp_count(F.col("__tok"), F.lit("[aeiouy]+")),
                        F.lit(1),
                    ),
                )
            ),
            F.lit(0),
        ).cast("long").alias("syllables"),
    )
    s = F.col("sentences")
    w = F.col("words")
    syl = F.col("syllables")
    f_num = (
        F.lit(206835) * s * w - F.lit(1015) * w * w - F.lit(84600) * syl * s
    ).cast("long")
    g_num = (
        F.lit(390) * w * w + F.lit(11800) * syl * s - F.lit(15590) * s * w
    ).cast("long")
    den = (F.lit(1000) * s * w).cast("long")
    return agg.select(
        id_col,
        "words",
        "sentences",
        "syllables",
        F.when(w > 0, f_num).alias("flesch_num"),
        F.when(w > 0, g_num).alias("fk_num"),
        F.when(w > 0, den).alias("rd_den"),
        F.when(w > 0, f_num.cast("double") / den.cast("double")).alias(
            "flesch"
        ),
        F.when(w > 0, g_num.cast("double") / den.cast("double")).alias(
            "fk_grade"
        ),
    )


def bigram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    ref: Column | None = None,
) -> DataFrame:
    """Add-one bigram LM fit on a REFERENCE slice, scoring every doc —
    the conditional-probability sibling of :func:`unigram_lm_score`
    (KenLM-style fluency filtering, Heafield WMT'11 / Wenzek et al.
    2020; higher-order n-gram scores are the standard CCNet upgrade).

    p(b|a) = (c_ab + 1) / (c_a + V + 1) with c_ab / c_a the training
    bigram / context counts and V the training vocabulary (the +1 is the
    OOV bucket, as in the unigram scorer). Per document:

    - ``n_bigrams``, ``oov_bigrams``  exact integer counts
      (oov = bigram never seen in training);
    - ``blm_num``   Σ (c_ab + 1)  — exact BIGINT numerator mass;
    - ``ctx_num``   Σ c_a         — exact BIGINT context-familiarity mass
      (0 for a doc whose every context word is unseen);
    - ``avg_logprob``  mean ln p(b|a) — multi-term FLOAT sum, tolerance-
      comparable only (pytest-oracled; excluded from the hash-compared
      driver query, exactly like the unigram scorer's).

    Scale: the LM is two token-keyed count aggregates (vocabulary-sized,
    map-combinable) + a 1-row totals broadcast; scoring is two
    vocab-keyed left joins (AQE broadcasts them when small) and one
    doc-keyed rollup. No Python anywhere.
    """
    flag = (ref if ref is not None else F.lit(True)).alias("__ref")
    toks = df.select(
        F.col(id_col),
        flag,
        F.regexp_extract_all(
            F.lower(F.col(text)), F.lit(TOKEN_REGEX), F.lit(0)
        ).alias("__ts"),
    )
    pairs = toks.select(
        F.col(id_col),
        "__ref",
        F.explode_outer(
            F.expr(
                "CASE WHEN size(__ts) >= 2 THEN "
                "transform(sequence(1, size(__ts) - 1), "
                "i -> struct(element_at(__ts, i) AS a, "
                "element_at(__ts, i + 1) AS b)) "
                "ELSE CAST(array() AS array<struct<a string, b string>>) END"
            )
        ).alias("__p"),
    ).select(id_col, "__ref", F.col("__p.a").alias("__a"), F.col("__p.b").alias("__b"))
    train = pairs.filter(F.col("__ref") & F.col("__a").isNotNull())
    cab = train.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("__cab"))
    ca = train.groupBy("__a").agg(F.count(F.lit(1)).alias("__ca"))
    vocab = (
        toks.filter("__ref")
        .select(F.explode("__ts").alias("__t"))
        .agg(F.count_distinct("__t").cast("long").alias("__V"))
    )
    scored = (
        pairs.drop("__ref")
        .join(cab, ["__a", "__b"], "left")
        .join(ca, ["__a"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.when(F.col("__a").isNotNull(), 1))
            .cast("long")
            .alias("n_bigrams"),
            F.count(F.when(F.col("__a").isNotNull() & F.col("__cab").isNull(), 1))
            .cast("long")
            .alias("oov_bigrams"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__a").isNotNull(),
                        F.coalesce(F.col("__cab"), F.lit(0)) + 1,
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("blm_num"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__a").isNotNull(), F.coalesce(F.col("__ca"), F.lit(0))
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("ctx_num"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__a").isNotNull(),
                        F.log(
                            (F.coalesce(F.col("__cab"), F.lit(0)) + 1).cast("double")
                        )
                        - F.log(
                            (
                                F.coalesce(F.col("__ca"), F.lit(0))
                                + F.col("__V")
                                + 1
                            ).cast("double")
                        ),
                    )
                ),
                F.lit(0.0),
            ).alias("__sumlog"),
        )
    )
    return scored.select(
        id_col,
        "n_bigrams",
        "oov_bigrams",
        "blm_num",
        "ctx_num",
        F.when(F.col("n_bigrams") == 0, F.lit(0.0))
        .otherwise(F.col("__sumlog") / F.col("n_bigrams"))
        .alias("avg_logprob"),
    )


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Tokenizer APPLY for a shipped BPE merge list — the encode step
    that pairs with :func:`bpe_train`'s learn step (Sennrich ACL'16).

    Each whitespace word becomes its character symbols; every merge rule
    (left, right) is applied in rank order as ONE greedy left-to-right
    non-overlapping pass — exactly :func:`bpe_train`'s fold semantics —
    via string surgery: symbols are rendered space-wrapped (`` a  b ``,
    one space per side, so adjacency is a double space and a separator
    can never appear inside a symbol, tokens being whitespace-split),
    and a merge is ``replace(s, ' l  r ', ' lr ')``. ``replace`` scans
    left-to-right over non-overlapping occurrences in both Spark and
    DuckDB, and the replacement re-supplies the shared boundary space,
    so chained pairs (``a a a a`` → ``aa aa``) come out identical to the
    trainer's fold — the whole encode is engine-exact, no UDF.

    Output per document: ``n_words``, ``n_syms_in`` (character symbols
    before merging), ``n_syms_out`` (tokens after all merges),
    ``n_merges_applied`` = in − out. Documents with no words still get a
    row (all zeros).

    Scale: map-only — one explode + a fixed chain of |merges| replace
    expressions inside whole-stage codegen, then a doc-keyed rollup.
    """
    toks = F.filter(
        F.split(
            F.lower(
                F.trim(
                    F.regexp_replace(F.col(text), "[ \\t\\n\\r\\f\\u000B]+", " ")
                )
            ),
            " ",
        ),
        lambda x: x != "",
    )
    words = df.select(F.col(id_col), F.explode_outer(toks).alias("__w"))
    chars = F.filter(F.split(F.col("__w"), ""), lambda s: s != "")
    s = F.concat(F.lit(" "), F.array_join(chars, "  "), F.lit(" "))
    for left, right, *_ in merges:
        s = F.replace(s, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} "))
    per_word = words.select(
        id_col,
        F.when(F.col("__w").isNull(), F.lit(0))
        .otherwise(F.length("__w"))
        .alias("__in"),
        F.when(F.col("__w").isNull(), F.lit(0))
        .otherwise(F.size(F.split(F.trim(s), "  ")))
        .alias("__out"),
        F.when(F.col("__w").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("__word"),
    )
    return per_word.groupBy(id_col).agg(
        F.sum("__word").cast("long").alias("n_words"),
        F.sum("__in").cast("long").alias("n_syms_in"),
        F.sum("__out").cast("long").alias("n_syms_out"),
        (F.sum("__in") - F.sum("__out")).cast("long").alias("n_merges_applied"),
    )


def compression_ratio_features(
    df: DataFrame, id_col: str = "doc_id", text: str = "text", level: int = 6
) -> DataFrame:
    """Per-document zlib compression ratio — the Gopher-family quality
    proxy (Rae et al. 2021 §A1.2: highly repetitive or degenerate text
    compresses far below ~0.4; near-random noise barely compresses).

    Arrow-batched ``mapInPandas`` (the codec is inherently per-row
    Python, so this is the documented slow path — one narrow column in,
    three scalars out, no shuffle). NOT cross-engine oracled: DEFLATE
    output length is a property of the zlib build, not of SQL semantics
    — the pytest oracle pins the exact same library, which verifies the
    Spark plumbing (batching, schema, null handling), and the ratio's
    meaning is calibrated per-deployment anyway.
    """
    import pandas as pd  # noqa: F401 — signature documentation

    out_schema = (
        f"{id_col} long, n_bytes long, n_compressed long, compression_ratio double"
    )

    def kernel(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = pdf[text].fillna("").str.encode("utf-8")
            n_bytes = raw.str.len()
            n_comp = raw.map(lambda b: len(zlib.compress(b, level)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "n_compressed": n_comp.astype("int64"),
                    "compression_ratio": (
                        n_comp / n_bytes.where(n_bytes > 0)
                    ).fillna(0.0),
                }
            )

    return df.select(id_col, text).mapInPandas(kernel, schema=out_schema)


def zipf_fit(df: DataFrame, text: str, top_k: int = 100) -> DataFrame:
    """Zipf rank-frequency law fit over the corpus's top-k tokens — the
    one-row "is this corpus natural language" health gauge (Zipf 1949;
    Piantadosi 2014 review): OLS of ln(count) on ln(rank) over the k
    most frequent tokens. Natural text sits near slope −1; slope → 0
    flags boilerplate/spam floods, steep slopes flag tiny-vocabulary
    template corpora.

    The k-set is engine-stable: tokens order by (count DESC, token ASC)
    — both total — and Catalyst collapses the orderBy+limit into
    TakeOrderedAndProject (per-task partial top-k, ONE corpus scan, no
    global sort). The only partitionless window (rank 1..k) runs over
    that ≤k-row table (window-hygiene allowlisted, the ``token_ids``
    pattern). Counts ship as exact BIGINTs; the OLS moments are ≤k-term
    double sums whose addition order rides the shared nudge.

    Output: ONE row — ``k`` (rows fitted), ``n_top_tokens`` ≡ k,
    ``top1_cnt`` / ``sum_cnt_topk`` (BIGINT vehicles), raw doubles
    ``slope``, ``intercept`` (of ln-cnt at ln-rank 0) and ``r2``
    (caller nudge-rounds).
    """
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text), F.lit(""))), F.lit(TOKEN_REGEX), 0
    )
    counts = (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(int(top_k))
    ranked = top.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), F.asc("tok")))
        .cast("long")
        .alias("rank"),
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max(F.when(F.col("rank") == 1, F.col("cnt"))).cast("long").alias(
            "top1_cnt"
        ),
        F.sum("cnt").cast("long").alias("sum_cnt_topk"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    kd = F.col("k").cast("double")
    cov = kd * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = kd * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = kd * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(varx > 0, cov / varx)
    return m.select(
        "k",
        F.col("k").alias("n_top_tokens"),
        "top1_cnt",
        "sum_cnt_topk",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / kd).alias("intercept"),
        F.when((varx > 0) & (vary > 0), cov * cov / (varx * vary)).alias(
            "r2"
        ),
    )


def chao1_richness(df: DataFrame, text: str, slice_col: str) -> DataFrame:
    """Chao1 nonparametric vocabulary-richness estimator per slice
    (Chao 1984; the species-richness standard): how many DISTINCT
    tokens would this slice show at infinite sampling, from the
    frequency-of-frequencies of what we did see —

        chao1 = V + F1·(F1−1) / (2·(F2+1))

    (bias-corrected form, finite even when no token occurs exactly
    twice). The "is this source's vocabulary saturated or barely
    sampled" dial behind dedup/mixing decisions: chao1 ≈ V means
    diminishing novelty; chao1 ≫ V means keep crawling.

    ALL-INTEGER until the single closing division: V (distinct
    tokens), F1 (singletons), F2 (doubletons), n_tokens are exact
    BIGINTs from one groupBy(slice, token) — map-side combinable, the
    one token-keyed exchange — and chao1/coverage are single divisions
    of BIGINT products, bit-exact cross-engine (no nudge needed).
    ``coverage`` is the Good-Turing sample-coverage estimate
    1 − F1/n_tokens (Good 1953).

    Output: one row per slice — ``slice``, ``n_tokens``, ``vocab``,
    ``f1``, ``f2`` (BIGINTs), doubles ``chao1``, ``coverage``.
    """
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text), F.lit(""))), F.lit(TOKEN_REGEX), 0
    )
    cells = (
        df.select(F.col(slice_col).alias("slice"), F.explode(toks).alias("tok"))
        .groupBy("slice", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per = cells.groupBy("slice").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("f2"),
    )
    return per.select(
        "slice",
        "n_tokens",
        "vocab",
        "f1",
        "f2",
        (
            F.col("vocab").cast("double")
            + (F.col("f1") * (F.col("f1") - 1)).cast("double")
            / (2 * (F.col("f2") + 1)).cast("double")
        ).alias("chao1"),
        (
            F.lit(1.0)
            - F.col("f1").cast("double") / F.col("n_tokens").cast("double")
        ).alias("coverage"),
    )


def vocab_overlap(df: DataFrame, text: str, slice_col: str) -> DataFrame:
    """Pairwise vocabulary overlap between slices — Jaccard and
    Szymkiewicz–Simpson overlap coefficient on the DISTINCT-token sets
    of every slice pair. The cross-source redundancy map mixing
    decisions key on: near-1 Jaccard says two crawls cover the same
    language, near-0 says genuinely complementary vocabulary.

    ALL-INTEGER: per-slice vocab sizes and pair intersection counts are
    exact BIGINTs; jaccard = inter/(v_a + v_b − inter) and
    overlap = inter/min(v_a, v_b) are single divisions of BIGINTs —
    bit-exact cross-engine, no nudge needed.

    Scale: one groupBy(slice, token) distinct pass (token-keyed, the
    dedup exchange), then a TOKEN-KEYED self-equi-join restricted to
    slice_a < slice_b — at |slices| sources each token contributes at
    most |slices|²/2 pair rows, so the join output is
    vocab-size·O(|slices|²), never corpus-sized; slice sizes attach via
    broadcast (|slices| rows). No window anywhere. The distinct vocab
    table is consumed three times (sizes + both join sides), so it is
    PERSISTED — vocab-sized, not corpus-sized — to keep the corpus scan
    single; cache lifecycle is caller-owned (release via
    ``operators.cache.release_persisted_intermediates`` after the
    consuming action).
    """
    from featureextraction_spark.operators.cache import persist_tracked

    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text), F.lit(""))), F.lit(TOKEN_REGEX), 0
    )
    vocab = (
        df.select(F.col(slice_col).alias("slice"), F.explode(toks).alias("tok"))
        .distinct()
        .transform(persist_tracked)
    )
    sizes = vocab.groupBy("slice").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    a = vocab.select(F.col("slice").alias("slice_a"), "tok")
    b = vocab.select(F.col("slice").alias("slice_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("slice_a") < F.col("slice_b"))
        .groupBy("slice_a", "slice_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    out = (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("slice", "slice_a")
                        .withColumnRenamed("v", "v_a")),
            "slice_a",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("slice", "slice_b")
                        .withColumnRenamed("v", "v_b")),
            "slice_b",
        )
    )
    return out.select(
        "slice_a",
        "slice_b",
        "v_a",
        "v_b",
        "inter",
        (
            F.col("inter").cast("double")
            / (F.col("v_a") + F.col("v_b") - F.col("inter")).cast("double")
        ).alias("jaccard"),
        (
            F.col("inter").cast("double")
            / F.least("v_a", "v_b").cast("double")
        ).alias("overlap"),
    )
