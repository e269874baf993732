"""Training-data curation operators: benchmark decontamination, domain
mixing, TF-IDF term profiling, exact group quantiles, and PII scrubbing.

These extend the training-data-pipeline family (dedup, quality, language
ID) with the remaining steps of a pre-training curation flow. The
reference has no analog — its pipeline stops at feature extraction; these
are the operations a 100-TB corpus pipeline runs before/alongside it.

Determinism contract (shared with the rest of the repo): every "random"
choice is a 60-bit md5 hash, every float is either an exact-rounded IEEE
expression over integers or explicitly rounded — so DuckDB replays every
operator bit-for-bit for the driver's hash gate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featureextraction_spark.operators.dedup import token_ngrams
from featureextraction_spark.operators.sampling import _seed_hash


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 3,
    threshold: float = 0.05,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination by token n-gram containment (the GPT-3 /
    PaLM eval-overlap check, arXiv:2005.14165 §C): for each training
    document, the fraction of its DISTINCT token n-grams that also appear
    anywhere in the eval/benchmark corpus.

    Returns one row per train document: (id, n_unique_ngrams, eval_hits,
    contamination, contaminated). Documents with < n tokens have zero
    n-grams, NULL contamination, and are never flagged.

    Scale design: benchmark corpora are small by definition, so the
    distinct eval n-gram set is broadcast (``broadcast_eval=True``) — the
    100-TB train side is never shuffled, just map-side joined after its
    per-doc distinct. Set ``broadcast_eval=False`` for an oversized eval
    set to fall back to an ngram-keyed shuffle join. Containment uses
    DISTINCT n-grams on both sides, so a hot n-gram costs one row per doc.
    """
    tr = token_ngrams(train, id_col=id_col, text=text, n=n).distinct()
    ev = (
        token_ngrams(eval_docs, id_col=id_col, text=text, n=n)
        .select("ngram")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    per = (
        tr.join(ev, "ngram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_unique_ngrams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("eval_hits"),
        )
    )
    # contamination = eval_hits / n_unique_ngrams: a ratio of small ints —
    # one correctly-rounded IEEE division, bit-identical in any engine
    return (
        train.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_unique_ngrams", F.lit(0)).cast("long").alias("n_unique_ngrams"),
            F.coalesce("eval_hits", F.lit(0)).cast("long").alias("eval_hits"),
            F.when(
                F.coalesce("n_unique_ngrams", F.lit(0)) > 0,
                F.col("eval_hits").cast("double")
                / F.col("n_unique_ngrams").cast("double"),
            ).alias("contamination"),
            # 0/1 long, not boolean: the driver's cross-engine value hash
            # has only ever been exercised on numeric/string columns
            F.coalesce(
                F.col("eval_hits").cast("double")
                / F.col("n_unique_ngrams").cast("double")
                >= F.lit(float(threshold)),
                F.lit(False),
            )
            .cast("long")
            .alias("contaminated"),
        )
    )


def domain_mix(
    df: DataFrame,
    weights: dict[str, float],
    total: int,
    domain: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic domain-mixture sampling: draw a ``total``-row sample
    whose per-domain quotas follow ``weights`` (the data-mixing step of
    every pre-training pipeline — e.g. The Pile / Dolma source weights).

    quota(d) = floor(total * w_d / Σw); within each domain the kept rows
    are the ``quota`` lowest by the 60-bit md5(id:seed) rank — the same
    content-addressed pseudo-randomness as ``hash_split``, so the sample
    is stable across runs/engines and adding new domains never reshuffles
    existing ones. Domains absent from ``weights`` are dropped; domains
    smaller than their quota contribute everything they have (documented:
    the realized total can undershoot).

    Returns (id, domain, sample_rank) with sample_rank ∈ [1, quota].

    Scale design: one hash-rank window per domain (single shuffle on the
    domain key); the quota table is a broadcast literal. Skewed domains
    are bounded by their quota — rank early-exits are handled by Spark's
    WindowGroupLimit pushdown for rank filters.
    """
    wsum = float(sum(weights.values()))
    rows = [
        (d, int(math.floor(total * w / wsum))) for d, w in sorted(weights.items())
    ]
    quotas = df.sparkSession.createDataFrame(rows, f"{domain} string, __quota long")
    w = Window.partitionBy(domain).orderBy(_seed_hash(id_col, seed), F.col(id_col))
    ranked = df.select(id_col, domain).withColumn(
        "sample_rank", F.row_number().over(w)
    )
    return (
        ranked.join(F.broadcast(quotas), domain)
        .filter(F.col("sample_rank") <= F.col("__quota"))
        .select(id_col, domain, F.col("sample_rank").cast("long"))
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    by: str = "source",
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per domain by TF-IDF — the corpus-profiling
    report behind domain-mix decisions (what IS src7, vocabulary-wise?).

    tf(d, t)  = total occurrences of term t in domain d;
    idf(t)    = (2N − 2df + 1) / (2df + 1)   [BM25's (N − df + ½)/(df + ½),
                scaled by 2 so both products are exact small integers];
    score     = tf · idf.

    The rational idf is chosen over log(N/df) deliberately: tf·(2N−2df+1)
    is an exact integer in float64 and the final division is one
    correctly-rounded IEEE op, so the score — and therefore the ranking —
    is bit-identical across engines (log differs by ULPs between libms,
    which can flip ranks on near-ties; the r2 ``feature_families`` flake
    was exactly this class of bug). Ties break on the term string.

    Scale design: tokens aggregate per (domain, term) map-side before the
    df join; doc frequencies aggregate per term from per-doc distincts.
    Two keyed shuffles + one rank window on the (small) domain-term table.
    """
    from featureextraction_spark.plans.feature_pipeline import TOKEN_REGEX

    # unigrams need no positional slice machinery — explode the token array
    # directly, carrying the domain column through the tokenization so no
    # extra join is needed
    toks = df.select(
        F.col(id_col),
        F.col(by),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text)), F.lit(TOKEN_REGEX), F.lit(0))
        ).alias("term"),
    )
    tf = toks.groupBy(by, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = (
        toks.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    n_docs = df.select(id_col).distinct().count()
    scored = tf.join(docfreq, "term").withColumn(
        "tfidf",
        F.col("tf").cast("double")
        * (F.lit(2.0 * n_docs) - F.lit(2.0) * F.col("doc_freq") + F.lit(1.0))
        / (F.lit(2.0) * F.col("doc_freq") + F.lit(1.0)),
    )
    w = Window.partitionBy(by).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            by,
            "term",
            F.col("tf").cast("long"),
            F.col("doc_freq").cast("long"),
            F.round("tfidf", 6).alias("tfidf"),
            F.col("rank").cast("long"),
        )
    )


def group_quantiles(
    df: DataFrame,
    value: str,
    by: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """EXACT per-group quantiles with linear interpolation (numpy's default
    / SQL ``quantile_cont`` semantics), computed sort-based rather than via
    ``approx_percentile`` — the length/score-distribution report behind
    corpus filtering thresholds.

    For each group of n rows sorted by value: pos = (n−1)·q,
    k = floor(pos), frac = pos − k, result = v[k] + (v[k+1] − v[k])·frac
    (0-indexed; v[k+1] clamps to v[n−1]). The expression shape is fixed so
    any engine evaluating the same doubles produces the same bits — the
    driver oracle replays it literally rather than calling the engine's
    own quantile (whose interpolation may differ by a ULP).

    Scale design: one rank window per group (single shuffle on the group
    key) + two broadcast joins of the tiny (group × quantile) probe table
    against the ranked rows. No full collect of any group — this is the
    distributed exact quantile, not a driver-side sort.
    """
    ranked = (
        df.select(F.col(by), F.col(value).cast("double").alias("__v"))
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy(by).orderBy("__v")),
        )
    )
    counts = ranked.groupBy(by).agg(F.count(F.lit(1)).alias("__n"))
    probes = (
        counts.withColumn(
            "q", F.explode(F.array(*[F.lit(float(q)) for q in quantiles]))
        )
        .withColumn("__pos", (F.col("__n") - F.lit(1)).cast("double") * F.col("q"))
        .withColumn("__k", F.floor("__pos").cast("long"))
        .withColumn("__frac", F.col("__pos") - F.col("__k").cast("double"))
        .withColumn(
            "__khi", F.least(F.col("__k") + F.lit(1), F.col("__n") - F.lit(1))
        )
    )
    lo = ranked.select(
        F.col(by).alias("__g_lo"),
        F.col("__rn").alias("__lo_rn"),
        F.col("__v").alias("__lo"),
    )
    hi = ranked.select(
        F.col(by).alias("__g_hi"),
        F.col("__rn").alias("__hi_rn"),
        F.col("__v").alias("__hi"),
    )
    out = (
        probes.join(
            lo,
            (F.col(by) == F.col("__g_lo")) & (F.col("__lo_rn") == F.col("__k") + 1),
        )
        .join(
            hi,
            (F.col(by) == F.col("__g_hi")) & (F.col("__hi_rn") == F.col("__khi") + 1),
        )
    )
    return out.select(
        by,
        "q",
        F.round(
            F.col("__lo") + (F.col("__hi") - F.col("__lo")) * F.col("__frac"), 6
        ).alias("quantile_value"),
        F.col("__n").cast("long").alias("n"),
    )


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    min_words: int = 3,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line/page cleaning (Raffel et al. 2020, arXiv:1910.10683
    §2.2): keep only lines that have ≥ ``min_words`` words, end in
    terminal punctuation, and don't mention "javascript"; flag pages
    containing "{" (code) or the "lorem ipsum" placeholder; a page
    survives iff it keeps ≥ ``min_kept_lines`` lines and has neither flag.

    Returns (id, n_lines, n_kept, has_brace, has_lorem, keep_doc,
    clean_text) — counts/flags as 0/1 longs for the cross-engine hash,
    clean_text the kept lines re-joined with \\n in original order.

    Scale design: the per-line pass is a higher-order ``filter`` over the
    split array — a single narrow JVM projection with NO explode, NO
    shuffle, NO Python; at 100 TB it fuses into the surrounding scan.
    Predicates stick to regex constructs Java and RE2 evaluate identically
    (explicit classes, no lookaround) so DuckDB replays the filter
    bit-for-bit.
    """
    from featureextraction_spark.plans.feature_pipeline import TOKEN_REGEX

    c = F.col(text)
    line_ok = lambda l: (  # noqa: E731 — HOF predicate, shared shape
        (F.regexp_count(l, F.lit(TOKEN_REGEX)) >= F.lit(int(min_words)))
        & F.trim(l).rlike('[.!?"]$')
        & ~F.lower(l).contains("javascript")
    )
    lines = F.split(c, "\n")
    kept = F.filter(lines, line_ok)
    n_kept = F.size(kept)
    has_brace = c.contains("{")
    has_lorem = F.lower(c).contains("lorem ipsum")
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        has_brace.cast("long").alias("has_brace"),
        has_lorem.cast("long").alias("has_lorem"),
        (
            (n_kept >= F.lit(int(min_kept_lines))) & ~has_brace & ~has_lorem
        )
        .cast("long")
        .alias("keep_doc"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


# PII patterns restricted to constructs Java regex and RE2 evaluate
# identically (no lookaround, explicit classes — same rule as
# textstats.BPE_ISH_REGEX). Counting happens on the ORIGINAL text;
# redaction applies email → ip → phone → long-number in that order so a
# category never eats another's placeholder.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PII_PHONE = r"\+[0-9][0-9 -]{7,}[0-9]"
PII_LONGNUM = r"[0-9]{9,}"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Rule-based PII detection + redaction: emails, IPv4 addresses,
    international-format phone numbers, and ≥9-digit ID-like runs are
    counted (on the original text) and replaced with typed placeholders —
    the standard scrubbing pass before corpus release (C4/Dolma-style
    regex scrubbing; no ML NER — rules only, so it is deterministic and
    engine-replayable).

    Returns (id, n_emails, n_ips, n_phones, n_longnums, clean_text).

    Scale design: pure JVM regexp expressions in one narrow projection —
    no shuffle, no Python; at 100 TB this is a map-only pass that fuses
    into whatever scan/filter surrounds it.
    """
    c = F.col(text)
    clean = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    clean = F.regexp_replace(clean, PII_IPV4, "<IP>")
    clean = F.regexp_replace(clean, PII_PHONE, "<PHONE>")
    clean = F.regexp_replace(clean, PII_LONGNUM, "<NUM>")
    return df.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(c, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count(c, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(c, F.lit(PII_LONGNUM)).cast("long").alias("n_longnums"),
        clean.alias("clean_text"),
    )


def dsir_weights(
    df: DataFrame,
    target,
    id_col: str = "doc_id",
    text: str = "text",
    buckets: int = 1024,
    quant: int = 1_000_000,
) -> DataFrame:
    """DSIR-style hashed-n-gram importance weights (Xie et al., NeurIPS
    2023 "Data Selection for Language Models via Importance Resampling"):
    featurize each document as a bag of word uni+bigrams hashed into
    ``buckets``, fit Laplace-smoothed bucket distributions on the
    ``target`` slice vs the rest ("raw"), and weight each document by how
    target-like its buckets are.

    Per document:
    - ``n_grams``      uni+bigram instances;
    - ``weight_q``     Σ over gram instances of the QUANTIZED probability
                       ratio ``((ct_b+1)·quant) div (cr_b+1)`` — all
                       integer, order-independent, bit-stable across
                       engines (the hash-gate vehicle);
    - ``ratio_score``  weight_q / (quant · n_grams) — mean quantized
                       target/raw count ratio, one exact division;
    - ``log_weight``   the paper's statistic: mean per-gram
                       log-likelihood ratio ln p̂_target(b) − ln p̂_raw(b)
                       with Laplace smoothing over ``buckets``. A
                       multi-term FLOAT sum — pytest-oracled with
                       tolerance, excluded from hash-compared queries.

    Scale design: bucket counts are ONE ``buckets``-sized aggregate
    (map-side combine collapses each partition to ≤ ``buckets`` rows);
    the per-doc score joins gram instances to that tiny table
    (broadcast) and rolls up by document — two doc/bucket-keyed
    shuffles, no Python. The doc→target flag join is doc-keyed and
    AQE-broadcastable.
    """
    flags = df.select(F.col(id_col), target.alias("__tgt"))
    grams = token_ngrams(df, id_col=id_col, text=text, n=1).unionByName(
        token_ngrams(df, id_col=id_col, text=text, n=2)
    )
    from featureextraction_spark.operators.dedup import portable_hash60

    b = grams.select(
        id_col, (portable_hash60(F.col("ngram")) % buckets).alias("__b")
    ).join(flags, id_col)
    counts = b.groupBy("__b").agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).cast("long").alias("__ct"),
        F.sum(F.when(F.col("__tgt"), 0).otherwise(1)).cast("long").alias("__cr"),
    )
    totals = counts.agg(
        F.coalesce(F.sum("__ct"), F.lit(0)).cast("long").alias("__Nt"),
        F.coalesce(F.sum("__cr"), F.lit(0)).cast("long").alias("__Nr"),
    )
    ratio_q = F.expr(f"(( __ct + 1) * {quant}) div (__cr + 1)")
    llr = (
        F.log((F.col("__ct") + 1).cast("double"))
        - F.log((F.col("__Nt") + F.lit(buckets)).cast("double"))
        - F.log((F.col("__cr") + 1).cast("double"))
        + F.log((F.col("__Nr") + F.lit(buckets)).cast("double"))
    )
    scored = (
        b.join(F.broadcast(counts), "__b")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(ratio_q).cast("long").alias("weight_q"),
            F.sum(llr).alias("__sumllr"),
        )
    )
    return scored.select(
        id_col,
        "n_grams",
        "weight_q",
        (
            F.col("weight_q").cast("double") / (F.col("n_grams") * F.lit(quant))
        ).alias("ratio_score"),
        (F.col("__sumllr") / F.col("n_grams")).alias("log_weight"),
    )


def quota_sample(
    df: DataFrame,
    budget_tokens: int,
    group: str = "source",
    id_col: str = "doc_id",
    text: str = "text",
    salt: str = "42",
) -> DataFrame:
    """Deterministic per-group token-budget sampling — the data-mixing
    step that turns target mixture token counts into a concrete document
    subset: within each ``group`` (domain/source), walk documents in a
    deterministic pseudo-random order (the md5 60-bit uniform used by
    ``hash_split``/``domain_mix``, salted + tie-broken by ``id_col``) and
    keep each document whose running token total BEFORE it is still
    under ``budget_tokens`` — so the budget-crossing document is
    admitted and every non-empty group yields at least one document,
    matching the usual "take until the quota is exceeded" mixing rule.

    Output per kept document: (id_col, group, n_tokens, u, cum_tokens)
    where ``cum_tokens`` is the inclusive running total in sample order.

    Scale design: one shuffle (the per-group ordered window). The running
    sum is a prefix aggregate, so a mega-group does NOT need a single
    partition at 100 TB: swap the window for the two-phase
    repartitionByRange + per-partition-offset global cumsum used by
    ``packing.with_global_cumsum`` keyed by (group, u) — the per-group
    offsets are one ≤n_partitions-row driver exchange. The window form
    is kept here because it is the plan Catalyst can reason about and
    group cardinality ≪ partition budget at test scale.
    """
    from featureextraction_spark.functions.textstats import token_count
    from featureextraction_spark.operators.sampling import _seed_hash

    u = _seed_hash(id_col, int(salt)).cast("double") / F.lit(float(1 << 60))
    d = df.select(
        id_col,
        F.col(group).alias(group),
        token_count(text).alias("n_tokens"),
        u.alias("u"),
    )
    w = (
        Window.partitionBy(group)
        .orderBy("u", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return d.filter(
        (F.col("cum_tokens") - F.col("n_tokens")) < F.lit(budget_tokens)
    )


def vocab_coverage(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    top_k: int = 1000,
) -> DataFrame:
    """Per-document OOV rate against the corpus's own top-``top_k`` vocab.

    The tokenizer-coverage screen a training pipeline runs before
    committing to a vocabulary size: build the top-k vocabulary by total
    corpus frequency (ties broken by term, ascending — a total order, so
    the k-boundary is engine-stable), then score every document by the
    fraction of its token OCCURRENCES that fall outside it.

    Returns (id, n_tokens, oov_tokens, oov_rate): exact longs plus one
    integer÷integer division the caller nudge-rounds.

    Scale design: tokenization is the corpus-wide explode every lexical
    operator here pays (same lowercased whitespace contract as
    ``tfidf_top_terms`` / ``unigram_lm``); term counting is one
    map-side-combinable groupBy; top-k selection is
    ``TakeOrderedAndProject`` (distributed heap per partition, k rows to
    the driver — never a full sort); membership is a BROADCAST join of a
    k-row vocabulary. The big side shuffles once (the per-doc count-back),
    on the document id.

    Public-practice analog: SentencePiece/BPE vocabulary-coverage reports;
    no reference counterpart.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text), F.lit(""))),
                F.lit("[^ \\t\\n\\r\\f\\u000B]+"),
                F.lit(0),
            )
        ).alias("term"),
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.desc("__cnt"), F.asc("term"))
        .limit(int(top_k))
        .select("term", F.lit(1).alias("__in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("oov_tokens"),
        )
    )
    # documents with zero tokens never appear in toks — restore them
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("oov_tokens"), F.lit(0)).cast("long").alias("oov_tokens"),
            F.when(
                F.col("n_tokens") > 0,
                F.col("oov_tokens").cast("double") / F.col("n_tokens").cast("double"),
            ).alias("oov_rate"),
        )
    )


def tokenize_to_ids(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    top_k: int = 500,
    oov_id: int = -1,
) -> DataFrame:
    """Tokenizer APPLY: map every token occurrence to its vocabulary id.

    The id-ification step between curation and training: vocabulary =
    top-``top_k`` terms by total corpus frequency (ties term-ascending —
    the ``vocab_coverage`` boundary contract), ids 0..k−1 in that rank
    order, everything else ``oov_id``. Output is fully relational —
    one row per (doc, position, term, token_id) with 0-based positions
    from ``posexplode`` — so any SQL engine can replay it (no array
    columns in the contract).

    Scale design: same as ``vocab_coverage`` — TakeOrdered top-k (never
    a full sort), k-row BROADCAST join; the corpus-wide explode is the
    price of any lexical operator and shuffles only for the final
    (doc-keyed) consumers downstream.
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text), F.lit(""))),
                F.lit("[^ \\t\\n\\r\\f\\u000B]+"),
                F.lit(0),
            )
        ).alias("pos", "term"),
    )
    vocab = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.coalesce(F.col(text), F.lit(""))),
                    F.lit("[^ \\t\\n\\r\\f\\u000B]+"),
                    F.lit(0),
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.desc("__cnt"), F.asc("term"))
        .limit(int(top_k))
    )
    w = Window.orderBy(F.desc("__cnt"), F.asc("term"))
    vocab_ids = vocab.select(
        "term", (F.row_number().over(w) - 1).cast("long").alias("__vid")
    )
    return toks.join(F.broadcast(vocab_ids), "term", "left").select(
        id_col,
        F.col("pos").cast("long").alias("pos"),
        "term",
        F.coalesce(F.col("__vid"), F.lit(int(oov_id))).cast("long").alias("token_id"),
    )


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive: str,
    k: int = 5,
    l_div: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit per quasi-identifier group
    (Sweeney 2002; Machanavajjhala et al. 2006) — the release-safety
    check run before publishing a training corpus with demographic-ish
    columns: every QI combination must hide among ≥ k rows (k_ok) and
    carry ≥ l distinct sensitive values (l_ok), else it re-identifies
    or attribute-discloses.

    One map-side-combinable groupBy on the QI columns; the distinct
    count shuffles (qi, sensitive) once. Output is QI-cardinality
    sized, integer flags as hash vehicles.
    """
    g = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("grp_n"),
        F.countDistinct(sensitive).cast("long").alias("n_sensitive"),
    )
    return g.select(
        *qi_cols,
        "grp_n",
        "n_sensitive",
        (F.col("grp_n") >= int(k)).cast("long").alias("k_ok"),
        (F.col("n_sensitive") >= int(l_div)).cast("long").alias("l_ok"),
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive: str,
    l_min: int = 2,
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. ICDE'06) —
    the follow-up k-anonymity (:func:`k_anonymity_audit`) needs: a
    k-anonymous equivalence class still leaks if every member shares
    the same SENSITIVE value, so each class must carry at least l
    distinct sensitive values.

    Output: one row per equivalence class — the quasi columns, ``n``
    (class size), ``l_distinct`` (distinct sensitive values) and the
    ``diverse`` flag (l_distinct ≥ l_min) — ALL integers/booleans,
    bit-exact by construction.

    Scale: ONE groupBy over the quasi key computing count +
    count_distinct(sensitive) — the distinct is per-group over the
    sensitive alphabet (map-side partials), the same single exchange
    the k-anonymity audit pays. Release-gating joins on the class key
    then use only ``diverse``.
    """
    qs = [F.col(c) for c in quasi_cols]
    per = df.groupBy(*qs).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct(F.col(sensitive)).cast("long").alias("l_distinct"),
    )
    return per.select(
        *quasi_cols,
        "n",
        "l_distinct",
        (F.col("l_distinct") >= F.lit(int(l_min))).alias("diverse"),
    )


def temperature_mix(
    df: DataFrame,
    group: str,
    tau: float = 0.7,
) -> DataFrame:
    """Temperature-scaled sampling mix over sources — the multilingual
    / multi-source pre-training standard (XLM-R, Conneau et al. ACL'20;
    mT5): sampling share p_g ∝ n_g^τ flattens the natural mix toward
    uniform as τ → 0 (τ = 1 recovers proportional, the
    :func:`domain_mix` share). ``boost = p_g/q_g`` is the per-source
    up/down-sampling factor a weighted sampler applies.

    ``n_g`` ships as the exact BIGINT vehicle; ``pow(n, τ)`` is one
    libm call per group and the ≤|groups|-term normalizer rides the
    shared nudge (the :func:`..sampling.balance_weights` precedent).

    Scale: ONE map-side-combinable groupBy(group); the normalizer is a
    1-row aggregate of the bounded group table joined back broadcast.
    """
    per = df.groupBy(F.col(group).alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    per = per.select(
        "group",
        "n",
        F.pow(F.col("n").cast("double"), F.lit(float(tau))).alias("__w"),
    )
    tot = per.agg(
        F.sum("__w").alias("__wsum"),
        F.sum("n").cast("long").alias("__ntot"),
    )
    out = per.crossJoin(F.broadcast(tot))
    p = F.col("__w") / F.col("__wsum")
    q = F.col("n").cast("double") / F.col("__ntot").cast("double")
    return out.select(
        "group",
        "n",
        p.alias("p_sample"),
        q.alias("p_natural"),
        (p / q).alias("boost"),
    )
