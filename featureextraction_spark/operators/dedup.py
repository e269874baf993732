"""Deduplication for web-scale training-data pipelines.

Five strategies, all DataFrame-native (the scalable replacement for the
reference's all-pairs O(n²) pattern, ``src/training/statistics.py:17-25``):

- exact:        md5 fingerprint → hash groupBy. One shuffle.
- n-gram Jaccard: exact pairwise Jaccard restricted to pairs sharing a
                shingle (inverted-index join) — no cartesian product.
- MinHash+LSH:  shingle → portable minhash signature → banded bucket join →
                candidates → exact-Jaccard verification. Sub-quadratic;
                candidate recall tunable via (num_hashes, bands).
- SimHash:      64-bit sign-of-weighted-sum fingerprint; near-dups = equal
                band keys (hamming-adjacent buckets).
- embedding cosine: see ``operators/similarity.py`` (near_dup_pairs).

Hashing is md5-based so every intermediate is reproducible in DuckDB
(``('0x' || substr(md5(x),1,15))::BIGINT``) and pandas oracles — never
Spark's xxhash64, which nothing else can replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featureextraction_spark.operators.cache import persist_tracked

from featureextraction_spark.functions.textstats import fingerprint
from featureextraction_spark.plans.feature_pipeline import TOKEN_REGEX

# deterministic affine permutation constants for minhash: h_j(x) = (a_j*x + b_j) % P
MINHASH_PRIME = (1 << 61) - 1  # Mersenne prime
_A0, _B0 = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Seeded (a, b) pairs — deterministic, shared by engine and oracles."""
    params = []
    a, b = _A0, _B0
    for _ in range(num_hashes):
        a = (a * 6364136223846793005 + 1442695040888963407) % MINHASH_PRIME
        b = (b * 6364136223846793005 + 1442695040888963407) % MINHASH_PRIME
        params.append((a or 1, b))
    return params


def portable_hash60(col) -> F.Column:
    """60-bit integer hash: int(md5(x)[:15], 16). Reproducible in DuckDB,
    pandas (hashlib) and Spark — the cross-engine contract for all dedup
    hashing."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def char_shingles(df: DataFrame, id_col: str, text: str, n: int = 5) -> DataFrame:
    """Distinct character n-gram shingles per document: (id, shingle).

    Documents shorter than n characters produce zero shingles (and thus
    never appear in similarity pairs) — documented edge.
    """
    # explode integer positions, build each shingle string AFTER the
    # generate — exploding a pre-built string array folds the transform
    # into the generator (CollapseProject), re-evaluating the whole O(L)
    # substring transform per emitted element (O(L²) per doc); see
    # dup_ngram_fraction for the measured cost
    pos = df.select(
        F.col(id_col),
        F.col(text).alias("__t"),
        F.explode(
            F.when(
                F.length(text) >= n,
                F.expr(f"sequence(1, length({text}) - {n - 1})"),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__i"),
    )
    return pos.select(
        id_col, F.expr(f"substring(__t, __i, {n})").alias("shingle")
    ).distinct()


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint.

    Returns (id, canonical_id, group_size); canonical = min id per group.
    Single hash-shuffle on the 32-char fingerprint — at 100 TB this is one
    aggregation, no joins.
    """
    fp = df.select(F.col(id_col), fingerprint(text).alias("fp"))
    groups = fp.groupBy("fp").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return fp.join(groups, "fp").select(id_col, "canonical_id", "group_size")


def token_ngrams(
    df: DataFrame, id_col: str = "doc_id", text: str = "text", n: int = 3
) -> DataFrame:
    """One (id, ngram) row per token n-gram POSITION: lowercase whitespace
    tokens (``TOKEN_REGEX``), space-joined windows of ``n``. Documents with
    fewer than ``n`` tokens emit zero rows. Shared by ``dup_ngram_fraction``
    and the curation operators (decontamination, TF-IDF uses n=1).

    Positions are exploded as integers and the n-gram string is built in a
    post-generate projection — see the CollapseProject note below.
    """
    toks = df.select(
        F.col(id_col),
        F.regexp_extract_all(F.lower(F.col(text)), F.lit(TOKEN_REGEX), F.lit(0)).alias(
            "__toks"
        ),
    )
    # explode integer POSITIONS, then build each n-gram string in a
    # post-generate projection: exploding a pre-built string array lets
    # CollapseProject fold the whole transform/concat expression INTO the
    # generator, which re-evaluates it per emitted element (~17× slower
    # here); the position sequence is trivial to re-evaluate, and slice+
    # concat_ws then run exactly once per output row
    return toks.select(
        id_col,
        "__toks",
        F.explode(
            F.when(
                F.size("__toks") >= n,
                F.expr(f"sequence(1, size(__toks) - {n - 1})"),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__i"),
    ).select(
        id_col,
        F.concat_ws(" ", F.expr(f"slice(__toks, __i, {n})")).alias("ngram"),
    )


def dup_ngram_fraction(
    df: DataFrame, id_col: str = "doc_id", text: str = "text", n: int = 3
) -> DataFrame:
    """Per-document fraction of token n-gram POSITIONS whose n-gram also
    occurs in at least one OTHER document — the duplicated-text diagnostic
    behind substring-level training-data dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL'22: report/remove
    spans duplicated across documents). The reference has no analog; this
    extends the dedup family the same way winnow/simhash do.

    Returns (id, n_ngrams, dup_ngrams, dup_fraction): total n-gram
    positions, positions whose n-gram has cross-document frequency ≥ 2,
    and their ratio (NULL when the document has < n tokens).

    Scale design: positions are pre-aggregated per (doc, ngram) BEFORE any
    join (map-side combine), so the ngram-keyed join ships one row per
    distinct (doc, ngram) — a hot n-gram costs its distinct-doc count, not
    its total occurrence count. Two keyed shuffles (ngram, then id); all
    tokenization is JVM-side regexp, zero Python.
    """
    pos = token_ngrams(df, id_col=id_col, text=text, n=n)
    pc = pos.groupBy(id_col, "ngram").agg(F.count(F.lit(1)).alias("c"))
    dfs = pc.groupBy("ngram").agg(F.count(F.lit(1)).alias("doc_freq"))
    per = (
        pc.join(dfs, "ngram")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_ngrams"),
            F.sum(F.when(F.col("doc_freq") >= 2, F.col("c")).otherwise(F.lit(0))).alias(
                "dup_ngrams"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("dup_ngrams", F.lit(0)).cast("long").alias("dup_ngrams"),
            F.when(
                F.coalesce("n_ngrams", F.lit(0)) > 0,
                F.col("dup_ngrams").cast("double") / F.col("n_ngrams").cast("double"),
            ).alias("dup_fraction"),
        )
    )


def token_ngrams_pos(
    df: DataFrame, id_col: str = "doc_id", text: str = "text", n: int = 3
) -> DataFrame:
    """``token_ngrams`` with the 0-based token POSITION kept:
    (id, pos, ngram). Same positions-explode shape (the ngram string is
    built post-generate, once per row)."""
    toks = df.select(
        F.col(id_col),
        F.regexp_extract_all(F.lower(F.col(text)), F.lit(TOKEN_REGEX), F.lit(0)).alias(
            "__toks"
        ),
    )
    return toks.select(
        id_col,
        "__toks",
        F.explode(
            F.when(
                F.size("__toks") >= n,
                F.expr(f"sequence(1, size(__toks) - {n - 1})"),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__i"),
    ).select(
        id_col,
        (F.col("__i") - 1).cast("long").alias("pos"),
        F.concat_ws(" ", F.expr(f"slice(__toks, __i, {n})")).alias("ngram"),
    )


def _dup_gram_positions(
    df: DataFrame, id_col: str, text: str, n: int, min_df: int
) -> DataFrame:
    """(id, pos) of every token n-gram whose document frequency is ≥
    ``min_df`` — the shared discovery step of ``duplicated_spans`` and
    ``cut_duplicated_spans``. Doc frequencies aggregate from per-doc
    DISTINCT n-grams (map-side combine), positions come back through one
    ngram-keyed equi-join."""
    pos = token_ngrams_pos(df, id_col=id_col, text=text, n=n)
    dfs = (
        pos.select(id_col, "ngram")
        .distinct()
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("__ddf"))
        .filter(F.col("__ddf") >= min_df)
        .select("ngram")
    )
    return pos.join(dfs, "ngram").select(id_col, "pos")


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 4,
    min_df: int = 2,
) -> DataFrame:
    """Span-level exact substring dedup (Lee et al. ACL'22): for each
    document, the MAXIMAL runs of token positions whose ``n``-gram occurs
    in ≥ ``min_df`` distinct documents — the spans a substring-dedup pass
    would cut, as a (doc, span) table with token offsets.

    Returns (id, span_rank, start_tok, end_tok, span_tokens,
    n_dup_grams): ``[start_tok, end_tok)`` is the 0-based token interval
    covered by consecutive duplicated n-grams (end = last dup position +
    n), ``span_rank`` orders a document's spans, ``n_dup_grams`` counts
    the run's duplicated positions.

    Scale design: doc frequencies aggregate from per-doc DISTINCT n-grams
    (map-side combine; a hot boilerplate gram costs one row per doc);
    positions of duplicated grams come back through one ngram-keyed
    equi-join, and the run merge is the cumsum-island trick (pos −
    row_number is constant within a consecutive run) under a window
    PARTITIONED by document — no global window, two keyed shuffles total.
    """
    dup = _dup_gram_positions(df, id_col=id_col, text=text, n=n, min_df=min_df)
    w = Window.partitionBy(id_col).orderBy("pos")
    grp = dup.withColumn(
        "__grp", F.col("pos") - F.row_number().over(w)
    )
    spans = grp.groupBy(id_col, "__grp").agg(
        F.min("pos").alias("start_tok"),
        (F.max("pos") + n).alias("end_tok"),
        F.count(F.lit(1)).alias("n_dup_grams"),
    )
    wr = Window.partitionBy(id_col).orderBy("start_tok")
    return spans.select(
        id_col,
        F.row_number().over(wr).cast("long").alias("span_rank"),
        F.col("start_tok").cast("long"),
        F.col("end_tok").cast("long"),
        (F.col("end_tok") - F.col("start_tok")).cast("long").alias("span_tokens"),
        F.col("n_dup_grams").cast("long"),
    )


def cut_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 4,
    min_df: int = 2,
) -> DataFrame:
    """The APPLY step of span-level substring dedup (Lee et al. ACL'22):
    remove every token covered by a cross-document duplicated ``n``-gram
    run and reassemble the remaining tokens.

    A token at index ``t`` is cut iff some duplicated n-gram position
    ``p`` covers it (``p ≤ t < p + n`` — the union of the
    ``duplicated_spans`` intervals, which may overlap when dup positions
    are ``< n`` apart). Returns one row per document: (id, n_tokens,
    removed_tokens, clean_text). ``clean_text`` preserves original token
    CASE but normalizes inter-token whitespace to single spaces
    (tokenization is lossy by construction); duplicate discovery itself
    is case-insensitive, matching ``duplicated_spans``.

    Scale design: the discovery shuffles are ``_dup_gram_positions``'s
    (distinct-ngram doc frequency + one ngram join); duplicated positions
    merge into DISJOINT covered intervals with one lag window — two
    intervals [p1, p1+n) and [p2, p2+n) union into one run iff
    p2 ≤ p1 + n, the island trick on the positions themselves (no
    explode) — and each document collapses to one sorted interval array,
    so the final left join is doc-keyed. The cut rebuilds the kept tokens
    as a concatenation of ``slice``s of the token array BETWEEN the
    intervals: O(tokens + intervals) per document — linear even for a
    heavily-duplicated long document (the per-token ``array_contains``
    scan this replaces was O(tokens × removed)) — JVM expressions, zero
    Python.
    """
    toks = df.select(
        F.col(id_col),
        F.regexp_extract_all(F.col(text), F.lit(TOKEN_REGEX), F.lit(0)).alias(
            "__toks"
        ),
    )
    dup = _dup_gram_positions(df, id_col=id_col, text=text, n=n, min_df=min_df)
    wpos = Window.partitionBy(id_col).orderBy("pos")
    wcum = wpos.rowsBetween(Window.unboundedPreceding, 0)
    ivs = (
        dup.withColumn(
            "__new",
            F.when(
                F.col("pos") <= F.lag("pos").over(wpos) + n, F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn("__grp", F.sum("__new").over(wcum))
        .groupBy(id_col, "__grp")
        .agg(
            F.min("pos").cast("int").alias("s"),
            (F.max("pos") + n).cast("int").alias("e"),
        )
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("s", "e"))).alias("__ivs"))
    )
    cov = F.coalesce(
        F.col("__ivs"), F.expr("CAST(array() AS array<struct<s:int,e:int>>)")
    )
    # kept tokens = slices of __toks between the disjoint covered
    # intervals: gap starts = [0] ++ interval ends, gap ends = interval
    # starts ++ [n_tokens]
    starts = F.concat(F.array(F.lit(0)), F.transform(cov, lambda iv: iv["e"]))
    ends = F.concat(
        F.transform(cov, lambda iv: iv["s"]),
        F.array(F.size("__toks")),
    )
    kept = F.flatten(
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.slice(
                F.col("__toks"), s + F.lit(1), F.greatest(e - s, F.lit(0))
            ),
        )
    )
    return toks.join(ivs, id_col, "left").select(
        id_col,
        F.size("__toks").cast("long").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).cast("long").alias("removed_tokens"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


def _cap_shingle_df(sh: DataFrame, max_df: int) -> tuple[DataFrame, int]:
    """Drop shingles whose document frequency exceeds ``max_df``.

    Returns (filtered shingle table, number of dropped shingles). The
    per-shingle df aggregate has map-side combine; the filter join is an
    equi-join on the shingle key.
    """
    import logging

    dfs = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_")).transform(persist_tracked)
    n_dropped = dfs.filter(F.col("df_") > max_df).count()
    if n_dropped:
        logging.getLogger(__name__).info(
            "dropped %d stop-shingles with df > %d (recall contract: pairs "
            "sharing only stop-shingles are missed)",
            n_dropped,
            max_df,
        )
    keep = dfs.filter(F.col("df_") <= max_df).select("shingle")
    return sh.join(keep, "shingle"), n_dropped


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 5,
    threshold: float = 0.4,
    max_shingle_df: int | None = None,
    strategy: str = "auto",
    vocab_limit: int = 200_000,
    auto_max_shingle_df: int | None = 100_000,
) -> DataFrame:
    """EXACT n-gram Jaccard similar pairs; physical strategy auto-selected.

    - ``index``: inverted-index self-join — |A∩B| from the shingle join,
      |A∪B| = |A| + |B| − |A∩B|; only pairs sharing ≥1 shingle
      materialize. Right when the vocabulary is open (web text): hot keys
      guarded by ``max_shingle_df`` (drops stop-shingles; None = exact).
    - ``bitset``: encode each document over the distinct-shingle vocabulary
      as a bitset, popcount(AND) per block pair (``operators/blockpair``).
      Right when the vocabulary broadcasts (≲ ``vocab_limit``): the
      inverted index degenerates to Σ df² pair-rows there.
    - ``auto``: count the vocabulary (one cheap aggregate) and pick.

    ``max_shingle_df`` is applied BEFORE the strategy branch, so both
    physical strategies see the same (possibly stop-shingle-filtered)
    shingle table and return identical rows — the tests assert it.

    Recall contract of the hot-shingle cap: a shingle appearing in more
    than ``max_shingle_df`` documents stops contributing to |A∩B| (and to
    the per-doc set sizes), so reported Jaccard shifts slightly and pairs
    whose ONLY shared shingles are stop-shingles are missed. At web scale
    an uncapped stop-shingle appearing in d docs emits d²/2 join rows —
    quadratic in the hot key — so ``auto`` applies ``auto_max_shingle_df``
    whenever it routes an open-vocabulary corpus (> ``vocab_limit``
    distinct shingles) to the index path and no explicit cap was given;
    the number of dropped shingles is logged. Pass
    ``auto_max_shingle_df=None`` for exactness regardless of scale.
    """
    sh = char_shingles(df, id_col, text, n)
    capped_df = max_shingle_df
    if strategy in ("auto", "bitset"):
        from featureextraction_spark.operators.blockpair import (
            blocked_jaccard_pairs,
            shingle_vocab,
        )

        # persist the exploded shingles + vocabulary: every downstream
        # action (vocab count, positions, packing) reuses this lineage
        sh = sh.transform(persist_tracked)
        use_bitset = True
        dsh, n_vocab = None, None
        if strategy == "auto":
            dsh = sh.select("shingle").distinct().transform(persist_tracked)
            n_vocab = dsh.count()
            use_bitset = n_vocab <= vocab_limit
            if not use_bitset and capped_df is None:
                capped_df = auto_max_shingle_df
        if capped_df is not None:
            sh, _ = _cap_shingle_df(sh, capped_df)
            sh = sh.transform(persist_tracked)
            dsh, n_vocab = None, None  # vocabulary changed under the cap
        if use_bitset:
            if dsh is None:
                dsh = sh.select("shingle").distinct().transform(persist_tracked)
                n_vocab = dsh.count()
            vocab = shingle_vocab(dsh, assume_distinct=True, n_rows=n_vocab).transform(persist_tracked)
            return blocked_jaccard_pairs(
                sh, id_col=id_col, threshold=threshold, vocab=vocab, n_vocab=n_vocab
            )
    elif capped_df is not None:
        sh, _ = _cap_shingle_df(sh, capped_df)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))

    a = sh.select(F.col(id_col).alias("a_id"), "shingle")
    b = sh.select(F.col(id_col).alias("b_id"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a_id"), F.col("set_size").alias("a_size"))
    sb = sizes.select(F.col(id_col).alias("b_id"), F.col("set_size").alias("b_size"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("a_size") + F.col("b_size") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 5,
    num_hashes: int = 32,
    strategy: str = "auto",
    vocab_limit: int = 200_000,
    shingles: DataFrame | None = None,
    vocab: DataFrame | None = None,
    n_vocab: int | None = None,
    positions: DataFrame | None = None,
) -> DataFrame:
    """(id, sig: array<long>) — minhash over portable shingle hashes.

    Strategies (identical output, tested):
    - ``gather``: hash the distinct vocabulary once into a (V × k) matrix,
      broadcast it, and take per-document numpy column-mins over each
      document's vocabulary positions — one aggregation, no k× row blowup.
    - ``explode``: long form (doc, j, hv) → per-(doc, j) min with map-side
      combine; the open-vocabulary path.
    - ``auto``: count the vocabulary and pick.
    """
    from featureextraction_spark.operators.blockpair import (
        doc_positions,
        shingle_vocab,
    )

    spark = df.sparkSession
    params = spark.createDataFrame(
        [(j, a, b) for j, (a, b) in enumerate(minhash_params(num_hashes))],
        schema="j int, a long, b long",
    )
    sh = shingles if shingles is not None else char_shingles(df, id_col, text, n).transform(persist_tracked)
    if strategy == "auto":
        if n_vocab is None:
            n_vocab = (
                vocab.count()
                if vocab is not None
                else sh.select("shingle").distinct().count()
            )
        strategy = "gather" if n_vocab <= vocab_limit else "explode"
    # the explode path never needs dense vocabulary positions — building
    # them for an open vocabulary would be pure overhead
    if vocab is None and strategy == "gather":
        vocab = shingle_vocab(sh).transform(persist_tracked)
    distinct_sh = vocab if vocab is not None else sh.select("shingle").distinct()
    # hash the DISTINCT vocabulary once, never per (doc, shingle) instance:
    # (a*h + b) % P needs decimal(38) (60-bit h × 61-bit a overflows int64)
    # and md5 is not free — both costs now scale with |vocab|, not |corpus|
    vocab_hv = (
        distinct_sh.withColumn("h", portable_hash60(F.col("shingle")))
        .crossJoin(F.broadcast(params))
        .withColumn(
            "hv",
            (
                (F.col("h").cast("decimal(38,0)") * F.col("a").cast("decimal(38,0)")
                 + F.col("b").cast("decimal(38,0)"))
                % F.lit(MINHASH_PRIME).cast("decimal(38,0)")
            ).cast("long"),
        )
    )
    if strategy == "gather":
        # per-document numpy min-gather over the broadcast (V × k) matrix
        import numpy as np
        import pandas as pd

        hv_pdf = (
            vocab_hv.groupBy("__pos")
            .agg(F.array_sort(F.collect_list(F.struct("j", "hv"))).alias("__s"))
            .select("__pos", F.expr("transform(__s, x -> x.hv)").alias("hvs"))
            .orderBy("__pos")
            .toPandas()
        )
        mat = np.array(hv_pdf["hvs"].tolist(), dtype=np.int64)
        bmat = spark.sparkContext.broadcast(mat)
        pos = positions if positions is not None else doc_positions(sh, vocab, id_col)
        id_type = dict(pos.dtypes)[id_col]

        def kernel(batches):
            m = bmat.value
            for pdf in batches:
                sigs = [
                    m[np.asarray(poss, dtype=np.int64)].min(axis=0)
                    for poss in pdf["poss"]
                ]
                yield pd.DataFrame({id_col: pdf[id_col], "sig": sigs})

        return pos.mapInPandas(kernel, schema=f"{id_col} {id_type}, sig array<long>")

    exploded = (
        sh.join(
            vocab_hv.groupBy("shingle")
            .agg(F.array_sort(F.collect_list(F.struct("j", "hv"))).alias("__s"))
            .select("shingle", F.expr("transform(__s, x -> x.hv)").alias("hvs")),
            "shingle",
        )
        .select(id_col, F.posexplode("hvs").alias("j", "hv"))
    )
    return (
        exploded.groupBy(id_col, "j")
        .agg(F.min("hv").alias("mh"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("j", "mh"))).alias("__s"))
        .select(id_col, F.expr("transform(__s, x -> x.mh)").alias("sig"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.4,
    vocab_limit: int = 200_000,
    broadcast_limit_bytes: int = 64 << 20,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Bands of r = num_hashes/bands rows; docs colliding on any band's
    signature slice become candidates (equi-join on (band, slice-hash) —
    shuffle-friendly, no theta join); candidates are verified with exact
    n-gram Jaccard and filtered at ``threshold``. Output ⊆ exact pairs;
    recall governed by the (bands, r) S-curve.

    Verification strategy follows the vocabulary size (both produce
    identical pairs — tested):
    - closed vocabulary (≤ ``vocab_limit`` distinct shingles): per-doc
      bitsets + JVM popcount; the packed table is broadcast only when its
      estimated size fits ``broadcast_limit_bytes``, otherwise it joins
      by shuffle — the broadcast never grows with the corpus.
    - open vocabulary: candidate-restricted inverted-index join (bitsets
      would be ceil(V/64) words per document — unbounded).
    """
    from featureextraction_spark.operators.blockpair import shingle_vocab

    assert num_hashes % bands == 0
    r = num_hashes // bands
    from featureextraction_spark.operators.blockpair import doc_positions

    sh = char_shingles(df, id_col, text, n).transform(persist_tracked)
    dsh = sh.select("shingle").distinct().transform(persist_tracked)
    n_vocab = dsh.count()
    vocab = (
        shingle_vocab(dsh, assume_distinct=True, n_rows=n_vocab).transform(persist_tracked)
        if n_vocab <= vocab_limit
        else None
    )
    # per-doc vocabulary positions are shared by the signature gather AND
    # the bitset verification — compute the (broadcast-join + collect_set)
    # aggregation once
    pos = (
        doc_positions(sh, vocab, id_col).transform(persist_tracked) if vocab is not None else None
    )
    sig = minhash_signatures(
        df, id_col, text, n, num_hashes,
        shingles=sh, vocab=vocab, n_vocab=n_vocab, positions=pos,
    )
    # positions-explode (see char_shingles): slice once per output row
    banded = sig.select(
        id_col,
        "sig",
        F.explode(F.expr(f"sequence(0, {bands - 1})")).alias("band"),
    ).select(
        id_col, "band", F.expr(f"slice(sig, band * {r} + 1, {r})").alias("sl")
    )

    # join on a 64-bit hash of (band, slice) — cheaper to shuffle than the
    # slice arrays; a hash collision only adds a FALSE candidate, which the
    # exact verification below filters (correctness unaffected)
    keyed = banded.select(
        F.col(id_col), F.xxhash64("band", "sl").alias("bk")
    )
    a = keyed.select(F.col(id_col).alias("a_id"), "bk")
    b = keyed.select(F.col(id_col).alias("b_id"), "bk")
    cand = (
        a.join(b, "bk")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    # exact-Jaccard verification of the CANDIDATES ONLY — never the full
    # pair table
    if vocab is not None:
        # closed vocabulary: per-doc bitsets, popcount JVM-side
        # (O(|cand| · vocab/64) longs)
        from featureextraction_spark.operators.blockpair import (
            jaccard_from_bitsets,
            pack_bitsets,
        )

        packed = pack_bitsets(
            sh, id_col, vocab=vocab, n_vocab=n_vocab, positions=pos
        ).transform(persist_tracked)
        n_docs = packed.count()
        n_words = max((int(n_vocab) + 63) // 64, 1)
        # ~8 B/word payload + per-row array/offset overhead; broadcast only
        # when the whole packed table fits, else a plain shuffle join —
        # never let the broadcast grow with the corpus
        est_bytes = n_docs * (n_words * 8 + 48)
        hint = F.broadcast if est_bytes <= broadcast_limit_bytes else (lambda d: d)
        pa = packed.select(
            F.col(id_col).alias("a_id"), F.col("bits").alias("__ab"), F.col("sz").alias("__asz")
        )
        pb = packed.select(
            F.col(id_col).alias("b_id"), F.col("bits").alias("__bb"), F.col("sz").alias("__bsz")
        )
        return (
            cand.join(hint(pa), "a_id")
            .join(hint(pb), "b_id")
            .withColumn(
                "jaccard",
                jaccard_from_bitsets(
                    F.col("__ab"), F.col("__bb"), F.col("__asz"), F.col("__bsz")
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
        )
    return _verify_pairs_shingle_join(cand, sh, id_col, threshold)


def _verify_pairs_shingle_join(
    cand: DataFrame, sh: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact Jaccard for an explicit candidate-pair table via the shingle
    inverted index, restricted to the candidates (open-vocabulary
    verification: work is O(Σ |A| over candidate pairs), never df²)."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    sa = sh.select(F.col(id_col).alias("a_id"), "shingle")
    sb = sh.select(F.col(id_col).alias("b_id"), "shingle")
    inter = (
        cand.join(sa, "a_id")
        .join(sb, ["b_id", "shingle"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sizes.select(F.col(id_col).alias("a_id"), F.col("set_size").alias("a_size"))
    zb = sizes.select(F.col(id_col).alias("b_id"), F.col("set_size").alias("b_size"))
    return (
        inter.join(za, "a_id")
        .join(zb, "b_id")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("a_size") + F.col("b_size") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 5,
    bits: int = 60,
    strategy: str = "auto",
    vocab_limit: int = 200_000,
) -> DataFrame:
    """(id, simhash: long) — sign-of-summed-bit-votes over shingle hashes.

    Bit k of the fingerprint = majority vote of bit k across the document's
    shingle hashes (60-bit md5-derived — hence 60 fingerprint bits).

    Strategies (identical output, tested):
    - ``explode``: bit test → groupBy sum → reassemble; all JVM-side; the
      open-vocabulary path.
    - ``gemm``: per-bit ones-counts for ALL documents at once as one
      matmul — unpacked doc bitsets (``pack_bitsets``) × the vocabulary's
      60-bit matrix; right when the vocabulary broadcasts.
    - ``auto``: count the vocabulary and pick.
    """
    sh0 = char_shingles(df, id_col, text, n)
    if strategy in ("auto", "gemm"):
        from featureextraction_spark.operators.blockpair import shingle_vocab

        sh0 = sh0.transform(persist_tracked)
        dsh = sh0.select("shingle").distinct().transform(persist_tracked)
        n_vocab = dsh.count()
        if strategy == "gemm" or n_vocab <= vocab_limit:
            vocab = shingle_vocab(dsh, assume_distinct=True, n_rows=n_vocab).transform(persist_tracked)
            return _simhash_gemm(sh0, id_col, bits, vocab=vocab, n_vocab=n_vocab)
        strategy = "explode"
    sh = sh0.withColumn("h", portable_hash60(F.col("shingle")))
    # positions-explode (see char_shingles): the vote CASE runs once per
    # (doc, bit) row instead of re-building the whole 60-struct array
    bits_df = sh.select(
        id_col,
        "h",
        F.explode(F.expr(f"sequence(0, {bits - 1})")).alias("k"),
    ).select(
        id_col,
        "k",
        F.expr(
            "CASE WHEN (h div shiftleft(1L, k)) % 2 = 1 THEN 1 ELSE -1 END"
        ).alias("vote"),
    )
    votes = bits_df.groupBy(id_col, "k").agg(F.sum("vote").alias("v"))
    return (
        votes.withColumn(
            "bit",
            F.when(F.col("v") > 0, F.expr("shiftleft(1L, k)")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("bit").cast("long").alias("simhash"))
    )


def _simhash_gemm(
    shingles: DataFrame,
    id_col: str,
    bits: int,
    vocab: DataFrame | None = None,
    n_vocab: int | None = None,
) -> DataFrame:
    """SimHash via one ones-count matmul per doc block.

    votes[d, k] = 2 * ones[d, k] − n_shingles[d] where
    ones = (doc × vocab 0/1 matrix) @ (vocab × bits hash-bit matrix);
    the doc matrix comes from unpacking ``pack_bitsets`` bitsets, with the
    unpackbits byte/bit permutation mapped back to vocabulary positions.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from featureextraction_spark.operators.blockpair import pack_bitsets

    from featureextraction_spark.operators.blockpair import shingle_vocab

    if vocab is None:
        vocab = shingle_vocab(shingles).transform(persist_tracked)
    # vocabulary hash matrix, ordered EXACTLY like pack_bitsets positions
    # (sorted by shingle) — collected to the driver; gemm regime only
    vocab_pdf = (
        vocab.withColumn("h", portable_hash60(F.col("shingle")))
        .orderBy("__pos")
        .select("h")
        .toPandas()
    )
    h = vocab_pdf["h"].to_numpy(dtype=np.int64).astype(np.uint64)
    vocab_bits = ((h[:, None] >> np.arange(bits, dtype=np.uint64)[None, :]) & 1).astype(
        np.float32
    )  # (V, bits)
    n_vocab = len(h)
    n_words = (n_vocab + 63) // 64
    # unpackbits(int64-view bytes, bitorder='big') index for position p:
    # word w = p//64 contributes bytes little-endian, high bit first per byte
    p = np.arange(n_words * 64)
    unpack_idx = (p // 64) * 64 + ((p % 64) // 8) * 8 + (7 - (p % 8))
    V = np.zeros((n_words * 64, bits), dtype=np.float32)
    V[unpack_idx[:n_vocab]] = vocab_bits

    packed = pack_bitsets(shingles, id_col, vocab=vocab, n_vocab=n_vocab)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            bmat = np.array(pdf["bits"].tolist(), dtype=np.int64)
            unpacked = np.unpackbits(
                bmat.view(np.uint8), axis=-1
            ).astype(np.float32)  # (n, n_words*64)
            ones = unpacked @ V  # (n, bits)
            nsh = pdf["sz"].to_numpy(dtype=np.int64)
            votes = 2 * ones.astype(np.int64) - nsh[:, None]
            fp = (
                (votes > 0).astype(np.uint64)
                << np.arange(bits, dtype=np.uint64)[None, :]
            ).sum(axis=1)
            yield pd.DataFrame({id_col: ids, "simhash": fp.astype(np.int64)})

    id_type = dict(packed.dtypes)[id_col]
    return packed.mapInPandas(kernel, schema=f"{id_col} {id_type}, simhash long")


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 5,
    band_bits: int = 15,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 60-bit fingerprint into
    60/band_bits chunks (a pair within hamming distance d < #bands must
    collide on ≥1 band — pigeonhole); verify hamming ≤ max_hamming."""
    nbands = 60 // band_bits
    s = simhash(df, id_col, text, n)
    # positions-explode (see char_shingles): band key computed post-generate
    banded = s.select(
        id_col,
        "simhash",
        F.explode(F.expr(f"sequence(0, {nbands - 1})")).alias("band"),
    ).select(
        id_col,
        "simhash",
        "band",
        F.expr(
            f"(simhash div shiftleft(1L, band * {band_bits}))"
            f" % shiftleft(1L, {band_bits})"
        ).alias("key"),
    )
    a = banded.select(
        F.col(id_col).alias("a_id"), F.col("simhash").alias("a_sh"), "band", "key"
    )
    b = banded.select(
        F.col(id_col).alias("b_id"), F.col("simhash").alias("b_sh"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sh", "b_sh")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): the
    distinct minima of k-gram hashes over every ``window`` consecutive
    positions — the rolling-hash document signature that guarantees any
    shared substring of length >= k + window − 1 produces a shared
    fingerprint.

    Relational shape: positional k-grams (posexplode — NOT the distinct
    shingle set), portable 60-bit hash per position, per-doc window min
    over full windows, distinct (id, fingerprint). The only shuffle keys
    are ``id`` (window + distinct) — per-document windows, never global.
    Returns (id, fingerprint) rows.
    """
    from pyspark.sql import Window as W

    # positions-explode (see char_shingles): the k-gram string is built
    # once per output row, after the generate
    pos_sh = df.select(
        F.col(id_col),
        F.col(text).alias("__t"),
        F.explode(
            F.when(
                F.length(text) >= k,
                F.expr(f"sequence(1, length({text}) - {k - 1})"),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
    )
    hashed = pos_sh.select(
        id_col,
        "pos",
        portable_hash60(F.expr(f"substring(__t, pos, {k})")).alias("h"),
    )
    frame = W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    return (
        hashed.withColumn("__wmin", F.min("h").over(frame))
        .withColumn("__wlen", F.count(F.lit(1)).over(frame))
        .filter(F.col("__wlen") == window)  # full windows only
        .select(id_col, F.col("__wmin").alias("fingerprint"))
        .distinct()
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_key,
    id_col: str,
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95
    merge/purge): sort the corpus by a fuzzy key, emit every ordered
    pair within ``window`` positions — the classic linear-candidate
    alternative to LSH when near-duplicates share a sortable prefix.

    Candidate volume is n·window by construction (vs n² all-pairs).
    The global rank comes from the two-phase range-partitioned cumsum
    (:func:`..packing.with_global_cumsum` over unit weights — no
    single-partition window), and the neighborhood join is an equi-join
    on ``rank div window`` buckets: a pair within ``window`` positions
    spans at most two adjacent buckets, so each row joins its own and
    the next bucket only. One range exchange + one bucket-keyed
    equi-join at any scale.

    ``sort_key`` is a Column expression (e.g. a lowercased prefix);
    ties order by ``id_col`` so ranks are deterministic.
    """
    from featureextraction_spark.operators.packing import with_global_cumsum

    d = df.select(
        sort_key.alias("__k"),
        F.col(id_col).alias("__id"),
        F.lit(1).alias("__one"),
    )
    ranked = with_global_cumsum(
        d, ["__k", "__id"], "__one", out_col="__rank"
    ).select(
        "__id", "__k", F.col("__rank").cast("long").alias("__rank"),
        F.expr(f"__rank div {int(window)}").cast("long").alias("__b"),
    )
    left = ranked.select(
        F.col("__id").alias("a_id"), F.col("__k").alias("key_a"),
        F.col("__rank").alias("rank_a"), F.col("__b").alias("__jb"),
    )
    right = ranked.select(
        F.col("__id").alias("b_id"), F.col("__k").alias("key_b"),
        F.col("__rank").alias("rank_b"),
        F.explode(
            F.array(F.col("__b"), F.col("__b") - F.lit(1))
        ).alias("__jb"),
    )
    pairs = left.join(right, "__jb").where(
        (F.col("rank_b") - F.col("rank_a") >= 1)
        & (F.col("rank_b") - F.col("rank_a") <= F.lit(int(window)))
    )
    return pairs.select("a_id", "b_id", "rank_a", "rank_b", "key_a", "key_b")


def canonical_pick(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """The keep-one APPLY step after near-dup clustering: every document
    gets its cluster's canonical representative — the highest-``score_col``
    member (ties to the smallest id), singletons canonicalize to
    themselves. Downstream keeps ``is_canon = 1`` rows and rewrites
    references through ``canon_id``; this is the step that turns cluster
    STATISTICS into an actual deduplicated corpus (Lee et al. ACL'22
    keep-longest convention).

    ``clusters`` is :func:`..graph.dedup_clusters` output (doc_id,
    cluster_id, cluster_size) covering only documents that appear in
    near-dup pairs; the left join + coalesce folds the singleton
    majority back in without ever materializing their clusters.

    Scale: one id equi-join, one cluster-keyed rank-1 (map-side
    WindowGroupLimit — <=1 row per cluster per partition reaches the
    shuffle), one cluster-keyed join back. Window skew is the largest
    cluster, already bounded by the pair-generation caps upstream.
    """
    from pyspark.sql import Window

    full = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(score_col).alias("__score")
        )
        .join(
            clusters.select("doc_id", "cluster_id", "cluster_size"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias(
                "cluster_id"
            ),
            F.coalesce(F.col("cluster_size"), F.lit(1))
            .cast("long")
            .alias("cluster_size"),
            "__score",
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("__score").desc(), F.col("doc_id")
    )
    canon = (
        full.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("canon_id"))
    )
    return full.join(canon, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        "canon_id",
        (F.col("doc_id") == F.col("canon_id")).cast("long").alias("is_canon"),
    )
