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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featureextraction_spark.functions.textstats import fingerprint

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
    shingles = F.when(
        F.length(text) >= n,
        F.expr(
            f"transform(sequence(1, length({text}) - {n - 1}),"
            f" i -> substring({text}, i, {n}))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(id_col, F.explode(shingles).alias("shingle")).distinct()


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


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 5,
    threshold: float = 0.4,
    max_shingle_df: int | None = None,
    strategy: str = "auto",
    vocab_limit: int = 200_000,
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

    Both strategies return identical rows — the tests assert it.
    """
    sh = char_shingles(df, id_col, text, n)
    if strategy == "auto":
        n_vocab = sh.select("shingle").distinct().count()
        strategy = "bitset" if n_vocab <= vocab_limit else "index"
    if strategy == "bitset":
        from featureextraction_spark.operators.blockpair import blocked_jaccard_pairs

        return blocked_jaccard_pairs(
            sh, id_col=id_col, threshold=threshold
        )
    if max_shingle_df is not None:
        keep = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_")).filter(
            F.col("df_") <= max_shingle_df
        )
        sh = sh.join(keep.select("shingle"), "shingle")
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
) -> DataFrame:
    """(id, sig: array<long>) — minhash over portable shingle hashes.

    Long form (one row per shingle) → cross the tiny hash-param table →
    per-(doc, j) min — Spark's partial aggregation does the map-side
    combine; no UDF.
    """
    spark = df.sparkSession
    params = spark.createDataFrame(
        [(j, a, b) for j, (a, b) in enumerate(minhash_params(num_hashes))],
        schema="j int, a long, b long",
    )
    sh = char_shingles(df, id_col, text, n).withColumn(
        "h", portable_hash60(F.col("shingle"))
    )
    # (a*h + b) % P in embedded-integer arithmetic: 60-bit h × 61-bit a
    # overflows int64, so do the multiply in decimal(38) then mod.
    hashed = (
        sh.crossJoin(F.broadcast(params))
        .withColumn(
            "hv",
            (
                (F.col("h").cast("decimal(38,0)") * F.col("a").cast("decimal(38,0)")
                 + F.col("b").cast("decimal(38,0)"))
                % F.lit(MINHASH_PRIME).cast("decimal(38,0)")
            ).cast("long"),
        )
    )
    return (
        hashed.groupBy(id_col, "j")
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
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Bands of r = num_hashes/bands rows; docs colliding on any band's
    signature slice become candidates (equi-join on (band, slice-hash) —
    shuffle-friendly, no theta join); candidates are verified with exact
    n-gram Jaccard and filtered at ``threshold``. Output ⊆ exact pairs;
    recall governed by the (bands, r) S-curve.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(df, id_col, text, n, num_hashes)
    banded = sig.select(
        id_col,
        "sig",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> struct(b as band, slice(sig, b * {r} + 1, {r}) as sl))"
            )
        ).alias("bs"),
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sl").alias("sl"))

    a = banded.select(F.col(id_col).alias("a_id"), "band", "sl")
    b = banded.select(F.col(id_col).alias("b_id"), "band", "sl")
    cand = (
        a.join(b, ["band", "sl"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    # exact-Jaccard verification of the CANDIDATES ONLY — never the full
    # pair table: join each candidate to the two docs' vocabulary BITSETS
    # and popcount the intersection JVM-side (O(|cand| · vocab/64) longs;
    # the packed table is one small row per doc, broadcast when it fits)
    from featureextraction_spark.operators.blockpair import (
        jaccard_from_bitsets,
        pack_bitsets,
    )

    packed = pack_bitsets(char_shingles(df, id_col, text, n), id_col)
    pa = packed.select(
        F.col(id_col).alias("a_id"), F.col("bits").alias("__ab"), F.col("sz").alias("__asz")
    )
    pb = packed.select(
        F.col(id_col).alias("b_id"), F.col("bits").alias("__bb"), F.col("sz").alias("__bsz")
    )
    return (
        cand.join(pa, "a_id")
        .join(pb, "b_id")
        .withColumn(
            "jaccard",
            jaccard_from_bitsets(
                F.col("__ab"), F.col("__bb"), F.col("__asz"), F.col("__bsz")
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text: str = "text", n: int = 5, bits: int = 60
) -> DataFrame:
    """(id, simhash: long) — sign-of-summed-bit-votes over shingle hashes.

    Bit k of the fingerprint = majority vote of bit k across the document's
    shingle hashes (60-bit md5-derived — hence 60 fingerprint bits).
    Expressed as explode → bit test → groupBy sum → reassemble; all
    JVM-side.
    """
    sh = char_shingles(df, id_col, text, n).withColumn(
        "h", portable_hash60(F.col("shingle"))
    )
    bits_df = sh.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bits - 1}),"
                f" k -> struct(k as k, CASE WHEN (h div shiftleft(1L, k)) % 2 = 1"
                f" THEN 1 ELSE -1 END as vote))"
            )
        ).alias("bv"),
    ).select(id_col, F.col("bv.k").alias("k"), F.col("bv.vote").alias("vote"))
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
    banded = s.select(
        id_col,
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {nbands - 1}),"
                f" b -> struct(b as band,"
                f" (simhash div shiftleft(1L, b * {band_bits})) % shiftleft(1L, {band_bits}) as key))"
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
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
