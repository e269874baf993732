"""Edit-distance similarity self-join with q-gram prefix filtering.

The missing rung between exact dedup and token-level Jaccard: find all
pairs of strings within Levenshtein distance ``t`` WITHOUT the all-pairs
cross join. Standard public construction (Gravano VLDB'01 count filter;
Chaudhuri ICDE'06 / Xiao WWW'08 PPJoin prefix filter):

- ``t`` edits touch at most ``q·t`` of a string's positional q-grams, so
  ed(s1,s2) ≤ t ⟹ the occurrence-indexed gram multisets overlap in at
  least ``max(|G1|,|G2|) − q·t`` elements;
- under ANY canonical total order over gram elements, two multisets with
  that much overlap MUST intersect within their first ``q·t + 1``
  elements (prefix filter — complete, no false negatives);
- ordering elements by ascending global document frequency makes those
  prefixes the RAREST grams, so the candidate join's per-key fanout is
  bounded by rare-gram df, not vocabulary hotness.

Candidates then verify with one exact ``levenshtein`` call — an integer,
identical DP on every engine, so the whole output is hash-portable.

Scale design: one gram explode (L−q+1 rows per string), one gram-df agg,
one per-doc window for the prefix rank (doc-partitioned), an equi-join
ON THE RARE PREFIX ELEMENTS ONLY (the hot-gram blowup of a naive gram
join never materializes — completeness comes from the theorem, not from
joining every gram), and two id-keyed joins to fetch the texts for the
O(candidates) verify. Strings shorter than ``q`` produce no grams and
are excluded (document-length floor; at corpus scale short strings go
through exact dedup instead — documented, not hidden).

No reference counterpart; public similarity-join literature as cited.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cache import persist_tracked


def edit_distance_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """All (id1 < id2) pairs with levenshtein(text1, text2) ≤ ``max_dist``
    among strings of length ≥ ``q``; returns (id1, id2, dist, len1, len2).
    """
    prefix_len = q * max_dist + 1
    d = docs.select(
        F.col(id_col).alias("__id"),
        F.col(text).alias("__s"),
        F.length(text).cast("long").alias("__len"),
    ).where(F.length(text) >= q)

    grams = d.select(
        "__id",
        "__len",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, CAST(__len AS INT) - {q - 1}),"
                f" i -> substring(__s, i, {q}))"
            )
        ).alias("__pos", "gram"),
    )
    # ONE doc-keyed exchange serves both windows below: hash(id)
    # clusters (id, gram) too, so the occ window and the per-doc rank
    # window each add only a sort — without this the plan pays two full
    # shuffles of the gram table ((id, gram) then (id))
    grams = grams.repartition(F.col("__id"))
    # occurrence index makes duplicate grams distinct multiset elements
    occ_w = Window.partitionBy("__id", "gram").orderBy("__pos")
    grams = grams.withColumn("occ", F.row_number().over(occ_w).cast("long"))

    # df from the occ==1 rows (exactly one per (id, gram)) — no
    # count_distinct two-phase agg; the result is vocab-sized (≤ |Σ|^q),
    # persisted and broadcast when small so the grams table is never
    # re-shuffled on the hot gram key
    gram_df = (
        grams.where(F.col("occ") == 1)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("__df"))
        .transform(persist_tracked)
    )
    gdf = (
        F.broadcast(gram_df)
        if gram_df.count() <= 2_000_000
        else gram_df
    )
    ranked = grams.join(gdf, "gram").withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy("__id").orderBy("__df", "gram", "occ")
        ),
    )
    # prefix is tiny (prefix_len rows per doc) but its LINEAGE is the
    # full gram explode + two windows; the self-join below consumes it
    # twice and the verify path a third time — persist or the whole
    # upstream recomputes per consumer (profiled 22.7s → ~7s at sf0.1)
    prefix = (
        ranked.where(F.col("__rk") <= prefix_len)
        .select("gram", "occ", "__id", "__len")
        .transform(persist_tracked)
    )

    a = prefix.select(
        "gram", "occ", F.col("__id").alias("id1"), F.col("__len").alias("len1")
    )
    b = prefix.select(
        "gram", "occ", F.col("__id").alias("id2"), F.col("__len").alias("len2")
    )
    cand = (
        a.join(b, ["gram", "occ"])
        .where(
            (F.col("id1") < F.col("id2"))
            & (F.abs(F.col("len1") - F.col("len2")) <= max_dist)
        )
        .select("id1", "id2", "len1", "len2")
        .distinct()
    )

    t1 = d.select(F.col("__id").alias("id1"), F.col("__s").alias("__s1"))
    t2 = d.select(F.col("__id").alias("id2"), F.col("__s").alias("__s2"))
    return (
        cand.join(t1, "id1")
        .join(t2, "id2")
        .withColumn("dist", F.levenshtein("__s1", "__s2").cast("long"))
        .where(F.col("dist") <= max_dist)
        .select("id1", "id2", "dist", "len1", "len2")
    )


def link_score(
    pairs: DataFrame,
    left_attrs: DataFrame,
    right_attrs: DataFrame,
    id_col: str,
    exact_fields: list[tuple[str, int, int]],
    length_field: tuple[str, int, int, int] | None = None,
    threshold: int = 50,
) -> DataFrame:
    """Record-linkage scoring over candidate pairs — the decide step of
    the Fellegi–Sunter model (JASA 1969) with fixed integer agreement /
    disagreement weights standing in for the log-likelihood ratios
    (kept integer so the score is an exact BIGINT hash vehicle; real
    deployments fit the weights, the dataflow is identical).

    ``pairs`` carries (a_id, b_id) candidates (e.g. from
    :func:`..dedup.sorted_neighborhood_pairs`); attributes join on by
    two id equi-joins. ``exact_fields`` is (field, w_agree,
    w_disagree); ``length_field`` is (field, pct, w_agree, w_disagree)
    scoring agreement when |la−lb|·100 ≤ pct·min(la,lb) — integer
    arithmetic, no float ratio. NULL fields score the disagreement
    weight (conservative).

    Scale: candidates are n·w from blocking, attributes shuffle once
    per side on the id — never the corpus against itself.
    """
    la = left_attrs.select(
        F.col(id_col).alias("a_id"),
        *[F.col(f).alias(f"__a_{f}") for f, _, _ in exact_fields],
        *(
            [F.col(length_field[0]).alias(f"__a_{length_field[0]}")]
            if length_field
            else []
        ),
    )
    rb = right_attrs.select(
        F.col(id_col).alias("b_id"),
        *[F.col(f).alias(f"__b_{f}") for f, _, _ in exact_fields],
        *(
            [F.col(length_field[0]).alias(f"__b_{length_field[0]}")]
            if length_field
            else []
        ),
    )
    d = pairs.join(la, "a_id").join(rb, "b_id")
    score = F.lit(0)
    agree_cols = []
    for f, w_a, w_d in exact_fields:
        agree = (
            F.col(f"__a_{f}").isNotNull()
            & F.col(f"__b_{f}").isNotNull()
            & (F.col(f"__a_{f}") == F.col(f"__b_{f}"))
        )
        agree_cols.append(agree.cast("long").alias(f"agree_{f}"))
        score = score + F.when(agree, F.lit(w_a)).otherwise(F.lit(w_d))
    if length_field:
        f, pct, w_a, w_d = length_field
        a, b = F.col(f"__a_{f}").cast("long"), F.col(f"__b_{f}").cast("long")
        agree = (
            a.isNotNull()
            & b.isNotNull()
            & (F.abs(a - b) * 100 <= F.lit(int(pct)) * F.least(a, b))
        )
        agree_cols.append(agree.cast("long").alias(f"agree_{f}"))
        score = score + F.when(agree, F.lit(w_a)).otherwise(F.lit(w_d))
    return d.select(
        "a_id",
        "b_id",
        *agree_cols,
        score.cast("long").alias("score"),
        (score >= F.lit(int(threshold))).cast("long").alias("is_match"),
    )
