"""Feature selection — χ² term/label association over a document corpus.

The classic filter-method feature selector (Yang & Pedersen ICML'97,
public knowledge): for each term t and a binary document label, build
the 2×2 presence contingency

        label=1   label=0
  t      a         b
  ¬t     c         d          (c = n1 − a, d = n0 − b, N = n1 + n0)

and score χ²(t) = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)).

Bit-portability contract: a, b, c, d are exact BIGINT counts; the
numerator N·(ad−bc)² and the denominator product are computed entirely
in BIGINT (int64 budget: |ad−bc| ≤ N²/4 so the numerator peaks at
N⁵/16 — exact up to N ≈ 10⁴ documents per evaluation scope in the
worst case; above that, evaluate per shard/stratum and keep the exact
a/b/c/d cells, which stay int64 to N ≈ 2³¹, recomputing the score on
the merged cells), so the score is ONE IEEE division of two exact
integers — Spark and DuckDB agree bit-for-bit before the shared nudged
rounding.

Scale design: term presence is one explode + distinct (doc-partitioned,
map-side combinable), the contingency is one groupBy onto the VOCABULARY
(not the corpus), and the two class totals ride in via a 1-row broadcast
— the corpus is shuffled once, as aggregation partials. ``min_df``
prunes the long hapax tail before the score is evaluated.

No reference counterpart (the reference has no text pipeline); cited
public literature only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[^ \\t\\n\\r\\f\\u000B]+"


def chi2_terms(
    docs: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text: str = "text",
    min_df: int = 5,
) -> DataFrame:
    """(term, df_pos, df_neg, chi2_q) for every term with document
    frequency ≥ ``min_df``; ``label`` must evaluate to 0/1 per document.

    ``df_pos``/``df_neg`` are the a/b cells (docs of each class
    CONTAINING the term); chi2_q is the χ² score through the shared
    round-6 nudge (0 when any marginal is empty — the degenerate
    always/never terms carry no signal).
    """
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.col(text).alias("__text"),
        label.cast("long").alias("__y"),
    )
    totals = base.agg(
        F.sum("__y").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("__y")).cast("long").alias("n0"),
    )
    presence = (
        base.select(
            "__id",
            "__y",
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(
                        F.lower(F.coalesce(F.col("__text"), F.lit(""))),
                        F.lit(TOKEN_RE),
                        F.lit(0),
                    )
                )
            ).alias("term"),
        )
    )
    cells = presence.groupBy("term").agg(
        F.sum("__y").cast("long").alias("a"),
        F.sum(F.lit(1) - F.col("__y")).cast("long").alias("b"),
    )
    scored = (
        cells.where(F.col("a") + F.col("b") >= min_df)
        .join(F.broadcast(totals))
        .withColumn("c", (F.col("n1") - F.col("a")).cast("long"))
        .withColumn("d", (F.col("n0") - F.col("b")).cast("long"))
        .withColumn(
            "__adbc",
            (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast("long"),
        )
        .withColumn(
            "__den",
            (
                (F.col("a") + F.col("b"))
                * (F.col("c") + F.col("d"))
                * (F.col("a") + F.col("c"))
                * (F.col("b") + F.col("d"))
            ).cast("long"),
        )
        .withColumn(
            "__num",
            (
                (F.col("n1") + F.col("n0")) * F.col("__adbc") * F.col("__adbc")
            ).cast("long"),
        )
    )
    chi2 = F.when(F.col("__den") == 0, F.lit(0.0)).otherwise(
        F.col("__num").cast("double") / F.col("__den").cast("double")
    )
    return scored.select(
        "term",
        F.col("a").alias("df_pos"),
        F.col("b").alias("df_neg"),
        F.round(chi2 + F.lit(1e-9), 6).alias("chi2_q"),
    )


def vocab_prefix(
    docs: DataFrame,
    text: str = "text",
    coverage_num: int = 95,
    coverage_den: int = 100,
) -> DataFrame:
    """The minimal frequency-ranked vocabulary prefix covering at least
    ``coverage_num/coverage_den`` of the corpus token mass — the
    tokenizer-vocabulary pruning cut (keep the terms; everything else
    becomes <unk>).

    Terms are ordered by (count DESC, term ASC); a term is kept iff the
    token mass STRICTLY BEFORE it is below the target, which keeps
    exactly the minimal covering prefix. Returns (term, cnt, cum) with
    ``cum`` the inclusive running mass, so the consumer reads the final
    row's ``cum/total`` as the achieved coverage.

    Bit-portability: counts, cumulative sums, and the threshold
    comparison ``cum_before · den < num · total`` are all BIGINT — no
    float enters the cut (int64 budget: token mass ≤ 2⁶³/den).

    Scale design: one explode + term groupBy (map-side combinable) onto
    the vocabulary; the running mass is
    :func:`..packing.with_global_cumsum`'s two-phase range-partitioned
    prefix sum — no single-partition window anywhere, so the rank
    survives a vocabulary that does not fit one task. The corpus total
    rides in as a 1-row broadcast.
    """
    from .packing import with_global_cumsum

    counts = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.coalesce(F.col(text), F.lit(""))),
                    F.lit(TOKEN_RE),
                    F.lit(0),
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("__total"))
    cum = with_global_cumsum(
        counts,
        [F.col("cnt").desc(), F.col("term").asc()],
        "cnt",
        out_col="__before",
        n_rows=counts.count(),
    )
    return (
        cum.join(F.broadcast(total))
        .where(
            F.col("__before") * F.lit(coverage_den)
            < F.lit(coverage_num) * F.col("__total")
        )
        .select(
            "term",
            "cnt",
            (F.col("__before") + F.col("cnt")).cast("long").alias("cum"),
        )
    )
