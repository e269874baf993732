"""TextRank keyword scores — fixed-iteration integer PageRank over the
token co-occurrence graph.

TextRank (Mihalcea & Tarau, EMNLP 2004, public knowledge) ranks corpus
terms by running PageRank on the graph whose nodes are terms and whose
edges connect ADJACENT tokens, weighted by corpus-wide co-occurrence
count. This is the engine's representative ITERATIVE graph algorithm on
weighted edges (connected components covers the unweighted/propagation
family): the power iteration is unrolled a fixed ``iterations`` times as
plain join+aggregate rounds — the classic DataFrame formulation of
Pregel-style iteration, no RDDs, no driver loop over data.

Bit-portability: the float PageRank update
``r' = 0.15 + 0.85·Σ r(u)·w(u,v)/W(u)`` is replayed in SCALED INTEGERS —
ranks carry a 10⁶ fixed-point scale, each transfer is ONE integer
multiply + ONE integer division ``(q·w) div W``, and the damping step is
``150000 + (85·Σ) div 100``. Every intermediate is BIGINT, so Spark and
DuckDB (unrolled CTEs) produce identical bits — no float accumulation
order anywhere. int64 budget: total mass stays ≤ n·10⁶ (division only
loses mass); a single transfer peaks at q·w ≤ (n·10⁶)·w — with a 10⁶
vocabulary and 10⁸-count hot edges that is ~10¹⁴·10⁸ > 2⁶³, so at that
extreme drop the scale to 10³; documented contract, not a silent wrap.

Scale design: edges are one map-side-combinable groupBy onto the
(term, next-term) vocabulary — bounded by distinct adjacent PAIRS, not
corpus size; each iteration is one broadcast-or-shuffle equi-join of the
rank table (|V| rows) against the edge table (|E| rows) plus one groupBy
onto |V| — the same shape GraphX's Pregel compiles to. ``iterations`` is
fixed and small (TextRank converges in tens of rounds; rankings
stabilize much earlier), so the lineage stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TR_SCALE = 1_000_000
TR_BASE = 150_000  # 0.15 · SCALE
TR_DAMP_NUM, TR_DAMP_DEN = 85, 100


def cooccurrence_edges(
    docs: DataFrame, text: str = "text", min_weight: int = 1
) -> DataFrame:
    """Undirected adjacent-token co-occurrence graph: one row per
    DIRECTED (src, dst) with ``weight`` = number of adjacencies in the
    corpus (both directions emitted, so the rank update can treat edges
    as out-links). Tokenization is the repo's portable single-space
    normalize + split, lowercased."""
    toks = F.filter(
        F.split(
            F.lower(
                F.trim(
                    F.regexp_replace(F.col(text), "[ \\t\\n\\r\\f\\u000B]+", " ")
                )
            ),
            " ",
        ),
        lambda t: t != "",
    )
    t = docs.select(toks.alias("__toks")).where(F.size("__toks") >= 2)
    pairs = t.select(
        F.explode(
            F.zip_with(
                F.slice("__toks", 1, F.size("__toks") - 1),
                F.slice("__toks", 2, F.size("__toks") - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("__p")
    ).select(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
    und = pairs.where(F.col("a") != F.col("b"))
    both = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return (
        both.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
        .where(F.col("weight") >= min_weight)
    )


def textrank_terms(
    docs: DataFrame,
    text: str = "text",
    iterations: int = 3,
    min_weight: int = 1,
) -> DataFrame:
    """(term, rank_q, out_weight) after ``iterations`` integer PageRank
    rounds from a uniform start; ``rank_q`` carries the 10⁶ fixed-point
    scale. Isolated/self-loop-only tokens are absent (no edges)."""
    edges = cooccurrence_edges(docs, text=text, min_weight=min_weight)
    outw = edges.groupBy("src").agg(F.sum("weight").cast("long").alias("W"))
    nodes = outw.select(F.col("src").alias("term"), "W")
    rank = nodes.select("term", F.lit(TR_SCALE).cast("long").alias("q"))
    for _ in range(iterations):
        contrib = (
            edges.join(rank.withColumnRenamed("term", "src"), "src")
            .join(outw, "src")
            .select(
                F.col("dst").alias("term"),
                F.expr("CAST((q * weight) div W AS BIGINT)").alias("__c"),
            )
            .groupBy("term")
            .agg(F.sum("__c").cast("long").alias("__in"))
        )
        rank = (
            nodes.join(contrib, "term", "left")
            .select(
                "term",
                (
                    F.lit(TR_BASE)
                    + F.expr(
                        f"CAST(({TR_DAMP_NUM} * coalesce(__in, CAST(0 AS BIGINT)))"
                        f" div {TR_DAMP_DEN} AS BIGINT)"
                    )
                )
                .cast("long")
                .alias("q"),
            )
        )
    return rank.join(nodes, "term").select(
        "term", F.col("q").alias("rank_q"), F.col("W").alias("out_weight")
    )
