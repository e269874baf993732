"""BM25 text retrieval scoring — the lexical similarity-search baseline.

Okapi BM25 with the standard (k1=1.2, b=0.75) parametrization and the
Lucene/ATIRE idf form ln(1 + (N − df + 0.5)/(df + 0.5)), which is
non-negative for every df (classic Robertson idf goes negative for
terms in more than half the corpus).

Scale design (the point of doing this in Spark):

- the corpus is tokenized and FILTERED TO THE QUERY TERMS before the
  only explode — the per-doc term-frequency aggregation therefore
  shuffles O(matching (doc, term) pairs), not O(corpus tokens);
- document length comes from the token array size (map-side, no
  explode); corpus stats (N, avgdl) are a 1-row aggregate joined back
  by broadcast, and the per-term document frequencies are a
  |query_terms|-row aggregate, also broadcast — the corpus-sized side
  is never reshuffled after the tf aggregation;
- the top-k is ``orderBy(...).limit(k)``, which Spark executes as
  TakeOrderedAndProject (per-partition heaps + driver merge of k rows),
  NOT a single-partition global sort — safe at any corpus size;
- scores are quantized through the shared nudged rounding BEFORE the
  ordering, so the top-k SET is identical across engines even when
  ln()/accumulation differ by 1 ulp (ties broken by doc id).

No reference counterpart; this is the retrieval/quality-scoring sibling
of the embedding ANN operators in ``similarity.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WS_RUN = "[ \\t\\n\\r\\f\\u000B]+"
_HASH_EPS = 1e-9


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score against ``query_terms``
    (case-insensitive, whitespace tokenization shared with the DuckDB
    oracle). Output: (id_col, n_terms_hit, score) with ``score`` rounded
    through the nudged 6-digit hash vehicle; deterministic tie-break on
    ``id_col``.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})

    toks = F.filter(
        F.split(
            F.lower(F.trim(F.regexp_replace(F.col(text), _WS_RUN, " "))), " "
        ),
        lambda x: x != "",
    )
    base = df.select(F.col(id_col), toks.alias("__toks")).withColumn(
        "__dl", F.size("__toks").cast("long")
    )

    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
    )

    tf = (
        base.select(id_col, "__dl", F.explode("__toks").alias("__term"))
        .filter(F.col("__term").isin(list(terms)))
        .groupBy(id_col, "__dl", "__term")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    dfreq = tf.groupBy("__term").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )

    scored = (
        tf.join(F.broadcast(dfreq), "__term")
        .join(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("__tf") * F.lit(k1 + 1.0))
            / (
                F.col("__tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("__dl") / F.col("__avgdl")
                )
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        F.round(F.sum("__s") + F.lit(_HASH_EPS), 6).alias("score"),
    )
    return (
        agg.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "n_terms_hit", "score")
    )


def phrase_match(
    df: DataFrame,
    phrase: Sequence[str],
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Exact-phrase retrieval over a positional inverted index: posting
    lists (doc, position) per phrase term, chained by (doc, pos + i)
    equi-joins — the classic positional-index phrase query, no text
    rescan per term. Output one row per matching document:
    (id_col, n_matches, first_pos).

    Scale shape: the term filter lands BEFORE the explode output is
    shuffled (only the phrase's own postings move — a vocabulary-
    selective sliver of the corpus), every chain step is a hash
    equi-join on (doc, aligned position), and the closing per-doc
    aggregate is map-combinable. Tokenization is the repo-wide
    whitespace contract shared with the DuckDB oracle.
    """
    terms = [t.lower() for t in phrase]
    if not terms:
        raise ValueError("phrase must be non-empty")
    toks = F.filter(
        F.split(
            F.lower(F.trim(F.regexp_replace(F.col(text), _WS_RUN, " "))), " "
        ),
        lambda x: x != "",
    )
    posted = df.select(
        F.col(id_col), F.posexplode(toks).alias("__pos", "__term")
    ).where(F.col("__term").isin(terms))
    chain = (
        posted.where(F.col("__term") == terms[0])
        .select(F.col(id_col), F.col("__pos").alias("__p0"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = posted.where(F.col("__term") == F.lit(t)).select(
            F.col(id_col).alias("__id_r"),
            (F.col("__pos") - F.lit(i)).alias("__p0_r"),
        )
        chain = chain.join(
            nxt,
            (chain[id_col] == nxt["__id_r"])
            & (chain["__p0"] == nxt["__p0_r"]),
        ).select(chain[id_col], chain["__p0"])
    return chain.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("__p0").cast("long").alias("first_pos"),
    )


def rrf_fusion(
    runs: list[DataFrame],
    k: int = 60,
    topn: int = 10,
    rank_cap: int = 10,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval runs (Cormack et
    al., SIGIR'09): score(d) = Σ_runs 1/(k + rank_r(d)) — the standard
    hybrid-search combiner (lexical + dense), robust to incomparable
    raw scores because only ranks enter.

    Kept exact: every contribution is pre-scaled by
    ``L = lcm(k+1 … k+rank_cap)`` so ``rrf_num = Σ L/(k+rank)`` is an
    exact BIGINT (each division is exact by construction) — same
    vehicle family as the 2520-trick in ``ranking_metrics``. Ties break
    by doc id.

    Scale: one unionAll of the Q·rank_cap run tables, one
    map-side-combinable (query, doc) aggregate, one query-partitioned
    top-n window. Nothing touches the corpora.
    """
    import math

    L = math.lcm(*range(k + 1, k + rank_cap + 1))
    parts = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("neighbor_id"),
            F.col(rank_col).cast("long").alias("__r"),
        ).where(F.col("__r") <= rank_cap)
        for r in runs
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    g = u.groupBy("query_id", "neighbor_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.sum(F.expr(f"{L} div ({k} + __r)")).cast("long").alias("rrf_num"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_num").desc(), F.col("neighbor_id").asc()
    )
    return (
        g.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .where(F.col("fused_rank") <= topn)
    )


def mmr_rerank(
    candidates: DataFrame,
    pair_sims: DataFrame,
    k: int = 5,
    lam_num: int = 7,
    lam_den: int = 10,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified re-ranking (Carbonell &
    Goldstein SIGIR'98) — the rerank half of a retrieve→rerank stack:
    from each query's candidate pool, greedily pick the item maximizing

        mmr = λ·relevance − (1−λ)·max_sim_to_already_picked

    so near-duplicate hits don't crowd the top-k (the diversity knob
    every RAG/result-page pipeline ends up needing).

    Inputs: ``candidates`` (query_id, doc_id, rel_q) with INTEGER
    relevance (quantized cosine/BM25 — exact multiples survive the hash
    gate), ``pair_sims`` (query_id, a_id, b_id, sim_q) integer pairwise
    similarities among each query's candidates, BOTH directions present
    (build from the candidate pool's self-join; absent pairs read as 0).
    λ is the exact rational lam_num/lam_den: the greedy argmax compares
    ``lam_num·rel_q − (lam_den−lam_num)·maxsim_q`` — pure BIGINT, ties
    to the smaller doc_id, fully deterministic on every engine.

    The greedy loop is data-INDEPENDENT in length (exactly ``k`` rounds,
    like the fixed-round PageRank), so it unrolls into one static plan:
    round i anti-joins the picked set (≤ i−1 rows per query), takes the
    max similarity against it, and argmaxes via a per-query rank-1
    window (map-side WindowGroupLimit). Candidate pools are top-N
    bounded (N ~ 10-100), so every per-round join is pool-sized — the
    corpus is touched only by the retriever upstream.
    """
    mu = lam_den - lam_num
    sel = None  # (query_id, doc_id, pick_rank, rel_q, mmr_q)
    pool = candidates.select("query_id", "doc_id", F.col("rel_q").cast("long").alias("rel_q"))
    for rnd in range(1, k + 1):
        if sel is None:
            scored = pool.select(
                "query_id", "doc_id", "rel_q",
                (F.lit(lam_num) * F.col("rel_q")).cast("long").alias("mmr_q"),
            )
        else:
            remaining = pool.join(
                sel.select("query_id", "doc_id"),
                ["query_id", "doc_id"],
                "left_anti",
            )
            # max similarity to the picked set: join candidate->picked
            # pairs through pair_sims (absent pair contributes 0)
            cand_sel = remaining.join(
                sel.select("query_id", F.col("doc_id").alias("__sel_id")),
                "query_id",
            ).join(
                pair_sims.select(
                    "query_id",
                    F.col("a_id").alias("doc_id"),
                    F.col("b_id").alias("__sel_id"),
                    F.col("sim_q").cast("long").alias("__sim_q"),
                ),
                ["query_id", "doc_id", "__sel_id"],
                "left",
            )
            maxsim = cand_sel.groupBy("query_id", "doc_id", "rel_q").agg(
                F.max(F.coalesce(F.col("__sim_q"), F.lit(0)))
                .cast("long")
                .alias("__maxsim")
            )
            scored = maxsim.select(
                "query_id", "doc_id", "rel_q",
                (
                    F.lit(lam_num) * F.col("rel_q")
                    - F.lit(mu) * F.col("__maxsim")
                ).cast("long").alias("mmr_q"),
            )
        w = Window.partitionBy("query_id").orderBy(
            F.col("mmr_q").desc(), F.col("doc_id").asc()
        )
        pick = (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(
                "query_id", "doc_id", "rel_q", "mmr_q",
                F.lit(rnd).cast("long").alias("pick_rank"),
            )
        )
        sel = pick if sel is None else sel.unionByName(pick)
        sel = sel.localCheckpoint() if rnd < k else sel
    return sel.select("query_id", "pick_rank", "doc_id", "rel_q", "mmr_q")
