"""Round-4 additions (thirty-seventh batch): MMR diversified
re-ranking vs a verbatim naive greedy python oracle."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from featureextraction_spark.operators.retrieval import mmr_rerank


def _naive_mmr(cand, sims, k, lam_num=7, lam_den=10):
    """cand: {q: {doc: rel}}, sims: {(q,a,b): sim}. Returns
    {q: [(rank, doc, rel, mmr)]}."""
    mu = lam_den - lam_num
    out = {}
    for q, pool in cand.items():
        picked, rows = [], []
        for rnd in range(1, k + 1):
            best = None
            for d, rel in pool.items():
                if d in picked:
                    continue
                if picked:
                    ms = max(sims.get((q, d, s), 0) for s in picked)
                else:
                    ms = 0
                score = lam_num * rel - (mu * ms if picked else 0)
                key = (-score, d)
                if best is None or key < best[0]:
                    best = (key, d, rel, score)
            if best is None:
                break
            picked.append(best[1])
            rows.append((rnd, best[1], best[2], best[3]))
        out[q] = rows
    return out


def test_mmr_vs_naive(spark):
    rng = random.Random(471)
    cand, sims, cand_rows, sim_rows = {}, {}, [], []
    for q in range(6):
        pool = rng.sample(range(100), 9)
        cand[q] = {}
        for d in pool:
            rel = rng.randrange(-100, 1000)
            cand[q][d] = rel
            cand_rows.append((q, d, rel))
        for a in pool:
            for b in pool:
                if a != b:
                    # symmetric similarity, deterministic from the pair
                    s = ((a * 131 + b * 131) % 997) - 300
                    sims[(q, a, b)] = s
                    sim_rows.append((q, a, b, s))
    cdf = spark.createDataFrame(cand_rows, "query_id long, doc_id long, rel_q long")
    sdf = spark.createDataFrame(sim_rows, "query_id long, a_id long, b_id long, sim_q long")
    got = {}
    for r in mmr_rerank(cdf, sdf, k=4).collect():
        got.setdefault(r["query_id"], []).append(
            (r["pick_rank"], r["doc_id"], r["rel_q"], r["mmr_q"])
        )
    want = _naive_mmr(cand, sims, k=4)
    for q in want:
        assert sorted(got[q]) == sorted(want[q]), (q, got[q], want[q])


def test_mmr_diversifies_duplicates(spark):
    # two near-identical top docs: plain top-k keeps both adjacent,
    # MMR must interleave the diverse lower-relevance doc
    cand_rows = [(0, 1, 1000), (0, 2, 999), (0, 3, 700)]
    sim_rows = [
        (0, 1, 2, 990), (0, 2, 1, 990),   # 1 and 2 are near-dups
        (0, 1, 3, 10), (0, 3, 1, 10),
        (0, 2, 3, 10), (0, 3, 2, 10),
    ]
    cdf = spark.createDataFrame(cand_rows, "query_id long, doc_id long, rel_q long")
    sdf = spark.createDataFrame(sim_rows, "query_id long, a_id long, b_id long, sim_q long")
    order = [
        r["doc_id"]
        for r in mmr_rerank(cdf, sdf, k=3).orderBy("pick_rank").collect()
    ]
    # pick1 = 1 (max rel); pick2: doc2 scores 7*999-3*990=4023 vs
    # doc3 7*700-3*10=4870 -> diverse doc 3 jumps ahead of near-dup 2
    assert order == [1, 3, 2]
