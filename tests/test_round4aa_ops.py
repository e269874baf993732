"""Round-4 additions (twenty-sixth batch): frontier BFS hop distance,
MIPS dot-product top-k, reciprocal-rank fusion — each vs a verbatim
naive python oracle."""

from __future__ import annotations

import math
import random
from collections import deque

from pyspark.sql import functions as F

from featureextraction_spark.operators.graph import bfs_hops
from featureextraction_spark.operators.retrieval import rrf_fusion
from featureextraction_spark.operators.similarity import dot_topk


def _naive_bfs(edges, seeds, max_hops):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        n = q.popleft()
        if dist[n] >= max_hops:
            continue
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    return dist


def test_bfs_hops_vs_naive(spark):
    rng = random.Random(127)
    nodes = list(range(120))
    edges = set()
    while len(edges) < 200:
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    # a long chain hanging off node 0 — exercises the hop cap
    edges |= {(200 + i, 201 + i) for i in range(8)}
    edges.add((0, 200))
    edges = sorted(edges)
    seeds = [0, 7, 55]
    e_df = spark.createDataFrame(edges, "src long, dst long")
    s_df = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {r.node: r.hop for r in bfs_hops(e_df, s_df, max_hops=4).collect()}
    exp = _naive_bfs(edges, seeds, 4)
    assert got == exp
    # chain nodes past 4 hops from node 0 are absent
    assert 205 not in got and got[203] == 4


def test_bfs_hops_empty_frontier_short_circuit(spark):
    e_df = spark.createDataFrame([(1, 2)], "src long, dst long")
    s_df = spark.createDataFrame([(9,)], "node long")  # isolated seed
    got = {r.node: r.hop for r in bfs_hops(e_df, s_df, max_hops=4).collect()}
    assert got == {9: 0}


def test_dot_topk_vs_cosine_topk_ordering(spark):
    from featureextraction_spark.operators.similarity import cosine_topk

    rng = random.Random(131)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where(F.col("vec_id") < 3)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.dot)
        for r in dot_topk(q, df, k=5).collect()
    }
    vecs = dict(rows)
    for qid in range(3):
        scored = sorted(
            (
                (-round(sum(a * b for a, b in zip(vecs[qid], vecs[n])), 6), n)
                for n in vecs
                if n != qid
            ),
        )[:5]
        for rank, (negdot, n) in enumerate(scored, 1):
            assert got[(qid, rank)][0] == n, (qid, rank)
    # dot ordering differs from cosine ordering somewhere (MIPS != NN)
    cos = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(q, df, k=5).collect()
    }
    assert any(cos[k] != got[k][0] for k in cos)


def test_rrf_fusion_vs_naive(spark):
    rng = random.Random(137)
    runs_py = []
    for _ in range(2):
        run = []
        for q in range(6):
            docs = rng.sample(range(50), 10)
            run += [(q, d, i + 1) for i, d in enumerate(docs)]
        runs_py.append(run)
    dfs = [
        spark.createDataFrame(r, "query_id long, neighbor_id long, rank long")
        for r in runs_py
    ]
    got = {
        (r.query_id, r.fused_rank): (r.neighbor_id, r.n_runs, r.rrf_num)
        for r in rrf_fusion(dfs, k=60, topn=10, rank_cap=10).collect()
    }
    L = math.lcm(*range(61, 71))
    scores = {}
    for run in runs_py:
        for q, d, r in run:
            e = scores.setdefault((q, d), [0, 0])
            e[0] += L // (60 + r)
            e[1] += 1
    for q in range(6):
        ranked = sorted(
            ((d, v[0], v[1]) for (qq, d), v in scores.items() if qq == q),
            key=lambda t: (-t[1], t[0]),
        )[:10]
        for fr, (d, num, nr) in enumerate(ranked, 1):
            assert got[(q, fr)] == (d, nr, num), (q, fr)
