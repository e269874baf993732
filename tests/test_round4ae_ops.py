"""Round-4 additions (thirtieth batch): CART Gini stump split scan,
fixed-round k-core peeling, referential-integrity audit — each vs a
verbatim naive python oracle."""

from __future__ import annotations

import random
from collections import defaultdict
from fractions import Fraction

from pyspark.sql import functions as F

from featureextraction_spark.operators.graph import kcore_peel
from featureextraction_spark.operators.profiling import referential_audit
from featureextraction_spark.operators.splits import (
    best_gini_split,
    gini_split_scan,
)


def _naive_scan(rows):
    """rows: (grp, feature_int, y) -> {(grp, t): tuple} using exact
    Fractions for the cost."""
    by = defaultdict(list)
    for g, x, y in rows:
        by[g].append((x, y))
    out = {}
    for g, xs in by.items():
        vals = sorted({x for x, _ in xs})
        n = len(xs)
        p = sum(y for _, y in xs)
        for t in vals[:-1]:
            n_l = sum(1 for x, _ in xs if x <= t)
            pos_l = sum(y for x, y in xs if x <= t)
            neg_l = n_l - pos_l
            n_r, pos_r = n - n_l, p - pos_l
            neg_r = n_r - pos_r
            num = pos_l * neg_l * n_r + pos_r * neg_r * n_l
            den = n_l * n_r
            out[(g, t)] = (n_l, pos_l, neg_l, n_r, pos_r, neg_r, num, den)
    return out


def test_gini_split_scan_vs_naive(spark):
    rng = random.Random(307)
    rows = []
    for g in ["a", "b", "c"]:
        for _ in range(rng.randint(20, 300)):
            x = rng.randrange(0, 40)
            # label correlated with x so splits are non-trivial
            y = int(rng.random() < (0.2 + 0.6 * (x > 20)))
            rows.append((g, x, y))
    # a pure group: every label 1 -> cost 0 at every threshold
    rows += [("pure", v, 1) for v in range(10)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    got = {
        (r.grp, r.threshold): (
            r.n_l, r.pos_l, r.neg_l, r.n_r, r.pos_r, r.neg_r,
            r.cost_num, r.cost_den, r.cost,
        )
        for r in gini_split_scan(
            df, feature="x", label=F.col("y") == 1, by="grp"
        ).collect()
    }
    exp = _naive_scan(rows)
    assert set(got) == set(exp)
    for key, e in exp.items():
        g = got[key]
        assert g[:8] == e, (key, g, e)
        assert abs(g[8] - e[6] / e[7]) < 1e-12
    assert all(v[6] == 0 for k, v in exp.items() if k[0] == "pure")


def test_best_gini_split_is_exact_argmin(spark):
    rng = random.Random(311)
    rows = [
        ("g", rng.randrange(0, 60), int(rng.random() < 0.4))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    best = best_gini_split(
        gini_split_scan(df, feature="x", label=F.col("y") == 1, by="grp")
    ).collect()
    assert len(best) == 1
    b = best[0]
    exp = _naive_scan(rows)
    best_cost = min(Fraction(num, den) for *_, num, den in exp.values())
    assert Fraction(b.cost_num, b.cost_den) == best_cost
    # tiebreak: smallest threshold among exact-minimum candidates
    min_ts = [
        t for (g, t), (*_, num, den) in exp.items()
        if Fraction(num, den) == best_cost
    ]
    assert b.threshold == min(min_ts)


def _naive_peel(edges, k, rounds):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = {n for n in adj if adj[n]}
    res = {}
    for r in range(1, rounds + 1):
        doomed = {n for n in alive if len(adj[n] & alive) < k}
        if not doomed:
            break
        for n in doomed:
            res[n] = (r, len(adj[n] & alive))
        alive -= doomed
    for n in alive:
        res[n] = (0, len(adj[n] & alive))
    return res


def test_kcore_peel_vs_naive(spark):
    rng = random.Random(313)
    edges = set()
    # a dense clique (survives), a chain (peels), random noise
    for i in range(10):
        for j in range(i + 1, 10):
            edges.add((i, j))
    edges |= {(100 + i, 101 + i) for i in range(20)}
    while len(edges) < 120:
        a, b = rng.randrange(40), rng.randrange(40)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edf = spark.createDataFrame(sorted(edges), "src long, dst long")
    for k, rounds in [(3, 12), (2, 25), (5, 4)]:
        got = {
            r.node: (r.removed_round, r.deg)
            for r in kcore_peel(edf, k=k, rounds=rounds).collect()
        }
        assert got == _naive_peel(edges, k, rounds), (k, rounds)


def test_kcore_fixed_round_budget_is_honored(spark):
    # a 30-chain under k=2 peels one end-pair per sweep; rounds=3 must
    # stop early with survivors exactly matching the naive 3-sweep state
    edges = [(i, i + 1) for i in range(30)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.removed_round, r.deg)
        for r in kcore_peel(edf, k=2, rounds=3).collect()
    }
    assert got == _naive_peel(set(edges), 2, 3)
    assert max(r for r, _ in got.values()) == 3
    assert any(r == 0 for r, _ in got.values())


def test_referential_audit_vs_naive(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None), (5, 98), (6, 98)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (11,), (None,)], "pk long")
    out = {
        r.relation: (
            r.child_rows, r.null_key_rows, r.orphan_rows, r.orphan_keys
        )
        for r in referential_audit(
            [("c->p", child, "fk", parent, "pk")]
        ).collect()
    }
    # 6 rows, 1 null key, orphans: 99 (1 row) + 98 (2 rows) = 3 rows / 2 keys
    assert out == {"c->p": (6, 1, 3, 2)}
