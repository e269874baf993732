"""Round-4 additions (eighteenth batch): per-vertex triangle counts,
latest-wins CDC changelog compaction, keyed snapshot diff — each vs a
verbatim naive python oracle."""

from __future__ import annotations

import random
from collections import defaultdict
from itertools import combinations

from featureextraction_spark.operators.graph import triangle_counts
from featureextraction_spark.operators.scd import cdc_apply, table_diff


def _naive_triangles(edges):
    adj = defaultdict(set)
    canon = set()
    for s, d in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        canon.add((a, b))
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    counts = defaultdict(int)
    for a, b in canon:
        for c in adj[a] & adj[b]:
            if c > b:  # each triangle once, corners get +1 each
                counts[a] += 1
                counts[b] += 1
                counts[c] += 1
    return dict(counts)


def test_triangles_vs_naive(spark):
    rng = random.Random(11)
    nodes = list(range(40))
    edges = set()
    # dense-ish cluster plus sparse tail so triangles exist but aren't total
    for a, b in combinations(nodes[:12], 2):
        if rng.random() < 0.6:
            edges.add((a, b))
    for _ in range(80):
        edges.add((rng.choice(nodes), rng.choice(nodes)))
    # feed both directions + duplicates + self loops: operator must canonize
    rows = []
    for a, b in edges:
        rows.append((a, b))
        if rng.random() < 0.5:
            rows.append((b, a))
    rows.append((7, 7))
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == _naive_triangles(edges)


def test_triangles_corner_sum_is_three_per_triangle(spark):
    # K4 has 4 triangles; every vertex is a corner of exactly 3
    df = spark.createDataFrame(
        [(a, b) for a, b in combinations(range(4), 2)], "src long, dst long"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    assert sum(got.values()) == 3 * 4


def _changelog(rng, n_keys=30, n_changes=300):
    rows = []
    for i in range(n_changes):
        rows.append(
            (rng.randrange(n_keys), i, rng.randrange(0, 10**6),
             rng.choice(["U", "U", "U", "D"]),
             round(rng.uniform(0, 100), 3))
        )
    return rows


def _naive_cdc(rows):
    latest = {}
    for k, cid, ts, op, v in rows:
        cur = latest.get(k)
        if cur is None or (ts, cid) > (cur[0], cur[1]):
            latest[k] = (ts, cid, op, v)
    return {
        k: (cid, op, v)
        for k, (ts, cid, op, v) in latest.items()
        if op != "D"
    }


def test_cdc_apply_vs_naive(spark):
    rng = random.Random(19)
    rows = _changelog(rng)
    df = spark.createDataFrame(
        rows, "k long, change_id long, ts long, op string, v double"
    )
    got = {
        r.k: (r.change_id, r.op, r.v)
        for r in cdc_apply(
            df, key="k", seq=("ts", "change_id"), op="op", delete_op="D"
        ).collect()
    }
    assert got == _naive_cdc(rows)


def test_cdc_apply_same_ts_tiebreaks_on_second_seq_col(spark):
    df = spark.createDataFrame(
        [(1, 10, 100, "U", 1.0), (1, 11, 100, "U", 2.0),
         (2, 20, 100, "U", 3.0), (2, 21, 100, "D", 4.0)],
        "k long, change_id long, ts long, op string, v double",
    )
    out = cdc_apply(
        df, key="k", seq=("ts", "change_id"), op="op", delete_op="D"
    ).collect()
    assert {(r.k, r.v) for r in out} == {(1, 2.0)}  # key 2 tombstoned


def test_table_diff_vs_naive(spark):
    rng = random.Random(23)
    old_rows = {k: (rng.choice(["a", "b", None]), rng.randrange(5))
                for k in range(20) if rng.random() < 0.8}
    new_rows = {k: (rng.choice(["a", "b", None]), rng.randrange(5))
                for k in range(25) if rng.random() < 0.8}
    old = spark.createDataFrame(
        [(k, c, v) for k, (c, v) in old_rows.items()],
        "k long, cat string, val long",
    )
    new = spark.createDataFrame(
        [(k, c, v) for k, (c, v) in new_rows.items()],
        "k long, cat string, val long",
    )
    got = {
        r.k: (r.status, r.old_cat, r.new_cat, r.old_val, r.new_val)
        for r in table_diff(old, new, key="k", compare=("cat", "val")).collect()
    }
    want = {}
    for k in set(old_rows) | set(new_rows):
        o, n = old_rows.get(k), new_rows.get(k)
        if o is None:
            st = "added"
        elif n is None:
            st = "removed"
        else:
            st = "unchanged" if o == n else "changed"
        want[k] = (st,
                   o[0] if o else None, n[0] if n else None,
                   o[1] if o else None, n[1] if n else None)
    assert got == want


def test_table_diff_null_to_value_is_changed(spark):
    old = spark.createDataFrame([(1, None)], "k long, cat string")
    new = spark.createDataFrame([(1, "x")], "k long, cat string")
    out = table_diff(old, new, key="k", compare=("cat",)).collect()
    assert out[0].status == "changed"


def test_clustering_coeffs_vs_naive(spark):
    from featureextraction_spark.operators.graph import clustering_coeffs

    rng = random.Random(13)
    edges = set()
    for a, b in combinations(range(15), 2):
        if rng.random() < 0.4:
            edges.add((a, b))
    edges.add((20, 21))  # degree-1 pair: coeff must be 0
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    tri = _naive_triangles(edges)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    got = {r.node: (r.degree, r.n_triangles, r.clustering_coeff)
           for r in clustering_coeffs(df).collect()}
    assert set(got) == set(adj)
    for n, neigh in adj.items():
        d = len(neigh)
        t = tri.get(n, 0)
        want = 2 * t / (d * (d - 1)) if d > 1 else 0.0
        assert got[n][0] == d and got[n][1] == t
        assert abs(got[n][2] - want) < 1e-12


def test_clustering_coeff_complete_graph_is_one(spark):
    df = spark.createDataFrame(
        [(a, b) for a, b in combinations(range(5), 2)], "src long, dst long"
    )
    from featureextraction_spark.operators.graph import clustering_coeffs

    assert all(
        r.clustering_coeff == 1.0 for r in clustering_coeffs(df).collect()
    )
