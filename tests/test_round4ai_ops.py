"""Round-4 additions (thirtieth batch): total-variation split drift,
Adjusted Rand Index partition agreement, leave-one-out kNN majority
vote — each vs a verbatim naive python oracle."""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from featureextraction_spark.operators.drift import tv_distance
from featureextraction_spark.operators.evaluation import adjusted_rand_index
from featureextraction_spark.operators.similarity import knn_classify


def test_tv_distance_vs_naive(spark):
    rng = random.Random(411)
    parts = ["p0", "p1", "p2", "p3"]
    cats = ["a", "b", "c", "d", "e"]
    rows = [
        (rng.choice(parts), rng.choice(cats)) for _ in range(2000)
    ]
    # p3 deliberately skewed so TV is far from 0
    rows += [("p3", "a")] * 300
    df = spark.createDataFrame(rows, "part string, cat string")

    out = {
        r["part"]: r
        for r in tv_distance(df, "part", "cat").collect()
    }

    total = Counter(c for _, c in rows)
    n = len(rows)
    by_part = defaultdict(Counter)
    for p, c in rows:
        by_part[p][c] += 1
    for p, cnt in by_part.items():
        np_ = sum(cnt.values())
        tv_num = sum(
            abs(cnt.get(c, 0) * n - total[c] * np_) for c in total
        )
        tv_den = 2 * np_ * n
        got = out[p]
        assert got["n_rows"] == np_
        assert got["tv_num"] == tv_num
        assert got["tv_den"] == tv_den
        assert math.isclose(got["tv"], tv_num / tv_den, rel_tol=1e-12)
        # TV of a partition's mix vs the corpus is in [0, 1)
        assert 0.0 <= got["tv"] < 1.0


def test_tv_distance_identical_mix_is_zero(spark):
    # every partition has the exact same categorical mix -> TV == 0
    rows = [
        (p, c)
        for p in ("x", "y")
        for c in ("a", "a", "b")
    ]
    df = spark.createDataFrame(rows, "part string, cat string")
    for r in tv_distance(df, "part", "cat").collect():
        assert r["tv_num"] == 0
        assert r["tv"] == 0.0


def _naive_ari(pairs):
    cells = Counter(pairs)
    n = sum(cells.values())
    sij = sum(c * (c - 1) for c in cells.values())
    ra = Counter()
    cb = Counter()
    for (a, b), c in cells.items():
        ra[a] += c
        cb[b] += c
    sa = sum(c * (c - 1) for c in ra.values())
    sb = sum(c * (c - 1) for c in cb.values())
    t = n * (n - 1)
    den = t * (sa + sb) - 2 * sa * sb
    ari = None if den == 0 else 2 * (t * sij - sa * sb) / den
    return n, sij, sa, sb, ari


def test_ari_vs_naive(spark):
    rng = random.Random(412)
    # correlated labelings: b is a relabeled with 20% noise
    relabel = {"u": "x", "v": "y", "w": "z"}
    pairs = []
    for _ in range(800):
        a = rng.choice(["u", "v", "w"])
        b = relabel[a] if rng.random() < 0.8 else rng.choice(["x", "y", "z"])
        pairs.append((a, b))
    df = spark.createDataFrame(pairs, "a string, b string")
    got = adjusted_rand_index(df, "a", "b").collect()[0]
    n, sij, sa, sb, ari = _naive_ari(pairs)
    assert (got["n"], got["sij"], got["sa"], got["sb"]) == (n, sij, sa, sb)
    assert math.isclose(got["ari"], ari, rel_tol=1e-12)
    assert 0.2 < got["ari"] < 1.0


def test_ari_identical_partitions_is_one(spark):
    pairs = [("a", "A")] * 5 + [("b", "B")] * 7 + [("c", "C")] * 3
    df = spark.createDataFrame(pairs, "a string, b string")
    assert adjusted_rand_index(df, "a", "b").collect()[0]["ari"] == 1.0


def test_ari_permutation_invariant(spark):
    # renaming b's labels must not change ARI (unlike kappa)
    rng = random.Random(413)
    pairs = [
        (rng.choice("uvw"), rng.choice("xyz")) for _ in range(500)
    ]
    swapped = [(a, {"x": "z", "y": "x", "z": "y"}[b]) for a, b in pairs]
    d1 = spark.createDataFrame(pairs, "a string, b string")
    d2 = spark.createDataFrame(swapped, "a string, b string")
    a1 = adjusted_rand_index(d1, "a", "b").collect()[0]["ari"]
    a2 = adjusted_rand_index(d2, "a", "b").collect()[0]["ari"]
    assert math.isclose(a1, a2, rel_tol=1e-12)


def test_ari_degenerate_is_null(spark):
    # one block vs one block: T*(A+B) == 2AB -> denominator 0 -> NULL
    df = spark.createDataFrame(
        [("a", "x")] * 4, "a string, b string"
    )
    assert adjusted_rand_index(df, "a", "b").collect()[0]["ari"] is None


def _naive_knn(vecs, labels, k):
    ids = sorted(vecs)
    out = {}
    for q in ids:
        scored = []
        for c in ids:
            if c == q:
                continue
            dot = sum(a * b for a, b in zip(vecs[q], vecs[c]))
            nq = math.sqrt(sum(a * a for a in vecs[q]))
            nc = math.sqrt(sum(a * a for a in vecs[c]))
            scored.append((round(dot / (nq * nc), 6), c))
        scored.sort(key=lambda t: (-t[0], t[1]))
        votes = Counter(labels[c] for _, c in scored[:k])
        pred = min(votes.items(), key=lambda t: (-t[1], t[0]))
        out[q] = (pred[0], pred[1], 1 if pred[0] == labels[q] else 0)
    return out


def test_knn_classify_vs_naive(spark):
    rng = random.Random(414)
    vecs, labels, rows = {}, {}, []
    for i in range(40):
        lab = "even" if i % 2 == 0 else "odd"
        # two noisy clusters so kNN is non-trivial but mostly right
        base = [1.0, 0.0, 0.5] if lab == "even" else [0.0, 1.0, -0.5]
        v = [b + rng.uniform(-0.3, 0.3) for b in base]
        vecs[i], labels[i] = v, lab
        rows.append((i, v, lab))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    got = {
        r["query_id"]: (r["pred"], r["votes"], r["hit"])
        for r in knn_classify(df, df, k=5).collect()
    }
    want = _naive_knn(vecs, labels, 5)
    assert got == want
    # sanity: leave-one-out accuracy on separated clusters is high
    assert sum(h for _, _, h in got.values()) >= 35
