"""Round-4 additions (thirty-fourth batch): hardest-negative mining and
Neyman budget allocation — each vs a verbatim naive python oracle,
including the int64-overflow regression for the scaled variance."""

from __future__ import annotations

import math
import random
from collections import defaultdict

from pyspark.sql import functions as F

from featureextraction_spark.operators.sampling import neyman_allocation
from featureextraction_spark.operators.similarity import hard_negative_mining


def _naive_hard_negatives(rows, anchor_ids):
    vecs = {i: v for i, v, _ in rows}
    labels = {i: l for i, _, l in rows}
    out = {}
    for q in anchor_ids:
        best = {}  # same-flag -> (cos, id)
        for c in vecs:
            if c == q:
                continue
            dot = sum(a * b for a, b in zip(vecs[q], vecs[c]))
            nq = math.sqrt(sum(a * a for a in vecs[q]))
            nc = math.sqrt(sum(a * a for a in vecs[c]))
            cos = round(dot / (nq * nc), 6)
            same = labels[c] == labels[q]
            cur = best.get(same)
            if cur is None or (-cos, c) < (-cur[0], cur[1]):
                best[same] = (cos, c)
        if True in best and False in best:
            (pc, pi), (nc_, ni) = best[True], best[False]
            out[q] = (labels[q], pi, pc, ni, nc_, pc - nc_,
                      1 if pc <= nc_ else 0)
    return out


def test_hard_negatives_vs_naive(spark):
    rng = random.Random(451)
    rows = []
    for i in range(40):
        lab = ["a", "b", "c"][i % 3]
        base = {"a": [1, 0, 0], "b": [0, 1, 0], "c": [0.6, 0.6, 0.2]}[lab]
        rows.append(
            (i, [x + rng.uniform(-0.4, 0.4) for x in base], lab)
        )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    anchors = df.filter(F.col("vec_id") < 15)
    got = {
        r["anchor_id"]: (
            r["anchor_label"], r["pos_id"], r["pos_cos"], r["neg_id"],
            r["neg_cos"], r["margin"], r["is_violation"],
        )
        for r in hard_negative_mining(anchors, df).collect()
    }
    want = _naive_hard_negatives(rows, range(15))
    assert set(got) == set(want)
    for k in want:
        for gv, wv in zip(got[k], want[k]):
            if isinstance(wv, float):
                assert math.isclose(gv, wv, rel_tol=1e-12), (k, got[k], want[k])
            else:
                assert gv == wv, (k, got[k], want[k])
    # class "c" overlaps the others: at least one violation should exist
    assert any(v[6] == 1 for v in got.values()) or all(
        v[5] > 0 for v in got.values()
    )


def _naive_neyman(rows, budget=1000, scale=10000):
    strata = defaultdict(list)
    for s, x in rows:
        strata[s].append(x)
    stats = {}
    for s, xs in strata.items():
        n, sx, sx2 = len(xs), sum(xs), sum(x * x for x in xs)
        if n > 1:
            raw = n * sx2 - sx * sx
            den = n * (n - 1)
            var_q = (raw // den) * scale + ((raw % den) * scale) // den
        else:
            var_q = 0
        sig = math.isqrt(var_q)
        stats[s] = (n, var_q, sig, n * sig)
    total = sum(a for _, _, _, a in stats.values())
    out = {}
    for s, (n, vq, sig, al) in stats.items():
        nt = (budget * al) // total if total > 0 else 0
        share = al / total if total > 0 else None
        out[s] = (n, vq, sig, al, total, nt, share)
    return out


def test_neyman_vs_naive(spark):
    rng = random.Random(452)
    rows = [("u", rng.randrange(50, 60)) for _ in range(300)]       # tight
    rows += [("w", rng.randrange(0, 5000)) for _ in range(300)]     # wide
    rows += [("s", 123)]                                            # single
    df = spark.createDataFrame(rows, "src string, x long")
    got = {
        r["src"]: (
            r["n_rows"], r["var_q"], r["sigma_q"], r["alloc_num"],
            r["total_alloc"], r["n_target"], r["share"],
        )
        for r in neyman_allocation(df, "src", "x").collect()
    }
    want = _naive_neyman(rows)
    for s in want:
        for gv, wv in zip(got[s], want[s]):
            if isinstance(wv, float):
                assert math.isclose(gv, wv, rel_tol=1e-12)
            else:
                assert gv == wv, (s, got[s], want[s])
    # wide stratum gets (much) more budget than the tight one
    assert got["w"][5] > got["u"][5]
    assert got["s"][1] == 0 and got["s"][5] == 0


def test_neyman_scaled_variance_no_overflow(spark):
    # raw*scale would blow past 2^63 (raw ~ 1.3e16, *10000 = 1.3e20)
    # while the moment bound n*sum_x2 < 2^63 still holds (~4e18): the
    # split div must stay exact where the naive product overflows
    rng = random.Random(453)
    rows = [("big", rng.randrange(900_000, 1_100_000)) for _ in range(2_000)]
    rows += [("tiny", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "src string, x long")
    got = {
        r["src"]: r for r in neyman_allocation(df, "src", "x").collect()
    }
    want = _naive_neyman(rows)
    assert got["big"]["var_q"] == want["big"][1]
    assert got["big"]["sigma_q"] == want["big"][2]
    assert got["big"]["n_target"] == want["big"][5]


def test_isqrt_exact_at_boundaries(spark):
    from featureextraction_spark.operators.sampling import _isqrt

    vals = []
    for m in (1, 2, 10, 3_000_000, 2**26, 10**7):
        vals += [m * m - 1, m * m, m * m + 1]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = df.select("x", _isqrt(F.col("x")).alias("s")).collect()
    for r in got:
        assert r["s"] == math.isqrt(r["x"]), (r["x"], r["s"])
