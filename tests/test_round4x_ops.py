"""Round-4 additions (twenty-third batch): lag-k autocorrelation,
distributed 2-D skyline, Benford first-digit profile — each vs a
verbatim naive python oracle."""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import pytest

from featureextraction_spark.operators.profiling import (
    BENFORD_PPM,
    benford_profile,
)
from featureextraction_spark.operators.rolling import autocorrelation
from featureextraction_spark.operators.skyline import skyline_2d


def test_autocorrelation_vs_naive(spark):
    rng = random.Random(83)
    rows = []
    for u in range(25):
        n = rng.randint(1, 60)  # includes length-1 (den == 0) series
        for t in range(n):
            rows.append((u, t, round(rng.uniform(0, 100), 3)))
    # a perfectly periodic user: acf at lag 2 must be ~1
    rows += [(99, t, float(t % 2)) for t in range(40)]
    df = spark.createDataFrame(rows, "user_id long, ord long, value double")
    got = {
        (r.user_id, r.lag): (r.n, r.acf_num, r.acf_den, r.acf)
        for r in autocorrelation(
            df, value="value", by="user_id", order=["ord"]
        ).collect()
    }
    series = defaultdict(list)
    for u, t, v in rows:
        series[u].append((t, math.floor(v * 1000 + 0.5)))
    for u, sv in series.items():
        sv.sort()
        qs = [q for _, q in sv]
        n, s = len(qs), sum(qs)
        c = [n * q - s for q in qs]
        den = sum(x * x for x in c)
        for k in (1, 2, 3):
            num = sum(c[t] * c[t + k] for t in range(n - k)) if n > k else 0
            exp_acf = num / den if den > 0 else None
            gn, gnum, gden, gacf = got[(u, k)]
            assert (gn, gnum, gden) == (n, num, den), (u, k)
            if exp_acf is None:
                assert gacf is None
            else:
                assert gacf == pytest.approx(exp_acf, abs=1e-6)
    # the periodic user alternates: lag-2 acf near 1, lag-1 near -1
    assert got[(99, 2)][3] > 0.9 and got[(99, 1)][3] < -0.9


def _naive_skyline(pts):
    out = []
    for i, (kx, ky) in enumerate(pts):
        dominated = any(
            (x2 >= kx and y2 >= ky and (x2 > kx or y2 > ky))
            for j, (x2, y2) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((kx, ky))
    return sorted(out)


def test_skyline_vs_naive(spark):
    rng = random.Random(89)
    pts = [(rng.randrange(0, 1000), rng.randrange(0, 1000)) for _ in range(800)]
    # exact duplicates on the frontier: both must survive
    mx = max(x for x, _ in pts)
    pts += [(mx + 1, 500), (mx + 1, 500)]
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted(
        (r.x, r.y) for r in skyline_2d(df, "x", "y", keep=["id"]).collect()
    )
    # naive keeps one of each duplicate pair; expand duplicates
    exp_set = _naive_skyline(pts)
    assert got == sorted(exp_set)
    assert got.count((mx + 1, 500)) == 2


def test_skyline_bucket_count_invariance(spark):
    rng = random.Random(97)
    rows = [
        (i, rng.randrange(0, 50), rng.randrange(0, 50)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    a = sorted(
        (r.id, r.x, r.y)
        for r in skyline_2d(df, "x", "y", keep=["id"], n_buckets=1).collect()
    )
    b = sorted(
        (r.id, r.x, r.y)
        for r in skyline_2d(df, "x", "y", keep=["id"], n_buckets=64).collect()
    )
    assert a == b


def test_benford_profile_vs_naive(spark):
    rng = random.Random(101)
    rows = []
    for g in ("a", "b"):
        for _ in range(400):
            # log-uniform magnitudes: Benford-ish for group a
            v = 10 ** rng.uniform(0, 4) if g == "a" else rng.uniform(1, 9.99)
            rows.append((g, round(v, 2)))
    rows.append(("a", 0.0))  # excluded: quantizes to 0
    df = spark.createDataFrame(rows, "grp string, value double")
    out = benford_profile(df, value="value", by="grp", quant=100.0).collect()
    qs = defaultdict(list)
    for g, v in rows:
        q = math.floor(v * 100 + 0.5)
        if q > 0:
            qs[g].append(int(str(q)[0]))
    got = {(r.grp, r.digit): (r.n_d, r.n, r.ppm, r.dev_ppm_n) for r in out}
    assert len(got) == 18  # full 9-digit grid per group
    for g, digs in qs.items():
        cnt, n = Counter(digs), len(digs)
        for d in range(1, 10):
            n_d = cnt.get(d, 0)
            exp_dev = abs(n_d * 1_000_000 - n * BENFORD_PPM[d])
            assert got[(g, d)] == (n_d, n, BENFORD_PPM[d], exp_dev), (g, d)
    # group b (uniform 1-9.99) is far from Benford on digit 1
    assert got[("b", 1)][3] > got[("a", 1)][3]
