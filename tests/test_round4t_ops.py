"""Round-4 additions (nineteenth batch): exact tie-aware ROC-AUC,
calibration bins, 2×2 A/B chi-squared, SCD2 point-in-time lookup,
single-pass column profile, expectation checks — each vs a verbatim
naive python oracle."""

from __future__ import annotations

import math
import random
from collections import defaultdict

from pyspark.sql import functions as F

from featureextraction_spark.operators.evaluation import (
    ab_chi2,
    calibration_bins,
    roc_auc,
)
from featureextraction_spark.operators.profiling import (
    expectation_checks,
    profile_columns,
)
from featureextraction_spark.operators.scd import scd2_intervals, scd2_lookup


def _naive_auc(pairs, quant=10_000):
    # P(score_pos > score_neg) + 0.5 P(==), on quantized scores
    qs = [(int(s * quant + 0.5), y) for s, y in pairs]
    pos = [s for s, y in qs if y]
    neg = [s for s, y in qs if not y]
    num2 = 0
    for p in pos:
        for n in neg:
            num2 += 2 if p > n else (1 if p == n else 0)
    return len(pos), len(neg), num2, num2 / (2 * len(pos) * len(neg))


def test_roc_auc_vs_naive_quadratic(spark):
    rng = random.Random(31)
    # positives shifted up, plus deliberate tie mass at exact values
    pairs = [(rng.choice([0.25, 0.5, round(rng.uniform(0, 1), 3)]),
              rng.random() < 0.4) for _ in range(400)]
    pairs += [(0.5, True), (0.5, False), (0.25, True), (0.25, False)]
    df = spark.createDataFrame(
        [(s, int(y)) for s, y in pairs], "score double, label long"
    )
    n_pos, n_neg, num2, auc = _naive_auc(pairs)
    r = roc_auc(df).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc_num2) == (n_pos, n_neg, num2)
    assert abs(r.auc - auc) < 1e-12


def test_roc_auc_perfect_and_random(spark):
    perfect = spark.createDataFrame(
        [(float(i), int(i >= 50)) for i in range(100)], "score double, label long"
    )
    assert roc_auc(perfect).collect()[0].auc == 1.0
    const = spark.createDataFrame(
        [(1.0, i % 2) for i in range(100)], "score double, label long"
    )
    assert const.transform(roc_auc).collect()[0].auc == 0.5


def test_calibration_bins_vs_naive(spark):
    rng = random.Random(37)
    rows = [(round(rng.uniform(-0.2, 1.2), 4), int(rng.random() < 0.3))
            for _ in range(500)]
    df = spark.createDataFrame(rows, "score double, label long")
    want = defaultdict(lambda: [0, 0, 0])
    for s, y in rows:
        q = math.floor(s * 1000 + 0.5)
        qc = min(max(q, 0), 1000)
        b = min((qc * 10) // 1000, 9)
        want[b][0] += 1
        want[b][1] += y
        want[b][2] += q
    got = {r.bin: [r.n, r.n_pos, r.sum_score_q]
           for r in calibration_bins(df, n_bins=10).collect()}
    assert got == dict(want)


def test_ab_chi2_vs_scipy_formula(spark):
    # contingency: A 40/100 conversions, B 25/100
    rows = [("A", 1)] * 40 + [("A", 0)] * 60 + [("B", 1)] * 25 + [("B", 0)] * 75
    df = spark.createDataFrame(rows, "variant string, converted long")
    r = ab_chi2(df).collect()[0]
    a, b, c, d = 40, 60, 25, 75
    n = a + b + c + d
    det = a * d - b * c
    den = (a + b) * (c + d) * (a + c) * (b + d)
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (100, 40, 100, 25)
    assert r.chi2_num == n * det * det
    assert r.chi2_den == den
    assert abs(r.chi2 - n * det * det / den) < 1e-12


def test_scd2_lookup_vs_naive(spark):
    rng = random.Random(41)
    dim_rows, probe_rows = [], []
    for u in range(20):
        times = sorted(rng.sample(range(1000), rng.randint(1, 5)))
        for i, t in enumerate(times):
            dim_rows.append((u, f"d{u}_{i}", f"s{i}", t))
        for _ in range(10):
            probe_rows.append((u, f"p{u}_{rng.randrange(10**6)}",
                               rng.randrange(1100)))
    changes = spark.createDataFrame(
        [(u, e, s, t) for u, e, s, t in dim_rows],
        "user_id long, event_id string, state_val string, t long",
    ).selectExpr(
        "user_id", "event_id", "state_val",
        "CAST(to_timestamp(t) AS timestamp) AS ts",
    )
    dim = scd2_intervals(changes, state="state_val")
    probes = spark.createDataFrame(
        probe_rows, "user_id long, event_id string, ts_us long"
    ).withColumn("ts_us", F.col("ts_us") * 1_000_000)
    got = {
        (r.user_id, r.event_id): (r.dim_state, r.dim_version)
        for r in scd2_lookup(probes, dim).collect()
    }
    by_user = defaultdict(list)
    for u, e, s, t in dim_rows:
        by_user[u].append((t, s))
    want = {}
    for u, e, t in probe_rows:
        vers = sorted(by_user[u])
        state, version = None, None
        for i, (vt, vs) in enumerate(vers):
            if vt <= t:
                state, version = vs, i + 1
        want[(u, e)] = (state, version)
    assert got == want


def test_profile_columns_vs_naive(spark):
    rows = [(1, "a", 10), (2, "a", None), (3, None, 10), (4, "b", 30),
            (4, "b", 30)]
    df = spark.createDataFrame(rows, "id long, cat string, v long")
    got = {r.col_name: (r.n_rows, r.n_null, r.n_distinct, r.min_s, r.max_s)
           for r in profile_columns(df, ["id", "cat", "v"]).collect()}
    assert got == {
        "id": (5, 0, 4, "1", "4"),
        "cat": (5, 1, 2, "a", "b"),
        "v": (5, 1, 2, "10", "30"),
    }


def test_expectation_checks_vs_naive(spark):
    rows = [(1, "x", 5.0), (2, "x", 50.0), (3, "y", 500.0), (4, None, 7.0),
            (4, "z", None)]
    df = spark.createDataFrame(rows, "id long, cat string, v double")
    got = {r.rule: (r.metric_num, r.metric_den, r.passed)
           for r in expectation_checks(
               df,
               completeness=["cat", "v"],
               unique=["id"],
               member_of={"cat": ["x", "y"]},
               ranges={"v": (0.0, 100.0)},
               min_rows=3,
           ).collect()}
    assert got == {
        "complete(cat)": (4, 5, 0),
        "complete(v)": (4, 5, 0),
        "unique(id)": (4, 5, 0),
        "in_set(cat)": (3, 5, 0),
        "in_range(v)": (3, 5, 0),  # NULL and 500.0 both fail the range
        "min_rows": (5, 3, 1),
    }


def test_expectation_checks_all_pass(spark):
    df = spark.createDataFrame(
        [(1, "x", 5.0), (2, "y", 50.0)], "id long, cat string, v double"
    )
    out = expectation_checks(
        df, completeness=["cat"], unique=["id"],
        member_of={"cat": ["x", "y"]}, ranges={"v": (0.0, 100.0)},
        min_rows=2,
    ).collect()
    assert all(r.passed == 1 for r in out)
