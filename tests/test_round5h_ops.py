"""Round-5 additions (eighth batch): Cochran's Q and Cohen's d /
Hedges' g vs verbatim naive oracles."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from featureextraction_spark.operators.evaluation import cochran_q, cohens_d


def test_cochran_q_vs_naive(spark):
    rows = [
        (1, 1, 1), (1, 1, 0), (1, 0, 0), (1, 1, 1), (0, 0, 0),
        (1, 0, 1), (0, 1, 0), (1, 1, 0), (1, 1, 1), (0, 0, 1),
    ]
    df = spark.createDataFrame(
        [(bool(a), bool(b), bool(c)) for a, b, c in rows],
        "a boolean, b boolean, c boolean",
    )
    row = cochran_q(df, [F.col("a"), F.col("b"), F.col("c")]).collect()[0]
    k = 3
    cj = [sum(r[j] for r in rows) for j in range(k)]
    ri = [sum(r) for r in rows]
    n = sum(cj)
    q_num = (k - 1) * (k * sum(c * c for c in cj) - n * n)
    q_den = k * n - sum(r * r for r in ri)
    assert (row["n_units"], row["k"], row["n_succ"]) == (len(rows), k, n)
    assert row["sum_cj2"] == sum(c * c for c in cj)
    assert row["sum_ri2"] == sum(r * r for r in ri)
    assert (row["q_num"], row["q_den"]) == (q_num, q_den)
    assert abs(row["q"] - q_num / q_den) < 1e-15


def test_cochran_q_unanimous_null(spark):
    # every row unanimous -> k*N == sum R_i^2 -> Q undefined
    df = spark.createDataFrame(
        [(True, True), (False, False), (True, True)],
        "a boolean, b boolean",
    )
    row = cochran_q(df, [F.col("a"), F.col("b")]).collect()[0]
    assert row["q_den"] == 0 and row["q"] is None


def test_cochran_q_requires_two_flags(spark):
    df = spark.createDataFrame([(True,)], "a boolean")
    with pytest.raises(ValueError):
        cochran_q(df, [F.col("a")])


def test_cohens_d_vs_naive(spark):
    groups = {"a": [10, 12, 14, 16], "b": [20, 21, 22], "c": [5, 5, 5]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r["group_a"], r["group_b"]): r
        for r in cohens_d(df, "g", "v").collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (ga, gb), r in got.items():
        va, vb = groups[ga], groups[gb]
        na, nb = len(va), len(vb)
        ma, mb = sum(va) / na, sum(vb) / nb
        ssa = sum((x - ma) ** 2 for x in va)
        ssb = sum((x - mb) ** 2 for x in vb)
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert (r["s_a"], r["s_b"]) == (sum(va), sum(vb))
        if ssa + ssb > 0:
            sp = math.sqrt((ssa + ssb) / (na + nb - 2))
            d = (ma - mb) / sp
            g = d * (1 - 3 / (4 * (na + nb) - 9))
            assert abs(r["d"] - d) < 1e-9
            assert abs(r["g"] - g) < 1e-9
    # both groups constant -> pooled variance 0 -> NULL
    assert got[("b", "c")]["d"] is not None  # b has variance
    zero = spark.createDataFrame(
        [("x", 3), ("x", 3), ("y", 9), ("y", 9)], "g string, v long"
    )
    assert cohens_d(zero, "g", "v").collect()[0]["d"] is None
