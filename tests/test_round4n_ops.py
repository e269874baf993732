"""Round-4 additions (thirteenth batch): histogram-quantile sketch and
χ² term/label feature selection — each vs a verbatim naive python
oracle."""

from __future__ import annotations

import math
import random
import re
from collections import Counter

import pytest

from featureextraction_spark.operators.selection import chi2_terms
from featureextraction_spark.operators.sketches import (
    hist_bins,
    hist_quantile_estimate,
)
from pyspark.sql import functions as F

W = 8


def _naive_hist_quantiles(values, width, quantiles):
    bins = Counter(v // width for v in values if v is not None)
    ordered = sorted(bins.items())
    n = sum(bins.values())
    out = {}
    for num, den in quantiles:
        rank = max(1, -((-num * n) // den))  # ceil via negative floor-div
        cum = 0
        for b, cnt in ordered:
            if cum < rank <= cum + cnt:
                est = b * width + (rank - cum) * width / cnt
                out[(num, den)] = (rank, b, cnt, round(est + 1e-9, 6))
                break
            cum += cnt
    return out


def test_hist_quantiles_vs_naive(spark):
    rng = random.Random(7)
    vals = [rng.randrange(0, 500) for _ in range(2000)] + [None, 0, 499]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    qs = ((1, 4), (1, 2), (9, 10), (99, 100))
    got = {
        (r.q_num, r.q_den): (r.rank, r.bin, r.bin_cnt, r.est_q)
        for r in hist_quantile_estimate(
            hist_bins(df, "v", bin_width=W), bin_width=W, quantiles=qs
        ).collect()
    }
    assert got == _naive_hist_quantiles(vals, W, qs)


def test_hist_quantiles_exact_when_width_one(spark):
    # width 1 degrades the sketch to the exact distribution: the p50/p90
    # estimates must land exactly on the order statistics + 1 boundary
    vals = list(range(1000))
    random.Random(3).shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    rows = hist_quantile_estimate(
        hist_bins(df, "v", bin_width=1), bin_width=1, quantiles=((1, 2), (9, 10))
    ).collect()
    by_q = {(r.q_num, r.q_den): r for r in rows}
    # rank = ceil(q*1000); value at that rank is rank-1 (0-based sorted);
    # interpolation inside a singleton bin adds exactly width=1
    assert by_q[(1, 2)].est_q == pytest.approx(499 + 1.0)
    assert by_q[(9, 10)].est_q == pytest.approx(899 + 1.0)


def test_hist_bins_merge_across_shards(spark):
    # the mergeable-sketch contract: bins(A ∪ B) == bins(A) + bins(B)
    a = spark.createDataFrame([(i % 40,) for i in range(500)], "v int")
    b = spark.createDataFrame([(i % 23,) for i in range(300)], "v int")
    merged = (
        hist_bins(a, "v", W)
        .unionByName(hist_bins(b, "v", W))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = hist_bins(a.unionByName(b), "v", W)
    assert {(r.bin, r.cnt) for r in merged.collect()} == {
        (r.bin, r.cnt) for r in whole.collect()
    }


TOK = re.compile(r"[^ \t\n\r\f\x0b]+")


def _naive_chi2(rows, min_df):
    n1 = sum(y for _, y, _ in rows)
    n0 = len(rows) - n1
    cells: Counter = Counter()
    for _, y, text in rows:
        for t in set(TOK.findall((text or "").lower())):
            cells[(t, y)] += 1
    out = {}
    terms = {t for (t, _) in cells}
    for t in terms:
        a, b = cells.get((t, 1), 0), cells.get((t, 0), 0)
        if a + b < min_df:
            continue
        c, d = n1 - a, n0 - b
        den = (a + b) * (c + d) * (a + c) * (b + d)
        num = (n1 + n0) * (a * d - b * c) ** 2
        out[t] = (a, b, round((num / den if den else 0.0) + 1e-9, 6))
    return out


def test_chi2_terms_vs_naive(spark):
    rng = random.Random(11)
    words_pos = ["alpha", "beta", "gamma", "shared", "rare"]
    words_neg = ["delta", "epsilon", "shared", "Zeta"]
    rows = []
    for i in range(120):
        y = i % 2
        pool = words_pos if y else words_neg
        text = " ".join(rng.choice(pool) for _ in range(rng.randrange(3, 9)))
        rows.append((i, y, text))
    rows.append((900, 1, None))
    df = spark.createDataFrame(rows, "doc_id long, y long, text string")
    got = {
        r.term: (r.df_pos, r.df_neg, r.chi2_q)
        for r in chi2_terms(df, label=F.col("y"), min_df=3).collect()
    }
    assert got == _naive_chi2([(i, y, t) for i, y, t in rows], 3)


def test_chi2_degenerate_term_scores_zero(spark):
    # a term present in EVERY document has an empty ¬t margin -> chi2 0
    rows = [(i, i % 2, f"always w{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, y long, text string")
    got = {r.term: r.chi2_q for r in chi2_terms(df, label=F.col("y"), min_df=3).collect()}
    assert got["always"] == pytest.approx(1e-9, abs=1e-12) or got["always"] == 0.0


def test_chi2_int64_budget_documented_bound():
    # the docstring's N^5/16 worst-case budget: exact to N ~ 1e4
    n = 10**4
    assert n * (n * n // 4) ** 2 < 2**63  # exact at the documented bound
    n = 2 * 10**4
    assert n * (n * n // 4) ** 2 >= 2**63  # would overflow past it
