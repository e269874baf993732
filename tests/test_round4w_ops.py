"""Round-4 additions (twenty-second batch): rank-k retrieval metrics
and Cohen's kappa labeler agreement — each vs a verbatim naive python
oracle."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

import pytest

from featureextraction_spark.operators.evaluation import (
    cohens_kappa,
    ranking_metrics,
)


def _naive_ranking(run_rows, qrel_rows, k):
    qrels = defaultdict(set)
    for q, d in qrel_rows:
        qrels[q].add(d)
    per = defaultdict(list)
    for q, d, r in run_rows:
        if r <= k:
            per[q].append((r, d))
    exp = {}
    for q, lst in per.items():
        rel_ranks = sorted(r for r, d in lst if d in qrels[q])
        hits = len(rel_ranks)
        first = rel_ranks[0] if rel_ranks else None
        n_rel = len(qrels[q])
        exp[q] = (
            n_rel,
            hits,
            first,
            (2520 // first) if first else 0,
            sum(2520 // r for r in rel_ranks),
            hits / k,
            hits / n_rel if n_rel else 0.0,
        )
    return exp


def test_ranking_metrics_vs_naive(spark):
    rng = random.Random(73)
    run_rows = []
    qrel_rows = []
    for q in range(30):
        docs = rng.sample(range(200), 10)
        run_rows += [(q, d, i + 1) for i, d in enumerate(docs)]
        # relevant set overlaps the run partially; one query gets none
        if q != 7:
            rel = set(rng.sample(docs, rng.randint(0, 5))) | {
                500 + q  # relevant doc NOT retrieved (recall < 1)
            }
            qrel_rows += [(q, d) for d in rel]
    run = spark.createDataFrame(
        run_rows, "query_id long, neighbor_id long, rank long"
    )
    qrels = spark.createDataFrame(qrel_rows, "query_id long, rel_id long")
    got = {
        r.query_id: (
            r.n_rel, r.hits, r.first_rel_rank, r.rr_x2520,
            r.dcg_lin_x2520, r.precision_at_10, r.recall_at_10,
        )
        for r in ranking_metrics(run, qrels, k=10).collect()
    }
    exp = _naive_ranking(run_rows, qrel_rows, 10)
    assert set(got) == set(exp)
    for q in exp:
        assert got[q][:5] == exp[q][:5], q
        assert got[q][5] == pytest.approx(exp[q][5])
        assert got[q][6] == pytest.approx(exp[q][6])
    # query 7 has no qrels at all: n_rel 0, recall 0
    assert got[7][0] == 0 and got[7][6] == 0.0


def test_ranking_metrics_k_cap(spark):
    run = spark.createDataFrame(
        [(0, 1, 1)], "query_id long, neighbor_id long, rank long"
    )
    qrels = spark.createDataFrame([(0, 1)], "query_id long, rel_id long")
    with pytest.raises(ValueError):
        ranking_metrics(run, qrels, k=11)


def test_cohens_kappa_vs_naive(spark):
    rng = random.Random(79)
    cats = ["en", "de", "fr", "es", "unknown"]
    rows = [
        (rng.choice(cats), rng.choice(cats)) for _ in range(500)
    ] + [("en", "en")] * 200  # skew the agreement above chance
    df = spark.createDataFrame(rows, "a string, b string")
    row = cohens_kappa(df, "a", "b").collect()[0]
    n = len(rows)
    agree = sum(1 for a, b in rows if a == b)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    rc = sum(ra[c] * cb[c] for c in set(ra) & set(cb))
    assert (row.n, row.agree, row.rc_sum) == (n, agree, rc)
    assert row.kappa_num == n * agree - rc
    assert row.kappa_den == n * n - rc
    assert row.kappa == pytest.approx((n * agree - rc) / (n * n - rc))


def test_cohens_kappa_degenerate(spark):
    # perfect single-category agreement: p_e == 1, kappa undefined (NULL)
    df = spark.createDataFrame([("x", "x")] * 5, "a string, b string")
    row = cohens_kappa(df, "a", "b").collect()[0]
    assert row.kappa_den == 0 and row.kappa is None
    # perfect multi-category agreement: kappa == 1
    df2 = spark.createDataFrame(
        [("x", "x"), ("y", "y")], "a string, b string"
    )
    row2 = cohens_kappa(df2, "a", "b").collect()[0]
    assert row2.kappa == pytest.approx(1.0)
