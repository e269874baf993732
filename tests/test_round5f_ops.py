"""Round-5 additions (sixth batch): Zipf fit, Chao1 richness, vocabulary
overlap, Gini concentration, diversity indices, McNemar's test vs
verbatim naive oracles."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from featureextraction_spark.functions.textstats import (
    chao1_richness,
    vocab_overlap,
    zipf_fit,
)
from featureextraction_spark.operators.cache import (
    release_persisted_intermediates,
)
from featureextraction_spark.operators.evaluation import mcnemar_test
from featureextraction_spark.operators.profiling import (
    diversity_indices,
    gini_concentration,
)


def _tok(s):
    return s.lower().split()


def test_zipf_fit_vs_naive(spark):
    # a synthetic corpus with an exact power-ish law: token t_i appears
    # 200//(i+1) times
    words = []
    for i in range(40):
        words += [f"t{i:02d}"] * (200 // (i + 1))
    docs = [(" ".join(words[j::7]),) for j in range(7)]
    df = spark.createDataFrame(docs, "text string")
    row = zipf_fit(df, "text", top_k=25).collect()[0]

    cnt = Counter(w for d, in docs for w in _tok(d))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(c) for _, c in top]
    k = len(top)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    intercept = (sy - slope * sx) / k
    r2 = (k * sxy - sx * sy) ** 2 / ((k * sxx - sx * sx) * (k * syy - sy * sy))

    assert row["k"] == k
    assert row["top1_cnt"] == top[0][1]
    assert row["sum_cnt_topk"] == sum(c for _, c in top)
    assert abs(row["slope"] - slope) < 1e-9
    assert abs(row["intercept"] - intercept) < 1e-9
    assert abs(row["r2"] - r2) < 1e-9
    assert row["slope"] < 0  # frequency falls with rank


def test_zipf_fit_degenerate_uniform(spark):
    # one distinct count only -> vary == 0 -> r2 NULL, slope 0/varx...
    # all counts equal: varx > 0, cov == 0 -> slope == 0, r2 NULL
    df = spark.createDataFrame([("a b c d",)] * 3, "text string")
    row = zipf_fit(df, "text", top_k=10).collect()[0]
    assert row["k"] == 4
    assert abs(row["slope"]) < 1e-12
    assert row["r2"] is None


def test_chao1_vs_naive(spark):
    rows = [
        ("en", "a a a b b c d e"),
        ("en", "a b f g"),
        ("de", "x y y z z z"),
        ("de", ""),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {
        r["slice"]: r for r in chao1_richness(df, "text", "lang").collect()
    }
    for lang in ("en", "de"):
        cnt = Counter(
            w for lg, t in rows if lg == lang for w in _tok(t)
        )
        v = len(cnt)
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        n = sum(cnt.values())
        r = got[lang]
        assert (r["n_tokens"], r["vocab"], r["f1"], r["f2"]) == (n, v, f1, f2)
        assert abs(r["chao1"] - (v + f1 * (f1 - 1) / (2 * (f2 + 1)))) < 1e-12
        assert abs(r["coverage"] - (1 - f1 / n)) < 1e-12
        assert r["chao1"] >= r["vocab"]  # estimator never below observed


def test_vocab_overlap_vs_naive(spark):
    rows = [
        ("en", "the cat sat on the mat"),
        ("de", "die katze sat auf der mat"),
        ("fr", "le chat sat sur le mat on"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {
        (r["slice_a"], r["slice_b"]): r
        for r in vocab_overlap(df, "text", "lang").collect()
    }
    release_persisted_intermediates()
    vocab = {lg: set(_tok(t)) for lg, t in rows}
    for a in vocab:
        for b in vocab:
            if a >= b:
                continue
            inter = len(vocab[a] & vocab[b])
            r = got[(a, b)]
            assert (r["v_a"], r["v_b"], r["inter"]) == (
                len(vocab[a]),
                len(vocab[b]),
                inter,
            )
            assert abs(
                r["jaccard"] - inter / len(vocab[a] | vocab[b])
            ) < 1e-12
            assert abs(
                r["overlap"] - inter / min(len(vocab[a]), len(vocab[b]))
            ) < 1e-12


def test_gini_concentration_vs_naive(spark):
    vals = [5, 1, 1, 8, 3, 3, 3, 20, 0, 7]
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v long, id long"
    )
    row = gini_concentration(df, "v", "id").collect()[0]
    release_persisted_intermediates()
    xs = sorted(vals)
    n = len(xs)
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    assert row["n"] == n
    assert row["sum_v"] == sum(xs)
    assert row["gini_num"] == num
    assert abs(row["gini"] - num / (n * sum(xs))) < 1e-12


def test_gini_concentration_extremes(spark):
    # perfectly equal -> 0; one unit owns everything -> (n-1)/n
    eq = spark.createDataFrame([(4, i) for i in range(8)], "v long, id long")
    assert abs(gini_concentration(eq, "v", "id").collect()[0]["gini"]) < 1e-12
    release_persisted_intermediates()
    mono = spark.createDataFrame(
        [(0, i) for i in range(7)] + [(100, 7)], "v long, id long"
    )
    g = gini_concentration(mono, "v", "id").collect()[0]["gini"]
    release_persisted_intermediates()
    assert abs(g - 7 / 8) < 1e-12


def test_diversity_indices_vs_naive(spark):
    rows = [("s1", f"c{i % 5}") for i in range(50)] + [("s2", "c0")] * 30 + [
        ("s2", "c1")
    ] * 2 + [("s3", "c9")] * 4
    df = spark.createDataFrame(rows, "part string, cat string")
    got = {r["part"]: r for r in diversity_indices(df, "part", "cat").collect()}
    for part in ("s1", "s2", "s3"):
        cnt = Counter(c for p, c in rows if p == part)
        n = sum(cnt.values())
        k = len(cnt)
        simpson = 1 - sum(c * (c - 1) for c in cnt.values()) / (n * (n - 1))
        shannon = math.log(n) - sum(
            c * math.log(c) for c in cnt.values()
        ) / n
        r = got[part]
        assert (r["n"], r["k"]) == (n, k)
        assert r["sum_nc2"] == sum(c * c for c in cnt.values())
        assert abs(r["simpson"] - simpson) < 1e-12
        assert abs(r["shannon"] - shannon) < 1e-9
        if k > 1:
            assert abs(r["evenness"] - shannon / math.log(k)) < 1e-9
        else:
            assert r["evenness"] is None
    # uniform 5-way mix is more diverse than the 30:2 near-monoculture
    assert got["s1"]["simpson"] > got["s2"]["simpson"]
    assert got["s3"]["evenness"] is None  # single category


def test_mcnemar_vs_naive(spark):
    # A right on 60, both right on 25, B-only right on 10, both wrong 5
    flags = [(True, False)] * 60 + [(True, True)] * 25 + [
        (False, True)
    ] * 10 + [(False, False)] * 5
    df = spark.createDataFrame(flags, "ca boolean, cb boolean")
    row = mcnemar_test(df, F.col("ca"), F.col("cb")).collect()[0]
    b, c = 60, 10
    assert (row["n"], row["n10"], row["n01"], row["n11"], row["n00"]) == (
        100,
        b,
        c,
        25,
        5,
    )
    assert row["chi2_num"] == (abs(b - c) - 1) ** 2
    assert abs(row["chi2"] - (abs(b - c) - 1) ** 2 / (b + c)) < 1e-12


def test_mcnemar_identical_classifiers_null(spark):
    df = spark.createDataFrame(
        [(True, True)] * 9 + [(False, False)] * 3, "ca boolean, cb boolean"
    )
    row = mcnemar_test(df, F.col("ca"), F.col("cb")).collect()[0]
    assert row["n10"] == row["n01"] == 0
    assert row["chi2"] is None
