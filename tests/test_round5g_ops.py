"""Round-5 additions (seventh batch): LOO target encoding, one-way
ANOVA F, Kendall tau-b, l-diversity audit, temperature mix, Theil index
vs verbatim naive oracles."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from itertools import combinations

from pyspark.sql import functions as F

from featureextraction_spark.operators.curation import (
    l_diversity_audit,
    temperature_mix,
)
from featureextraction_spark.operators.encoding import loo_target_encode
from featureextraction_spark.operators.evaluation import (
    anova_f,
    kendall_tau_b,
)
from featureextraction_spark.operators.profiling import theil_index


def test_loo_target_encode_vs_naive(spark):
    rows = [
        (0, "a", 1), (1, "a", 0), (2, "a", 1),
        (3, "b", 0), (4, "b", 0),
        (5, "c", 1),  # singleton -> global prior fallback
    ]
    df = spark.createDataFrame(rows, "id long, cat string, y long")
    got = {
        r["id"]: r
        for r in loo_target_encode(df, "cat", "y", "id").collect()
    }
    s_tot = sum(y for *_, y in rows)
    n_tot = len(rows)
    by_cat = defaultdict(list)
    for i, c, y in rows:
        by_cat[c].append(y)
    for i, c, y in rows:
        peers = by_cat[c]
        r = got[i]
        assert (r["n_cat"], r["sum_y"]) == (len(peers), sum(peers))
        if len(peers) > 1:
            want = (sum(peers) - y) / (len(peers) - 1)
            assert abs(r["loo"] - want) < 1e-15
            assert r["encoded"] == r["loo"]
        else:
            assert r["loo"] is None
            assert abs(r["encoded"] - (s_tot - y) / (n_tot - 1)) < 1e-15


def test_anova_f_vs_naive(spark):
    groups = {"g1": [10, 12, 11, 13], "g2": [20, 22, 21], "g3": [10, 30, 20]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    row = anova_f(df, "g", "v").collect()[0]
    all_v = [v for _, v in rows]
    n, k = len(all_v), len(groups)
    gm = sum(all_v) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in groups.values())
    ssw = sum(
        (v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (row["n"], row["k"]) == (n, k)
    assert abs(row["ssb"] - ssb) < 1e-9
    assert abs(row["ssw"] - ssw) < 1e-9
    assert abs(row["f"] - f) < 1e-9


def test_anova_f_degenerate(spark):
    # one group -> F NULL; zero within-variance -> F NULL
    one = spark.createDataFrame([("g", 1), ("g", 5)], "g string, v long")
    assert anova_f(one, "g", "v").collect()[0]["f"] is None
    flat = spark.createDataFrame(
        [("a", 3), ("a", 3), ("b", 7), ("b", 7)], "g string, v long"
    )
    assert anova_f(flat, "g", "v").collect()[0]["f"] is None


def _naive_tau_b(pairs):
    n = len(pairs)
    conc = disc = 0
    for (a1, b1), (a2, b2) in combinations(pairs, 2):
        s = (a1 - a2) * (b1 - b2)
        if s > 0:
            conc += 1
        elif s < 0 and a1 != a2 and b1 != b2:
            disc += 1
    n0 = n * (n - 1) // 2
    ta = Counter(a for a, _ in pairs)
    tb = Counter(b for _, b in pairs)
    n1 = sum(t * (t - 1) // 2 for t in ta.values())
    n2 = sum(t * (t - 1) // 2 for t in tb.values())
    tau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
    return n, conc, disc, n0, n1, n2, tau


def test_kendall_tau_b_vs_naive(spark):
    pairs = [
        (1, 1), (1, 2), (2, 1), (2, 3), (3, 3), (3, 3),
        (4, 2), (4, 5), (5, 4), (5, 5), (1, 1), (2, 2),
    ]
    df = spark.createDataFrame(pairs, "a long, b long")
    row = kendall_tau_b(df, "a", "b").collect()[0]
    n, conc, disc, n0, n1, n2, tau = _naive_tau_b(pairs)
    assert (row["n"], row["conc"], row["disc"]) == (n, conc, disc)
    assert (row["n0"], row["n1"], row["n2"]) == (n0, n1, n2)
    assert abs(row["tau_b"] - tau) < 1e-12


def test_kendall_tau_b_perfect_and_degenerate(spark):
    inc = spark.createDataFrame([(i, 2 * i) for i in range(8)], "a long, b long")
    assert abs(kendall_tau_b(inc, "a", "b").collect()[0]["tau_b"] - 1.0) < 1e-12
    dec = spark.createDataFrame([(i, -i) for i in range(8)], "a long, b long")
    assert abs(kendall_tau_b(dec, "a", "b").collect()[0]["tau_b"] + 1.0) < 1e-12
    const = spark.createDataFrame([(i, 7) for i in range(5)], "a long, b long")
    assert kendall_tau_b(const, "a", "b").collect()[0]["tau_b"] is None


def test_l_diversity_audit_vs_naive(spark):
    rows = [
        ("en", "web", 1), ("en", "web", 2), ("en", "web", 3),
        ("en", "book", 5), ("en", "book", 5),
        ("de", "web", 1), ("de", "web", 2),
    ]
    df = spark.createDataFrame(rows, "lang string, source string, s long")
    got = {
        (r["lang"], r["source"]): r
        for r in l_diversity_audit(df, ["lang", "source"], "s", 2).collect()
    }
    assert got[("en", "web")]["n"] == 3
    assert got[("en", "web")]["l_distinct"] == 3
    assert got[("en", "web")]["diverse"] is True
    assert got[("en", "book")]["l_distinct"] == 1
    assert got[("en", "book")]["diverse"] is False  # k-anonymous but leaky
    assert got[("de", "web")]["diverse"] is True


def test_temperature_mix_vs_naive(spark):
    counts = {"web": 700, "book": 200, "code": 100}
    rows = [(s,) for s, n in counts.items() for _ in range(n // 10)]
    df = spark.createDataFrame(rows, "source string")
    got = {r["group"]: r for r in temperature_mix(df, "source", 0.5).collect()}
    ws = {s: (n // 10) ** 0.5 for s, n in counts.items()}
    wsum = sum(ws.values())
    ntot = sum(n // 10 for n in counts.values())
    for s, n in counts.items():
        r = got[s]
        assert r["n"] == n // 10
        assert abs(r["p_sample"] - ws[s] / wsum) < 1e-12
        assert abs(r["p_natural"] - (n // 10) / ntot) < 1e-12
        assert abs(r["boost"] - r["p_sample"] / r["p_natural"]) < 1e-12
    # temperature < 1 boosts the rare source, damps the dominant one
    assert got["code"]["boost"] > 1.0 > got["web"]["boost"]


def test_theil_index_vs_naive(spark):
    vals = [5, 1, 1, 8, 3, 3, 3, 20, 0, 7]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = theil_index(df, "v").collect()[0]
    pos = [v for v in vals if v > 0]
    s = sum(pos)
    theil = sum((x / s) * math.log(x / (s / len(pos))) for x in pos)
    assert (row["n"], row["n_zero"], row["sum_v"]) == (len(pos), 1, s)
    assert abs(row["theil"] - theil) < 1e-12


def test_theil_index_extremes(spark):
    eq = spark.createDataFrame([(4,)] * 8, "v long")
    assert abs(theil_index(eq, "v").collect()[0]["theil"]) < 1e-12
    mono = spark.createDataFrame([(0,)] * 7 + [(100,)], "v long")
    r = theil_index(mono, "v").collect()[0]
    # all mass on the single positive unit -> T = ln(1) = 0 among
    # positive units; zeros are excluded by definition
    assert r["n"] == 1 and abs(r["theil"]) < 1e-12
