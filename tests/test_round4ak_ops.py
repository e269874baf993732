"""Round-4 additions (thirty-second batch): CUBE coverage matrix,
pairwise-cosine geometry profile — each vs a verbatim naive python
oracle, plus plan shape audits."""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter

from pyspark.sql import functions as F

from featureextraction_spark.operators.olap import cube_counts
from featureextraction_spark.operators.similarity import pair_distance_profile


def test_cube_counts_vs_naive(spark):
    rng = random.Random(431)
    rows = [
        (rng.choice(["en", "de", None]), rng.choice(["web", "book"]),
         rng.randrange(1000))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "lang string, source string, v long")
    got = {
        (r["lang"], r["source"], r["g1_total"], r["g2_total"]):
            (r["n"], r["sum_v"])
        for r in cube_counts(df, "lang", "source", "v").collect()
    }
    # four levels, computed naively
    want = {}
    for keyer, flags in (
        (lambda r: (r[0], r[1]), (0, 0)),
        (lambda r: (r[0], None), (0, 1)),
        (lambda r: (None, r[1]), (1, 0)),
        (lambda r: (None, None), (1, 1)),
    ):
        agg = {}
        for r in rows:
            k = keyer(r)
            n, s = agg.get(k, (0, 0))
            agg[k] = (n + 1, s + r[2])
        for k, v in agg.items():
            want[(k[0], k[1], flags[0], flags[1])] = v
    assert got == want
    # a real NULL lang row is distinguishable from the lang subtotal
    assert (None, "web", 0, 0) in got and (None, "web", 1, 0) in got


def test_cube_is_single_expand_single_agg(spark):
    df = spark.createDataFrame(
        [("en", "web", 1)], "lang string, source string, v long"
    )
    plan = (
        cube_counts(df, "lang", "source", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") == 1  # one scan, not four


def _h60(value, seed) -> int:
    return int(hashlib.md5(f"{value}:{seed}".encode()).hexdigest()[:15], 16)


def test_pair_distance_profile_vs_naive(spark):
    rng = random.Random(432)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["bin"]: (r["lo_q6"], r["n_pairs"], r["total_pairs"], r["share"])
        for r in pair_distance_profile(df, sample_mod=2).collect()
    }

    sample = [(i, v) for i, v in rows if _h60(i, 7) % 2 == 0]
    hist = Counter()
    for ai in range(len(sample)):
        for bi in range(ai + 1, len(sample)):
            a, b = sample[ai][1], sample[bi][1]
            dot = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            q = math.floor(dot / (na * nb) * 1e6 + 0.5)
            hist[(q + 1_000_000) // 100_000] += 1
    total = sum(hist.values())
    assert total == len(sample) * (len(sample) - 1) // 2
    assert set(got) == set(hist)
    for b, n in hist.items():
        lo, np_, tp, share = got[b]
        assert (lo, np_, tp) == (b * 100_000 - 1_000_000, n, total)
        assert math.isclose(share, n / total, rel_tol=1e-9)


def test_pair_profile_identical_vectors_land_in_top_bin(spark):
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = pair_distance_profile(df, sample_mod=1).collect()
    assert len(got) == 1
    assert got[0]["bin"] == 20  # cos == 1.0 exactly -> q = 1e6
    assert got[0]["n_pairs"] == 45 == got[0]["total_pairs"]


def test_pair_profile_sample_side_broadcasts(spark):
    rows = [(i, [float(i), 1.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plan = (
        pair_distance_profile(df, sample_mod=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Broadcast" in plan
    # the pair stream flows into an aggregate, never a sort
    assert "SortMergeJoin" not in plan
