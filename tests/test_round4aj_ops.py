"""Round-4 additions (thirty-first batch): KMV distinct-count sketch,
join-explosion audit, and plan audits for the two TPC-H-shaped
warehouse joins — each vs a verbatim naive python oracle."""

from __future__ import annotations

import hashlib
import random
from collections import Counter

from pyspark.sql import functions as F

from featureextraction_spark.operators.profiling import join_explosion_audit
from featureextraction_spark.operators.sketches import (
    KMV_SPACE,
    kmv_estimate,
    kmv_sketch,
)


def _h60(value, seed=0) -> int:
    return int(hashlib.md5(f"{value}:{seed}".encode()).hexdigest()[:15], 16)


def test_kmv_state_vs_naive(spark):
    rng = random.Random(421)
    rows = [("g1", rng.randrange(500)) for _ in range(3000)]
    rows += [("g2", rng.randrange(10)) for _ in range(200)]  # < k distinct
    df = spark.createDataFrame(rows, "g string, v long")
    state = kmv_sketch(df, "v", k=32, group="g").collect()
    by_g = {}
    for r in state:
        by_g.setdefault(r["g"], []).append((r["rn"], r["h"]))
    for g in ("g1", "g2"):
        hashes = sorted({_h60(v) for gg, v in rows if gg == g})
        want = [(i + 1, h) for i, h in enumerate(hashes[:32])]
        assert sorted(by_g[g]) == want


def test_kmv_estimate_exact_below_k_and_accurate_above(spark):
    rng = random.Random(422)
    # 5000 distinct values: estimate should land within ~25% at k=64
    rows = [("big", v) for v in range(5000)]
    rows += [("small", v) for v in range(7)]
    df = spark.createDataFrame(rows, "g string, v long")
    est = {
        r["g"]: r
        for r in kmv_estimate(
            kmv_sketch(df, "v", k=64, group="g"), k=64, group="g"
        ).collect()
    }
    assert est["small"]["n_kept"] == 7
    assert est["small"]["kmv_estimate"] == 7.0
    got = est["big"]["kmv_estimate"]
    assert 0.75 * 5000 < got < 1.25 * 5000
    # the estimator formula itself, bit for bit
    assert got == 63.0 * KMV_SPACE / float(est["big"]["kth_hash"])


def test_kmv_states_merge(spark):
    # union of two shard states, re-sketched, equals the whole sketch
    rng = random.Random(423)
    vals = [rng.randrange(100000) for _ in range(4000)]
    a = spark.createDataFrame([(v,) for v in vals[:2500]], "v long")
    b = spark.createDataFrame([(v,) for v in vals[2500:]], "v long")
    whole = spark.createDataFrame([(v,) for v in vals], "v long")
    sa = kmv_sketch(a, "v", k=32).select("h")
    sb = kmv_sketch(b, "v", k=32).select("h")
    merged = (
        sa.union(sb)
        .distinct()
        .orderBy("h")
        .limit(32)
        .collect()
    )
    direct = kmv_sketch(whole, "v", k=32).orderBy("h").collect()
    assert [r["h"] for r in merged] == [r["h"] for r in direct]


def test_join_explosion_audit_vs_naive(spark):
    rng = random.Random(424)
    left = [(rng.randrange(30),) for _ in range(800)]
    right = [(rng.randrange(40),) for _ in range(600)]
    dl = spark.createDataFrame(left, "k long")
    dr = spark.createDataFrame(right, "k long")
    got = join_explosion_audit(dl, dr, "k", top_n=10).collect()

    cl, cr = Counter(k for k, in left), Counter(k for k, in right)
    pk = {k: (cl[k], cr[k], cl[k] * cr[k]) for k in cl if k in cr}
    total = sum(p for _, _, p in pk.values())
    mx = max(p for _, _, p in pk.values())
    order = sorted(pk, key=lambda k: (-pk[k][2], k))[:10]

    assert [r["k"] for r in sorted(got, key=lambda r: r["rank"])] == order
    for r in got:
        nl, nr, p = pk[r["k"]]
        assert (r["nl"], r["nr"], r["pairs"]) == (nl, nr, p)
        assert r["total_pairs"] == total
        assert r["matched_keys"] == len(pk)
        assert r["max_pairs"] == mx
    # the audit's prediction IS the join's cardinality
    assert total == dl.join(dr, "k").count()


def test_join_audit_prediction_matches_real_join_with_misses(spark):
    dl = spark.createDataFrame([(1,), (1,), (2,), (99,)], "k long")
    dr = spark.createDataFrame([(1,), (2,), (2,), (7,)], "k long")
    got = join_explosion_audit(dl, dr, "k").collect()
    assert got[0]["total_pairs"] == dl.join(dr, "k").count() == 4
    assert {r["k"] for r in got} == {1, 2}  # unmatched keys never appear


def test_join_audit_topk_is_two_phase_salted(spark):
    # the global top-k must pre-prune per salt bucket so the final
    # (single-partition) rank only ever sees <= n_salts*top_n survivors
    dl = spark.createDataFrame([(i % 50,) for i in range(500)], "k long")
    dr = spark.createDataFrame([(i % 60,) for i in range(500)], "k long")
    plan = (
        join_explosion_audit(dl, dr, "k", top_n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__salt" in plan  # phase-1 salted window present
    # phase-1 rank<=k is planned as a map-side partial WindowGroupLimit
    assert "WindowGroupLimit" in plan


def test_tpch_joins_broadcast_dimensions(spark, tmp_path):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    plan3 = (
        entry.queries()["ship_priority"](spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan3  # filtered customer dim
    plan5 = (
        entry.queries()["regional_revenue"](spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all four dims broadcast: the only shuffle joins are none — count
    # SortMergeJoin should not appear for the dims
    assert plan5.count("BroadcastHashJoin") >= 4
