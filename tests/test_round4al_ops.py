"""Round-4 additions (thirty-third batch): incremental join-view
maintenance (delta rule) vs the from-scratch join, and plan audits for
the Q18/Q22-shaped reads."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from featureextraction_spark.operators.joins import incremental_join_delta


def _rows(rng, n, keyspace, tag):
    return [(rng.randrange(keyspace), f"{tag}{i}") for i in range(n)]


def test_delta_rule_equals_from_scratch(spark):
    rng = random.Random(441)
    l0 = _rows(rng, 200, 40, "l")
    dl = _rows(rng, 60, 50, "L")  # delta keys extend beyond old keyspace
    r0 = _rows(rng, 150, 40, "r")
    dr = _rows(rng, 50, 50, "R")
    mkl = lambda rows: spark.createDataFrame(rows, "k long, lv string")  # noqa: E731
    mkr = lambda rows: spark.createDataFrame(rows, "k long, rv string")  # noqa: E731

    view0 = mkl(l0).join(mkr(r0), "k")
    delta = incremental_join_delta(mkl(l0), mkl(dl), mkr(r0), mkr(dr), "k")
    got = Counter(
        (r["k"], r["lv"], r["rv"])
        for r in view0.unionByName(delta).collect()
    )
    full = Counter()
    for k1, v1 in l0 + dl:
        for k2, v2 in r0 + dr:
            if k1 == k2:
                full[(k1, v1, v2)] += 1
    assert got == full
    # bag semantics: no pair double-counted, none missed
    assert sum(got.values()) == sum(full.values())


def test_delta_rule_empty_deltas_add_nothing(spark):
    mkl = lambda rows: spark.createDataFrame(rows, "k long, lv string")  # noqa: E731
    mkr = lambda rows: spark.createDataFrame(rows, "k long, rv string")  # noqa: E731
    delta = incremental_join_delta(
        mkl([(1, "a")]), mkl([]), mkr([(1, "b")]), mkr([]), "k"
    )
    assert delta.count() == 0


def test_delta_rule_only_delta_keys(spark):
    # a key introduced by BOTH deltas joins exactly once (the dxd term)
    mkl = lambda rows: spark.createDataFrame(rows, "k long, lv string")  # noqa: E731
    mkr = lambda rows: spark.createDataFrame(rows, "k long, rv string")  # noqa: E731
    delta = incremental_join_delta(
        mkl([(1, "old_l")]), mkl([(9, "new_l")]),
        mkr([(1, "old_r")]), mkr([(9, "new_r")]),
        "k",
    )
    rows = {(r["k"], r["lv"], r["rv"]) for r in delta.collect()}
    assert rows == {(9, "new_l", "new_r")}


def test_big_orders_plan_is_take_ordered(spark):
    import __spark_entry__ as entry

    plan = (
        entry.queries()["big_orders"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # distributed partial top-k


def test_idle_customers_plan_anti_join_and_broadcasts(spark):
    import __spark_entry__ as entry

    plan = (
        entry.queries()["idle_customers"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
