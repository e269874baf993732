"""Connected-components dedup clustering vs a pure-python union-find oracle."""

from __future__ import annotations

import random

import pytest

from featureextraction_spark.operators.graph import connected_components, dedup_clusters


def _uf_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_components_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 120
    pairs = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(90)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(df).collect()
    }
    exp = _uf_components(pairs)
    assert got == exp


def test_chain_and_island(spark):
    # a 10-chain (diameter stresses the iteration) + a separate 2-island
    chain = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(chain + [(100, 101)], "a_id long, b_id long")
    out = dedup_clusters(df).toPandas()
    by_doc = dict(zip(out["doc_id"], out["cluster_id"]))
    assert all(by_doc[i] == 0 for i in range(11))
    assert by_doc[100] == 100 and by_doc[101] == 100
    sizes = dict(zip(out["doc_id"], out["cluster_size"]))
    assert sizes[5] == 11 and sizes[101] == 2


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(8)], "a_id long, b_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2, algorithm="label")


@pytest.mark.parametrize("seed", [1, 2])
def test_star_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = 120
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(df, algorithm="star").collect()
    }
    assert got == _uf_components(pairs)


def test_deep_chain_star_logarithmic(spark):
    """A 1200-vertex path graph — the adversarial case for min-label
    (O(diameter) rounds). The star variant must converge in O(log² n)
    rounds and still produce min-label components."""
    n = 1200
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id long, b_id long"
    )
    stats = {}
    got = connected_components(
        df, algorithm="star", max_iter=40, stats=stats
    ).collect()
    assert len(got) == n
    assert all(r["component_id"] == 0 for r in got)
    assert stats["rounds"] <= 25, stats


def test_auto_switches_to_star_on_deep_chain(spark):
    """auto must hand off to the star variant once label propagation fails
    to converge within switch_after rounds, and still finish correctly."""
    n = 300
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id long, b_id long"
    )
    stats = {}
    got = connected_components(
        df, algorithm="auto", switch_after=3, max_iter=40, stats=stats,
        driver_edge_limit=0,  # force the distributed handoff under test
    ).collect()
    assert stats["algorithm"] == "star"
    assert len(got) == n and all(r["component_id"] == 0 for r in got)


def test_auto_stays_on_label_for_shallow_graph(spark):
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "a_id long, b_id long"
    )
    stats = {}
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(
            df, stats=stats, driver_edge_limit=0
        ).collect()
    }
    assert stats["algorithm"] == "label"
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}


def test_auto_small_graph_takes_driver_path(spark):
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "a_id long, b_id long"
    )
    stats = {}
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(df, stats=stats).collect()
    }
    assert stats["algorithm"] == "driver"
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}


@pytest.mark.parametrize("seed", [7, 8])
def test_all_three_strategies_agree(spark, seed):
    rng = random.Random(seed)
    n = 150
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(110)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    results = []
    for kwargs in (
        {"algorithm": "auto"},                          # driver union-find
        {"algorithm": "label", "driver_edge_limit": 0},
        {"algorithm": "star", "driver_edge_limit": 0},
    ):
        results.append(
            sorted(
                (r["id"], r["component_id"])
                for r in connected_components(df, **kwargs).collect()
            )
        )
    assert results[0] == results[1] == results[2]
    # dtype parity: driver path must not widen the id type
    auto_df = connected_components(df)
    assert dict(auto_df.dtypes) == {"id": "bigint", "component_id": "bigint"}


def test_driver_path_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y")], "a_id string, b_id string"
    )
    got = {
        r["id"]: r["component_id"] for r in connected_components(df).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
