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
        connected_components(df, max_iter=2)
