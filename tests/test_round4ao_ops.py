"""Round-4 additions (thirty-sixth batch): composed entity-resolution
pipeline — structural invariants over the golden-record output (the
component operators each have their own naive-oracle tests)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_er_pipeline_invariants(spark):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    out = entry.queries()["er_pipeline"](spark, sf).collect()
    docs = {
        r["doc_id"]: r
        for r in entry._load(spark, sf, "documents").collect()
    }
    assert out, "sf0.001 should still produce at least one merged cluster"
    seen_canons = set()
    for r in out:
        assert r["cluster_size"] >= 2
        # canon must be a real doc, and is the cluster's min id only
        # when lengths tie — but it always belongs to the corpus
        assert r["canon_id"] in docs
        assert r["n_langs"] >= 1 and r["n_sources"] >= 1
        assert r["total_chars"] >= r["cluster_size"]  # non-empty docs
        assert r["canon_id"] not in seen_canons  # one golden row/cluster
        seen_canons.add(r["canon_id"])
    # clusters are disjoint by construction: ids are min-label components
    ids = [r["cluster_id"] for r in out]
    assert len(ids) == len(set(ids))


def test_er_pipeline_is_one_plan_no_python(spark):
    import __spark_entry__ as entry

    df = entry.queries()["er_pipeline"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # scoring/blocking/golden-record stay JVM-side expressions
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
