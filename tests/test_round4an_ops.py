"""Round-4 additions (thirty-fifth batch): streaming incremental
join-view maintenance (foreachBatch delta rule) gated against the
from-scratch batch join, and the Neyman sample apply step."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from featureextraction_spark.operators.sampling import (
    neyman_allocation,
    neyman_sample,
)


def test_streaming_join_view_matches_batch_join(spark, tmp_path):
    from featureextraction_spark.streaming.ivm import streaming_join_view

    rng = random.Random(461)
    rows = []
    for i in range(400):
        rows.append(
            (
                rng.randrange(30),                      # user_id
                "click" if rng.random() < 0.6 else "purchase",
                i,                                      # payload
            )
        )
    df = spark.createDataFrame(rows, "user_id long, kind string, seq long")

    # feed in 5 file-chunks so history/delta interplay is exercised
    src_dir = str(tmp_path / "src")
    for c in range(5):
        df.where(F.pmod(F.col("seq"), F.lit(5)) == c).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    state = str(tmp_path / "state")
    q = streaming_join_view(
        stream,
        state_dir=state,
        on="user_id",
        split_col="kind",
        left_value="click",
        right_value="purchase",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    view = spark.read.parquet(state + "/view")
    got = {
        (r["user_id"], r["l_seq"], r["r_seq"]) for r in view.collect()
    }
    clicks = [(u, s) for u, k, s in rows if k == "click"]
    purchases = [(u, s) for u, k, s in rows if k == "purchase"]
    want = {
        (uc, sc, sp)
        for uc, sc in clicks
        for up, sp in purchases
        if uc == up
    }
    assert got == want
    assert view.count() == len(want)  # no duplicates either


def test_neyman_sample_respects_quotas_and_determinism(spark):
    rng = random.Random(462)
    rows = [(i, "tight", rng.randrange(100, 105)) for i in range(300)]
    rows += [(1000 + i, "wide", rng.randrange(0, 10_000)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, src string, x long")

    alloc = {
        r["src"]: r["n_target"]
        for r in neyman_allocation(df, "src", "x").collect()
    }
    got = neyman_sample(df, "src", "x", "id").collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["src"], []).append(r)
    for src, rs in by_src.items():
        assert len(rs) == min(alloc[src], 300)
        assert all(r["n_target"] == alloc[src] for r in rs)
        assert sorted(r["draw_rank"] for r in rs) == list(
            range(1, len(rs) + 1)
        )
    # wide stratum dominates the draw
    assert len(by_src["wide"]) > len(by_src.get("tight", []))
    # deterministic: second run identical
    again = neyman_sample(df, "src", "x", "id").collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in got}


def test_streaming_join_view_retry_idempotent(spark, tmp_path):
    """Replay safety: re-running a micro-batch (same batch_id) after any
    partial write leaves the state byte-identical — per-batch overwrite
    dirs + strictly-before-history make the delta recomputation exact."""
    from featureextraction_spark.streaming.ivm import make_join_view_batch_fn

    state = str(tmp_path / "state")
    fn = make_join_view_batch_fn(
        state, on="user_id", split_col="kind",
        left_value="click", right_value="purchase",
    )
    b0 = spark.createDataFrame(
        [(1, "click", 10), (1, "purchase", 11), (2, "click", 12)],
        "user_id long, kind string, seq long",
    )
    b1 = spark.createDataFrame(
        [(1, "purchase", 20), (2, "purchase", 21)],
        "user_id long, kind string, seq long",
    )
    fn(b0, 0)
    fn(b1, 1)
    once = {tuple(r) for r in spark.read.parquet(state + "/view").drop("__bid").collect()}
    # simulate the retry storm: batch 1 replays twice, then batch 0 replays
    # (a retried batch must recompute against pre-batch history only)
    fn(b1, 1)
    fn(b1, 1)
    fn(b0, 0)
    again = {tuple(r) for r in spark.read.parquet(state + "/view").drop("__bid").collect()}
    assert again == once
    view = spark.read.parquet(state + "/view").drop("__bid")
    assert view.count() == len(once)  # overwrite, never double-append
    # and the view still equals the from-scratch join
    want = {(1, 10, 11), (1, 10, 20), (2, 12, 21)}
    assert {(r["user_id"], r["l_seq"], r["r_seq"]) for r in view.collect()} == want


def test_referential_audit_rejects_empty_relations(spark):
    import pytest as _pytest

    from featureextraction_spark.operators.profiling import referential_audit

    with _pytest.raises(ValueError, match="at least one"):
        referential_audit([])
