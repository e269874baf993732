"""Bucketed tables: co-located joins must plan with ZERO exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featureextraction_spark.sources.bucketed import (
    bucketed_join,
    create_bucket_db,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucket_tables(spark, transcripts, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("warehouse"))
    create_bucket_db(spark, "bdb", loc)
    write_bucketed(transcripts, "bdb.turns", buckets=8)
    feats = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.max("ts").alias("last_ts"),
    )
    write_bucketed(
        feats, "bdb.conv_features", buckets=8, sort_cols=("conv_id",)
    )
    yield "bdb.turns", "bdb.conv_features"
    spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_tables, transcripts):
    """With broadcast off (a small dim would otherwise broadcast — at the
    real scale both sides are huge), the sort-merge join must read
    matching buckets directly: no shuffle Exchange on either side."""
    left, right = bucket_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, on="conv_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # and it is the real join, row-for-row
        expected = transcripts.count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_results_equal_unbucketed(spark, bucket_tables, transcripts):
    left, right = bucket_tables
    joined = bucketed_join(spark, left, right, on="conv_id").select(
        "conv_id", "turn_idx", "n_turns"
    )
    feats = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns")
    )
    plain = transcripts.join(feats, "conv_id").select("conv_id", "turn_idx", "n_turns")
    a = joined.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = plain.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert a.equals(b)
