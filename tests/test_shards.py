"""Deterministic corpus shard writer: membership, balance, ordering,
manifest integrity, pruned reads, and rerun stability."""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from featureextraction_spark.sources.shards import (
    read_corpus_shards,
    with_shard,
    write_corpus_shards,
)

SF_DIR = "/root/testdata/sf0.001"
N_SHARDS = 8


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d.persist().count()
    return d


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_with_shard_is_content_addressed(docs):
    out = with_shard(docs, N_SHARDS).select("doc_id", "shard").collect()
    for r in out:
        assert r["shard"] == _h60(f"{r['doc_id']}:42") % N_SHARDS
    # shuffling the input does not move any document
    re = (
        with_shard(docs.repartition(13), N_SHARDS)
        .select("doc_id", "shard")
        .collect()
    )
    assert {r["doc_id"]: r["shard"] for r in re} == {
        r["doc_id"]: r["shard"] for r in out
    }


def test_with_shard_rank_dense_per_shard(docs):
    out = with_shard(docs, N_SHARDS).toPandas()
    for _, grp in out.groupby("shard"):
        assert sorted(grp["shard_rank"]) == list(range(len(grp)))


def test_write_read_roundtrip(docs, tmp_path):
    path = str(tmp_path / "release")
    manifest = write_corpus_shards(docs, path, N_SHARDS).toPandas()
    assert len(manifest) == N_SHARDS
    assert manifest["n_rows"].sum() == docs.count()
    # reasonable balance from md5 uniformity on 500 rows / 8 shards
    assert manifest["n_rows"].min() > 0

    back = read_corpus_shards(docs.sparkSession, path)
    assert back.count() == docs.count()
    assert set(back.select("doc_id").toPandas()["doc_id"]) == set(
        docs.select("doc_id").toPandas()["doc_id"]
    )
    # one data file per shard directory
    for k in range(N_SHARDS):
        files = glob.glob(os.path.join(path, "data", f"shard={k}", "*.parquet"))
        assert len(files) == 1, (k, files)


def test_shard_pruned_read(docs, tmp_path):
    path = str(tmp_path / "release")
    write_corpus_shards(docs, path, N_SHARDS)
    spark = docs.sparkSession
    two = read_corpus_shards(spark, path, shards=[0, 3])
    pdf = two.select("doc_id", "shard").toPandas()
    assert set(pdf["shard"]) == {0, 3}
    for r in pdf.itertuples():
        assert _h60(f"{r.doc_id}:42") % N_SHARDS in (0, 3)
    # partition pruning reached the scan
    plan = two._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "shard" in plan


def test_rerun_reproduces_shard_contents(docs, tmp_path):
    p1, p2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    write_corpus_shards(docs, p1, N_SHARDS)
    write_corpus_shards(docs.repartition(17), p2, N_SHARDS)
    spark = docs.sparkSession
    a = (
        read_corpus_shards(spark, p1)
        .orderBy("shard", "shard_rank")
        .select("doc_id", "shard", "shard_rank")
        .collect()
    )
    b = (
        read_corpus_shards(spark, p2)
        .orderBy("shard", "shard_rank")
        .select("doc_id", "shard", "shard_rank")
        .collect()
    )
    assert a == b


def test_bad_n_shards(docs):
    with pytest.raises(ValueError):
        with_shard(docs, 0)
