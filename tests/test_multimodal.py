"""Multimodal binary-column plumbing: schema, Arrow batching, pruning."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from featureextraction_spark.sources.multimodal import (
    FEATURE_DIM,
    _fake_decode_batch,
    decode_features,
    frame_sample,
    make_multimodal_fixture,
    resize_meta,
)


@pytest.fixture(scope="module")
def mm(spark):
    df = make_multimodal_fixture(spark, n=48, seed=42)
    df.persist().count()
    return df


def test_honest_not_implemented_without_libs(spark, mm):
    with pytest.raises(NotImplementedError, match="decode libraries"):
        decode_features(mm, fake=False)


def test_fake_decode_plumbing(spark, mm):
    out = decode_features(mm, fake=True).toPandas().sort_values("sample_id")
    assert len(out) == 48
    assert all(len(f) == FEATURE_DIM for f in out["features"])
    # deterministic vs driver-side kernel on the same payloads
    src = mm.select("sample_id", "payload").toPandas().sort_values("sample_id")
    exp = _fake_decode_batch(src["payload"])
    got = np.stack(out["features"].to_numpy())
    np.testing.assert_allclose(got, exp, rtol=1e-12)
    # Arrow batches actually batched (not row-at-a-time)
    assert out["batch_rows"].max() > 1


def test_frame_sample_counts_and_pruning(spark, mm, tmp_path):
    path = str(tmp_path / "mm.parquet")
    mm.write.parquet(path)
    mm_file = spark.read.parquet(path)
    fs = frame_sample(mm_file, every_ms=5000)
    pdf = fs.toPandas()
    meta = mm.select("sample_id", "modality", "meta.duration_ms").toPandas()
    for r in meta.itertuples(index=False):
        n = (pdf["sample_id"] == r.sample_id).sum()
        if r.modality == "image":
            assert n == 0
        else:
            expected = (max(r.duration_ms - 1, 0)) // 5000 + 1
            assert n == expected, (r.sample_id, n, expected)
    # metadata-only plan: the binary payload column is pruned from the
    # parquet ReadSchema (columnar scan never touches media bytes)
    plan = fs._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("payload" not in ln for ln in read_schema), plan


def test_resize_meta(spark, mm):
    out = resize_meta(mm, max_side=128).toPandas()
    with_dims = out[out["target_width"].notna()]
    assert (with_dims["target_width"] <= 128).all()
    assert (with_dims["target_height"] <= 128).all()
    # aspect ratio preserved within rounding
    m = with_dims
    orig_ratio = m.apply(lambda r: r["meta"]["width"] / r["meta"]["height"], axis=1)
    new_ratio = m["target_width"] / m["target_height"]
    np.testing.assert_allclose(new_ratio, orig_ratio, rtol=0.15)
