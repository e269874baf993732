"""Full point-in-time pipeline: Spark engine vs independent pandas oracle
(naive reference kernels) — the BASELINE.json allclose correctness gate —
plus the zero-temporal-leakage property on the Spark output itself."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from featureextraction_spark.oracle.feature_oracle import point_in_time_features_oracle
from featureextraction_spark.plans.feature_pipeline import (
    NUMERIC_FEATURES,
    point_in_time_features,
)


def _aligned(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    key = ["conv_id", "ts"]
    s = spark_pdf.sort_values(key, kind="mergesort").reset_index(drop=True)
    o = oracle_pdf.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(s) == len(o)
    assert list(s["conv_id"]) == list(o["conv_id"])
    return s, o


def _assert_feature_parity(s: pd.DataFrame, o: pd.DataFrame):
    for c in NUMERIC_FEATURES:
        a = s[c].to_numpy(dtype=float)
        b = o[c].to_numpy(dtype=float)
        ok = np.isclose(a, b, rtol=1e-9, atol=1e-9, equal_nan=True)
        assert ok.all(), (
            f"{c}: {(~ok).sum()} mismatches, first at {int(np.argmax(~ok))}: "
            f"spark={a[~ok][:3]} oracle={b[~ok][:3]}"
        )
    for c in ("session_id", "turn_count", "role_transitions"):
        a = s[c].astype("Int64")
        b = o[c].astype("Int64")
        assert a.equals(b), f"{c} mismatch"
    for c in ("prev_role", "last_tool"):
        a = s[c].fillna("∅")
        b = o[c].fillna("∅")
        assert list(a) == list(b), f"{c} mismatch"


def test_pipeline_matches_oracle(spark, transcripts, transcripts_pdf, probes, probes_pdf):
    got = point_in_time_features(transcripts, probes).toPandas()
    exp = point_in_time_features_oracle(transcripts_pdf, probes_pdf)
    s, o = _aligned(got, exp)
    _assert_feature_parity(s, o)


def test_pipeline_zero_temporal_leakage_on_spark_output(
    spark, transcripts, transcripts_pdf, probes_pdf
):
    """Recompute the Spark pipeline on the table truncated to ts' <= probe ts
    for a handful of probes — identical vectors ⇒ nothing read the future."""
    sample = (
        probes_pdf.sort_values(["conv_id", "ts"])
        .groupby("conv_id")
        .nth(2)
        .reset_index()[["conv_id", "ts"]]
        .head(4)
    )
    sample_sdf = spark.createDataFrame(sample, schema="conv_id string, ts timestamp")
    full = point_in_time_features(transcripts, sample_sdf).toPandas()
    for row in sample.itertuples(index=False):
        trunc = transcripts.filter(
            (F.col("conv_id") != row.conv_id) | (F.col("ts") <= F.lit(row.ts))
        )
        one_probe = spark.createDataFrame(
            pd.DataFrame([row], columns=["conv_id", "ts"]),
            schema="conv_id string, ts timestamp",
        )
        got = point_in_time_features(trunc, one_probe).toPandas()
        ref = full[(full["conv_id"] == row.conv_id) & (full["ts"] == row.ts)]
        assert len(got) == 1 and len(ref) == 1
        for c in NUMERIC_FEATURES:
            a, b = float(got[c].iloc[0]), float(ref[c].iloc[0])
            assert (np.isnan(a) and np.isnan(b)) or a == b, c


def test_pipeline_probe_before_first_turn(spark, transcripts, probes):
    got = point_in_time_features(transcripts, probes).toPandas()
    pre = got[got["turn_count"] == 0]
    assert len(pre) > 0
    assert pre["session_id"].isna().all()
    assert pre[NUMERIC_FEATURES].isna().all().all()
