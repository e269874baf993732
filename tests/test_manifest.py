"""Resume semantics: kill mid-run, restart, identical output, completed
stages not recomputed (SURVEY.md §5 'resume test')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featureextraction_spark.operators.sessionize import sessionize
from featureextraction_spark.streaming.manifest import CheckpointedRunner


@pytest.fixture()
def base_dir(tmp_path):
    return str(tmp_path / "checkpoints")


def _pipeline(runner: CheckpointedRunner, transcripts, fail_at: str | None = None):
    calls = {"load": 0, "sessions": 0, "agg": 0}

    def load():
        calls["load"] += 1
        return transcripts

    def sessions():
        calls["sessions"] += 1
        return sessionize(loaded)

    def agg():
        calls["agg"] += 1
        if fail_at == "agg":
            raise RuntimeError("simulated crash before final stage")
        return sessioned.groupBy("conv_id").agg(
            F.max("session_id").alias("n_sessions"), F.count(F.lit(1)).alias("n_turns")
        )

    loaded = runner.stage("load", load, fingerprint="fixture-v1")
    sessioned = runner.stage("sessions", sessions, fingerprint="gap=1800")
    result = runner.stage("agg", agg, fingerprint="by-conv")
    return result, calls


def test_resume_skips_completed_stages(spark, transcripts, base_dir):
    r1 = CheckpointedRunner(spark, base_dir, run_id="run1")
    with pytest.raises(RuntimeError, match="simulated crash"):
        _pipeline(r1, transcripts, fail_at="agg")
    # stages 1-2 committed with lineage before the crash
    assert {m["stage"] for m in r1.manifest_rows()} == {"load", "sessions"}
    for m in r1.manifest_rows():
        assert m["status"] == "done"
        assert m["total_rows"] == sum(p["row_count"] for p in m["partitions"])
        assert m["total_rows"] > 0

    # restart same run_id: load+sessions resumed from checkpoint, agg runs
    r2 = CheckpointedRunner(spark, base_dir, run_id="run1")
    result, calls = _pipeline(r2, transcripts)
    assert calls == {"load": 0, "sessions": 0, "agg": 1}
    assert r2.resumed == ["load", "sessions"]
    assert r2.recomputed == ["agg"]

    # output identical to a fresh uncheckpointed run
    fresh = (
        sessionize(transcripts)
        .groupBy("conv_id")
        .agg(F.max("session_id").alias("n_sessions"), F.count(F.lit(1)).alias("n_turns"))
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    got = result.toPandas().sort_values("conv_id").reset_index(drop=True)
    assert got.equals(fresh)


def test_fingerprint_mismatch_forces_recompute(spark, transcripts, base_dir):
    r1 = CheckpointedRunner(spark, base_dir, run_id="run2")
    r1.stage("load", lambda: transcripts, fingerprint="v1")
    r2 = CheckpointedRunner(spark, base_dir, run_id="run2")
    r2.stage("load", lambda: transcripts, fingerprint="v2-input-changed")
    assert r2.recomputed == ["load"]
    assert r2.resumed == []


def test_metrics_dataframe(spark, transcripts, base_dir):
    r = CheckpointedRunner(spark, base_dir, run_id="run3")
    r.stage("load", lambda: transcripts, fingerprint="v1")
    m = r.metrics().toPandas()
    assert list(m["stage"]) == ["load"]
    assert m["wall_ms"].iloc[0] >= 0
    assert m["total_rows"].iloc[0] == transcripts.count()
