"""End-to-end resumable job (scripts/run_pipeline.py) — the ship vehicle.

Asserts: full run lands features in the store; an identical re-run resumes
every stage (no recompute, no double-append); changing the input
fingerprint forces recompute."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from featureextraction_spark.datagen import make_transcripts  # noqa: E402


@pytest.fixture(scope="module")
def input_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pipe") / "tr.parquet")
    pdf = make_transcripts(n_conversations=12, mean_turns=8, seed=7)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
    return p


def test_run_then_resume(spark, input_path, tmp_path):
    import run_pipeline

    work = str(tmp_path / "work")
    args = ["--input", input_path, "--work", work, "--probes-per-conv", "2", "--cpus", "4"]

    first = run_pipeline.main(args)
    assert first["recomputed"] == ["features", "probes", "store", "turn_state"]
    assert first["resumed"] == []
    assert first["feature_rows"] > 0
    assert first["store_version"] == 0
    stage_names = {s["stage"] for s in first["stages"]}
    assert stage_names == {"turn_state", "probes", "features", "store"}
    assert all(s["status"] == "done" for s in first["stages"])

    second = run_pipeline.main(args)
    assert second["recomputed"] == []
    assert set(second["resumed"]) == stage_names
    # no double-append: same snapshot, same rows
    assert second["store_version"] == 0
    assert second["feature_rows"] == first["feature_rows"]


def test_changed_input_recomputes(spark, input_path, tmp_path):
    import run_pipeline

    work = str(tmp_path / "work2")
    args = ["--input", input_path, "--work", work, "--probes-per-conv", "1", "--cpus", "4"]
    run_pipeline.main(args)

    # append a byte to the input dir fingerprint by rewriting the file
    import pyarrow.parquet as pq

    t = pq.read_table(input_path)
    pq.write_table(t.slice(0, t.num_rows - 1), input_path)
    out = run_pipeline.main(args)
    assert "features" in out["recomputed"] and "turn_state" in out["recomputed"]


def test_crash_between_append_and_manifest_is_idempotent(spark, input_path, tmp_path):
    """If a run commits the store snapshot but dies before writing the
    store manifest, the rerun must ADOPT that snapshot (tag lookup), not
    append the same feature rows again."""
    import run_pipeline

    work = str(tmp_path / "work3")
    args = ["--input", input_path, "--work", work, "--probes-per-conv", "2", "--cpus", "4"]
    first = run_pipeline.main(args)

    # simulate the crash window: snapshot committed, manifest record lost
    os.remove(os.path.join(work, "ckpt", "run1", "manifest", "store.json"))

    second = run_pipeline.main(args)
    assert second["store_version"] == first["store_version"]
    assert second["feature_rows"] == first["feature_rows"]
    assert "store" in second["resumed"] and "store" not in second["recomputed"]
