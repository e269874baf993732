"""Streaming twins of the sliced-eval aggregates: the foreachBatch
partial-count maintainers must be row-equal to the batch operators over
the same rows, and replay-idempotent (per-batch overwrite state)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from featureextraction_spark.operators.evaluation import (
    calibration_bins,
    roc_auc_by,
)
from featureextraction_spark.streaming.evalagg import (
    read_calibration,
    read_roc_auc_by,
    streaming_calibration,
    streaming_roc_auc_by,
)


def _pred_df(spark, n=600, seed=471):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        grp = "s%d" % (i % 4)
        score = round(rng.random(), 4)
        label = 1 if rng.random() < score * 0.8 + 0.1 else 0
        rows.append((i, grp, score, label))
    return spark.createDataFrame(
        rows, "event_id long, grp string, score double, label long"
    )


def _as_stream(spark, df, tmp_path, chunks=5):
    src = str(tmp_path / "src")
    for c in range(chunks):
        df.where(F.pmod(F.col("event_id"), F.lit(chunks)) == c).coalesce(
            1
        ).write.mode("append").parquet(src)
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _rows(df, *key):
    return sorted((tuple(r) for r in df.collect()), key=lambda t: t[: len(key)])


def test_streaming_roc_auc_by_matches_batch(spark, tmp_path):
    df = _pred_df(spark)
    stream = _as_stream(spark, df, tmp_path)
    state = str(tmp_path / "auc_state")
    q = streaming_roc_auc_by(
        stream, state_dir=state, group="grp",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    got = _rows(read_roc_auc_by(spark, state), "grp")
    want = _rows(roc_auc_by(df, group="grp"), "grp")
    assert got == want


def test_streaming_calibration_matches_batch_and_replays(spark, tmp_path):
    df = _pred_df(spark, seed=472)
    stream = _as_stream(spark, df, tmp_path)
    state = str(tmp_path / "cal_state")
    q = streaming_calibration(
        stream, state_dir=state, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    got = _rows(read_calibration(spark, state), "bin")
    want = _rows(calibration_bins(df), "bin")
    assert got == want

    # replay idempotency: re-run one micro-batch's foreachBatch body with
    # its original batch_id — the overwrite leaves the state identical
    from featureextraction_spark.streaming.evalagg import _write_partial

    b1 = df.where(F.pmod(F.col("event_id"), F.lit(5)) == 1)
    _write_partial(calibration_bins(b1).drop("pos_rate"), state, 1)
    again = _rows(read_calibration(spark, state), "bin")
    assert again == want


def test_degenerate_slice_reports_null_auc(spark, tmp_path):
    # one group is all-positive: batch reports NULL auc; the twin must too
    df = spark.createDataFrame(
        [(i, "all_pos", 0.5 + (i % 3) * 0.1, 1) for i in range(9)]
        + [(100 + i, "mixed", 0.1 * i, i % 2) for i in range(10)],
        "event_id long, grp string, score double, label long",
    )
    stream = _as_stream(spark, df, tmp_path, chunks=3)
    state = str(tmp_path / "auc_state2")
    q = streaming_roc_auc_by(
        stream, state_dir=state, group="grp",
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(180)
    got = {r["grp"]: r["auc"] for r in read_roc_auc_by(spark, state).collect()}
    want = {r["grp"]: r["auc"] for r in roc_auc_by(df, group="grp").collect()}
    assert got == want
    assert got["all_pos"] is None


def test_streaming_anova_matches_batch_and_replays(spark, tmp_path):
    from featureextraction_spark.operators.evaluation import anova_f
    from featureextraction_spark.streaming.evalagg import (
        _write_partial,
        read_anova,
        streaming_anova,
    )

    rng = random.Random(473)
    rows = [
        (i, "g%d" % (i % 5), rng.randrange(0, 400)) for i in range(600)
    ]
    df = spark.createDataFrame(rows, "event_id long, grp string, v long")
    stream = _as_stream(spark, df, tmp_path)
    state = str(tmp_path / "anova_state")
    q = streaming_anova(
        stream, state_dir=state, group="grp", value="v",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    def close(a, b):
        # n/k are exact integers; ssb/ssw/f close over ≤k-term double
        # sums whose addition order differs between the merged-partial
        # and batch moment tables — the shared-nudge situation
        assert (a["n"], a["k"]) == (b["n"], b["k"])
        for c in ("ssb", "ssw", "f"):
            assert abs(a[c] - b[c]) <= 1e-6 * max(1.0, abs(b[c]))

    got = read_anova(spark, state).collect()
    want = anova_f(df, "grp", "v").collect()
    assert len(got) == len(want) == 1
    close(got[0], want[0])

    # replay idempotency: rewrite one micro-batch's partial with its
    # original batch_id — per-batch overwrite leaves the state identical
    b1 = df.where(F.pmod(F.col("event_id"), F.lit(5)) == 1)
    x = F.col("v").cast("long")
    partial = b1.groupBy(F.col("grp").alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(x).cast("long").alias("sg"),
        F.sum(x * x).cast("long").alias("qg"),
    )
    _write_partial(partial, state, 1)
    again = read_anova(spark, state).collect()
    close(again[0], want[0])
