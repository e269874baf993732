"""Streaming twins for the sliced-evaluation aggregates: per-group
ROC-AUC (``operators.evaluation.roc_auc_by``) and calibration bins
(``calibration_bins``) maintained over a LIVE prediction stream.

Both batch operators reduce the data to an additive integer count table
before anything order-sensitive happens — (grp, quantized-score) →
(n_pos, n_neg) for AUC, bin → (n, n_pos, sum_score_q) for calibration.
Additive means MERGEABLE: each micro-batch contributes a partial count
table, partials sum commutatively, and the batch operator's own closing
tail (``auc_from_group_score_counts`` / ``calibration_from_bin_counts``)
turns the merged state into the readout — batch and stream share one
closing code path, so twin equality is structural, not coincidental.

State layout mirrors ``streaming.ivm``'s exactly-once contract: each
micro-batch writes its partial into its own ``__bid=<batch_id>``
directory with ``mode("overwrite")``, so a retried batch replaces its
previous (possibly partial) output instead of double-counting it. The
state size is bounded by |groups| × |distinct quantized scores| (AUC;
quant=10k caps distinct scores) and |bins| (calibration) per batch —
sketch-sized, never row-sized.

Scale: the per-batch partial is one map-side-combinable aggregate over
the micro-batch; the read-side merge scans only partial tables. At
100 TB/day of predictions the partials stay tiny while the raw rows are
never retained — the same reason HLL/CMS states stream well.

No reference counterpart; public Structured Streaming practice
(foreachBatch incremental aggregation with idempotent per-batch sinks).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.evaluation import (
    auc_from_group_score_counts,
    calibration_bins,
    calibration_from_bin_counts,
)


def _write_partial(partial: DataFrame, state_dir: str, batch_id: int) -> None:
    partial.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"__bid={batch_id}")
    )


def _read_partials(spark: SparkSession, state_dir: str) -> DataFrame:
    # read the parent dir: partition discovery adds __bid, dropped after
    return spark.read.parquet(state_dir).drop("__bid")


def streaming_roc_auc_by(
    stream: DataFrame,
    state_dir: str,
    group: str,
    score: str = "score",
    label: str = "label",
    quant: int = 10_000,
    checkpoint_dir: str | None = None,
):
    """Maintain the per-slice AUC count state on ``stream``; returns the
    StreamingQuery. Read the live AUC with :func:`read_roc_auc_by`."""

    def process(batch: DataFrame, batch_id: int) -> None:
        sq = F.floor(
            F.col(score).cast("double") * F.lit(float(quant)) + F.lit(0.5)
        ).cast("long")
        partial = (
            batch.select(
                F.col(group).alias("grp"),
                sq.alias("sq"),
                F.col(label).cast("long").alias("__y"),
            )
            .groupBy("grp", "sq")
            .agg(
                F.sum("__y").cast("long").alias("n_pos"),
                (F.count(F.lit(1)) - F.sum("__y")).cast("long").alias("n_neg"),
            )
        )
        _write_partial(partial, state_dir, batch_id)

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_roc_auc_by(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merge the accumulated AUC partials and close with the batch
    operator's own tail — row-equal to :func:`roc_auc_by` over all rows
    seen so far (twin-test gated)."""
    merged = (
        _read_partials(spark, state_dir)
        .groupBy("grp", "sq")
        .agg(
            F.sum("n_pos").cast("long").alias("n_pos"),
            F.sum("n_neg").cast("long").alias("n_neg"),
        )
    )
    return auc_from_group_score_counts(merged)


def streaming_calibration(
    stream: DataFrame,
    state_dir: str,
    score: str = "score",
    label: str = "label",
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
    quant: int = 1_000,
    checkpoint_dir: str | None = None,
):
    """Maintain the reliability-bin count state on ``stream``; returns
    the StreamingQuery. Read the live table with
    :func:`read_calibration`. The bin CUTPOINTS are fixed parameters
    (equal-width over [lo, hi]), so per-batch binning is stateless and
    partials merge exactly."""

    def process(batch: DataFrame, batch_id: int) -> None:
        # per-batch partial = the batch operator minus its closing select:
        # (bin, n, n_pos, sum_score_q) integer sums
        partial = calibration_bins(
            batch, score=score, label=label, n_bins=n_bins,
            lo=lo, hi=hi, quant=quant,
        ).drop("pos_rate")
        _write_partial(partial, state_dir, batch_id)

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_calibration(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merge the accumulated calibration partials and close with the
    batch operator's own tail — row-equal to :func:`calibration_bins`
    over all rows seen so far (twin-test gated)."""
    merged = (
        _read_partials(spark, state_dir)
        .groupBy("bin")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("n_pos").cast("long").alias("n_pos"),
            F.sum("sum_score_q").cast("long").alias("sum_score_q"),
        )
    )
    return calibration_from_bin_counts(merged)


__all__ = [
    "streaming_roc_auc_by",
    "read_roc_auc_by",
    "streaming_calibration",
    "read_calibration",
]


def streaming_anova(
    stream: DataFrame,
    state_dir: str,
    group: str,
    value: str,
    checkpoint_dir: str | None = None,
):
    """Maintain the per-group ANOVA moment state (n, Σx, Σx²) on
    ``stream``; returns the StreamingQuery. Read the live F statistic
    with :func:`read_anova`. The moments are additive exact BIGINTs —
    the same mergeable-partial shape as the AUC/calibration twins, with
    the same ``__bid`` per-batch-overwrite exactly-once contract."""

    def process(batch: DataFrame, batch_id: int) -> None:
        x = F.col(value).cast("long")
        partial = batch.groupBy(F.col(group).alias("g")).agg(
            F.count(F.lit(1)).cast("long").alias("ng"),
            F.sum(x).cast("long").alias("sg"),
            F.sum(x * x).cast("long").alias("qg"),
        )
        _write_partial(partial, state_dir, batch_id)

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_anova(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merge the accumulated moment partials and close with the batch
    operator's own tail (``anova_from_group_moments``) — row-equal to
    :func:`..operators.evaluation.anova_f` over all rows seen so far
    (twin-test gated)."""
    from ..operators.evaluation import anova_from_group_moments

    merged = (
        _read_partials(spark, state_dir)
        .groupBy("g")
        .agg(
            F.sum("ng").cast("long").alias("ng"),
            F.sum("sg").cast("long").alias("sg"),
            F.sum("qg").cast("long").alias("qg"),
        )
    )
    return anova_from_group_moments(merged)
