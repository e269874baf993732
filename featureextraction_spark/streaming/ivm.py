"""Streaming incremental join-view maintenance (foreachBatch).

The production shape of ``operators.joins.incremental_join_delta``: one
event stream carries BOTH sides of a join (e.g. clicks and purchases of
the same log); each micro-batch splits into ΔL/ΔR, the delta rule
computes exactly the new joined rows

    Δview = ΔL ⋈ R_hist  ∪  L_hist ⋈ ΔR  ∪  ΔL ⋈ ΔR

against the parquet-backed history, Δview lands in the view's per-batch
``__bid`` dir, and the deltas land in the history's — the stored view is
NEVER re-joined, and every write is an idempotent per-batch overwrite
(retry-safe: see ``make_join_view_batch_fn``). After the stream drains,
the view is row-equal to the from-scratch batch join (asserted by test,
the same external gate as the batch ``ivm_join``).

Why foreachBatch and not a stream-stream join: Spark's built-in
stream-stream inner join keeps BOTH sides in state-store memory bounded
only by watermarks; the parquet-history delta rule instead keeps state
on storage, supports unbounded history, and leaves the view queryable by
any engine mid-stream. This is the standard "bronze→silver incremental
materialization" pattern.

Scale: per micro-batch, two delta-sized joins against the history (the
history side is a plain parquet scan — partition it by the join key's
bucket for co-located joins at 100 TB) plus a delta×delta join; the
micro-batch is the small side everywhere, so AQE broadcasts it.

No reference counterpart; public Structured Streaming + IVM practice.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import incremental_join_delta


def _read_history(
    spark: SparkSession, path: str, like: DataFrame, before_bid: int
) -> DataFrame:
    """Union of the ``__bid=N`` batch subdirs with N strictly below
    ``before_bid``. Prior batch dirs are immutable and the current
    batch's own dir is excluded, so a RETRIED micro-batch recomputes its
    delta against exactly the history the first attempt saw — the
    replay-stability half of the exactly-once contract."""
    if os.path.isdir(path):
        subdirs = [
            os.path.join(path, d)
            for d in os.listdir(path)
            if d.startswith("__bid=") and int(d[6:]) < before_bid
        ]
        if subdirs:
            # leaf dirs passed explicitly: no partition discovery, the
            # __bid key never leaks into the history schema
            return spark.read.schema(like.schema).parquet(*subdirs)
    return spark.createDataFrame([], like.schema)


def make_join_view_batch_fn(
    state_dir: str,
    on: str,
    split_col: str,
    left_value: str,
    right_value: str,
):
    """Build the foreachBatch function that maintains the join view.

    Each batch row is routed to the left side when ``split_col`` ==
    ``left_value``, to the right when == ``right_value`` (others
    dropped). State layout under ``state_dir``: ``left/``, ``right/``
    (history) and ``view/`` (the maintained join), each as hive-style
    ``__bid=<batch_id>`` subdirectories of plain parquet.

    Exactly-once under micro-batch retry: every write is a per-batch
    ``mode("overwrite")`` into the batch's own ``__bid`` dir, and the
    delta is computed against history STRICTLY BEFORE this batch (see
    ``_read_history``) — so a replayed batch recomputes the identical
    delta and overwrites its own previous (possibly partial) output
    instead of double-appending it. Readers of ``view/`` see ``__bid``
    as a discovered partition column (batch provenance for free).
    """
    left_dir = os.path.join(state_dir, "left")
    right_dir = os.path.join(state_dir, "right")
    view_dir = os.path.join(state_dir, "view")

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        payload = [c for c in batch.columns if c not in (on, split_col)]
        dl = batch.where(F.col(split_col) == left_value).select(
            F.col(on), *[F.col(c).alias(f"l_{c}") for c in payload]
        )
        dr = batch.where(F.col(split_col) == right_value).select(
            F.col(on), *[F.col(c).alias(f"r_{c}") for c in payload]
        )
        # pin the deltas before the writes below re-shape the dirs the
        # history scans read from (lazy plans + overlapping paths)
        dl = dl.localCheckpoint()
        dr = dr.localCheckpoint()
        l_hist = _read_history(spark, left_dir, dl, batch_id)
        r_hist = _read_history(spark, right_dir, dr, batch_id)
        delta_view = incremental_join_delta(l_hist, dl, r_hist, dr, on)
        bid = f"__bid={batch_id}"
        delta_view.write.mode("overwrite").parquet(os.path.join(view_dir, bid))
        dl.write.mode("overwrite").parquet(os.path.join(left_dir, bid))
        dr.write.mode("overwrite").parquet(os.path.join(right_dir, bid))

    return process


def streaming_join_view(
    stream: DataFrame,
    state_dir: str,
    on: str,
    split_col: str,
    left_value: str,
    right_value: str,
    checkpoint_dir: str | None = None,
):
    """Start the maintainer on ``stream``; returns the StreamingQuery.
    Read the maintained view from ``<state_dir>/view`` with any engine.
    """
    writer = stream.writeStream.foreachBatch(
        make_join_view_batch_fn(
            state_dir, on, split_col, left_value, right_value
        )
    ).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
