"""Streaming twin for the mergeable Misra–Gries heavy-hitters summary.

The batch operator (``operators.sketches.heavy_hitters``) reduces the
stream to an additive integer state FIRST — exact (shard, item) counts —
and only then compresses. Additive means mergeable: each micro-batch
contributes its own exact partial count table, partials sum
commutatively across batches, and the batch operator's own closing
chain (``heavy_hitters_from_shard_counts``: per-shard MG(k) compress →
sum-then-prune merge → certificate) turns the merged state into the
readout. Batch and stream share that one closing code path, so twin
equality is structural, not coincidental (the ``evalagg`` pattern).

State size is vocabulary-sized per batch — exactly the batch operator's
own first aggregate, bounded by |vocab|, never by row count. The
k-bounded alternative (compress each batch's partial before writing)
shrinks state to n_shards·k rows per batch at the cost of twin
EXACTNESS: the certificate stays valid (sum-then-prune merging of MG
summaries is Agarwal et al. PODS'12's construction) but the counts
diverge from the batch answer by the extra per-batch offsets. This
module keeps the exact-twin contract; the trade-off is documented, not
hidden.

Exactly-once: each micro-batch writes its partial into its own
``__bid=<batch_id>`` directory with ``mode("overwrite")`` — a retried
batch replaces its previous output instead of double-counting
(``streaming.ivm``'s contract).

No reference counterpart; public Structured Streaming practice.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import heavy_hitters_from_shard_counts


def streaming_heavy_hitters(
    stream: DataFrame,
    state_dir: str,
    col: str,
    shard_col: str,
    checkpoint_dir: str | None = None,
):
    """Maintain the exact (shard, item) count state on ``stream``;
    returns the StreamingQuery. Read the live MG(k) summary with
    :func:`read_heavy_hitters`."""

    def process(batch: DataFrame, batch_id: int) -> None:
        partial = (
            batch.select(
                F.col(shard_col).cast("long").alias("__s"),
                F.col(col).alias("item"),
            )
            .groupBy("__s", "item")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        partial.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"__bid={batch_id}")
        )

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_heavy_hitters(
    spark: SparkSession, state_dir: str, k: int = 16
) -> DataFrame:
    """Merge the accumulated partials into exact shard counts and close
    with the batch operator's own tail — row-equal to
    :func:`operators.sketches.heavy_hitters` over all rows seen so far
    (twin-test gated)."""
    merged = (
        spark.read.parquet(state_dir)
        .drop("__bid")
        .groupBy("__s", "item")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return heavy_hitters_from_shard_counts(merged, k)


__all__ = ["streaming_heavy_hitters", "read_heavy_hitters"]
