"""Streaming twin of the latest-wins CDC compaction.

Batch :func:`..operators.scd.cdc_apply` compacts a changelog to one
live row per key with a row_number window; on a LIVE change stream the
same semantics is a one-row state fold: per key the state holds the
highest-``seq`` change seen so far, and every change that advances it
is emitted as an upsert (tombstones emitted with ``is_delete = 1`` so a
serving store can delete the key). The LAST emission per key is exactly
the batch operator's row — equality the twin test asserts; a stale
change (lower seq than the state, e.g. an out-of-order replay across
micro-batches) is ignored, never emitted.

State is one narrow row per live key — memory bounded by key
cardinality, not changelog length; the shuffle key equals the batch
window's partition key, so the streaming and batch plans hash the same
way. ``retention_seconds`` evicts keys idle past the horizon by event
time once the watermark passes (bounded state under key churn).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _state_schema(id_type: str) -> str:
    # best_id keeps the changelog id's native type so the cross-batch
    # tiebreak compares exactly as the batch ORDER BY does
    return (
        f"best_ts long, best_id {id_type}, best_op string, "
        "best_value double"
    )


def _make_cdc_update(delete_op: str, retention_seconds: int | None):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best_ts, best_id, best_op, best_value = (
            state.get if state.exists else (None, None, None, None)
        )
        rows = []
        for pdf in pdfs:
            p = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            ts_us = p["ts"].astype("datetime64[us]").astype("int64")
            for eid, t, op, value in zip(
                p["event_id"], ts_us, p["event_type"], p["value"]
            ):
                t = int(t)
                # native-type tiebreak on the id, matching the batch
                # window's ORDER BY (string ids compare as strings only
                # because the column IS a string there)
                if best_ts is not None and (
                    t < best_ts or (t == best_ts and not (eid > best_id))
                ):
                    continue  # stale change: state already newer
                best_ts, best_id, best_op = t, eid, op
                best_value = None if pd.isna(value) else float(value)
                rows.append(
                    {
                        "user_id": key[0],
                        "event_id": eid,
                        "ts_us": t,
                        "op": op,
                        "value": best_value,
                        "is_delete": 1 if op == delete_op else 0,
                    }
                )
        state.update((best_ts, best_id, best_op, best_value))
        if retention_seconds is not None and best_ts is not None:
            state.setTimeoutTimestamp(
                best_ts // 1000 + retention_seconds * 1000
            )
        if rows:
            yield pd.DataFrame(rows)

    return update


def streaming_cdc_apply(
    stream: DataFrame,
    delete_op: str = "error",
    watermark: str = "0 seconds",
    retention_seconds: int | None = None,
) -> DataFrame:
    """Per advancing change: (user_id, event_id, ts_us, op, value,
    is_delete) — the upsert/delete feed a serving store applies. The
    final emission per key equals ``cdc_apply``'s compacted row (with
    tombstoned keys flagged instead of absent).
    """
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    user_type = stream.schema["user_id"].dataType
    event_id_type = stream.schema["event_id"].dataType
    out_schema = StructType(
        [
            StructField("user_id", user_type),
            StructField("event_id", event_id_type),
            StructField("ts_us", LongType()),
            StructField("op", StringType()),
            StructField("value", DoubleType()),
            StructField("is_delete", LongType()),
        ]
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"))
        .applyInPandasWithState(
            _make_cdc_update(delete_op, retention_seconds),
            outputStructType=out_schema,
            stateStructType=_state_schema(event_id_type.simpleString()),
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if retention_seconds is None
                else GroupStateTimeout.EventTimeTimeout
            ),
        )
    )
