"""Streaming twin of the last-touch attribution operator.

Batch :func:`..operators.activity.last_touch_attribution` scans each
user's full timeline with a carry-forward window; on a LIVE event
stream the same semantics is a one-value state fold: per user, the
state holds the most recent non-conversion event type, and every
arriving conversion is emitted immediately with that channel (or
``direct`` when no touch precedes it). This is exactly the turn_state
shape — one narrow state row per user, emission per arriving event,
leakage-free by construction (state can only fold the past).

Exactness contract: equal to the batch operator under per-key
in-order delivery (the micro-batch replay the tests run, and what a
(user, ts)-sorted upstream produces). Out-of-order arrivals WITHIN a
micro-batch are sorted before folding; across micro-batches a late
touch cannot retroactively re-credit an already-emitted conversion —
the standard streaming-attribution tradeoff, documented not hidden.

With ``retention_seconds`` set, a user idle past the horizon (event
time, fired when the watermark passes) has their touch state removed —
bounded state under user churn.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = "last_touch string, last_ts long"


def _make_attribution_update(
    conversion: str, default_channel: str, retention_seconds: int | None
):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        touch, last_ts = state.get if state.exists else (None, None)
        rows = []
        for pdf in pdfs:
            p = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            ts_us = p["ts"].astype("datetime64[us]").astype("int64")
            for eid, t, etype, value in zip(
                p["event_id"], ts_us, p["event_type"], p["value"]
            ):
                t = int(t)
                if etype == conversion:
                    vq = (
                        None
                        if pd.isna(value)
                        else int((float(value) * 1e3 + 0.5) // 1)
                    )
                    rows.append(
                        {
                            "user_id": key[0],
                            "event_id": eid,
                            "channel": touch
                            if touch is not None
                            else default_channel,
                            "value_q": vq,
                        }
                    )
                elif etype is not None and not (
                    isinstance(etype, float) and pd.isna(etype)
                ):
                    touch = etype
                last_ts = t
        state.update((touch, last_ts))
        if retention_seconds is not None and last_ts is not None:
            state.setTimeoutTimestamp(
                last_ts // 1000 + retention_seconds * 1000
            )
        if rows:
            yield pd.DataFrame(rows)

    return update


def streaming_attribution(
    stream: DataFrame,
    conversion: str = "purchase",
    default_channel: str = "direct",
    watermark: str = "0 seconds",
    retention_seconds: int | None = None,
) -> DataFrame:
    """Per arriving conversion event: (user_id, event_id, channel,
    value_q), the streaming emission of the batch operator's rows.

    State is one (last_touch, last_ts) row per user — memory bounded by
    active users, not history; the shuffle key (user) is the same as the
    batch window's partition key.
    """
    # parquet sources surface NTZ timestamps; watermarks need the
    # instant type (identity under the repo's pinned UTC session)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    user_type = stream.schema["user_id"].dataType
    event_id_type = stream.schema["event_id"].dataType
    out_schema = StructType(
        [
            StructField("user_id", user_type),
            StructField("event_id", event_id_type),
            StructField("channel", StringType()),
            StructField("value_q", LongType()),
        ]
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"))
        .applyInPandasWithState(
            _make_attribution_update(
                conversion, default_channel, retention_seconds
            ),
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if retention_seconds is None
                else GroupStateTimeout.EventTimeTimeout
            ),
        )
    )
