"""Structured Streaming operators over transcript streams.

The batch engine's sessionize/lag/backfill assume the full history is
addressable; on a LIVE transcript stream (turns arriving as conversations
happen) the same semantics need Structured Streaming's stateful
machinery. The operator set:

- ``streaming_turn_state``: per-turn enrichment of the live stream with
  the batch ``turn_state`` relational half (session id, turn count, prev
  role, forward-filled tool, running transitions) — one narrow state row
  per conversation, emitted per arriving turn, leakage-free by
  construction; proven row-equal to the batch operator in the tests.

- ``streaming_sessionize``: gap-based session assembly as a custom
  stateful operator (``applyInPandasWithState``) — per ``conv_id`` the
  state holds the open session's (id, start, last ts, turn count); a turn
  arriving more than ``gap_seconds`` after the last one closes the open
  session and starts the next. Closed sessions are EMITTED (append mode);
  the open session is held in state and flushed either by a later turn or
  by the event-time timeout once the watermark passes
  ``last_ts + gap_seconds``. The emitted rows match the batch
  ``sessionize`` → groupBy(session) aggregate exactly — the tests replay
  a file stream and diff against the batch result.

- ``streaming_turn_stats``: watermarked sliding-window aggregation
  (turns/sec, distinct conversations, token counts per window) — the
  built-in-operator path; late turns beyond the watermark are dropped by
  Spark, on-time turns update their window.

- ``streaming_asof_lookup``: point-in-time feature lookup for a live
  probe stream against a static feature snapshot (stream-static backward
  join + watermarked max-by finalization) — each probe answered once,
  leakage-free, equal to the batch as-of join.

Scale notes: state is keyed by ``conv_id`` (the same shuffle key as every
batch operator), one state row per OPEN conversation — memory is bounded
by concurrency, not history. The watermark bounds both state retention
and late-data acceptance; ``gap_seconds`` doubles as the timeout, so an
abandoned conversation's state is reclaimed at exactly the moment its
session is defined to be closed. RocksDB state store
(``spark.sql.streaming.stateStore.providerClass``) is the production
setting at 10^8 concurrent conversations; the default HDFS-backed store
is fine for tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from featureextraction_spark.plans.feature_pipeline import TOKEN_REGEX

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ]
)


def _make_session_update(gap_seconds: int):
    """Build the per-conv stateful kernel: fold sorted turn timestamps into
    sessions. Pure function of (state, sorted batch) — emits every session
    CLOSED by this batch (or by timeout) and parks the still-open one in
    state."""
    gap_us = gap_seconds * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            if state.exists:
                sid, n, start, end = state.get
                yield pd.DataFrame(
                    [
                        {
                            "conv_id": key[0],
                            "session_id": sid,
                            "n_turns": n,
                            "start_us": start,
                            "end_us": end,
                        }
                    ]
                )
            state.remove()
            return

        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(
                int(v) for v in pdf["ts"].astype("datetime64[us]").astype("int64")
            )
        ts_us.sort()
        if not ts_us:
            return

        if state.exists:
            sid, n, start, end = state.get
        else:
            sid, n, start, end = 1, 0, ts_us[0], -(10**18)

        closed = []
        for t in ts_us:
            if n > 0 and (t - end) > gap_us:
                closed.append((sid, n, start, end))
                sid, n, start = sid + 1, 0, t
            n += 1
            end = t
        state.update((sid, n, start, end))
        # event-time timeout: fire when the watermark passes last_ts + gap —
        # exactly when the open session becomes closable by definition
        state.setTimeoutTimestamp(end // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                [
                    {
                        "conv_id": key[0],
                        "session_id": s,
                        "n_turns": c,
                        "start_us": st,
                        "end_us": en,
                    }
                    for (s, c, st, en) in closed
                ]
            )

    return update


def streaming_sessionize(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Gap-based sessionization over a streaming transcript DataFrame.

    ``stream`` needs (conv_id, ts) columns; returns an APPEND-mode stream
    of closed sessions (conv_id, session_id 1-based, n_turns, start_us,
    end_us). Within-batch ordering is handled by the kernel's sort; across
    batches, correctness relies on the watermark — turns older than it are
    Spark-dropped before the operator.
    """
    return (
        # NTZ timestamps (pandas/arrow parquet) → TIMESTAMP: watermarks
        # require the instant type (identity under the UTC session tz)
        stream.select("conv_id", F.col("ts").cast("timestamp").alias("ts"))
        .withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_session_update(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_turn_stats(
    stream: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked (sliding) window aggregates over the turn stream —
    pure built-in operators (incremental partial aggregation, no custom
    state): turns, distinct-ish conversations, token count."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(w.alias("win"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
            # canonical token regex (single source of truth incl. \x0B) so
            # streaming token counts agree with batch token_count
            F.sum(F.regexp_count(F.col("text"), F.lit(TOKEN_REGEX)))
            .cast("long")
            .alias("n_tokens"),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("win_start_us"),
            F.unix_micros(F.col("win.end")).alias("win_end_us"),
            "n_turns",
            "approx_convs",
            "n_tokens",
        )
    )


TURN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("turn_count", T.LongType()),
        T.StructField("prev_role", T.StringType()),
        T.StructField("last_tool", T.StringType()),
        T.StructField("role_transitions", T.LongType()),
    ]
)

_TURN_STATE_STATE = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("turn_count", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_role", T.StringType()),
        T.StructField("last_tool", T.StringType()),
        T.StructField("role_transitions", T.LongType()),
    ]
)


def _make_turn_state_update(gap_seconds: int, retention_seconds: int | None):
    """Per-conv running state fold: the streaming twin of the batch
    ``plans.feature_pipeline.turn_state`` relational half. Each arriving
    turn is emitted ENRICHED with the leakage-free state as of itself
    (session id, running turn count, previous role, forward-filled tool,
    running role-transition count).

    With ``retention_seconds`` set, a conversation idle past the horizon
    (by event time, fired once the watermark passes) has its state row
    REMOVED — nothing to flush, the enrichment was already emitted per
    turn."""
    gap_us = gap_seconds * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            sid, cnt, last_ts, last_role, last_tool, trans = state.get
        else:
            sid, cnt, last_ts, last_role, last_tool, trans = 0, 0, None, None, None, 0

        rows = []
        for pdf in pdfs:
            p = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            ts_us = p["ts"].astype("datetime64[us]").astype("int64")
            for turn_idx, t, role, tool in zip(
                p["turn_idx"], ts_us, p["role"], p["tool"]
            ):
                t = int(t)
                if last_ts is None or (t - last_ts) > gap_us:
                    sid += 1
                if last_role is not None and role != last_role:
                    trans += 1
                cnt += 1
                if tool is not None and not (isinstance(tool, float) and pd.isna(tool)):
                    last_tool = tool
                rows.append(
                    {
                        "conv_id": key[0],
                        "turn_idx": int(turn_idx),
                        "ts_us": t,
                        "session_id": sid,
                        "turn_count": cnt,
                        "prev_role": last_role,
                        "last_tool": last_tool,
                        "role_transitions": trans,
                    }
                )
                last_ts, last_role = t, role
        state.update((sid, cnt, last_ts, last_role, last_tool, trans))
        if retention_seconds is not None and last_ts is not None:
            state.setTimeoutTimestamp(
                last_ts // 1000 + retention_seconds * 1000
            )
        if rows:
            yield pd.DataFrame(rows)

    return update


def streaming_turn_state(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
    retention_seconds: int | None = 86_400,
) -> DataFrame:
    """Enrich a LIVE transcript stream with the per-turn relational state
    the batch ``turn_state`` computes over full history — session id,
    turn count, prev role, forward-filled tool, running role transitions
    — emitted per arriving turn, leakage-free by construction (state only
    ever folds past turns).

    Ordering contract: within a micro-batch the kernel sorts by
    (ts, turn_idx); ACROSS batches correctness relies on the source
    delivering each conversation's turns in non-decreasing event-time
    order beyond the watermark (true for log-structured transcript
    feeds).

    State retention: one narrow row per conversation seen within the last
    ``retention_seconds`` of event time — an event-time timeout removes a
    conversation's state once the watermark passes
    ``last_ts + retention_seconds``, so long-running streams are bounded
    by ACTIVE conversations, not every conv_id ever seen. A conversation
    that resumes after eviction restarts its running state (session_id 1,
    turn_count 1, …) — pick a horizon longer than any real conversation
    lifetime, or pass ``retention_seconds=None`` for unbounded retention
    (exact batch parity forever, state grows with distinct conv_ids).
    """
    return (
        stream.select(
            "conv_id",
            "turn_idx",
            F.col("ts").cast("timestamp").alias("ts"),
            "role",
            "tool",
        )
        .withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_turn_state_update(gap_seconds, retention_seconds),
            outputStructType=TURN_STATE_SCHEMA,
            stateStructType=_TURN_STATE_STATE,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if retention_seconds is None
                else GroupStateTimeout.EventTimeTimeout
            ),
        )
    )


def streaming_asof_lookup(
    probes: DataFrame,
    data: DataFrame,
    on: str = "ts",
    by: str = "conv_id",
    tie: str = "turn_idx",
    value_cols: list[str] | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Point-in-time feature lookup for a LIVE probe stream: each arriving
    probe (by, ts) is answered with the latest static-table row at
    ``ts' <= ts`` — the streaming face of ``operators.asof.asof_join``.

    Shape: stream-static left join on ``by`` with the backward time
    predicate, then a watermarked per-probe aggregation picking the
    max-(ts', tie) match (append mode — a probe's answer is emitted once
    the watermark passes its timestamp, and is final). Leakage-free by the
    join predicate itself.

    Scale notes: the static side is re-scanned per micro-batch — keep it
    broadcastable (a feature snapshot) or bucketed by ``by`` so the join
    is co-located. For data sides that also stream, compose
    ``streaming_turn_state`` (running state) instead; true
    stream-stream as-of needs both sides watermarked and is bounded by
    the join window Spark requires.
    """
    if value_cols is None:
        value_cols = [c for c in data.columns if c not in (by, on, tie)]
    d = data.select(
        F.col(by).alias("__d_by"),
        F.col(on).cast("timestamp").alias("__d_ts"),
        F.col(tie).alias("__d_tie"),
        *[F.col(c).alias(f"__d_{c}") for c in value_cols],
    )
    p = probes.select(
        by,
        F.col(on).cast("timestamp").alias(on),
        tie,
    ).withWatermark(on, watermark)
    joined = p.join(
        d,
        (F.col(by) == F.col("__d_by")) & (F.col("__d_ts") <= F.col(on)),
        "left",
    )
    best = F.max_by(
        F.struct(
            F.col("__d_ts").alias("matched_ts"),
            *[F.col(f"__d_{c}").alias(c) for c in value_cols],
        ),
        F.struct(F.col("__d_ts"), F.col("__d_tie")),
    ).alias("__best")
    out = joined.groupBy(by, on, tie).agg(best)
    return out.select(
        by,
        on,
        tie,
        F.col("__best.matched_ts").alias("matched_ts"),
        *[F.col(f"__best.{c}").alias(c) for c in value_cols],
    )
