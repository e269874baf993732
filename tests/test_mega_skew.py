"""Mega-conversation skew, end to end (round-4 verdict item 7).

One synthetic conversation with 1M turns — the pathological key no
partitioner can split — through the full salted flagship chain
(sessionize_salted → forward_fill_salted → asof_join_salted), asserted
row-equal (checksum + count) to the plain chain's output. The plain
chain funnels the whole conversation through ONE task per window; the
salted chain parallelizes it ~80 ways by contiguous time bucket — the
wall-time ratio at 10M turns is recorded by scripts/skew_bench.py into
BENCH_SKEW.json / BASELINE.md.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featureextraction_spark.operators.asof import asof_join, asof_join_salted
from featureextraction_spark.operators.backfill import (
    forward_fill,
    forward_fill_salted,
)
from featureextraction_spark.operators.sessionize import (
    sessionize,
    sessionize_salted,
)

N_TURNS = 1_000_000


def make_mega_conv(spark, n: int = N_TURNS) -> DataFrame:
    """Deterministic 1-conversation fixture: ~7s cadence, a >30min jump
    every 997 turns (session break), sparse 'purchase' values."""
    return spark.range(n).select(
        F.lit("mega").alias("conv_id"),
        F.col("id").cast("long").alias("turn_idx"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.col("id") * 7
            + F.floor(F.col("id") / 997) * 3600
        ).alias("ts"),
        F.when(F.pmod("id", 13) == 0, F.col("id").cast("double")).alias(
            "purchase_value"
        ),
        F.concat(F.lit("r"), F.pmod("id", 3).cast("string")).alias("role"),
    )


def _chain(df: DataFrame, salted: bool) -> DataFrame:
    if salted:
        s = sessionize_salted(df, key="conv_id", ts="ts", tie="turn_idx")
        f = forward_fill_salted(
            s, ["purchase_value"], key="conv_id", ts="ts", tie="turn_idx"
        )
    else:
        s = sessionize(df, key="conv_id", ts="ts", tie="turn_idx")
        f = forward_fill(
            s, ["purchase_value"], key="conv_id", order=("ts", "turn_idx")
        )
    probes = df.filter(F.pmod("turn_idx", 101) == 0).select(
        "conv_id", "turn_idx", "ts"
    )
    data = f.select(
        "conv_id",
        F.col("turn_idx").alias("data_turn"),
        "ts",
        "role",
        "session_id",
        "last_purchase_value",
    )
    join = asof_join_salted if salted else asof_join
    return join(
        probes,
        data,
        on="ts",
        by="conv_id",
        tie="data_turn",
        value_cols=["role", "session_id", "last_purchase_value"],
    )


def _checksum(df: DataFrame) -> tuple[int, int]:
    cols = sorted(df.columns)
    row = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.crc32(F.to_json(F.struct(*cols)))).cast("long").alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def test_mega_conversation_salted_chain_equals_plain(spark):
    df = make_mega_conv(spark).localCheckpoint()  # pin the fixture once
    t0 = time.perf_counter()
    plain = _checksum(_chain(df, salted=False))
    t_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    salted = _checksum(_chain(df, salted=True))
    t_salted = time.perf_counter() - t0
    assert plain[0] == N_TURNS // 101 + 1
    assert salted == plain, (salted, plain)
    # informational (formal ratios live in scripts/skew_bench.py output):
    print(
        f"mega-skew 1M turns: plain {t_plain:.1f}s, salted {t_salted:.1f}s"
    )
