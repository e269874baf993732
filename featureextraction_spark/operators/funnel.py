"""Ordered-step funnel completion per entity (event-sequence analytics).

"Did the user view, then click, then purchase — in that order?" computed
for every entity in ONE pass: no self-joins, no per-row Python, no
sequence UDF. For each step k, a running window tracks the earliest
step-(k−1) completion so far; a row is a step-k CANDIDATE iff its type
matches and a strictly-earlier completion exists; the final per-entity
aggregate takes the min candidate timestamp per step. All window passes
share one ``HashPartitioning(key)`` exchange and one sort, and the
closing groupBy is on the same key (no second shuffle).

Strictness: step k must have a strictly LATER timestamp than step k−1
(same-µs ties do not chain — documented funnel semantics that keeps
every comparison a plain BIGINT ``<``, portable to any SQL engine).

All outputs are integers (µs timestamps, step count, gaps) — hash-exact
by construction. No reference counterpart; standard product-analytics
practice (the windowed reformulation of the classic funnel self-join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.time import epoch_us


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    by: str = "user_id",
    ts: str = "ts",
    role: str = "event_type",
    tie: str = "event_id",
) -> DataFrame:
    """One row per entity: ``step{k}_us`` (µs of the earliest valid
    step-k completion, NULL if never reached), ``steps_completed``
    (0..len(steps)), and ``gap{k}_us`` between consecutive completions.

    (The result is provably tie-order-insensitive — a same-µs candidate
    can never chain under the strict ``<`` — but the window orders on
    (ts, tie) anyway so both engines walk identical prefixes.)
    """
    t = df.withColumn("__us", epoch_us(df, ts))
    w_run = (
        Window.partitionBy(by)
        .orderBy("__us", tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # candidate timestamp per step: step 0 is unconditional; step k needs
    # the running step-(k-1) completion to be strictly earlier
    prev_run = None
    cand_cols = []
    for k, step in enumerate(steps):
        is_step = F.col(role) == step
        if prev_run is None:
            cand = F.when(is_step, F.col("__us"))
        else:
            cand = F.when(
                is_step & prev_run.isNotNull() & (prev_run < F.col("__us")),
                F.col("__us"),
            )
        name = f"__cand_{k}"
        t = t.withColumn(name, cand)
        cand_cols.append(name)
        prev_run = F.min(name).over(w_run)

    aggs = [
        F.min(c).cast("long").alias(f"step{k}_us")
        for k, c in enumerate(cand_cols)
    ]
    out = t.groupBy(by).agg(*aggs)
    done = sum(
        (F.col(f"step{k}_us").isNotNull()).cast("int") for k in range(len(steps))
    )
    out = out.withColumn("steps_completed", done.cast("long"))
    for k in range(1, len(steps)):
        out = out.withColumn(
            f"gap{k}_us",
            (F.col(f"step{k}_us") - F.col(f"step{k - 1}_us")).cast("long"),
        )
    return out
