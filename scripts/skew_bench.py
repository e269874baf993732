"""Mega-conversation skew benchmark (round-4 verdict item 7).

One conversation with 10M turns — the key no partitioner can split —
through the plain flagship chain (sessionize → forward_fill → asof_join,
all windows funneling the conversation through ONE task) vs the salted
chain (contiguous-time-bucket salting, ~B-way parallel for a
conversation spanning B buckets), plus a balanced fixture (same total
rows over 1000 conversations) as the no-skew control.

Writes BENCH_SKEW.json (one JSON line per row-count, merged — existing
entries at other row counts are preserved) and prints this run's line.
Equality of the two chains is gated in tests/test_mega_skew.py; this
script measures the wall-time story only.

Reading the numbers (32 cores): the plain chain's cost grows
superlinearly with the mega-conversation's size on ONE core (n log n
sort + spill; no partitioner can split the key) — 18.5 s at 10M turns,
94.0 s at 30M — while the salted chain's cost scales with
min(buckets, cores) and is insensitive to WHERE the rows sit (mega 33 s
vs balanced 50 s at 30M; penalty 0.66× vs plain's 9.9×). The crossover:
1.05× salted speedup at 10M turns, 2.83× at 30M, growing without bound —
on a real cluster the plain chain is still one task while the salted
chain spreads over every executor. On balanced data plain wins (9.5 s vs
50 s at 30M), which is exactly why salting ships as explicit *_salted
variants (proven output-equal) rather than the default path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n = int(os.environ.get("SKEW_BENCH_ROWS", 10_000_000))
    reps = int(os.environ.get("SKEW_BENCH_REPS", 2))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)

    from featureextraction_spark.session import get_spark
    from tests.test_mega_skew import _chain

    # the 30M-row point needs headroom for the checkpointed fixture plus 32
    # concurrent window sorts (8g OOMs there); the box backs /dev/shm with RAM
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    spark = get_spark(
        "fex-skew-bench",
        parallelism=cpus,
        shuffle_partitions=cpus,
        extra_conf={
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
            "spark.local.dir": "/dev/shm/spark-tmp",
        },
    )
    spark.range(1000000).selectExpr("sum(id)").collect()  # JVM warm-up

    def fixture(n_convs: int):
        # same row count / cadence / session-break / value sparsity as the
        # pytest fixture, spread over n_convs conversations
        return spark.range(n).select(
            F.concat(F.lit("c"), F.pmod("id", n_convs).cast("string")).alias(
                "conv_id"
            ),
            F.floor(F.col("id") / n_convs).cast("long").alias("turn_idx"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + F.floor(F.col("id") / n_convs) * 7
                + F.floor(F.col("id") / (997 * n_convs)) * 3600
            ).alias("ts"),
            F.when(
                F.pmod("id", 13) == 0, F.col("id").cast("double")
            ).alias("purchase_value"),
            F.concat(F.lit("r"), F.pmod("id", 3).cast("string")).alias("role"),
        )

    results: dict[str, float] = {}
    for label, n_convs in (("mega", 1), ("balanced", 1000)):
        df = fixture(n_convs).localCheckpoint()
        for salted in (False, True):
            key = f"{label}_{'salted' if salted else 'plain'}_sec"
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                force(_chain(df, salted=salted))
                samples.append(time.perf_counter() - t0)
            results[key] = round(min(samples), 2)
        df.unpersist()

    out = {
        "metric": "mega_skew_chain",
        "rows": n,
        "cpus": cpus,
        "reps": reps,
        **results,
        "skew_penalty_plain": round(
            results["mega_plain_sec"] / results["balanced_plain_sec"], 2
        ),
        "skew_penalty_salted": round(
            results["mega_salted_sec"] / results["balanced_salted_sec"], 2
        ),
        "salted_speedup_on_mega": round(
            results["mega_plain_sec"] / results["mega_salted_sec"], 2
        ),
    }
    line = json.dumps(out)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SKEW.json",
    )
    # merge-not-overwrite (established floors policy): one line per row
    # count, this run replacing only its own row-count's entry
    existing: dict[int, str] = {}
    if os.path.exists(path):
        with open(path) as f:
            for prev in f:
                prev = prev.strip()
                if prev:
                    existing[json.loads(prev)["rows"]] = prev
    existing[n] = line
    with open(path, "w") as f:
        for _, entry in sorted(existing.items()):
            f.write(entry + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
