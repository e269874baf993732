"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop write (full execution, no driver
collect). The flagship pipeline's turns/sec throughput (BASELINE.json
metric) is included as an extra key.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)

    import __spark_entry__ as entrymod
    from featureextraction_spark.session import get_spark

    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    spark = get_spark(
        "fex-bench",
        parallelism=cpus,
        shuffle_partitions=cpus,
        # same throughput config the scaling bench validated: ParallelGC
        # (~10% over G1 on sort/shuffle-bound stages) + tmpfs shuffle dirs
        extra_conf={
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
            "spark.local.dir": "/dev/shm/spark-tmp",
        },
    )

    # warm the JVM/codegen once on a trivial action so q1 isn't charged startup
    spark.range(1000000).selectExpr("sum(id)").collect()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    # flagship throughput: full point-in-time pipeline (sessionize + ffill +
    # as-of at purchase probes) over the events table; turns/sec = input rows
    # processed per wall-second
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n_rows = ev.count()
    t0 = time.perf_counter()
    from featureextraction_spark.operators.asof import asof_join
    from featureextraction_spark.operators.backfill import forward_fill
    from featureextraction_spark.operators.sessionize import sessionize

    enriched = forward_fill(
        sessionize(ev, key="user_id", ts="ts", tie="event_id").withColumn(
            "purchase_value", F.when(F.col("event_type") == "purchase", F.col("value"))
        ),
        ["purchase_value"],
        key="user_id",
        order=("ts", "event_id"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    data = enriched.select(
        "user_id",
        F.col("event_id").alias("data_event_id"),
        "ts",
        "event_type",
        "session_id",
        "last_purchase_value",
    )
    force(
        asof_join(
            probes,
            data,
            on="ts",
            by="user_id",
            tie="data_event_id",
            value_cols=["event_type", "session_id", "last_purchase_value"],
        )
    )
    flagship_sec = time.perf_counter() - t0
    timings["flagship_pipeline"] = round(flagship_sec, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "turns_per_sec": round(n_rows / flagship_sec, 1),
        "flagship_input_rows": n_rows,
    }
    # attach the latest scaling-efficiency evidence (scripts/scaling_bench.py
    # writes it; protocol + tables in BENCH_SCALING.md)
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            sc = json.load(f)
        out["scaling_efficiency"] = sc.get("value")
        out["scaling_pairs"] = sc.get("pairs")
        out["scaling_peak_turns_per_sec"] = max(
            (lv["turns_per_sec"] for lv in sc.get("levels", [])), default=None
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
