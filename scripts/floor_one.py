"""Measure bench floors for a subset of queries and hand-merge them into
BENCH_LOCAL.json per the established merge-not-overwrite floors policy.

Usage: python scripts/floor_one.py ivfpq_recall [more names...]

Identical protocol to bench.py (same session config, JVM warm-up, noop
force, best-of-$SPARK_GRAFT_REPS with spread, cache release after reps);
only the named queries run, and only their entries in the floors file
change: floor = min(old, new), spread = max(old, new) when an entry
already exists, plus the headline total is re-summed from the merged
per-query floors.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: floor_one.py <query> [query...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))

    import __spark_entry__ as entrymod
    from featureextraction_spark.operators.cache import (
        release_persisted_intermediates,
    )
    from featureextraction_spark.session import get_spark

    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    spark = get_spark(
        "fex-floor-one",
        parallelism=cpus,
        shuffle_partitions=cpus,
        extra_conf={
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
            "spark.local.dir": "/dev/shm/spark-tmp",
        },
    )
    spark.range(1000000).selectExpr("sum(id)").collect()

    qs = entrymod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in names:
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        release_persisted_intermediates()
        timings[name] = round(min(samples), 3)
        spreads[name] = round(max(samples) - min(samples), 3)
        print(f"{name}: floor {timings[name]}s spread {spreads[name]}s")
    spark.stop()

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_LOCAL.json",
    )
    with open(path) as f:
        doc = json.load(f)
    for name in names:
        old = doc["queries"].get(name)
        doc["queries"][name] = min(old, timings[name]) if old else timings[name]
        old_sp = doc["query_spread_sec"].get(name)
        doc["query_spread_sec"][name] = (
            max(old_sp, spreads[name]) if old_sp is not None else spreads[name]
        )
    doc["value"] = round(sum(doc["queries"].values()), 3)
    with open(path, "w") as f:
        json.dump(doc, f)
    print(json.dumps({k: doc["queries"][k] for k in names}))
    print(f"new headline total: {doc['value']}")


if __name__ == "__main__":
    main()
