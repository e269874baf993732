"""End-to-end resumable feature job — the spark-submit ship vehicle.

The north rule's job shape: read a transcript table, compute point-in-time
features, land them in the feature store — with every stage writing
per-partition lineage + metrics to the checkpoint manifest so a restarted
run resumes mid-job without recomputation (the formalization of the
reference's every-10-entities flush, ``src/preparation/writer.py:122-126``).

Usage (local or cluster — same file)::

    zip -r fex.zip featureextraction_spark
    spark-submit --driver-memory 24g --py-files fex.zip scripts/run_pipeline.py \
        --input /path/to/transcripts.parquet \
        --work  /path/to/workdir \
        [--gap-seconds 1800] [--probes-per-conv 3] [--run-id r1]

Driver/executor memory MUST be sized via spark-submit flags (the JVM is
already running by the time session-level conf is read); local-mode runs
at 10^7+ turns want >= 16g.

Stages (each checkpointed + manifested):
  1. turn_state  — sessionize + lag + forward-fill + running transitions
  2. probes      — deterministic probe points (last N turns per conv)
  3. features    — point-in-time vectors at the probes
  4. store       — snapshot append into the parquet/Iceberg feature store

Re-running with the same --work and unchanged input fingerprints skips
completed stages (their outputs are re-read from the checkpoint parquet);
the final JSON line reports which stages resumed vs recomputed plus
per-stage wall/rows from the manifest.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def input_fingerprint(path: str) -> str:
    """Deterministic fingerprint of the input: file names + sizes."""
    parts = []
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            fp = os.path.join(path, f)
            if f.endswith(".parquet") or f == "_SUCCESS":
                parts.append(f"{f}:{os.path.getsize(fp)}")
    else:
        parts.append(f"{os.path.basename(path)}:{os.path.getsize(path)}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet path")
    ap.add_argument("--work", required=True, help="checkpoint/workdir")
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--gap-seconds", type=int, default=1800)
    ap.add_argument("--probes-per-conv", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args(argv)

    from featureextraction_spark.plans.feature_pipeline import (
        point_in_time_features,
        turn_state,
    )
    from featureextraction_spark.session import get_spark
    from featureextraction_spark.sources.feature_store import FeatureStore
    from featureextraction_spark.streaming.manifest import CheckpointedRunner

    spark = get_spark("fex-pipeline", parallelism=args.cpus or None)
    ckpt = CheckpointedRunner(spark, os.path.join(args.work, "ckpt"), args.run_id)
    fp = input_fingerprint(args.input)

    state = ckpt.stage(
        "turn_state",
        lambda: turn_state(spark.read.parquet(args.input), args.gap_seconds),
        fingerprint=fp,
    )

    def probes_fn():
        tr = spark.read.parquet(args.input)
        w = Window.partitionBy("conv_id").orderBy(F.desc("ts"), F.desc("turn_idx"))
        return (
            tr.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= args.probes_per_conv)
            .select("conv_id", "ts")
            .distinct()
        )

    probes = ckpt.stage("probes", probes_fn, fingerprint=fp)

    features = ckpt.stage(
        "features",
        lambda: point_in_time_features(
            None, probes, args.gap_seconds, state=state
        ),
        fingerprint=fp,
    )

    store = FeatureStore(
        spark, os.path.join(args.work, "feature_store"), key_cols=["conv_id", "ts"]
    )
    store_manifest = ckpt.read_manifest("store")
    store_tag = f"{args.run_id}:{fp}:store"
    if store_manifest is not None and store_manifest.get("input_fingerprint") == fp:
        ckpt.resumed.append("store")
        version = store_manifest.get("store_version", store.current_version())
    else:
        import time as _t

        t0 = _t.perf_counter()
        # idempotent under restart: if a previous attempt committed the
        # snapshot but crashed before recording the manifest, adopt that
        # commit instead of appending the same feature rows again
        version = store.find_version_by_tag(store_tag)
        adopted = version is not None
        if not adopted:
            version = store.append(features, tag=store_tag)
        n = store.read(version=version).count()
        ckpt.record(
            "store", fp, n, int((_t.perf_counter() - t0) * 1000),
            extra={"store_version": version},
            resumed=adopted,
        )

    summary = {
        "run_id": args.run_id,
        "input": args.input,
        "fingerprint": fp,
        "resumed": sorted(set(ckpt.resumed)),
        "recomputed": sorted(set(ckpt.recomputed)),
        "store_version": version,
        "feature_rows": store.read().count(),
        "stages": [
            {k: m[k] for k in ("stage", "status", "wall_ms", "total_rows", "n_partitions")}
            for m in ckpt.manifest_rows()
        ],
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
