"""Checkpoint manifest with per-partition lineage — mid-job resume without
recomputation (SURVEY.md W10 → §4 'incremental / resumable execution').

Reference analog: the periodic flush every 10 completed entities that
protects against late failure (``src/preparation/writer.py:114-128``) —
formalized here as stage-granular checkpointing:

- every stage writes its output to ``<base>/<run_id>/<stage>/data`` (parquet,
  partition-atomic: Spark commits via _SUCCESS);
- a manifest row per partition ``(run_id, stage, partition_id, row_count)``
  plus stage-level ``(input_fingerprint, wall_ms, total_rows, status)`` is
  committed AFTER the data — the commit-ordering invariant that makes
  restart safe: a manifest entry implies readable data;
- on restart, stages whose manifest entry is ``done`` AND whose
  input_fingerprint matches are loaded from their checkpoint, not recomputed.

Spark gives task-level retry within a job but nothing across driver
restarts; this is the custom subsystem the north rule asks for. Local-FS
JSON here; the identical protocol works on any object store (or an Iceberg
manifest table) on a real cluster.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PART_COL = "__checkpoint_partition_id"


class StageSkipped(Exception):
    """Raised internally when a stage is resumed from checkpoint."""


class CheckpointedRunner:
    """Runs a named sequence of DataFrame stages with resume-from-manifest.

    Usage::

        runner = CheckpointedRunner(spark, base_dir, run_id="r1")
        turns = runner.stage("load", lambda: spark.read.parquet(...),
                             fingerprint="sf0.01")
        feats = runner.stage("features", lambda: pipeline(turns))
    """

    def __init__(self, spark: SparkSession, base_dir: str, run_id: str):
        self.spark = spark
        self.base = os.path.join(base_dir, run_id)
        self.run_id = run_id
        os.makedirs(os.path.join(self.base, "manifest"), exist_ok=True)
        self.recomputed: list[str] = []
        self.resumed: list[str] = []

    # -- manifest bookkeeping ------------------------------------------------

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.base, "manifest", f"{stage}.json")

    def _data_path(self, stage: str) -> str:
        return os.path.join(self.base, stage, "data")

    def read_manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def manifest_rows(self) -> list[dict]:
        rows = []
        mdir = os.path.join(self.base, "manifest")
        for fn in sorted(os.listdir(mdir)):
            with open(os.path.join(mdir, fn)) as f:
                rows.append(json.load(f))
        return rows

    # -- execution -----------------------------------------------------------

    def stage(
        self,
        name: str,
        df_fn: Callable[[], DataFrame],
        fingerprint: str | None = None,
    ) -> DataFrame:
        """Run (or resume) one stage; returns the stage's output DataFrame
        backed by its checkpoint parquet (stable lineage for downstream
        stages even across restarts)."""
        manifest = self.read_manifest(name)
        data_path = self._data_path(name)
        if (
            manifest is not None
            and manifest.get("status") == "done"
            and manifest.get("input_fingerprint") == fingerprint
            and os.path.exists(os.path.join(data_path, "_SUCCESS"))
        ):
            self.resumed.append(name)
            return self.spark.read.parquet(data_path).drop(_PART_COL)

        t0 = time.perf_counter()
        df = df_fn().withColumn(_PART_COL, F.spark_partition_id())
        df.write.mode("overwrite").parquet(data_path)  # partition-atomic commit
        wall_ms = int((time.perf_counter() - t0) * 1000)

        # per-partition lineage from the committed data (cheap columnar scan)
        written = self.spark.read.parquet(data_path)
        counts = (
            written.groupBy(_PART_COL)
            .agg(F.count(F.lit(1)).alias("row_count"))
            .collect()
        )
        partitions = sorted(
            [{"partition_id": int(r[_PART_COL]), "row_count": int(r["row_count"])} for r in counts],
            key=lambda d: d["partition_id"],
        )
        total = sum(p["row_count"] for p in partitions)

        # manifest committed strictly AFTER data: temp file + atomic rename
        entry = {
            "run_id": self.run_id,
            "stage": name,
            "status": "done",
            "input_fingerprint": fingerprint,
            "wall_ms": wall_ms,
            "total_rows": total,
            "n_partitions": len(partitions),
            "partitions": partitions,
            "committed_at_unix": int(time.time()),
        }
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f, indent=1)
        os.replace(tmp, self._manifest_path(name))
        self.recomputed.append(name)
        return written.drop(_PART_COL)

    def record(
        self,
        name: str,
        fingerprint: str | None,
        total_rows: int,
        wall_ms: int,
        extra: dict | None = None,
        resumed: bool = False,
    ) -> None:
        """Manifest a side-effect stage (e.g. a feature-store append) that
        has no checkpoint parquet of its own — same atomic commit protocol,
        so restarts can skip the side effect too. ``resumed=True`` records
        the manifest without counting the stage as recomputed (healing a
        lost manifest for a side effect that had already committed)."""
        entry = {
            "run_id": self.run_id,
            "stage": name,
            "status": "done",
            "input_fingerprint": fingerprint,
            "wall_ms": wall_ms,
            "total_rows": total_rows,
            "n_partitions": 0,
            "partitions": [],
            "committed_at_unix": int(time.time()),
            **(extra or {}),
        }
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f, indent=1)
        os.replace(tmp, self._manifest_path(name))
        (self.resumed if resumed else self.recomputed).append(name)

    def metrics(self) -> DataFrame:
        """All manifest rows as a DataFrame (stage-level metrics sink, S9)."""
        rows = [
            (
                m["run_id"],
                m["stage"],
                m["status"],
                m["wall_ms"],
                m["total_rows"],
                m["n_partitions"],
            )
            for m in self.manifest_rows()
        ]
        return self.spark.createDataFrame(
            rows,
            schema="run_id string, stage string, status string, wall_ms long,"
            " total_rows long, n_partitions long",
        )
