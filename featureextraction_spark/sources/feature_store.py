"""Feature store sink — snapshot-versioned parquet with Iceberg semantics.

Re-expresses the reference's two CSV write disciplines
(``src/preparation/writer.py:20-34`` row append and ``writer.py:37-77``
positional column merge) as a table-format sink:

* ``append(df)``   — S4: a new snapshot that REFERENCES existing data files
  and adds new ones (no rewrite — exactly Iceberg's append snapshot).
* ``merge_columns(df, on=...)`` — S5: schema-evolving column merge keyed on
  the ROW KEY, never on row position — fixing the defect the reference's own
  TODO admits (``writer.py:47``: "Implement write_features with smarter
  merging such that features are added based on the file names"). Rows are
  matched by key (e.g. ``(conv_id, ts)``); unmatched left rows keep nulls in
  the new columns. Implemented as a copy-on-write rewrite snapshot — the
  parquet stand-in for Iceberg ``MERGE INTO`` (see ``IcebergFeatureStore``).
* ``read(version=...)`` — time travel over the snapshot log.

Scale notes (100 TB): the snapshot log holds file PATHS, not data — append
is O(new data) regardless of table size, like Iceberg manifests.
``merge_columns`` is the only rewriting op; on a real cluster it is issued
as Iceberg ``MERGE INTO`` (merge-on-read) via ``IcebergFeatureStore`` so it
rewrites nothing either. The local parquet engine keeps identical user
semantics so every test exercises the same API the cluster path ships.

Commit protocol: data files are written first, then the log is replaced via
atomic rename — a half-written snapshot is never visible (single-writer;
Iceberg's optimistic-concurrency swap is the multi-writer analog).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_feature_store_log.json"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime jar + a catalog are on the session.

    This container ships no Iceberg jar, so the parquet engine below is the
    tested path; ``IcebergFeatureStore`` is the drop-in for clusters that do.
    """
    try:
        jconf = spark.sparkContext._jsc.sc().conf()
        if not any(
            "iceberg" in str(v).lower()
            for _k, v in jconf.getAll()
        ):
            return False
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


class FeatureStore:
    """Snapshot-versioned parquet feature store keyed on ``key_cols``.

    Layout::

        <path>/data/<uuid>/part-*.parquet     immutable data-file groups
        <path>/_feature_store_log.json        snapshot log (atomic rename)

    Each snapshot is ``{"version", "op", "files": [dirs], "schema"}``; reads
    union the referenced dirs. ``version`` is monotonically increasing.
    """

    def __init__(self, spark: SparkSession, path: str, key_cols: list[str]):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    # -- snapshot log ------------------------------------------------------

    def _log_path(self) -> str:
        return os.path.join(self.path, _LOG)

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._log_path()):
            return []
        with open(self._log_path()) as f:
            return json.load(f)

    def current_version(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1]["version"] if snaps else None

    def _commit(
        self, op: str, files: list[str], schema: list[str], tag: str | None = None
    ) -> int:
        snaps = self.snapshots()
        version = (snaps[-1]["version"] + 1) if snaps else 0
        snap = {"version": version, "op": op, "files": files, "schema": schema}
        if tag is not None:
            snap["tag"] = tag
        snaps.append(snap)
        tmp = self._log_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(snaps, f, indent=1)
        os.replace(tmp, self._log_path())  # atomic commit point
        return version

    def _write_group(self, df: DataFrame) -> str:
        group = uuid.uuid4().hex
        df.write.mode("overwrite").parquet(os.path.join(self.path, "data", group))
        return group

    # -- operations --------------------------------------------------------

    def find_version_by_tag(self, tag: str) -> int | None:
        """Latest snapshot version committed with ``tag``, or None.

        Tags make appends idempotent across job restarts: a writer that
        crashed AFTER committing but BEFORE recording its own bookkeeping
        can look its commit up instead of appending the same rows again
        (Iceberg analog: snapshot summary properties).
        """
        for s in reversed(self.snapshots()):
            if s.get("tag") == tag:
                return s["version"]
        return None

    def append(self, df: DataFrame, tag: str | None = None) -> int:
        """S4 row append: new snapshot = previous files + one new file group.

        Columns are matched BY NAME against the current schema (the
        reference appends headerless CSV rows positionally,
        ``writer.py:32-34`` — a silent-corruption hazard we do not copy).
        ``tag`` stamps the snapshot for idempotent-restart lookup
        (``find_version_by_tag``).
        """
        snaps = self.snapshots()
        if snaps:
            schema = snaps[-1]["schema"]
            missing = [c for c in schema if c not in df.columns]
            if missing:
                raise ValueError(f"append missing columns: {missing}")
            df = df.select(*schema)  # name-aligned, order-normalized
        else:
            schema = df.columns
        group = self._write_group(df)
        prev_files = snaps[-1]["files"] if snaps else []
        return self._commit("append", prev_files + [group], schema, tag=tag)

    def merge_columns(
        self,
        df: DataFrame,
        new_cols: list[str] | None = None,
        tag: str | None = None,
    ) -> int:
        """S5 column merge KEYED ON ``key_cols`` (never positional).

        ``df`` must carry the key columns plus the feature columns to adopt;
        only columns absent from the current schema are added (reference
        ``np.setdiff1d(new.columns, old.columns)``, ``writer.py:67``).
        Existing rows without a match keep nulls. Copy-on-write rewrite —
        on Iceberg this is ``MERGE INTO`` + ``ADD COLUMNS`` instead.
        """
        snaps = self.snapshots()
        if not snaps:
            return self.append(df)
        current = self.read()
        schema = snaps[-1]["schema"]
        if new_cols is None:
            new_cols = [c for c in df.columns if c not in schema]
        if not new_cols:
            return snaps[-1]["version"]
        right = df.select(*self.key_cols, *new_cols)
        if right.groupBy(*self.key_cols).count().filter("count > 1").limit(1).count():
            raise ValueError("merge_columns: right side has duplicate keys")
        merged = current.join(right, on=self.key_cols, how="left")
        group = self._write_group(merged)
        return self._commit("merge_columns", [group], schema + list(new_cols), tag=tag)

    def read(self, version: int | None = None) -> DataFrame:
        """Read the table at ``version`` (default: latest) — time travel."""
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"empty feature store at {self.path}")
        snap = snaps[-1] if version is None else next(
            s for s in snaps if s["version"] == version
        )
        paths = [os.path.join(self.path, "data", g) for g in snap["files"]]
        return self.spark.read.parquet(*paths).select(*snap["schema"])

    def expire_snapshots(self, keep_last: int = 1) -> int:
        """Drop unreferenced file groups (Iceberg ``expire_snapshots``)."""
        snaps = self.snapshots()
        if len(snaps) <= keep_last:
            return 0
        kept = snaps[-keep_last:]
        live = {g for s in kept for g in s["files"]}
        removed = 0
        data_dir = os.path.join(self.path, "data")
        for g in os.listdir(data_dir):
            if g not in live:
                shutil.rmtree(os.path.join(data_dir, g))
                removed += 1
        tmp = self._log_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(kept, f, indent=1)
        os.replace(tmp, self._log_path())
        return removed


class IcebergFeatureStore:
    """The same API issued as real Iceberg SQL — the cluster ship path.

    Untestable in this container (no Iceberg jar — ``iceberg_available``);
    every statement below is standard public Iceberg-Spark SQL.
    """

    def __init__(self, spark: SparkSession, table: str, key_cols: list[str]):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on classpath; use FeatureStore (parquet)"
            )
        self.spark = spark
        self.table = table
        self.key_cols = list(key_cols)

    def append(self, df: DataFrame, tag: str | None = None) -> None:
        w = df.writeTo(self.table)
        if tag is not None:
            # public Iceberg write option: lands in the snapshot summary,
            # queryable via the table's .snapshots metadata table
            w = w.option("snapshot-property.run-tag", tag)
        w.append()

    def merge_columns(self, df: DataFrame, new_cols: list[str]) -> None:
        for c in new_cols:
            dt = dict(df.dtypes)[c]
            self.spark.sql(
                f"ALTER TABLE {self.table} ADD COLUMNS ({c} {dt})"
            )
        df.createOrReplaceTempView("_fex_merge_src")
        on = " AND ".join(f"t.{k} = s.{k}" for k in self.key_cols)
        sets = ", ".join(f"t.{c} = s.{c}" for c in new_cols)
        self.spark.sql(
            f"MERGE INTO {self.table} t USING _fex_merge_src s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {sets}"
        )

    def read(self, version: int | None = None) -> DataFrame:
        reader = self.spark.read
        if version is not None:
            reader = reader.option("snapshot-id", str(version))
        return reader.format("iceberg").load(self.table)
