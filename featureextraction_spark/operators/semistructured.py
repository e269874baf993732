"""Schema-on-read extraction from semi-structured (JSON string) columns.

Event logs at 100 TB almost always carry a free-form JSON ``props``
column; promoting fields out of it is the first step of every pipeline.
Both operators are pure Catalyst expressions (``get_json_object`` is a
codegen'd JVM path — no Python, no shuffle for the row-level extract;
the profile is ONE map-side-combinable groupBy onto the small group
vocabulary), so the extraction rides inside whatever scan already
touches the log — schema-on-read costs nothing extra at scale.

Malformed-JSON policy: ``get_json_object`` yields NULL for corrupt
documents and missing paths alike; ``n_present`` therefore counts rows
whose JSON parses AND has an integral field at ``path`` — the quarantine
split (``n_rows − n_present``) is the corrupt/missing bucket, mirroring
the PERMISSIVE-mode policy of :mod:`..sources.jsonl`.

Cross-engine contract: the extracted field is CAST to BIGINT before any
aggregate, so min/max/sum are exact integers (DuckDB replays with
``json_valid`` + ``json_extract_string``; its HUGEINT sum is cast back).

No reference counterpart (the reference has no semi-structured inputs);
standard public practice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_field(json_col: str, path: str = "$.k") -> Column:
    """The field at ``path`` as a BIGINT (NULL on corrupt JSON, missing
    key, or a non-integral value — strings of digits DO cast, matching
    DuckDB's ``json_extract_string``-then-TRY_CAST replay). ``try_cast``
    keeps the quarantine policy under ANSI mode: malformed values become
    NULL instead of failing the job."""
    return F.get_json_object(F.col(json_col), path).try_cast("long")


def with_json_field(
    df: DataFrame, json_col: str = "props", path: str = "$.k", out: str = "k"
) -> DataFrame:
    """Row-level promotion of one JSON field to a typed column."""
    return df.withColumn(out, json_field(json_col, path))


def json_field_profile(
    df: DataFrame,
    by: str = "event_type",
    json_col: str = "props",
    path: str = "$.k",
) -> DataFrame:
    """Per-group presence/range profile of an integral JSON field:
    (group, n_rows, n_present, k_min, k_max, k_sum) — the scan you run
    before promoting a props field into the table schema."""
    k = json_field(json_col, path)
    return df.groupBy(by).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(k).cast("long").alias("n_present"),
        F.min(k).cast("long").alias("k_min"),
        F.max(k).cast("long").alias("k_max"),
        F.sum(k).cast("long").alias("k_sum"),
    )
