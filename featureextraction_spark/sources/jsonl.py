"""JSONL corpus source — the interchange format web-scale text corpora
actually ship in (one JSON document per line, gzip-friendly).

Web corpus dumps are dirty: truncated lines, invalid UTF-8 escapes,
schema drift. Silent row drops are the failure mode to design against —
a loader that quietly skips 2% of a 100-TB corpus is unauditable. This
reader makes malformedness EXPLICIT: every unparseable line is kept as a
``_corrupt_record`` row (Spark's PERMISSIVE mode), and ``split_corrupt``
partitions the read into (clean, corrupt) frames so the pipeline can
count, sample, and quarantine bad lines instead of losing them.

Scale design: schema is REQUIRED (never inferred — inference is a full
extra pass over 100 TB and non-deterministic under sampling); the reader
is a plain distributed text scan, splittable per file, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def jsonl_schema_with_corrupt(schema: T.StructType) -> T.StructType:
    """The user schema plus the corrupt-record capture column."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> DataFrame:
    """Read a JSONL corpus with an EXPLICIT schema; malformed lines are
    captured in ``_corrupt_record`` (all data columns null), never
    dropped. Compressed inputs (`.gz`, `.zst` where the codec is present)
    work transparently via Spark's text codecs.

    Implemented as a splittable text scan + ``from_json`` rather than
    ``spark.read.json``: the native JSON source DISALLOWS queries that
    reference only the corrupt column (SPARK-21610's documented
    cache-first workaround), which is exactly what a quarantine count
    does — the from_json projection has no such restriction, and blank
    lines are dropped the same way the native reader drops them.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    full = jsonl_schema_with_corrupt(schema)
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parsed = lines.select(
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__j")
    )
    return parsed.select("__j.*")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, corrupt_lines) — the quarantine
    split. Corrupt rows carry the raw line for audit/repair."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, corrupt


def corrupt_stats(df: DataFrame) -> DataFrame:
    """One-row frame: total lines, corrupt lines, corrupt fraction — the
    release-gate number (a corpus with unexplained corrupt volume fails
    review before it ships)."""
    return df.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col(CORRUPT_COL).isNotNull().cast("long")).alias("n_corrupt"),
        (
            F.sum(F.col(CORRUPT_COL).isNotNull().cast("long"))
            / F.count(F.lit(1))
        ).alias("corrupt_fraction"),
    )
