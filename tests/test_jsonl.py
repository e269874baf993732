"""JSONL corpus source: explicit-schema reads, corrupt-line quarantine,
gzip transparency."""

from __future__ import annotations

import gzip
import os

import pytest

from featureextraction_spark.sources.jsonl import (
    corrupt_stats,
    read_jsonl,
    split_corrupt,
)

LINES = [
    '{"doc_id": 1, "text": "hello world", "source": "src0"}',
    '{"doc_id": 2, "text": "second doc", "source": "src1"}',
    '{"doc_id": 3, "text": "unterminated',          # malformed JSON
    'not json at all',                               # garbage line
    '{"doc_id": 4, "text": null, "source": "src0"}', # valid, null field
    '{"doc_id": 5, "text": "extra", "source": "src1", "unknown": 9}',
]
SCHEMA = "doc_id long, text string, source string"


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    with open(os.path.join(str(d), "part0.jsonl"), "w") as f:
        f.write("\n".join(LINES[:3]) + "\n")
    with open(os.path.join(str(d), "part1.jsonl"), "w") as f:
        f.write("\n".join(LINES[3:]) + "\n")
    return str(d)


def test_read_clean_and_corrupt(spark, jsonl_dir):
    df = read_jsonl(spark, jsonl_dir, SCHEMA)
    clean, corrupt = split_corrupt(df)
    got = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert got == {1: "hello world", 2: "second doc", 4: None, 5: "extra"}
    bad = sorted(r["raw_line"] for r in corrupt.collect())
    assert bad == sorted([LINES[2], LINES[3]])
    # clean frame does not leak the capture column
    assert "_corrupt_record" not in clean.columns


def test_corrupt_stats(spark, jsonl_dir):
    df = read_jsonl(spark, jsonl_dir, SCHEMA)
    row = corrupt_stats(df).collect()[0]
    assert row["n_lines"] == 6
    assert row["n_corrupt"] == 2
    assert row["corrupt_fraction"] == pytest.approx(2 / 6)


def test_gzip_transparent(spark, tmp_path):
    p = str(tmp_path / "corpus.jsonl.gz")
    with gzip.open(p, "wt") as f:
        f.write("\n".join(LINES[:2]) + "\n")
    df = read_jsonl(spark, p, SCHEMA)
    clean, corrupt = split_corrupt(df)
    assert clean.count() == 2 and corrupt.count() == 0


def test_schema_object_accepted(spark, jsonl_dir):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    assert read_jsonl(spark, jsonl_dir, schema).count() == 6
