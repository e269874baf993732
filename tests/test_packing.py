"""Sequence packing (concat-and-chunk) vs a naive python oracle, plus the
tiling invariants a shard writer depends on, and the C4 line filter."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from featureextraction_spark.operators.curation import c4_line_filter
from featureextraction_spark.operators.packing import (
    pack_segments,
    pack_sequences,
    with_global_cumsum,
)

SF_DIR = "/root/testdata/sf0.001"
_TOK = re.compile(r"[^ \t\n\r\f\x0b]+")
L = 128


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    d.persist().count()
    return d


@pytest.fixture(scope="module")
def docs_pdf(docs):
    return docs.toPandas()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _naive_pack(pdf, seq_len, seed=42):
    """Driver-side replay: hash order, exclusive cumsum, grid intersect."""
    rows = sorted(
        (
            (_h60(f"{r.doc_id}:{seed}"), r.doc_id, len(_TOK.findall(r.text or "")))
            for r in pdf.itertuples()
        )
    )
    out, acc = {}, 0
    for _h, doc_id, n in rows:
        first = acc // seq_len if n > 0 else None
        last = (acc + n - 1) // seq_len if n > 0 else None
        out[doc_id] = (n, acc, first, last, 0 if n == 0 else last - first + 1)
        acc += n
    return out


# ------------------------------------------------------------ global cumsum

def test_with_global_cumsum_matches_window(spark):
    rows = [(i, (i * 37) % 11) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["c"]
        for r in with_global_cumsum(df, ["k"], "v", "c", n_rows=1000).collect()
    }
    acc, want = 0, {}
    for k, v in rows:
        want[k] = acc
        acc += v
    assert got == want


def test_with_global_cumsum_many_partitions(spark):
    # force several range partitions so the offset-lift path is exercised
    rows = [(i, 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    got = with_global_cumsum(
        df, ["k"], "v", "c", n_rows=500, rows_per_partition=64
    ).collect()
    assert {r["k"]: r["c"] for r in got} == {i: i for i in range(500)}


# ------------------------------------------------------------ pack_sequences

def test_pack_sequences_vs_naive(docs, docs_pdf):
    want = _naive_pack(docs_pdf, L)
    got = pack_sequences(docs, L).collect()
    assert len(got) == len(want)
    for r in got:
        n, cum, first, last, nseq = want[r["doc_id"]]
        assert (
            r["n_tokens"],
            r["cum_start"],
            r["first_seq"],
            r["last_seq"],
            r["n_seqs"],
        ) == (n, cum, first, last, nseq)


def test_pack_sequences_stream_is_contiguous(docs):
    # documents tile the virtual token stream: sorted by cum_start, each
    # document begins exactly where the previous one ended
    rows = sorted(pack_sequences(docs, L).collect(), key=lambda r: r["cum_start"])
    acc = 0
    for r in rows:
        assert r["cum_start"] == acc
        acc += r["n_tokens"]


# ------------------------------------------------------------- pack_segments

def test_pack_segments_tile_documents(docs):
    segs = pack_segments(docs, L).collect()
    per_doc = {}
    for s in segs:
        per_doc.setdefault(s["doc_id"], []).append(s)
    packed = {r["doc_id"]: r for r in pack_sequences(docs, L).collect()}
    for doc_id, ss in per_doc.items():
        ss.sort(key=lambda s: s["seg_start"])
        # segments partition [0, n_tokens) without gap or overlap
        assert ss[0]["seg_start"] == 0
        pos = 0
        for s in ss:
            assert s["seg_start"] == pos
            assert s["seg_len"] > 0
            pos += s["seg_len"]
        assert pos == packed[doc_id]["n_tokens"]


def test_pack_segments_tile_sequences(docs):
    segs = pack_segments(docs, L).collect()
    per_seq = {}
    for s in segs:
        per_seq.setdefault(s["seq_id"], []).append(s)
    last_seq = max(per_seq)
    for seq_id, ss in per_seq.items():
        ss.sort(key=lambda s: s["seq_offset"])
        pos = 0
        for s in ss:
            assert s["seq_offset"] == pos
            pos += s["seg_len"]
        if seq_id < last_seq:
            assert pos == L  # every non-final sequence is exactly full
        else:
            assert 0 < pos <= L


def test_pack_zero_token_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   "), (4, "d")], "doc_id long, text string"
    )
    packed = {r["doc_id"]: r for r in pack_sequences(df, 2).collect()}
    assert packed[2]["n_seqs"] == 0 and packed[2]["first_seq"] is None
    assert packed[3]["n_seqs"] == 0
    assert {s["doc_id"] for s in pack_segments(df, 2).collect()} == {1, 4}


def test_pack_rejects_bad_seq_len(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)


# ------------------------------------------------------------ c4_line_filter

def test_c4_line_filter_rules(spark):
    rows = [
        (1, "this line is long enough to keep.\nshort.\nno terminal punct here"),
        (2, "please enable javascript to view.\nanother good line stays here."),
        (3, "code ahead { x }\ngood line number one here.\n"
            "good line number two here.\ngood line number three here."),
        (4, "Lorem ipsum dolor sit amet.\nreal line one stays right here.\n"
            "real line two stays right here.\nreal line three stays right here."),
        (5, "keep one here today fine.\nkeep two here today fine!\n"
            'keep three here today fine?"'),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_line_filter(df).collect()}

    r1 = got[1]
    assert (r1["n_lines"], r1["n_kept"]) == (3, 1)
    assert r1["clean_text"] == "this line is long enough to keep."
    assert r1["keep_doc"] == 0  # fewer than 3 kept lines

    assert got[2]["n_kept"] == 1  # javascript line dropped

    r3 = got[3]
    assert (r3["has_brace"], r3["n_kept"], r3["keep_doc"]) == (1, 3, 0)

    r4 = got[4]
    # lorem line itself passes the LINE rules but flags the page
    assert (r4["has_lorem"], r4["n_kept"], r4["keep_doc"]) == (1, 4, 0)

    r5 = got[5]
    assert (r5["n_kept"], r5["keep_doc"]) == (3, 1)
    assert r5["clean_text"].count("\n") == 2

    assert (got[6]["n_lines"], got[6]["n_kept"], got[6]["keep_doc"]) == (1, 0, 0)


def test_c4_line_filter_no_shuffle(docs):
    # map-only contract: the plan must contain no Exchange
    plan = c4_line_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
