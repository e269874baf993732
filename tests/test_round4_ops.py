"""Round-4 operators — token-window chunking, per-group token-quota
sampling, chat-template conversation rendering, and the expression-only
logistic quality classifier — vs naive python oracles."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from featureextraction_spark.functions.textstats import (
    QUALITY_CLF_WEIGHTS,
    quality_classifier,
)
from featureextraction_spark.operators.chunking import chunk_documents
from featureextraction_spark.operators.curation import quota_sample
from featureextraction_spark.operators.render import render_conversations

SF_DIR = "/root/testdata/sf0.001"
_TOK = re.compile(r"[^ \t\n\r\f\x0b]+")


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    d.persist().count()
    return d


def _chunks_naive(text: str, window: int, stride: int):
    toks = _TOK.findall(text)
    n = len(toks)
    if n == 0:
        return []
    k = math.ceil(max(n - window, 0) / stride)
    out = []
    for i in range(k + 1):
        s = i * stride
        c = toks[s : s + window]
        out.append((i, len(c), " ".join(c)))
    return out


def test_chunk_documents_vs_naive(spark, docs):
    got = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
        for r in chunk_documents(docs, window=16, stride=12).collect()
    }
    want = {}
    for r in docs.select("doc_id", "text").collect():
        for cid, ntok, ctext in _chunks_naive(r.text, 16, 12):
            want[(r.doc_id, cid)] = (ntok, ctext)
    assert got == want


@pytest.mark.parametrize(
    "n,window,stride",
    [(0, 8, 4), (1, 8, 4), (7, 8, 4), (8, 8, 4), (9, 8, 4), (12, 8, 4), (13, 8, 8), (100, 8, 4)],
)
def test_chunk_documents_boundaries(spark, n, window, stride):
    text = " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    rows = sorted(
        chunk_documents(df, window=window, stride=stride).collect(),
        key=lambda r: r.chunk_id,
    )
    want = _chunks_naive(text, window, stride)
    assert [(r.chunk_id, r.n_tokens, r.chunk_text) for r in rows] == want
    # covering: last chunk reaches the end; no fully-redundant tail chunk
    if n > 0:
        assert rows[-1].chunk_text.endswith(f"t{n - 1}")
        if len(rows) > 1:
            assert rows[-1].n_tokens + (len(rows) - 1) * stride >= n


def test_chunk_documents_whitespace_and_empty(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="  a\t\tb \n c  "), Row(doc_id=2, text=" \t\n ")]
    )
    rows = chunk_documents(df, window=2, stride=1).collect()
    assert {r.doc_id for r in rows} == {1}
    assert sorted((r.chunk_id, r.chunk_text) for r in rows) == [(0, "a b"), (1, "b c")]


def _u60(doc_id: int, salt: str = "42") -> float:
    h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60)


def test_quota_sample_vs_naive(spark, docs):
    budget = 120
    got = {
        r.doc_id: (r.source, r.n_tokens, r.cum_tokens)
        for r in quota_sample(docs, budget_tokens=budget, group="source").collect()
    }
    by_src: dict[str, list] = {}
    for r in docs.select("doc_id", "source", "text").collect():
        by_src.setdefault(r.source, []).append(
            (_u60(r.doc_id), r.doc_id, len(_TOK.findall(r.text)))
        )
    want = {}
    for src, rows in by_src.items():
        cum = 0
        for u, did, ntok in sorted(rows):
            if cum < budget:
                want[did] = (src, ntok, cum + ntok)
            cum += ntok
    assert got == want
    # every non-empty group admits at least one doc (budget-crossing rule)
    assert {v[0] for v in got.values()} == set(by_src)


def _tiny_transcripts(spark):
    rows = [
        # deliberately out of order: the render must re-sort by turn_idx
        Row(conv_id="c1", turn_idx=2, role="assistant", text="t\nwo"),
        Row(conv_id="c1", turn_idx=0, role="user", text="zero"),
        Row(conv_id="c1", turn_idx=1, role="tool", text=""),
        Row(conv_id="c2", turn_idx=0, role="user", text="only"),
    ]
    return spark.createDataFrame(rows)


def test_render_conversations_order_and_bytes(spark):
    out = {r.conv_id: r for r in render_conversations(_tiny_transcripts(spark)).collect()}
    r1 = "<|user|>zero\n<|tool|>\n<|assistant|>t\nwo"
    assert out["c1"].rendered == r1
    assert out["c1"].turn_count == 3
    assert out["c1"].n_chars == len(r1)
    assert out["c2"].rendered == "<|user|>only"


def test_render_conversations_last_k_equals_tail_slice(spark):
    tr = _tiny_transcripts(spark)
    out = {r.conv_id: r.rendered for r in render_conversations(tr, last_k=2).collect()}
    assert out["c1"] == "<|tool|>\n<|assistant|>t\nwo"
    assert out["c2"] == "<|user|>only"
    # counts reflect KEPT turns (bounded aggregate)
    tc = {r.conv_id: r.turn_count for r in render_conversations(tr, last_k=2).collect()}
    assert tc == {"c1": 2, "c2": 1}


def test_render_conversations_rejects_bad_last_k(spark):
    with pytest.raises(ValueError):
        render_conversations(_tiny_transcripts(spark), last_k=0)


def test_quality_classifier_vs_naive(spark, docs):
    got = {r.doc_id: r for r in quality_classifier(docs).collect()}
    w = QUALITY_CLF_WEIGHTS
    for r in docs.select("doc_id", "text").collect():
        t = r.text
        n_chars = len(t)
        toks = _TOK.findall(t)
        n_tok = len(toks)
        alpha = sum(c.isascii() and c.isalpha() for c in t) / n_chars if n_chars else 0.0
        punct = (
            sum(c in ".,;:!?'\"()[]{}-" for c in t) / n_chars if n_chars else 0.0
        )
        stop_hits = len(
            re.findall(
                r"(^|[ ])(the|and|of|to|is|in|that|it|for|with)([ ]|$)", t.lower()
            )
        )
        stop = stop_hits / n_tok if n_tok else 0.0
        logit = (
            w["bias"]
            + w["alpha_ratio"] * alpha
            + w["stopword_ratio"] * stop
            + w["punct_ratio"] * punct
            + w["log1p_tokens"] * math.log(n_tok + 1.0)
        )
        g = got[r.doc_id]
        assert g.logit == pytest.approx(logit, abs=1e-9)
        assert g.prob == pytest.approx(1.0 / (1.0 + math.exp(-logit)), abs=1e-9)
        assert g.keep == (logit > 0)
        assert g.n_tokens == n_tok
