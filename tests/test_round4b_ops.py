"""Round-4 additions (second batch) — turn-taking features, serving-side
context truncation, BM25 retrieval and BPE pair statistics — vs naive
python oracles."""

from __future__ import annotations

import datetime as dt
import math
import re
from collections import Counter, defaultdict

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from featureextraction_spark.functions.textstats import bpe_pair_counts
from featureextraction_spark.operators.chunking import truncate_context
from featureextraction_spark.operators.retrieval import bm25_topk
from featureextraction_spark.operators.turns import turn_taking_features

SF_DIR = "/root/testdata/sf0.001"
_TOK = re.compile(r"[^ \t\n\r\f\x0b]+")


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    d.persist().count()
    return d


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def _transcripts(spark):
    rows = [
        # c1: user/assistant alternation, one 2-turn tool chain, a
        # 3-turn same-role run at the end
        Row(conv_id="c1", turn_idx=0, role="user", text="a b", tool=None, ts=_ts(0)),
        Row(conv_id="c1", turn_idx=1, role="assistant", text="c", tool="search", ts=_ts(10)),
        Row(conv_id="c1", turn_idx=2, role="assistant", text="d e f", tool="code", ts=_ts(13)),
        Row(conv_id="c1", turn_idx=3, role="user", text="g", tool=None, ts=_ts(40)),
        Row(conv_id="c1", turn_idx=4, role="user", text="h i", tool=None, ts=_ts(41)),
        Row(conv_id="c1", turn_idx=5, role="user", text="j", tool=None, ts=_ts(45)),
        # c2: single turn, no tools, no gaps
        Row(conv_id="c2", turn_idx=0, role="user", text="solo", tool=None, ts=_ts(0)),
        # c3: all tool turns (one chain spanning the whole conversation)
        Row(conv_id="c3", turn_idx=0, role="assistant", text="x", tool="t1", ts=_ts(0)),
        Row(conv_id="c3", turn_idx=1, role="assistant", text="y", tool="t2", ts=_ts(2)),
    ]
    return spark.createDataFrame(rows)


def test_turn_taking_features_fixture(spark):
    got = {r.conv_id: r for r in turn_taking_features(_transcripts(spark)).collect()}

    c1 = got["c1"]
    assert c1.n_turns == 6
    assert c1.n_roles == 2
    # role changes at turns 1 (u->a) and 3 (a->u)
    assert c1.alternations == 2
    assert c1.alternation_rate == pytest.approx(2 / 5)
    assert c1.max_role_run == 3  # turns 3,4,5 all user
    assert c1.tool_turns == 2
    assert c1.tool_fraction == pytest.approx(2 / 6)
    assert c1.max_tool_chain == 2  # turns 1,2
    assert c1.gap_sum_us == 45_000_000  # gaps: 10+3+27+1+4 seconds
    assert c1.mean_gap_sec == pytest.approx(9.0)

    c2 = got["c2"]
    assert (c2.n_turns, c2.n_roles, c2.alternations) == (1, 1, 0)
    assert c2.alternation_rate == 0.0
    assert c2.max_role_run == 1
    assert (c2.tool_turns, c2.max_tool_chain) == (0, 0)
    assert c2.gap_sum_us is None and c2.mean_gap_sec is None

    c3 = got["c3"]
    assert c3.max_tool_chain == 2
    assert c3.tool_fraction == pytest.approx(1.0)
    assert c3.max_role_run == 2 and c3.alternations == 0


def test_truncate_context_budget_and_newest_kept(spark):
    tr = _transcripts(spark)
    out = truncate_context(tr, budget_tokens=4)
    got = {(r.conv_id, r.turn_idx): (r.n_tokens, r.cum_tokens_from_end) for r in out.collect()}
    # c1 suffix token counts (newest first): j=1, "h i"=2, g=1 -> cum 1,3,4
    assert got[("c1", 5)] == (1, 1)
    assert got[("c1", 4)] == (2, 3)
    assert got[("c1", 3)] == (1, 4)
    assert ("c1", 2) not in got  # cum would be 7 > 4
    assert got[("c2", 0)] == (1, 1)
    # c3: y=1, x=1 -> both fit
    assert got[("c3", 1)] == (1, 1) and got[("c3", 0)] == (1, 2)


def test_truncate_context_newest_turn_kept_even_over_budget(spark):
    df = spark.createDataFrame(
        [Row(conv_id="c", turn_idx=0, text="a b c d e"),
         Row(conv_id="c", turn_idx=1, text="v w x y z")]
    )
    rows = truncate_context(df, budget_tokens=3).collect()
    assert [(r.turn_idx, r.n_tokens, r.cum_tokens_from_end) for r in rows] == [(1, 5, 5)]


def test_truncate_context_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        truncate_context(_transcripts(spark), budget_tokens=0)


def _bm25_naive(texts: dict, terms, k1=1.2, b=0.75):
    toks = {d: [t.lower() for t in _TOK.findall(x)] for d, x in texts.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    tf = {d: Counter(t for t in v if t in terms) for d, v in toks.items()}
    df = Counter(t for d in tf.values() for t in d)
    scores = {}
    for d, c in tf.items():
        if not c:
            continue
        s = 0.0
        for t, f_ in c.items():
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (f_ * (k1 + 1)) / (f_ + k1 * (1 - b + b * len(toks[d]) / avgdl))
        scores[d] = (len(c), s)
    return scores


def test_bm25_topk_vs_naive(spark, docs):
    terms = ("join", "hash", "scan")
    k = 15
    got = bm25_topk(docs, terms, k=k).collect()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    want = _bm25_naive(texts, set(terms))
    ranked = sorted(
        ((round(s + 1e-9, 6), d) for d, (_, s) in want.items()),
        key=lambda x: (-x[0], x[1]),
    )[:k]
    assert [(r.doc_id, r.score) for r in got] == [(d, s) for s, d in ranked]
    for r in got:
        assert r.n_terms_hit == want[r.doc_id][0]
        assert r.score == pytest.approx(want[r.doc_id][1], abs=1e-5)


def test_bm25_topk_case_insensitive_and_validates(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="Apple BANANA apple"), Row(doc_id=2, text="cherry")]
    )
    rows = bm25_topk(df, ("APPLE",), k=5).collect()
    assert [r.doc_id for r in rows] == [1]
    with pytest.raises(ValueError):
        bm25_topk(df, (), k=5)


def _bpe_naive(texts, top):
    wc = Counter()
    for x in texts:
        for w in _TOK.findall(x.lower()):
            if len(w) >= 2:
                wc[w] += 1
    pc: Counter = Counter()
    nw: dict = defaultdict(set)
    for w, c in wc.items():
        for i in range(len(w) - 1):
            pair = w[i : i + 2]
            pc[pair] += c
            nw[pair].add(w)
    ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return [(p, len(nw[p]), c) for p, c in ranked]


def test_bpe_pair_counts_vs_naive(spark, docs):
    got = [(r.pair, r.n_words, r.pair_count) for r in bpe_pair_counts(docs, top=30).collect()]
    texts = [r.text for r in docs.select("text").collect()]
    assert got == _bpe_naive(texts, 30)


def test_bpe_pair_counts_intra_word_repeats(spark):
    # "aaa" contributes the pair "aa" twice per occurrence but is ONE word
    df = spark.createDataFrame([Row(text="aaa aaa bb")])
    got = {r.pair: (r.n_words, r.pair_count) for r in bpe_pair_counts(df, top=10).collect()}
    assert got["aa"] == (1, 4)  # 2 positions x word count 2
    assert got["bb"] == (1, 1)
