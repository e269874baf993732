"""Curation operators (decontamination, domain mixing, TF-IDF, exact
quantiles, PII scrubbing, SemDeDup) vs naive python/numpy oracles."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from featureextraction_spark.operators.curation import (
    decontaminate,
    domain_mix,
    group_quantiles,
    pii_scrub,
    tfidf_top_terms,
)
from featureextraction_spark.operators.similarity import semdedup

SF_DIR = "/root/testdata/sf0.001"
_TOK = re.compile(r"[^ \t\n\r\f\x0b]+")


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    d.persist().count()
    return d


@pytest.fixture(scope="module")
def docs_pdf(docs):
    return docs.toPandas()


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(150)
    e.persist().count()
    return e


def _ngrams(text: str, n: int) -> list[str]:
    toks = _TOK.findall(text.lower())
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- decontaminate

def test_decontaminate_vs_naive(docs, docs_pdf):
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    out = decontaminate(tr, ev, n=3, threshold=0.1).toPandas()

    ev_set: set[str] = set()
    for t in docs_pdf[docs_pdf.doc_id % 10 == 0].text:
        ev_set.update(_ngrams(t, 3))
    rows = {}
    for r in docs_pdf[docs_pdf.doc_id % 10 != 0].itertuples():
        grams = set(_ngrams(r.text, 3))
        hits = len(grams & ev_set)
        rows[r.doc_id] = (len(grams), hits)

    assert set(out.doc_id) == set(rows)
    for r in out.itertuples():
        n_u, hits = rows[r.doc_id]
        assert r.n_unique_ngrams == n_u
        assert r.eval_hits == hits
        if n_u:
            assert r.contamination == pytest.approx(hits / n_u, abs=0)
            assert bool(r.contaminated) == (hits / n_u >= 0.1)
        else:
            assert pd.isna(r.contamination) and not r.contaminated


def test_decontaminate_shuffle_join_equals_broadcast(docs):
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    a = decontaminate(tr, ev, n=3, broadcast_eval=True).toPandas()
    b = decontaminate(tr, ev, n=3, broadcast_eval=False).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


# ---------------------------------------------------------------- domain_mix

def test_domain_mix_quotas_and_ranks(docs, docs_pdf):
    weights = {s: 1.0 for s in sorted(docs_pdf.source.unique())}
    out = domain_mix(docs, weights=weights, total=40, domain="source").toPandas()
    quota = math.floor(40 / len(weights))
    counts = docs_pdf.groupby("source").size().to_dict()
    by_src = out.groupby("source")
    for src, grp in by_src:
        expect = min(quota, counts[src])
        assert len(grp) == expect
        assert sorted(grp.sample_rank) == list(range(1, expect + 1))
        # the kept ids are exactly the quota lowest by md5(id:42) rank
        ids = docs_pdf[docs_pdf.source == src].doc_id.tolist()
        ranked = sorted(ids, key=lambda i: (_h60(f"{i}:42"), i))[:expect]
        assert set(grp.doc_id) == set(ranked)


def test_domain_mix_weighted_and_excluded_domains(docs, docs_pdf):
    srcs = sorted(docs_pdf.source.unique())
    # only two domains get weight; one twice the other
    weights = {srcs[0]: 2.0, srcs[1]: 1.0}
    out = domain_mix(docs, weights=weights, total=9, domain="source").toPandas()
    assert set(out.source) <= {srcs[0], srcs[1]}
    got = out.groupby("source").size().to_dict()
    counts = docs_pdf.groupby("source").size().to_dict()
    assert got.get(srcs[0], 0) == min(math.floor(9 * 2 / 3), counts[srcs[0]])
    assert got.get(srcs[1], 0) == min(math.floor(9 * 1 / 3), counts[srcs[1]])


# ---------------------------------------------------------------- tfidf

def test_tfidf_top_terms_vs_naive(docs, docs_pdf):
    out = tfidf_top_terms(docs, k=3, by="source").toPandas()
    n_docs = len(docs_pdf)
    tf: Counter = Counter()
    docfreq: Counter = Counter()
    for r in docs_pdf.itertuples():
        toks = _TOK.findall(r.text.lower())
        for t in toks:
            tf[(r.source, t)] += 1
        for t in set(toks):
            docfreq[t] += 1
    scored: dict[str, list] = {}
    for (src, term), cnt in tf.items():
        dfq = docfreq[term]
        score = float(cnt) * (2.0 * n_docs - 2.0 * dfq + 1.0) / (2.0 * dfq + 1.0)
        scored.setdefault(src, []).append((-score, term, cnt, dfq, score))
    for src, rows in scored.items():
        rows.sort()
        got = out[out.source == src].sort_values("rank")
        assert len(got) == min(3, len(rows))
        for rank0, (g, e) in enumerate(zip(got.itertuples(), rows)):
            assert g.term == e[1]
            assert g.tf == e[2]
            assert g.doc_freq == e[3]
            assert g.tfidf == pytest.approx(round(e[4], 6), abs=0)
            assert g.rank == rank0 + 1


# ---------------------------------------------------------------- quantiles

def test_group_quantiles_vs_numpy(docs, docs_pdf):
    qs = (0.25, 0.5, 0.75, 0.9)
    out = group_quantiles(docs, value="n_chars", by="source", quantiles=qs).toPandas()
    for src, grp in docs_pdf.groupby("source"):
        vals = grp.n_chars.to_numpy(dtype=float)
        for q in qs:
            expect = np.percentile(vals, q * 100, method="linear")
            got = out[(out.source == src) & (out.q == q)]
            assert len(got) == 1
            assert got.quantile_value.iloc[0] == pytest.approx(expect, abs=1e-6)
            assert got.n.iloc[0] == len(vals)


def test_group_quantiles_single_row_group(spark):
    df = spark.createDataFrame([("a", 7.0), ("b", 1.0), ("b", 3.0)], "g string, v double")
    out = group_quantiles(df, value="v", by="g", quantiles=(0.5, 0.9)).toPandas()
    a = out[out.g == "a"]
    assert set(a.quantile_value) == {7.0}
    b = out[(out.g == "b") & (out.q == 0.5)]
    assert b.quantile_value.iloc[0] == pytest.approx(2.0)


# ---------------------------------------------------------------- pii_scrub

def test_pii_scrub_patterns(spark):
    rows = [
        (1, "mail me at jane.doe+x@mail.example.org today"),
        (2, "server 192.168.0.1 and 10.0.0.255 up"),
        (3, "call +31 6 1234 5678 now"),
        (4, "account 123456789012 flagged"),
        (5, "clean text with no pii at all"),
        (6, "a@b.co and c.d@e-f.io twice"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pii_scrub(df).toPandas().set_index("doc_id")
    assert out.loc[1, "n_emails"] == 1
    assert out.loc[1, "clean_text"] == "mail me at <EMAIL> today"
    assert out.loc[2, "n_ips"] == 2
    assert out.loc[2, "clean_text"] == "server <IP> and <IP> up"
    assert out.loc[3, "n_phones"] == 1
    assert out.loc[3, "clean_text"] == "call <PHONE> now"
    assert out.loc[4, "n_longnums"] == 1
    assert out.loc[4, "clean_text"] == "account <NUM> flagged"
    assert out.loc[5].tolist() == [0, 0, 0, 0, "clean text with no pii at all"]
    assert out.loc[6, "n_emails"] == 2
    assert out.loc[6, "clean_text"] == "<EMAIL> and <EMAIL> twice"


# ---------------------------------------------------------------- semdedup

def test_semdedup_vs_naive(emb):
    out = semdedup(emb, cluster_col="label", threshold=0.35).toPandas()
    pdf = emb.toPandas()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
    labels = {r.vec_id: r.label for r in pdf.itertuples()}
    assert len(out) == len(pdf)
    for r in out.itertuples():
        peers = [
            v
            for v in vecs
            if labels[v] == labels[r.vec_id] and v < r.vec_id
        ]
        if not peers:
            assert pd.isna(r.max_cos_lower) and bool(r.keep)
            continue
        a = vecs[r.vec_id]
        best = max(
            round(
                float(np.dot(vecs[p], a))
                / (math.sqrt(float(np.dot(vecs[p], vecs[p]))) * math.sqrt(float(np.dot(a, a)))),
                6,
            )
            for p in peers
        )
        assert r.max_cos_lower == pytest.approx(best, abs=1e-9)
        assert bool(r.keep) == (r.max_cos_lower < 0.35)


def test_semdedup_lowest_id_always_kept(emb):
    out = semdedup(emb, cluster_col="label", threshold=-2.0).toPandas()
    mins = out.groupby("label").vec_id.min()
    kept = out[out.keep == 1]
    # with a threshold below -1 every vector with a lower-id peer is a
    # duplicate (cosine is always ≥ -1), so exactly the per-cluster minima
    # survive
    assert sorted(kept.vec_id) == sorted(mins.tolist())


def test_curation_pipeline_composes_its_parts(spark, docs):
    from featureextraction_spark.operators.dedup import exact_dedup
    from featureextraction_spark.operators.sampling import hash_split
    from featureextraction_spark.functions.textstats import with_quality_features
    from featureextraction_spark.plans.curation_pipeline import curation_pipeline

    # inject one exact duplicate (non-canonical survivor test) and one
    # garbage doc (quality-gate test) so every gate fires both ways
    first_text = docs.orderBy("doc_id").first()["text"]
    extra = spark.createDataFrame(
        [(100001, first_text), (100002, ";;; !!! ,,,")],
        "doc_id long, text string",
    )
    docs = docs.select("doc_id", "text").unionByName(extra)

    out = curation_pipeline(docs, quality_min=0.5, seed=42).toPandas()
    assert len(out) == docs.count()

    q = {
        r["doc_id"]: round(r["quality_score"], 6)
        for r in with_quality_features(docs).collect()
    }
    dd = {r["doc_id"]: r["canonical_id"] for r in exact_dedup(docs).collect()}
    sp = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.select("doc_id"), id_col="doc_id", seed=42).collect()
    }
    for r in out.itertuples():
        assert r.quality_score == q[r.doc_id]
        assert r.quality_keep == int(r.quality_score >= 0.5)
        assert r.canonical_id == dd[r.doc_id]
        assert r.is_canonical == int(r.doc_id == r.canonical_id)
        assert r.split == sp[r.doc_id]
        assert r.final_keep == int(bool(r.quality_keep) and bool(r.is_canonical))
    # every gate fired both ways on this input
    assert 0 < out.final_keep.sum() < len(out)
    by_doc = out.set_index("doc_id")
    assert by_doc.loc[100001, "is_canonical"] == 0  # dup of doc 0
    assert by_doc.loc[100001, "group_size"] == 2
    assert by_doc.loc[100002, "quality_keep"] == 0  # garbage text
    assert by_doc.loc[100002, "final_keep"] == 0


def test_semdedup_strategies_identical(emb):
    """The GEMM block-pair path must reproduce the expression path: same
    keep decisions, same rounded max_cos_lower (tolerance one ULP at the
    6th digit for pairwise- vs sequential-summed dot products)."""
    expr = (
        semdedup(emb, cluster_col="label", threshold=0.35, strategy="expr")
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    gemm = (
        semdedup(emb, cluster_col="label", threshold=0.35, strategy="gemm")
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert list(expr.index) == list(gemm.index)
    assert (expr["keep"] == gemm["keep"]).all()
    both = expr["max_cos_lower"].fillna(-9) - gemm["max_cos_lower"].fillna(-9)
    assert both.abs().max() <= 1e-6


def test_semdedup_auto_gate(emb):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        semdedup(emb, strategy="bogus")
    # auto on a small corpus = expr; forcing the gate low = gemm — both
    # produce identical keeps (covered above); here just exercise the gate
    small = semdedup(emb, cluster_col="label", gemm_min_rows=10**9)
    forced = semdedup(emb, cluster_col="label", gemm_min_rows=1)
    assert small.count() == forced.count() == emb.count()


def test_dsir_weights_vs_naive(spark):
    """Hashed uni+bigram importance weights vs a pure-python replay:
    md5-bucket parity, integer quantized ratio, float LLR tolerance."""
    import hashlib
    import math
    import re as _re
    from collections import Counter

    from pyspark.sql import functions as F

    from featureextraction_spark.operators.curation import dsir_weights

    rows = [
        (0, "high quality prose about science and method"),
        (1, "buy cheap pills online now best price pills"),
        (2, "science method and careful high quality analysis"),
        (3, "cheap cheap online online now now"),
        (4, "mixed science pills prose online"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    B, Q = 64, 1_000_000
    out = (
        dsir_weights(df, target=F.col("doc_id") % 2 == 0, buckets=B, quant=Q)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )

    tok = _re.compile(r"[^ \t\n\r\f\x0b]+")

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    doc_grams = {}
    for i, s in rows:
        ts = tok.findall(s.lower())
        doc_grams[i] = [*ts, *(" ".join(ts[j : j + 2]) for j in range(len(ts) - 1))]
    ct: Counter = Counter()
    cr: Counter = Counter()
    for i, gs in doc_grams.items():
        c = ct if i % 2 == 0 else cr
        for g in gs:
            c[bucket(g)] += 1
    Nt, Nr = sum(ct.values()), sum(cr.values())
    for i, gs in doc_grams.items():
        wq = sum(((ct[bucket(g)] + 1) * Q) // (cr[bucket(g)] + 1) for g in gs)
        llr = sum(
            math.log((ct[bucket(g)] + 1) / (Nt + B))
            - math.log((cr[bucket(g)] + 1) / (Nr + B))
            for g in gs
        ) / len(gs)
        assert out.loc[i, "n_grams"] == len(gs)
        assert out.loc[i, "weight_q"] == wq
        assert out.loc[i, "ratio_score"] == wq / (len(gs) * Q)
        assert abs(out.loc[i, "log_weight"] - llr) < 1e-9
    # target-slice docs should look more target-like than spam
    assert out.loc[0, "log_weight"] > out.loc[1, "log_weight"]
