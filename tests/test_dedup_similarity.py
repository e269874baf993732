"""Dedup / similarity / text-stats operators vs pure-python oracles, on the
driver-provided documents/embeddings tables (sf0.001)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from featureextraction_spark.functions.textstats import STOPWORDS, language_id
from featureextraction_spark.operators import dedup as D
from featureextraction_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    # inject exact duplicates: re-add three docs under shifted ids
    dups = d.filter(F.col("doc_id") < 3).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    out = d.unionByName(dups)
    out.persist().count()
    return out


@pytest.fixture(scope="module")
def docs_pdf(docs):
    return docs.toPandas()


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    e.persist().count()
    return e


@pytest.fixture(scope="module")
def emb_pdf(emb):
    return emb.toPandas()


# ---------------------------------------------------------------- oracles

def _norm_text(t: str) -> str:
    return re.sub("[ \t\n\r\f\x0b]+", " ", t).strip().lower()


def _shingles(t: str, n: int = 5) -> set[str]:
    return {t[i : i + n] for i in range(max(len(t) - n + 1, 0))}


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _minhash_sig(t: str, n: int, params) -> list[int]:
    hs = [_h60(s) for s in _shingles(t, n)]
    return [min((a * h + b) % D.MINHASH_PRIME for h in hs) for a, b in params]


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if (a or b) else 0.0


# ------------------------------------------------------------------ tests

def test_exact_dedup(spark, docs, docs_pdf):
    got = D.exact_dedup(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    fp = docs_pdf.assign(fp=docs_pdf["text"].map(lambda t: hashlib.md5(_norm_text(t).encode()).hexdigest()))
    canon = fp.groupby("fp")["doc_id"].agg(["min", "count"]).rename(
        columns={"min": "canonical_id", "count": "group_size"}
    )
    exp = fp.join(canon, on="fp").sort_values("doc_id").reset_index(drop=True)
    assert list(got["canonical_id"]) == list(exp["canonical_id"])
    assert list(got["group_size"]) == list(exp["group_size"])
    # the injected duplicates collapse onto their originals
    assert (got[got["doc_id"] >= 100000]["canonical_id"] < 3).all()


def test_ngram_jaccard_pairs_exact(spark, docs, docs_pdf):
    got = (
        D.ngram_jaccard_pairs(docs, threshold=0.35)
        .toPandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    sh = {r.doc_id: _shingles(r.text) for r in docs_pdf.itertuples(index=False)}
    ids = sorted(sh)
    exp = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sh[a] or not sh[b]:
                continue
            j = _jaccard(sh[a], sh[b])
            if j >= 0.35:
                exp.append((a, b, round(j, 6)))
    exp_df = pd.DataFrame(exp, columns=["a_id", "b_id", "jaccard"])
    assert len(got) == len(exp_df)
    assert list(got["a_id"]) == list(exp_df["a_id"])
    assert list(got["b_id"]) == list(exp_df["b_id"])
    np.testing.assert_allclose(got["jaccard"], exp_df["jaccard"], rtol=1e-6)


def test_minhash_signatures_match_python(spark, docs, docs_pdf):
    num_hashes = 16
    got = {
        r["doc_id"]: list(r["sig"])
        for r in D.minhash_signatures(docs, num_hashes=num_hashes).collect()
    }
    params = D.minhash_params(num_hashes)
    for r in docs_pdf.head(30).itertuples(index=False):
        if not _shingles(r.text):
            continue
        assert got[r.doc_id] == _minhash_sig(r.text, 5, params), r.doc_id


def test_minhash_lsh_subset_of_exact_with_high_recall(spark, docs):
    exact = D.ngram_jaccard_pairs(docs, threshold=0.4).toPandas()
    lsh = D.minhash_lsh_pairs(docs, num_hashes=32, bands=16, threshold=0.4).toPandas()
    exact_keys = set(zip(exact["a_id"], exact["b_id"]))
    lsh_keys = set(zip(lsh["a_id"], lsh["b_id"]))
    assert lsh_keys <= exact_keys  # verification guarantees precision 1.0
    if exact_keys:
        recall = len(lsh_keys) / len(exact_keys)
        assert recall >= 0.8, f"recall {recall}"


def test_simhash_exact_dups_collide_and_pairs_found(spark, docs):
    sh = D.simhash(docs).toPandas().set_index("doc_id")["simhash"]
    for d in range(3):
        assert sh[d] == sh[d + 100000]
    pairs = D.simhash_near_dup_pairs(docs, max_hamming=3).toPandas()
    keys = set(zip(pairs["a_id"], pairs["b_id"]))
    for d in range(3):
        assert (d, d + 100000) in keys
    assert (pairs["hamming"] <= 3).all()


def test_cosine_topk_matches_numpy(spark, emb, emb_pdf):
    queries = emb.filter(F.col("vec_id") < 5)
    got = S.cosine_topk(queries, emb, k=10).toPandas()
    M = np.stack(emb_pdf.sort_values("vec_id")["embedding"].map(np.asarray))
    ids = emb_pdf.sort_values("vec_id")["vec_id"].to_numpy()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for q in range(5):
        sims = Mn[q] @ Mn.T
        order = sorted(
            [(round(float(s), 6), int(i)) for s, i in zip(sims, ids) if i != q],
            key=lambda t: (-t[0], t[1]),
        )[:10]
        g = got[got["query_id"] == q].sort_values("rank")
        assert list(g["neighbor_id"]) == [i for _, i in order]
        np.testing.assert_allclose(g["cosine"], [s for s, _ in order], atol=2e-6)


def test_ann_lsh_recall(spark, emb):
    # synthetic embeddings are near-random (best cosine ~0.3), so collision
    # probability per plane is low — test with few planes / many tables; on
    # real data (near-dup cosine ~0.95+) the defaults are appropriate.
    queries = emb.filter(F.col("vec_id") < 20)
    exact = S.cosine_topk(queries, emb, k=5).toPandas()
    approx = S.ann_lsh_topk(queries, emb, k=5, n_planes=4, n_tables=12).toPandas()
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"ANN recall too low: {recall}"
    # approximate results are still exact cosines, correctly ranked
    merged = approx.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e"))
    np.testing.assert_allclose(merged["cosine_a"], merged["cosine_e"], atol=1e-9)


def test_embedding_near_dup_pairs_verified(spark, emb, emb_pdf):
    got = S.embedding_near_dup_pairs(emb, threshold=0.8).toPandas()
    M = {int(r.vec_id): np.asarray(r.embedding, dtype=float) for r in emb_pdf.itertuples(index=False)}
    for r in got.itertuples(index=False):
        a, b = M[r.a_id], M[r.b_id]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r.cosine >= 0.8 and abs(cos - r.cosine) < 2e-6


@pytest.fixture(scope="module")
def tight_cluster_emb(spark):
    """Synthetic corpus of tight near-dup clusters: 60 random base
    directions in R^16, 4 members each with tiny noise (pairwise cosine
    ≈ 0.999 within a cluster, ≲ 0.8 across clusters at this dim)."""
    rng = np.random.default_rng(123)
    base = rng.standard_normal((60, 16))
    rows = []
    vid = 0
    for b in base:
        for _ in range(4):
            v = b + rng.standard_normal(16) * 0.02
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_pairs_lsh_equals_exact_above_gate(spark, tight_cluster_emb):
    """Forcing the corpus above the auto gate must switch to the LSH path
    and still return the exact pair set (VERDICT r2 #2): same (a_id, b_id)
    rows, cosines equal to the blocked-exact engine within rounding."""
    exact = (
        S.embedding_pairs(tight_cluster_emb, threshold=0.95, strategy="exact")
        .toPandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    # exact_max_rows below the corpus size → auto must route to LSH
    lsh = (
        S.embedding_pairs(tight_cluster_emb, threshold=0.95, exact_max_rows=10)
        .toPandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    assert len(exact) >= 60 * 6  # every within-cluster pair survives 0.95
    assert list(map(tuple, exact[["a_id", "b_id"]].values)) == list(
        map(tuple, lsh[["a_id", "b_id"]].values)
    )
    # numpy-GEMM vs JVM-fold accumulation may differ in the last ulp
    np.testing.assert_allclose(
        exact["cosine"].to_numpy(), lsh["cosine"].to_numpy(), atol=2e-6
    )


def test_embedding_pairs_auto_stays_exact_below_gate(spark, tight_cluster_emb):
    """Below the gate the auto strategy must be the blocked-exact engine
    byte-for-byte (the driver queries ride this path at test scale)."""
    from featureextraction_spark.operators.blockpair import blocked_cosine_pairs

    auto = (
        S.embedding_pairs(tight_cluster_emb, threshold=0.95)
        .toPandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    exact = (
        blocked_cosine_pairs(tight_cluster_emb, threshold=0.95)
        .toPandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(auto, exact)


def test_language_id_oracle(spark, docs, docs_pdf):
    got = language_id(docs).toPandas().set_index("doc_id")["lang_pred"]
    token_re = re.compile("[^ \t\n\r\f\x0b]+")
    for r in docs_pdf.itertuples(index=False):
        toks = token_re.findall(r.text.lower())
        hits = {
            lang: sum(t in ws for t in toks)
            for lang, ws in ((k, set(v)) for k, v in STOPWORDS.items())
        }
        best = max(sorted(hits), key=lambda k: (hits[k], ))
        # deterministic: max hits, ties -> lexicographically smallest lang
        mx = max(hits.values())
        exp = "unknown" if mx == 0 else min(k for k, v in hits.items() if v == mx)
        assert got[r.doc_id] == exp, (r.doc_id, hits, got[r.doc_id])


def test_jaccard_strategies_identical(spark, docs):
    """The bitset/blocked and inverted-index physical strategies must
    return byte-identical pair tables (same logical operator)."""
    from featureextraction_spark.operators.dedup import ngram_jaccard_pairs

    a = (
        ngram_jaccard_pairs(docs, threshold=0.3, strategy="bitset")
        .toPandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    b = (
        ngram_jaccard_pairs(docs, threshold=0.3, strategy="index")
        .toPandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_simhash_strategies_identical(spark, docs):
    from featureextraction_spark.operators.dedup import simhash
    import pandas as pd

    a = simhash(docs, strategy="gemm").toPandas().sort_values("doc_id").reset_index(drop=True)
    b = simhash(docs, strategy="explode").toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_minhash_strategies_identical(spark, docs):
    from featureextraction_spark.operators.dedup import minhash_signatures
    import pandas as pd

    a = (
        minhash_signatures(docs, strategy="gather")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        minhash_signatures(docs, strategy="explode")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    a["sig"] = a["sig"].apply(list)
    b["sig"] = b["sig"].apply(list)
    pd.testing.assert_frame_equal(a, b)


def test_minhash_lsh_verification_paths_identical(spark, docs):
    """Broadcast / shuffle-join / open-vocab shingle-join verification all
    produce the same verified pairs (only the physical join differs)."""
    base = (
        D.minhash_lsh_pairs(docs, num_hashes=32, bands=16, threshold=0.4)
        .toPandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
    )
    no_bcast = (
        D.minhash_lsh_pairs(
            docs, num_hashes=32, bands=16, threshold=0.4, broadcast_limit_bytes=0
        )
        .toPandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, no_bcast)
    open_vocab = (
        D.minhash_lsh_pairs(docs, num_hashes=32, bands=16, threshold=0.4, vocab_limit=0)
        .toPandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, open_vocab)


def test_jaccard_strategies_identical_string_ids(spark, docs):
    """Both physical strategies support non-integral id columns and keep
    the id type end-to-end (lexicographic a_id < b_id ordering)."""
    sdocs = docs.select(
        F.concat(F.lit("doc_"), F.lpad(F.col("doc_id").cast("string"), 7, "0")).alias("doc_id"),
        "text",
    )
    a = (
        D.ngram_jaccard_pairs(sdocs, threshold=0.3, strategy="bitset")
        .toPandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
    )
    b = (
        D.ngram_jaccard_pairs(sdocs, threshold=0.3, strategy="index")
        .toPandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
    )
    assert a["a_id"].dtype == object and len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_blocked_cosine_string_ids(spark, emb):
    from featureextraction_spark.operators.blockpair import blocked_cosine_pairs

    semb = emb.limit(60).select(
        F.concat(F.lit("v"), F.lpad(F.col("vec_id").cast("string"), 6, "0")).alias("vec_id"),
        "embedding",
    )
    got = blocked_cosine_pairs(
        semb, threshold=0.2, block_size=16
    ).toPandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
    pdf = semb.toPandas()
    M = np.stack(pdf["embedding"].map(np.asarray))
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = pdf["vec_id"].tolist()
    exp = []
    cos = Mn @ Mn.T
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and round(float(cos[i, j]), 6) >= 0.2:
                exp.append((ids[i], ids[j], round(float(cos[i, j]), 6)))
    exp_df = pd.DataFrame(sorted(exp), columns=["a_id", "b_id", "cosine"])
    assert list(got["a_id"]) == list(exp_df["a_id"])
    assert list(got["b_id"]) == list(exp_df["b_id"])
    np.testing.assert_allclose(got["cosine"], exp_df["cosine"], atol=2e-6)


def test_hot_shingle_cap_bounds_pairs(spark):
    """An adversarial stop-shingle shared by every doc must not generate
    d²/2 join rows when capped; both strategies agree under the cap."""
    stop = "ZZZZZ"
    rows = [(i, f"unique text number {i:04d} with filler " + stop) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # uncapped: the shared shingle links everything above threshold 0.0 —
    # capped at df<=5 the stop-shingle (df=40) is dropped on BOTH paths
    capped_idx = (
        D.ngram_jaccard_pairs(docs, threshold=0.12, max_shingle_df=5, strategy="index")
        .toPandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
    )
    capped_bit = (
        D.ngram_jaccard_pairs(docs, threshold=0.12, max_shingle_df=5, strategy="bitset")
        .toPandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(capped_idx, capped_bit)
    uncapped = D.ngram_jaccard_pairs(docs, threshold=0.12, strategy="index").toPandas()
    assert len(capped_idx) < len(uncapped)


def test_ivf_topk_full_probe_equals_exact(spark, emb):
    """Probing every IVF list is exhaustive search — must equal the exact
    brute-force ranking row for row."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(queries, emb, k=5).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    ivf = S.ivf_topk(
        queries, emb, k=5, n_lists=8, n_probe=8
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(exact, ivf)


def test_ivf_topk_partial_probe_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = S.cosine_topk(queries, emb, k=5).toPandas()
    approx = S.ivf_topk(queries, emb, k=5, n_lists=8, n_probe=4).toPandas()
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # approximate results carry exact cosines, correctly ranked
    merged = approx.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e"))
    np.testing.assert_allclose(merged["cosine_a"], merged["cosine_e"], atol=1e-9)


def test_ivf_index_reuse(spark, emb):
    """A prebuilt (centroids, assigned) index returns identical results."""
    centroids, assigned = S.ivf_fit(emb, n_lists=8)
    assigned = assigned.persist()
    queries = emb.filter(F.col("vec_id") < 5)
    a = S.ivf_topk(queries, emb, k=5, n_lists=8, n_probe=3).toPandas()
    b = S.ivf_topk(
        queries, emb, k=5, n_probe=3, assigned=assigned, centroids=centroids
    ).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["query_id", "rank"]).reset_index(drop=True),
        b.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_bpe_ish_token_count_fixtures(spark):
    from featureextraction_spark.functions.textstats import bpe_ish_token_count

    cases = [
        ("Hello world, it's 2024! foo_bar baz-qux", 13),
        ("  leading and trailing  ", 5),
        ("naïve café 123abc !!!", 5),
        ("", 0),
        ("word's won't we're I'll I'd I'm you've", 14),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t string")
    got = [
        r["n"]
        for r in df.select(bpe_ish_token_count("t").alias("n")).collect()
    ]
    assert got == [n for _, n in cases]


def test_auto_strategy_applies_hot_shingle_cap_on_open_vocab(spark):
    """When auto routes an 'open-vocabulary' corpus (> vocab_limit) to the
    index path with no explicit cap, auto_max_shingle_df kicks in — same
    pairs as an explicit index+cap call."""
    rows = [(i, f"distinct text number {i:04d} with shared ZZZZZ") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    auto = (
        D.ngram_jaccard_pairs(
            docs, threshold=0.12, strategy="auto", vocab_limit=10, auto_max_shingle_df=5
        )
        .toPandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
    )
    explicit = (
        D.ngram_jaccard_pairs(
            docs, threshold=0.12, strategy="index", max_shingle_df=5
        )
        .toPandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(auto, explicit)


def test_winnow_fingerprints_match_python(spark, docs, docs_pdf):
    got = (
        D.winnow_fingerprints(docs, k=5, window=4)
        .toPandas().groupby("doc_id")["fingerprint"].apply(set).to_dict()
    )
    for r in docs_pdf.head(40).itertuples(index=False):
        t = r.text
        hs = [_h60(t[i : i + 5]) for i in range(max(len(t) - 4, 0))]
        exp = {min(hs[i : i + 4]) for i in range(len(hs) - 3)} if len(hs) >= 4 else set()
        assert got.get(r.doc_id, set()) == exp, r.doc_id
    # guarantee: exact duplicate docs share ALL fingerprints
    for d in range(3):
        assert got[d] == got[d + 100000]


def test_repetition_features_fixtures(spark):
    from featureextraction_spark.functions.textstats import repetition_features

    rows = [
        (0, "a b c d"),               # no repetition
        (1, "a a a a"),               # total repetition
        (2, "x y x y x"),             # repeated bigrams: "x y"x2, "y x"x2
        (3, ""),                      # empty
        (4, "solo"),                  # single word, no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repetition_features(df).toPandas().set_index("doc_id")
    assert out.loc[0, "frac_dup_words"] == 0.0 and out.loc[0, "frac_dup_bigrams"] == 0.0
    assert out.loc[1, "frac_dup_words"] == 0.75 and out.loc[1, "top_word_frac"] == 1.0
    assert out.loc[1, "frac_dup_bigrams"] == 1.0  # "a a" x3 all duplicated
    assert out.loc[2, "top_word_frac"] == 0.6     # x appears 3/5
    assert out.loc[2, "frac_dup_bigrams"] == 1.0  # all 4 instances duplicated
    assert out.loc[3, "n_words"] == 0 and out.loc[3, "frac_dup_words"] == 0.0
    assert out.loc[4, "n_words"] == 1 and out.loc[4, "frac_dup_bigrams"] == 0.0


def test_persisted_intermediates_are_tracked_and_released(spark, docs):
    """Dedup pipelines register their persisted intermediates with the
    cache registry (caller-owned lifecycle, ADVICE r2); a release after
    the consuming action unpersists them all and a subsequent identical
    query still works."""
    from featureextraction_spark.operators import cache as C
    from featureextraction_spark.operators.dedup import ngram_jaccard_pairs

    C.release_persisted_intermediates()  # clean slate
    a = ngram_jaccard_pairs(docs, threshold=0.3, strategy="bitset").count()
    released = C.release_persisted_intermediates()
    assert released > 0
    assert not C._PERSISTED
    b = ngram_jaccard_pairs(docs, threshold=0.3, strategy="bitset").count()
    assert a == b
    C.release_persisted_intermediates()


def test_dup_ngram_fraction_naive_oracle(spark):
    """Handcrafted corpus with a known shared 3-gram span + a short doc;
    engine vs a from-scratch pandas/token-dict oracle, exact."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "a quick brown fox sat down"),          # shares "quick brown fox"
        (2, "the quick brown fox jumps high"),      # shares 3 positions with 0
        (3, "completely unrelated text entirely here"),
        (4, "tiny doc"),                            # < 3 tokens -> NULL fraction
        (5, ""),                                    # empty
        (6, "the the the the"),                     # internal repetition only
        (7, "THE QUICK BROWN fox"),                 # case-folds onto 0's span
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = (
        D.dup_ngram_fraction(df, n=3)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    toks = {i: re.findall(r"[^ \t\n\r\f\x0b]+", t.lower()) for i, t in rows}
    grams = {
        i: [" ".join(tk[j : j + 3]) for j in range(len(tk) - 2)]
        for i, tk in toks.items()
    }
    docs_per_gram: dict[str, set] = {}
    for i, gs in grams.items():
        for g in set(gs):
            docs_per_gram.setdefault(g, set()).add(i)
    for row in got.itertuples(index=False):
        gs = grams[row.doc_id]
        exp_total = len(gs)
        exp_dup = sum(1 for g in gs if len(docs_per_gram[g]) >= 2)
        assert row.n_ngrams == exp_total, row
        assert row.dup_ngrams == exp_dup, row
        if exp_total == 0:
            assert pd.isna(row.dup_fraction)
        else:
            assert row.dup_fraction == exp_dup / exp_total
    # the engineered overlaps actually fired
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "dup_ngrams"] > 0
    assert by_id.loc[7, "dup_ngrams"] > 0      # case folding
    assert by_id.loc[3, "dup_ngrams"] == 0
    assert by_id.loc[6, "dup_ngrams"] == 0     # self-repetition is not cross-doc


def test_dup_ngram_fraction_counts_positions_not_types(spark):
    """A doc repeating a shared n-gram counts every POSITION of it."""
    df = spark.createDataFrame(
        [(0, "x y z x y z x y z"), (1, "x y z")],
        schema="doc_id long, text string",
    )
    got = D.dup_ngram_fraction(df, n=3).toPandas().set_index("doc_id")
    # doc 0: 7 positions; "x y z" appears at 0,3,6 (3 positions), cross-doc
    assert got.loc[0, "n_ngrams"] == 7
    assert got.loc[0, "dup_ngrams"] == 3
    assert got.loc[1, "n_ngrams"] == 1
    assert got.loc[1, "dup_ngrams"] == 1


def test_duplicated_spans_vs_naive(spark):
    """Island merge of duplicated n-gram positions vs a pure-python replay
    on a corpus with known shared boilerplate."""
    import re as _re

    from featureextraction_spark.operators.dedup import duplicated_spans

    boiler = "all rights reserved do not copy"
    rows = [
        (1, f"{boiler} unique alpha beta gamma delta"),
        (2, f"prefix words here {boiler} and a tail"),
        (3, "completely original text with no duplication at all"),
        (4, f"{boiler} {boiler} doubled banner"),   # adjacent repeats merge
        (5, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = 3
    out = duplicated_spans(df, n=n, min_df=2).toPandas()

    tok = _re.compile(r"[^ \t\n\r\f\x0b]+")
    toks = {i: tok.findall(t.lower()) for i, t in rows}
    grams: dict = {}
    for i, ts in toks.items():
        for p in range(len(ts) - n + 1):
            grams.setdefault(" ".join(ts[p : p + n]), set()).add(i)
    dup_pos = {
        i: sorted(
            p
            for p in range(len(ts) - n + 1)
            if len(grams[" ".join(ts[p : p + n])]) >= 2
        )
        for i, ts in toks.items()
    }
    want = []
    for i, ps in dup_pos.items():
        run: list = []
        for p in ps:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    want.append((i, run[0], run[-1] + n, len(run)))
                run = [p]
        if run:
            want.append((i, run[0], run[-1] + n, len(run)))
    got = sorted(
        (r.doc_id, r.start_tok, r.end_tok, r.n_dup_grams)
        for r in out.itertuples()
    )
    assert got == sorted(want)
    # ranks are dense per doc in start order
    for _, g in out.groupby("doc_id"):
        assert sorted(g.span_rank) == list(range(1, len(g) + 1))
        assert (g.span_tokens == g.end_tok - g.start_tok).all()
    # doc 3 and the too-short doc 5 have no spans
    assert not set(out.doc_id) & {3, 5}


def test_cut_duplicated_spans_vs_naive(spark):
    """Token-cut apply step vs a pure-python replay: union of covered
    intervals removed, original case kept, whitespace normalized."""
    import re as _re

    from featureextraction_spark.operators.dedup import cut_duplicated_spans

    boiler = "All Rights Reserved do not copy"
    rows = [
        (1, f"{boiler} Unique alpha beta gamma delta"),
        (2, f"prefix words here {boiler.lower()} and a tail"),
        (3, "completely original text with no duplication at all"),
        (4, f"{boiler} {boiler} doubled banner"),
        (5, "short"),
        # overlapping cover: dup positions < n apart must union, not stack
        (6, "one two three four X one two three four"),
        (7, "zz one two three four yy one two three four qq"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = 3
    out = (
        cut_duplicated_spans(df, n=n, min_df=2)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )

    tok = _re.compile(r"[^ \t\n\r\f\x0b]+")
    cased = {i: tok.findall(t) for i, t in rows}
    lowered = {i: [w.lower() for w in ws] for i, ws in cased.items()}
    grams: dict = {}
    for i, ts in lowered.items():
        for p in range(len(ts) - n + 1):
            grams.setdefault(" ".join(ts[p : p + n]), set()).add(i)
    for i, ts in lowered.items():
        removed = set()
        for p in range(len(ts) - n + 1):
            if len(grams[" ".join(ts[p : p + n])]) >= 2:
                removed.update(range(p, p + n))
        kept = [w for j, w in enumerate(cased[i]) if j not in removed]
        assert out.loc[i, "n_tokens"] == len(ts)
        assert out.loc[i, "removed_tokens"] == len(removed)
        assert out.loc[i, "clean_text"] == " ".join(kept)


def test_cut_duplicated_spans_pathological_doc(spark):
    """Linearity guard: a 10k-token document with ~50% of its tokens
    covered by duplicated runs (exactly what the operator targets) must
    cut correctly and quickly — the interval-slice formulation is
    O(tokens + intervals) per doc, not O(tokens × removed) like a
    per-token array_contains scan."""
    import re as _re
    import time

    from featureextraction_spark.operators.dedup import cut_duplicated_spans

    n = 4
    # alternating blocks: 10 boilerplate tokens (shared with doc 2, so
    # every n-gram inside is duplicated) then 10 unique tokens — ~half
    # the 10k tokens end up covered, in ~500 separate intervals
    blocks = []
    for b in range(500):
        blocks.append(" ".join(f"boiler{j}" for j in range(10)))
        blocks.append(" ".join(f"u{b}x{j}" for j in range(10)))
    doc1 = " ".join(blocks)
    doc2 = " ".join(f"boiler{j}" for j in range(10))
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2)], "doc_id long, text string"
    )
    t0 = time.monotonic()
    out = (
        cut_duplicated_spans(df, n=n, min_df=2)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    elapsed = time.monotonic() - t0

    tok = _re.compile(r"[^ \t\n\r\f\x0b]+")
    texts = {1: doc1, 2: doc2}
    cased = {i: tok.findall(t) for i, t in texts.items()}
    lowered = {i: [w.lower() for w in ws] for i, ws in cased.items()}
    grams: dict = {}
    for i, ts in lowered.items():
        for p in range(len(ts) - n + 1):
            grams.setdefault(" ".join(ts[p : p + n]), set()).add(i)
    for i, ts in lowered.items():
        removed = set()
        for p in range(len(ts) - n + 1):
            if len(grams[" ".join(ts[p : p + n])]) >= 2:
                removed.update(range(p, p + n))
        kept = [w for j, w in enumerate(cased[i]) if j not in removed]
        assert out.loc[i, "n_tokens"] == len(ts)
        assert out.loc[i, "removed_tokens"] == len(removed)
        assert out.loc[i, "clean_text"] == " ".join(kept)
    assert out.loc[1, "removed_tokens"] >= 4500
    # generous wall bound — the quadratic formulation blows far past this
    assert elapsed < 60, f"cut took {elapsed:.1f}s on a 10k-token doc"


def test_line_dedup_features_vs_naive(spark):
    """Line-occurrence dedup fractions vs a pure-python replay, including
    empty lines, trailing-empty retention, and the zero-char guard."""
    from collections import Counter

    from featureextraction_spark.functions.textstats import line_dedup_features

    rows = [
        (1, "menu\nhome\nmenu\nabout\nmenu"),
        (2, "alpha\nbeta\ngamma"),
        (3, "x\n\n\nx\n"),          # duplicate empties + trailing empty
        (4, ""),                    # one empty line, zero chars
        (5, "same\nsame"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = line_dedup_features(df).toPandas().set_index("doc_id").sort_index()

    for i, t in rows:
        parts = t.split("\n")
        c = Counter(parts)
        n = len(parts)
        dup = sum(v - 1 for v in c.values())
        chars = sum(len(p) for p in parts)
        dup_chars = sum((v - 1) * len(k) for k, v in c.items())
        assert out.loc[i, "n_lines"] == n
        assert out.loc[i, "dup_lines"] == dup
        assert out.loc[i, "dup_line_frac"] == dup / n
        assert out.loc[i, "dup_char_frac"] == (
            dup_chars / chars if chars else 0.0
        )


def test_unigram_lm_score_vs_naive(spark):
    """Laplace unigram LM scoring vs a pure-python replay: reference-slice
    fit, OOV bucket, exact integer numerator, float log-prob tolerance."""
    import math
    import re as _re
    from collections import Counter

    from pyspark.sql import functions as F

    from featureextraction_spark.functions.textstats import unigram_lm_score

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "completely novel vocabulary zone"),
        (3, "the the the cat cat"),
        (10, "the mat and the cat again"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        unigram_lm_score(df, ref=F.col("doc_id") % 2 == 0)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )

    tok = _re.compile(r"[^ \t\n\r\f\x0b]+")
    ref_toks = [
        t for i, s in rows if i % 2 == 0 for t in tok.findall(s.lower())
    ]
    lm = Counter(ref_toks)
    N, V = sum(lm.values()), len(lm)
    D = N + V + 1
    for i, s in rows:
        ts = tok.findall(s.lower())
        num = sum(lm.get(t, 0) + 1 for t in ts)
        assert out.loc[i, "n_tokens"] == len(ts)
        assert out.loc[i, "oov_tokens"] == sum(1 for t in ts if t not in lm)
        assert out.loc[i, "lm_num"] == num
        assert out.loc[i, "mean_tok_prob"] == num / (len(ts) * D)
        want_lp = sum(math.log((lm.get(t, 0) + 1) / D) for t in ts) / len(ts)
        assert abs(out.loc[i, "avg_logprob"] - want_lp) < 1e-9
        assert abs(out.loc[i, "ppl"] - math.exp(-want_lp)) < 1e-6


def test_ngram_repetition_features_vs_naive(spark):
    """Union token-coverage repetition metrics vs a pure-python replay,
    including overlap-union, tie-break determinism, and short docs."""
    import re as _re
    from collections import Counter

    from featureextraction_spark.functions.textstats import (
        ngram_repetition_features,
    )

    rows = [
        (1, "spam spam spam spam eggs"),          # heavy overlap unions
        (2, "a b c a b c a b c"),
        (3, "all tokens here are unique words"),
        (4, "x y"),                               # shorter than n
        (5, "t1 t2 t1 t2 zz t1 t2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = 2
    out = (
        ngram_repetition_features(df, n=n)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )

    tok = _re.compile(r"[^ \t\n\r\f\x0b]+")
    for i, s in rows:
        ts = tok.findall(s.lower())
        grams = [" ".join(ts[p : p + n]) for p in range(len(ts) - n + 1)]
        c = Counter(grams)
        assert out.loc[i, "n_tokens"] == len(ts)
        if not grams:
            assert pd.isna(out.loc[i, "top_gram"])
            assert out.loc[i, "top_cover_frac"] == 0.0
            assert out.loc[i, "dup_cover_frac"] == 0.0
            continue
        top = min(c, key=lambda g: (-c[g], g))
        top_cov = set()
        dup_cov = set()
        for p, g in enumerate(grams):
            if g == top:
                top_cov.update(range(p, p + n))
            if c[g] > 1:
                dup_cov.update(range(p, p + n))
        assert out.loc[i, "top_gram"] == top
        assert out.loc[i, "top_gram_count"] == c[top]
        assert out.loc[i, "top_cover_frac"] == len(top_cov) / len(ts)
        assert out.loc[i, "dup_cover_frac"] == len(dup_cov) / len(ts)


def _np_pq_replay(X, Q, m, ks, k=5):
    """Naive ADC replay: sample codebooks (first ks rows' subvectors),
    decomposed-L2 argmin encode, per-query LUT scan, (adc desc, id asc)."""
    n, d = X.shape
    dsub = d // m
    cbs = [X[:ks, j * dsub : (j + 1) * dsub].copy() for j in range(m)]

    def seqdot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    codes = []
    for i in range(n):
        cs = []
        for j in range(m):
            a = X[i, j * dsub : (j + 1) * dsub]
            best = min(
                range(ks),
                key=lambda c: (
                    seqdot(a, a) - 2.0 * seqdot(a, cbs[j][c])
                    + seqdot(cbs[j][c], cbs[j][c]),
                    c,
                ),
            )
            cs.append(best)
        codes.append(cs)
    out = {}
    for qi in range(Q.shape[0]):
        scores = []
        for i in range(n):
            if i == qi:
                continue
            adc = 0.0
            for j in range(m):
                adc = adc + seqdot(
                    Q[qi, j * dsub : (j + 1) * dsub], cbs[j][codes[i][j]]
                )
            scores.append((round(adc, 6), i))
        scores.sort(key=lambda t: (-t[0], t[1]))
        out[qi] = scores[:k]
    return out


def test_pq_topk_matches_naive_replay(spark):
    """Sample-codebook ADC is bit-equal to the pure-python replay
    (decomposed-L2 encode, fixed-order LUT adds, deterministic ties)."""
    from featureextraction_spark.operators.similarity import pq_topk

    rng = np.random.default_rng(7)
    X = rng.standard_normal((40, 16)).astype(np.float32).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 6)
    got = (
        pq_topk(q, df, m=4, ks=8, k=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = _np_pq_replay(X, X[:6], m=4, ks=8, k=5)
    for _, r in got.iterrows():
        adc, nid = want[r.query_id][int(r["rank"]) - 1]
        assert nid == r.neighbor_id, (r.query_id, r["rank"])
        assert adc == r.adc


def test_pq_encode_identity_on_codebook_rows(spark):
    """Vectors that ARE codebook entries encode to their own index
    (d2 = 0 in every subspace) when subvectors are distinct."""
    from featureextraction_spark.operators.similarity import (
        pq_encode,
        pq_sample_codebooks,
    )

    rng = np.random.default_rng(3)
    X = rng.standard_normal((12, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    cbs = pq_sample_codebooks(df, m=2, ks=8)
    got = (
        pq_encode(df, cbs).toPandas().set_index("vec_id").sort_index()
    )
    for i in range(8):
        assert list(got.loc[i, "codes"]) == [i, i]


def test_pq_fit_kmeans_recall(spark):
    """k-means codebooks: ADC top-k recall vs exact inner-product top-k
    on clustered data clears a sane floor (and beats the tiny sample
    codebook's recall)."""
    from featureextraction_spark.operators.similarity import (
        pq_fit,
        pq_sample_codebooks,
        pq_topk,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((6, 32)) * 3
    X = np.vstack(
        [c + rng.standard_normal((30, 32)) * 0.5 for c in centers]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") % 45 == 0)
    qids = [int(r.vec_id) for r in q.collect()]

    def exact_top(qi, k=10):
        scores = X @ X[qi]
        order = sorted(
            (i for i in range(len(X)) if i != qi),
            key=lambda i: (-scores[i], i),
        )
        return set(order[:k])

    def recall(pdf):
        hits = tot = 0
        for qi in qids:
            want = exact_top(qi)
            gotn = set(
                pdf[pdf.query_id == qi].neighbor_id.tolist()
            )
            hits += len(want & gotn)
            tot += len(want)
        return hits / tot

    km = pq_topk(q, df, codebooks=pq_fit(df, m=4, ks=16, sample_n=200), k=10)
    r_km = recall(km.toPandas())
    assert r_km >= 0.5, r_km
    samp = pq_topk(
        q, df, codebooks=pq_sample_codebooks(df, m=4, ks=8), k=10
    )
    assert r_km >= recall(samp.toPandas()) - 0.05


def test_ivfpq_full_probe_equals_pq_scan(spark):
    """IVF-PQ probing every list is row-identical to the flat PQ scan
    with the same codebooks (ADC values and ranks)."""
    from featureextraction_spark.operators.similarity import (
        ivfpq_topk,
        pq_sample_codebooks,
        pq_topk,
    )

    rng = np.random.default_rng(5)
    X = rng.standard_normal((60, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 5)
    cbs = pq_sample_codebooks(df, m=4, ks=8)
    flat = (
        pq_topk(q, df, codebooks=cbs, k=7)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    ivf = (
        ivfpq_topk(
            q, df, codebooks=cbs, k=7, n_lists=4, n_probe=4, init_mode="random"
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(flat, ivf)


def test_pq_topk_auto_gate_ivfpq_full_probe(spark):
    """The corpus-size auto-gate: below ``flat_max_rows`` auto rides the
    flat ADC scan; above it, auto delegates to IVF-PQ — and at
    ``n_probe == n_lists`` the two physical strategies are row-identical
    (same codebooks, same ADC values/ranks), so the gate can never change
    results at full probe."""
    from featureextraction_spark.operators.similarity import (
        pq_sample_codebooks,
        pq_topk,
    )

    rng = np.random.default_rng(23)
    X = rng.standard_normal((60, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 5)
    cbs = pq_sample_codebooks(df, m=4, ks=8)
    flat = (
        pq_topk(q, df, codebooks=cbs, k=7, strategy="flat")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    # auto under the gate == flat
    auto_small = (
        pq_topk(q, df, codebooks=cbs, k=7, strategy="auto", n_rows=60)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(flat, auto_small)
    # force the over-gate IVF-PQ path at full probe: still row-identical
    auto_big = (
        pq_topk(
            q, df, codebooks=cbs, k=7, strategy="auto",
            flat_max_rows=1, n_rows=60, n_lists=4, n_probe=4,
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(flat, auto_big)


def test_ivfpq_partial_probe_recall(spark):
    """Probing a strict subset of lists keeps most of the flat-scan
    neighbors on clustered data, and its candidates are a subset."""
    from featureextraction_spark.operators.similarity import (
        ivfpq_topk,
        pq_fit,
        pq_topk,
    )

    rng = np.random.default_rng(13)
    centers = rng.standard_normal((4, 16)) * 4
    X = np.vstack([c + rng.standard_normal((40, 16)) * 0.5 for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") % 40 == 0)
    cbs = pq_fit(df, m=4, ks=16, sample_n=160)
    flat = pq_topk(q, df, codebooks=cbs, k=10).toPandas()
    part = ivfpq_topk(q, df, codebooks=cbs, k=10, n_lists=4, n_probe=2).toPandas()
    hits = tot = 0
    for qid in flat.query_id.unique():
        want = set(flat[flat.query_id == qid].neighbor_id)
        got = set(part[part.query_id == qid].neighbor_id)
        hits += len(want & got)
        tot += len(want)
    assert hits / tot >= 0.6, hits / tot
