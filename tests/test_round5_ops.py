"""Round-5 additions: mergeable Misra–Gries heavy hitters, priority
sampling, zone-map prune audit, WOE encoding, bigram LM scoring — each
vs a verbatim naive python/pandas oracle."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from featureextraction_spark.operators.encoding import woe_encode
from featureextraction_spark.operators.layout import zonemap_prune_audit
from featureextraction_spark.operators.sampling import priority_sample
from featureextraction_spark.operators.sketches import heavy_hitters, mg_compress
from featureextraction_spark.functions.textstats import bigram_lm_score


def _h60(value, seed=0) -> int:
    return int(hashlib.md5(f"{value}:{seed}".encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- MG ----


def _naive_mg_compress(counts: dict, k: int):
    """counts: item -> exact count. Returns (summary dict, offset)."""
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    off = ranked[k][1] if len(ranked) > k else 0
    summary = {i: c - off for i, c in ranked[:k] if c - off > 0}
    return summary, off


def _naive_heavy_hitters(rows, k, n_shards):
    """rows: (shard, item) occurrences."""
    shard_counts = Counter(rows)
    per_shard_items = {}
    shard_err = 0
    for s in {s for s, _ in rows}:
        cs = {i: c for (sh, i), c in shard_counts.items() if sh == s}
        summary, off = _naive_mg_compress(cs, k)
        shard_err += off
        for i, c in summary.items():
            per_shard_items[i] = per_shard_items.get(i, 0) + c
    final, off_final = _naive_mg_compress(per_shard_items, k)
    return {i: (c, shard_err + off_final) for i, c in final.items()}


def test_heavy_hitters_vs_naive_and_sandwich(spark):
    # skewed stream: item frequency ~ 1/rank, spread over 5 shards
    rows = []
    for r in range(1, 60):
        for j in range(120 // r):
            rows.append((j % 5, f"tok{r:02d}"))
    df = spark.createDataFrame(rows, "shard long, item string")
    got = {
        r["item"]: (r["mg_count"], r["err_bound"])
        for r in heavy_hitters(df, "item", F.col("shard"), k=8).collect()
    }
    want = _naive_heavy_hitters(rows, 8, 5)
    assert got == want
    # error certificate: mg <= exact <= mg + err for every reported item
    exact = Counter(i for _, i in rows)
    for item, (mg, err) in got.items():
        assert mg <= exact[item] <= mg + err, (item, mg, exact[item], err)
    # the top item is guaranteed present (its count exceeds any err bound)
    assert "tok01" in got


def test_heavy_hitters_small_input_is_exact(spark):
    # fewer distinct items than k: summary == exact counts, err == 0
    rows = [(i % 3, t) for i, t in enumerate(["a", "b", "a", "c", "a", "b"])]
    df = spark.createDataFrame(rows, "shard long, item string")
    got = heavy_hitters(df, "item", F.col("shard"), k=8).collect()
    assert {(r["item"], r["mg_count"], r["err_bound"]) for r in got} == {
        ("a", 3, 0),
        ("b", 2, 0),
        ("c", 1, 0),
    }


def test_mg_compress_all_ties_prunes_to_empty(spark):
    # k+1 equal counts: everything cancels; offset still reported upstream
    counts = spark.createDataFrame(
        [(0, f"t{i}", 7) for i in range(5)], "g long, item string, cnt long"
    )
    out = mg_compress(counts, "item", "cnt", k=4, group="g").collect()
    assert out == []
    # heavy_hitters must still carry that shard's offset in err_bound
    rows = [(0, f"t{i}") for i in range(5) for _ in range(7)] + [(1, "big")] * 50
    df = spark.createDataFrame(rows, "shard long, item string")
    got = {
        r["item"]: (r["mg_count"], r["err_bound"])
        for r in heavy_hitters(df, "item", F.col("shard"), k=4).collect()
    }
    assert got["big"][0] == 50
    assert got["big"][1] >= 7  # the all-ties shard's pruned offset counts


# ------------------------------------------------------- priority sample --


def _naive_priority(rows, k, seed=42):
    pri = []
    for rid, w in rows:
        u = (_h60(rid, seed) + 0.5) / float(1 << 60)
        pri.append((rid, w, w / u))
    pri.sort(key=lambda t: (-t[2], t[0]))
    tau = pri[k][2] if len(pri) > k else 0.0
    return {
        rid: (w, q, i + 1, tau, max(float(w), tau))
        for i, (rid, w, q) in enumerate(pri[:k])
    }


def test_priority_sample_vs_naive_exact(spark):
    rows = [(i, 1 + (i * 37) % 250) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = {
        r["id"]: (r["weight"], r["priority"], r["rn"], r["tau"], r["est_weight"])
        for r in priority_sample(df, "id", "w", k=64).collect()
    }
    assert got == _naive_priority(rows, 64)


def test_priority_sample_below_k_is_whole_table(spark):
    rows = [(i, 10 * (i + 1)) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = priority_sample(df, "id", "w", k=64).collect()
    assert len(out) == 5
    assert all(r["tau"] == 0.0 and r["est_weight"] == float(r["weight"]) for r in out)


def test_priority_sample_subset_sum_estimator(spark):
    # Σ est_weight over the sample estimates Σ w; with k=128 of 600 rows
    # a single draw should land well within 2x (DLT'07 variance bound)
    rows = [(i, 1 + (i * 13) % 97) for i in range(600)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = priority_sample(df, "id", "w", k=128).collect()
    est = sum(r["est_weight"] for r in out)
    truth = sum(w for _, w in rows)
    assert 0.5 * truth < est < 2.0 * truth


# ------------------------------------------------------- zonemap audit ---


def test_zonemap_prune_audit_vs_naive(spark):
    rows = [(i, (i * 17) % 1000) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v long")
    preds = [("lo", 0, 99), ("mid", 450, 549), ("all", 0, 999)]
    got = zonemap_prune_audit(
        df,
        {"natural": F.expr("id div 50"), "sorted": F.expr("v div 50")},
        "v",
        preds,
    ).collect()
    # naive: group rows into zones, min/max prune
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["id", "v"])
    for layout, zexpr in [
        ("natural", pdf.id // 50),
        ("sorted", pdf.v // 50),
    ]:
        z = pdf.assign(zone=zexpr)
        stats = z.groupby("zone")["v"].agg(["count", "min", "max"])
        for pred, lo, hi in preds:
            scanned = stats[(stats["min"] <= hi) & (stats["max"] >= lo)]
            row = [
                r
                for r in got
                if r["layout"] == layout and r["pred"] == pred
            ][0]
            assert row["zones_total"] == len(stats)
            assert row["zones_scanned"] == len(scanned)
            assert row["rows_total"] == len(pdf)
            assert row["rows_scanned"] == int(scanned["count"].sum())
            assert row["rows_matching"] == int(
                ((pdf.v >= lo) & (pdf.v <= hi)).sum()
            )
    # a value-sorted layout must dominate the natural one on range preds
    by = {(r["layout"], r["pred"]): r["rows_scanned"] for r in got}
    assert by[("sorted", "mid")] <= by[("natural", "mid")]


# ------------------------------------------------------------- WOE -------


def test_woe_encode_vs_naive(spark):
    rows = [(f"c{i % 4}", i % 3 == 0) for i in range(120)] + [("rare", True)]
    df = spark.createDataFrame(rows, "cat string, y boolean")
    got = {r["category"]: r for r in woe_encode(df, "cat", F.col("y")).collect()}
    pos_tot = sum(1 for _, y in rows if y)
    neg_tot = len(rows) - pos_tot
    cats = {c for c, _ in rows}
    for c in cats:
        pos = sum(1 for cc, y in rows if cc == c and y)
        neg = sum(1 for cc, y in rows if cc == c and not y)
        num = (2 * pos + 1) * neg_tot
        den = (2 * neg + 1) * pos_tot
        woe = math.log(num / den)
        iv = (pos / pos_tot - neg / neg_tot) * woe
        r = got[c]
        assert (r["n"], r["pos"], r["neg"]) == (pos + neg, pos, neg)
        assert (r["woe_num"], r["woe_den"]) == (num, den)
        assert r["woe"] == pytest.approx(woe, abs=1e-12)
        assert r["iv"] == pytest.approx(iv, abs=1e-12)
    # the all-positive rare cell stays finite thanks to smoothing
    assert math.isfinite(got["rare"]["woe"])


def test_woe_encode_rejects_other_smoothing(spark):
    df = spark.createDataFrame([("a", True)], "cat string, y boolean")
    with pytest.raises(ValueError):
        woe_encode(df, "cat", F.col("y"), smoothing=1.0)


# ------------------------------------------------------- bigram LM -------

_TOK = re.compile(r"[^ \t\n\r\f\x0b]+")


def _naive_bigram(docs, ref_ids):
    toks = {d: _TOK.findall(t.lower()) for d, t in docs}
    bigr = {d: list(zip(ts, ts[1:])) for d, ts in toks.items()}
    cab = Counter(p for d in ref_ids for p in bigr[d])
    ca = Counter(p[0] for d in ref_ids for p in bigr[d])
    vocab = {t for d in ref_ids for t in toks[d]}
    V = len(vocab)
    out = {}
    for d, _ in docs:
        bs = bigr[d]
        n = len(bs)
        oov = sum(1 for p in bs if p not in cab)
        num = sum(cab.get(p, 0) + 1 for p in bs)
        ctx = sum(ca.get(p[0], 0) for p in bs)
        slog = sum(
            math.log(cab.get(p, 0) + 1) - math.log(ca.get(p[0], 0) + V + 1)
            for p in bs
        )
        out[d] = (n, oov, num, ctx, slog / n if n else 0.0)
    return out


def test_bigram_lm_vs_naive(spark):
    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat ate the rat"),
        (2, "dogs chase the cat"),
        (3, "völlig unrelated Zeichen"),
        (4, ""),
        (5, "single"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["oov_bigrams"],
            r["blm_num"],
            r["ctx_num"],
            r["avg_logprob"],
        )
        for r in bigram_lm_score(df, ref=F.col("doc_id") < 2).collect()
    }
    want = _naive_bigram(docs, {0, 1})
    assert set(got) == set(want)  # every doc scored, even empty/1-token
    for d in want:
        assert got[d][:4] == want[d][:4], (d, got[d], want[d])
        assert got[d][4] == pytest.approx(want[d][4], abs=1e-9)
