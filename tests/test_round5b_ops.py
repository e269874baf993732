"""Round-5 additions (second batch): BPE encode via engine-exact string
surgery, columnar-encoding advisor stats, deterministic Poisson
bootstrap — each vs a verbatim naive python/pandas oracle."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from featureextraction_spark.functions.textstats import bpe_apply, bpe_train
from featureextraction_spark.operators.evaluation import (
    POISSON1_CDF,
    poisson_bootstrap_mean,
)
from featureextraction_spark.operators.profiling import encoding_advisor


# ------------------------------------------------------------ BPE apply --


def _naive_bpe_apply(texts, merges):
    out = {}
    for doc_id, t in texts:
        words = [w for w in re.split(r"[ \t\n\r\f\x0b]+", t.lower()) if w]
        n_in = sum(len(w) for w in words)
        n_out = 0
        for w in words:
            syms = list(w)
            for left, right in merges:
                new, pend = [], None
                for s in syms:
                    if pend is None:
                        pend = s
                    elif pend == left and s == right:
                        new.append(left + right)
                        pend = None
                    else:
                        new.append(pend)
                        pend = s
                if pend is not None:
                    new.append(pend)
                syms = new
            n_out += len(syms)
        out[doc_id] = (len(words), n_in, n_out, n_in - n_out)
    return out


def test_bpe_apply_vs_naive_fold(spark):
    merges = [("a", "b"), ("ab", "c"), ("a", "a"), ("aa", "aa")]
    texts = [
        (0, "abc abab aaaa baaab"),
        (1, "aaaaa cab ABC"),  # odd run; lowercasing; merged-into-merged
        (2, "xyz"),
        (3, ""),
        (4, "a  b\t ab\ncabc"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_syms_in"],
            r["n_syms_out"],
            r["n_merges_applied"],
        )
        for r in bpe_apply(df, merges).collect()
    }
    assert got == _naive_bpe_apply(texts, merges)


def test_bpe_apply_consistent_with_trainer(spark):
    # encode with the merges the trainer learned: the total symbol count
    # must equal the trainer's final vocabulary state mass
    texts = ["low lower lowest low low", "newest new newer lowest", "wide wider"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = bpe_train(df, n_merges=6, min_len=1)
    rules = [(m[1], m[2]) for m in merges]
    enc = bpe_apply(df, rules).agg(F.sum("n_syms_out")).collect()[0][0]
    # naive final state: train on words then count symbols per occurrence
    out = _naive_bpe_apply([(i, t) for i, t in enumerate(texts)], rules)
    assert enc == sum(v[2] for v in out.values())


# ----------------------------------------------------- encoding advisor --


def test_encoding_advisor_vs_naive(spark):
    import pandas as pd

    rows = [
        (u, i, ["x", "x", "y", None][i % 4], float(i % 3))
        for u in range(6)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "user_id long, pos long, s string, v double")
    got = {
        r["col_name"]: (
            r["n_rows"], r["n_null"], r["n_distinct"], r["n_runs"], r["data_bytes"]
        )
        for r in encoding_advisor(df, "user_id", ("pos",), ["s", "v"]).collect()
    }
    pdf = pd.DataFrame(rows, columns=["user_id", "pos", "s", "v"]).sort_values(
        ["user_id", "pos"]
    )
    for c, is_str in (("s", True), ("v", False)):
        runs = 0
        for _, g in pdf.groupby("user_id"):
            vals = list(g[c])
            runs += 1 + sum(
                1 for a, b in zip(vals, vals[1:]) if (pd.isna(a) != pd.isna(b))
                or (not pd.isna(a) and a != b)
            )
        n_null = int(pdf[c].isna().sum())
        n_distinct = int(pdf[c].nunique(dropna=True))
        data = (
            int(pdf[c].dropna().str.len().sum())
            if is_str
            else 8 * (len(pdf) - n_null)
        )
        assert got[c] == (len(pdf), n_null, n_distinct, runs, data), (c, got[c])


# ------------------------------------------------------ Poisson bootstrap


def _h60(value, seed=0) -> int:
    return int(hashlib.md5(f"{value}:{seed}".encode()).hexdigest()[:15], 16)


def _naive_boot(rows, B, seed=7):
    res = {}
    for b in range(B):
        n_eff = swx = 0
        for rid, x in rows:
            u = (int(hashlib.md5(f"{rid}:{b}:{seed}".encode()).hexdigest()[:15], 16)
                 + 0.0) / float(1 << 60)
            w = sum(1 for c in POISSON1_CDF if u >= c)
            n_eff += w
            swx += w * x
        res[b] = (n_eff, swx, swx / n_eff if n_eff else 0.0)
    return res


def test_poisson_bootstrap_vs_naive_exact(spark):
    rows = [(i, 50 + (i * 11) % 200) for i in range(250)]
    df = spark.createDataFrame(rows, "id long, x long")
    got = {
        r["replicate"]: (r["n_eff"], r["sum_wx"], r["boot_mean"])
        for r in poisson_bootstrap_mean(df, "id", "x", replicates=8).collect()
    }
    assert got == _naive_boot(rows, 8)


def test_poisson_bootstrap_distribution_covers_truth(spark):
    rows = [(i, 100 + (i * 7) % 50) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x long")
    means = [
        r["boot_mean"]
        for r in poisson_bootstrap_mean(df, "id", "x", replicates=32).collect()
    ]
    truth = sum(x for _, x in rows) / len(rows)
    # the replicate spread brackets the truth and stays tight (n=400)
    assert min(means) <= truth <= max(means)
    assert max(means) - min(means) < 0.2 * truth
