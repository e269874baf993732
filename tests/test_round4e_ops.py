"""Round-4 additions (fifth batch) — hashing-trick vectorizer, group
k-fold assignment, leakage-free standard scaling — vs naive python
oracles, plus leakage/determinism properties and plan audits."""

from __future__ import annotations

import hashlib
import math
import random
import re
from collections import defaultdict

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from featureextraction_spark.operators.encoding import hashed_features, standard_scale
from featureextraction_spark.operators.sampling import fold_stats, group_kfold


def h60(s: str, seed: int) -> int:
    return int(hashlib.md5(f"{s}:{seed}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(9)
    words = ["alpha", "beta", "Gamma", "DELTA", "eps", "zeta-1", "x"]
    rows = [
        Row(doc_id=i, text=" ".join(rng.choices(words, k=rng.randint(0, 30))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    df.persist().count()
    return df, rows


def test_hashed_features_vs_naive(docs):
    df, rows = docs
    got = {(r.doc_id, r.bucket): (r.val, r.n_tokens) for r in hashed_features(df).collect()}
    want = defaultdict(lambda: [0, 0])
    for r in rows:
        for tok in r.text.lower().split():
            h = h60(tok, 17)
            b = h % 64
            sign = 1 if h % 128 < 64 else -1
            want[(r.doc_id, b)][0] += sign
            want[(r.doc_id, b)][1] += 1
    assert got == {k: tuple(v) for k, v in want.items()}


def test_hashed_features_empty_doc_yields_no_rows(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=""), Row(doc_id=2, text="  ")])
    assert hashed_features(df).count() == 0


def test_group_kfold_groups_stay_together_and_balance(spark):
    rows = [
        Row(conv_id=f"c{c}", turn_idx=i, tool=None)
        for c in range(200)
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, schema="conv_id string, turn_idx int, tool string")
    out = group_kfold(df, "conv_id", k=5, seed=23)
    per_conv = (
        out.groupBy("conv_id")
        .agg(F.countDistinct("fold").alias("nf"), F.first("fold").alias("fold"))
        .collect()
    )
    assert all(r.nf == 1 for r in per_conv)  # whole conversation, one fold
    for r in per_conv:  # content-addressed: replayable from md5
        assert r.fold == h60(r.conv_id, 23) % 5
    stats = {r.fold: r.n_groups for r in fold_stats(out, "conv_id").collect()}
    assert sum(stats.values()) == 200
    assert all(20 <= v <= 60 for v in stats.values())  # binomial concentration


def test_group_kfold_zero_shuffle(spark):
    df = spark.createDataFrame(
        [Row(conv_id="a", turn_idx=0, tool=None)],
        schema="conv_id string, turn_idx int, tool string",
    )
    plan = group_kfold(df, "conv_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


@pytest.fixture(scope="module")
def events(spark):
    rng = random.Random(2)
    rows = [
        Row(
            event_id=i,
            user_id=i % 37,
            value=round(rng.uniform(0, 560), 2),
        )
        for i in range(600)
    ]
    df = spark.createDataFrame(rows)
    df.persist().count()
    return df, rows


def test_standard_scale_vs_naive(events):
    df, rows = events
    out = {r.event_id: r for r in standard_scale(df).collect()}
    train_groups = {
        u for u in {r.user_id for r in rows} if h60(str(u), 42) / (1 << 60) < 0.8
    }
    tq = [math.floor(r.value * 1e3 + 0.5) for r in rows if r.user_id in train_groups]
    n, s1, s2 = len(tq), sum(tq), sum(v * v for v in tq)
    mu = s1 / n
    sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
    for r in rows:
        o = out[r.event_id]
        vq = math.floor(r.value * 1e3 + 0.5)
        assert o.vq == vq
        assert o.split == ("train" if r.user_id in train_groups else "held")
        assert (o.n_train, o.sum_q, o.sum_sq_q) == (n, s1, s2)
        assert abs(o.z - (vq - mu) / sd) < 1e-9


def test_standard_scale_no_group_leakage(events):
    df, _ = events
    out = standard_scale(df)
    # a group is entirely train or entirely held — never mixed
    mixed = (
        out.groupBy("user_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter("ns > 1")
        .count()
    )
    assert mixed == 0
    # held rows influence nothing: refit after dropping them is identical
    refit = standard_scale(df.join(out.select("event_id", "split"), "event_id").filter(
        "split = 'train'").drop("split"))
    a = {r.event_id: (r.n_train, r.sum_q, r.sum_sq_q) for r in refit.collect()}
    b = {r.event_id: (r.n_train, r.sum_q, r.sum_sq_q) for r in out.collect() if r.split == "train"}
    assert a == b


def test_standard_scale_fact_table_never_shuffles(events):
    df, _ = events
    plan = standard_scale(df)._jdf.queryExecution().executedPlan().toString()
    # the only exchanges feed the 1-row fit aggregate / its broadcast —
    # nothing hash-partitions the fact table
    assert not re.search(r"Exchange hashpartitioning\((event_id|user_id)", plan)
    assert "Python" not in plan


def test_hashed_features_single_exchange(docs):
    df, _ = docs
    plan = hashed_features(df)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Python" not in plan
