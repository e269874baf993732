"""Round-4 additions (fourth batch) — integer-exact embedding
covariance / driver PCA, median-MAD robust outliers, per-conversation
summary features — vs naive python/numpy oracles, plus strategy
bit-equality and plan audits."""

from __future__ import annotations

import datetime as dt
import math
import random
import re
from collections import Counter, defaultdict

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from featureextraction_spark.operators.decomposition import (
    embedding_covariance,
    pca_components,
    pca_project,
)
from featureextraction_spark.operators.profiling import robust_outliers
from featureextraction_spark.operators.turns import conversation_summary


@pytest.fixture(scope="module")
def emb(spark):
    rng = random.Random(11)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(6)])
        for i in range(80)
    ]
    df = spark.createDataFrame(rows)
    df.persist().count()
    return df


def test_covariance_strategies_bit_identical(emb):
    e = embedding_covariance(emb, strategy="expr").orderBy("i", "j").collect()
    g = embedding_covariance(emb, strategy="gemm").orderBy("i", "j").collect()
    assert [tuple(r) for r in e] == [tuple(r) for r in g]


def test_covariance_matches_numpy_on_quantized(emb):
    x = np.array([r.embedding for r in emb.orderBy("vec_id").collect()])
    xq = np.floor(x * 1e6 + 0.5)
    c = np.cov(xq.T) / 1e12  # ddof=1 sample covariance
    rows = embedding_covariance(emb, strategy="expr").collect()
    assert len(rows) == 6 * 7 // 2
    for r in rows:
        assert r.n == 80
        assert abs(c[r.i, r.j] - r.cov) < 1e-9
        assert r.s_ij == int((xq[:, r.i] * xq[:, r.j]).sum())


def test_covariance_auto_gate(emb):
    # 80 rows < 2000 → expr; forcing the threshold down flips to gemm,
    # results identical either way (covered above); here just check the
    # gate doesn't crash and the unknown strategy raises
    out = embedding_covariance(emb, strategy="auto", gemm_min_rows=10)
    assert out.count() == 21
    with pytest.raises(ValueError):
        embedding_covariance(emb, strategy="bogus")


def test_pca_components_and_projection(emb):
    vals, vecs = pca_components(emb, k=3)
    # eigenvalues descending, axes orthonormal
    assert vals[0] >= vals[1] >= vals[2]
    assert np.allclose(vecs @ vecs.T, np.eye(3), atol=1e-9)
    # matches numpy PCA of the quantized data up to the fixed sign
    x = np.array([r.embedding for r in emb.orderBy("vec_id").collect()])
    xq = np.floor(x * 1e6 + 0.5)
    c = np.cov(xq.T) / 1e12
    w, v = np.linalg.eigh(c)
    order = np.argsort(w)[::-1][:3]
    assert np.allclose(vals, w[order], atol=1e-9)
    for k in range(3):
        ref = v[:, order[k]]
        if ref[np.argmax(np.abs(ref))] < 0:
            ref = -ref
        assert np.allclose(vecs[k], ref, atol=1e-9)
    # projection = dot product, JVM-side
    proj = {r.vec_id: r for r in pca_project(emb, vecs).collect()}
    for i, row in enumerate(x):
        for k in range(3):
            assert abs(getattr(proj[i], f"pc{k}") - float(row @ vecs[k])) < 1e-9


def test_robust_outliers_vs_naive(spark):
    rng = random.Random(3)
    rows = []
    for g, (mu, n_out) in {"a": (2.0, 3), "b": (-5.0, 2)}.items():
        vals = [round(rng.gauss(mu, 1.0), 4) for _ in range(41)]
        vals += [mu + 50.0] * n_out
        rows += [
            Row(event_id=len(rows) + i, event_type=g, value=v)
            for i, v in enumerate(vals)
        ]
    df = spark.createDataFrame(rows)
    got = {r.event_id: r for r in robust_outliers(df).collect()}

    def med2(xs):  # 2× linear-interpolated median, exactly integer
        s = sorted(xs)
        n = len(s)
        return (
            2 * s[n // 2] if n % 2 else s[n // 2 - 1] + s[n // 2]
        )

    by_g = defaultdict(list)
    for r in rows:
        by_g[r.event_type].append(math.floor(r.value * 1e6 + 0.5))
    for g, vqs in by_g.items():
        m2 = med2(vqs)
        devs = [abs(2 * v - m2) for v in vqs]
        m4 = med2(devs)
        grows = [r for r in rows if r.event_type == g]
        for r in grows:
            vq = math.floor(r.value * 1e6 + 0.5)
            o = got[r.event_id]
            assert o.med_x2 == m2 and o.mad_x4 == m4
            assert o.dev_x2 == abs(2 * vq - m2)
            assert o.is_outlier == (20000 * o.dev_x2 > 44478 * m4)
            if m4 > 0:
                assert abs(o.robust_z - 20000.0 * o.dev_x2 / (14826.0 * m4)) < 1e-12
    # the planted far points are flagged, the gaussian bulk mostly isn't
    flagged = sum(1 for o in got.values() if o.is_outlier)
    assert 5 <= flagged <= 10


def test_robust_outliers_zero_mad(spark):
    df = spark.createDataFrame(
        [Row(event_id=i, event_type="c", value=1.5) for i in range(5)]
    )
    out = robust_outliers(df).collect()
    assert all(r.mad_x4 == 0 and not r.is_outlier and r.robust_z is None for r in out)


@pytest.fixture(scope="module")
def convs(spark):
    rng = random.Random(5)
    rows = []
    for c in range(6):
        t = 0.0
        for i in range(rng.randint(1, 30)):
            t += rng.choice([1.0, 30.0, 900.0])
            rows.append(
                Row(
                    conv_id=f"c{c}",
                    turn_idx=i,
                    role=rng.choice(["user", "assistant", "system"]),
                    text="x" * rng.randint(0, 40),
                    tool=rng.choice([None, None, None, "search"]),
                    ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t),
                )
            )
    df = spark.createDataFrame(rows)
    df.persist().count()
    return df, rows


def test_conversation_summary_vs_naive(convs):
    df, rows = convs
    got = {r.conv_id: r for r in conversation_summary(df).collect()}
    by_c = defaultdict(list)
    for r in rows:
        by_c[r.conv_id].append(r)
    for c, rs in by_c.items():
        rs = sorted(rs, key=lambda r: r.turn_idx)
        g = got[c]
        n = len(rs)
        us = [int(r.ts.timestamp() * 1e6) for r in rs]
        assert g.n_turns == n
        assert g.duration_us == max(us) - min(us)
        assert g.n_roles == len({r.role for r in rs})
        assert g.tool_turns == sum(1 for r in rs if r.tool is not None)
        assert g.text_chars == sum(len(r.text) for r in rs)
        if n > 1:
            assert g.max_gap_us == max(b - a for a, b in zip(us, us[1:]))
        else:
            assert g.max_gap_us is None
        counts = Counter(r.role for r in rs)
        gini = (n * n - sum(v * v for v in counts.values())) / (n * n)
        assert abs(g.role_gini - gini) < 1e-12
        assert abs(g.mean_turn_chars - g.text_chars / n) < 1e-12


def test_conversation_summary_single_exchange(convs):
    df, _ = convs
    plan = conversation_summary(df)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Python" not in plan  # pure JVM expressions


def test_covariance_gemm_shuffles_partials_not_rows(emb):
    plan = (
        embedding_covariance(emb, strategy="gemm")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one ArrowEvalPython-free mapInPandas stage + one partial-sum agg
    assert "MapInPandas" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
