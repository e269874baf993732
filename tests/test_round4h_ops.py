"""Round-4 additions (eighth batch) — Count-Min and HyperLogLog sketches
vs naive python replicas of the md5/bit contracts, plus the CMS
over-estimate guarantee and HLL accuracy sanity."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from featureextraction_spark.operators.sketches import (
    HLL_EST_NUM,
    count_min_estimate,
    count_min_sketch,
    hll_estimate,
    hll_registers,
)

TAIL = 1 << 52


def _h(s: str, seed: int) -> int:
    return int(hashlib.md5(f"{s}:{seed}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def words(spark):
    # zipf-ish repetition plus unicode terms
    vals = []
    for i in range(3000):
        vals.append(f"w{i % 500}")
    vals += ["völlig", "überall", "naïve"] * 7
    df = spark.createDataFrame([(w,) for w in vals], schema="term string")
    df.persist().count()
    return df, vals


def test_count_min_sketch_vs_naive(spark, words):
    df, vals = words
    got = {
        (r.d, r.bucket): r.cell_count
        for r in count_min_sketch(df, "term", depth=4, width=256).collect()
    }
    exp = defaultdict(int)
    for w in vals:
        h0, h1 = _h(w, 0), _h(w, 1)
        for d in range(4):
            exp[(d, (h0 + d * h1) % 256)] += 1
    assert got == dict(exp)


def test_count_min_estimate_exact_and_overestimate(spark, words):
    df, vals = words
    cms = count_min_sketch(df, "term", depth=4, width=256)
    probes = spark.createDataFrame(
        [("w0",), ("w499",), ("naïve",), ("absent_zz",)], schema="term string"
    )
    got = {
        r.term: r.cm_estimate
        for r in count_min_estimate(cms, probes, "term").collect()
    }
    true = Counter(vals)
    # naive replay: min over rows of the naive cell counts
    cells = defaultdict(int)
    for w in vals:
        h0, h1 = _h(w, 0), _h(w, 1)
        for d in range(4):
            cells[(d, (h0 + d * h1) % 256)] += 1
    for t in ["w0", "w499", "naïve", "absent_zz"]:
        h0, h1 = _h(t, 0), _h(t, 1)
        exp = min(cells[(d, (h0 + d * h1) % 256)] for d in range(4))
        assert got[t] == exp
        assert got[t] >= true[t]  # CMS never under-estimates
    assert got["absent_zz"] >= 0


def _naive_registers(items):
    regs = defaultdict(int)
    for w in set(items):  # max over duplicates == max over distinct
        h = _h(w, 0)
        j, tail = divmod(h, TAIL)
        rho = 53 - tail.bit_length() if tail > 0 else 53
        regs[j] = max(regs[j], rho)
    return regs


def test_hll_registers_vs_naive(spark, words):
    df, vals = words
    got = {r.register: (r.m_rho, r.z) for r in hll_registers(df, "term").collect()}
    assert len(got) == 256
    exp = _naive_registers(vals)
    for j in range(256):
        m = exp.get(j, 0)
        assert got[j] == (m, 1 << (53 - m))


def test_hll_estimate_formula_and_accuracy(spark, words):
    df, vals = words
    est = hll_estimate(hll_registers(df, "term")).collect()[0]
    exp_regs = _naive_registers(vals)
    z_sum = sum(1 << (53 - exp_regs.get(j, 0)) for j in range(256))
    assert est.z_sum == z_sum
    assert est.n_zero_regs == 256 - len([j for j in exp_regs if exp_regs[j] > 0])
    assert est.hll_estimate == pytest.approx(HLL_EST_NUM / z_sum, rel=1e-12)
    # 503 distinct terms, 256 registers: expect single-digit-% error
    true_distinct = len(set(vals))
    assert abs(est.hll_estimate - true_distinct) / true_distinct < 0.25


def test_sketches_are_mergeable(spark, words):
    """The 100-TB property: sketch(A ∪ B) == merge(sketch(A), sketch(B))
    — CMS cells add, HLL registers max."""
    df, vals = words
    # disjoint multiset halves by term hash (subtract would dedup)
    df2 = df.withColumn("h", F.crc32(F.col("term")))
    a = df2.filter(F.col("h") % 2 == 0).drop("h")
    b = df2.filter(F.col("h") % 2 == 1).drop("h")
    whole = {
        (r.d, r.bucket): r.cell_count
        for r in count_min_sketch(df, "term").collect()
    }
    pa = {
        (r.d, r.bucket): r.cell_count
        for r in count_min_sketch(a, "term").collect()
    }
    pb = {
        (r.d, r.bucket): r.cell_count
        for r in count_min_sketch(b, "term").collect()
    }
    merged = Counter(pa)
    merged.update(pb)
    assert dict(merged) == whole
    ra = {r.register: r.m_rho for r in hll_registers(a, "term").collect()}
    rb = {r.register: r.m_rho for r in hll_registers(b, "term").collect()}
    rw = {r.register: r.m_rho for r in hll_registers(df, "term").collect()}
    assert {j: max(ra[j], rb[j]) for j in rw} == rw
