"""Round-5 additions (fourth batch): PSI drift bins, mutual information,
Mann-Whitney U, and IPS off-policy evaluation vs verbatim naive oracles."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from featureextraction_spark.operators.drift import psi_bins
from featureextraction_spark.operators.evaluation import (
    ips_evaluate,
    mann_whitney_u,
    mutual_information,
)


def _hash60(key: str, seed: int) -> int:
    return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:15], 16)


def test_psi_bins_vs_naive(spark):
    rows = [(i, (i * i) % 211 + 5) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    got = {r["bin"]: r for r in psi_bins(df, "v", "doc_id", bin_width=50).collect()}

    ca: Counter = Counter()
    cb: Counter = Counter()
    for i, v in rows:
        b = v // 50
        (ca if _hash60(str(i), 42) % 2 == 0 else cb)[b] += 1
    bins = set(ca) | set(cb)
    na, nb, k = sum(ca.values()), sum(cb.values()), len(bins)
    assert set(got) == bins
    total_psi = 0.0
    for b in bins:
        r = got[b]
        assert (r["n_a"], r["n_b"]) == (ca[b], cb[b])
        pa = (2 * ca[b] + 1) / (2 * na + k)
        pb = (2 * cb[b] + 1) / (2 * nb + k)
        want = (pa - pb) * math.log(pa / pb)
        assert abs(r["psi_term"] - want) < 1e-12, b
        assert r["psi_term"] >= 0.0  # each PSI term is nonnegative
        total_psi += r["psi_term"]
    # the two halves come from the same distribution: PSI well under the
    # 0.1 "no shift" industry threshold
    assert total_psi < 0.1


def test_psi_bins_detects_planted_shift(spark):
    # half A (even hash) unchanged, but values depend on the hash half:
    # plant a +500 shift for one deterministic subset via the id hash
    rows = []
    for i in range(400):
        shifted = _hash60(str(i), 42) % 2 == 0
        rows.append((i, 100 + (500 if shifted else 0) + (i % 40)))
    df = spark.createDataFrame(rows, "doc_id long, v long")
    out = psi_bins(df, "v", "doc_id", bin_width=50).collect()
    assert sum(r["psi_term"] for r in out) > 0.25  # "major shift" range


def test_mutual_information_vs_naive(spark):
    rows = []
    # correlated pair: b echoes a 70% of the time on a fixed pattern
    for i in range(500):
        a = f"a{i % 4}"
        b = a if i % 10 < 7 else f"a{(i + 1) % 4}"
        rows.append((a, b))
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]

    n = len(rows)
    cells = Counter(rows)
    ma = Counter(a for a, _ in rows)
    mb = Counter(b for _, b in rows)
    mi = sum(
        (c / n) * math.log(n * c / (ma[a] * mb[b])) for (a, b), c in cells.items()
    )
    h_a = -sum((v / n) * math.log(v / n) for v in ma.values())
    h_b = -sum((v / n) * math.log(v / n) for v in mb.values())
    assert (r["n"], r["n_cells"]) == (n, len(cells))
    assert abs(r["mi"] - mi) < 1e-9
    assert abs(r["h_a"] - h_a) < 1e-9
    assert abs(r["h_b"] - h_b) < 1e-9
    assert abs(r["nmi"] - mi / math.sqrt(h_a * h_b)) < 1e-9
    # sanity: strong association -> MI well above 0, below min entropy
    assert 0.3 < r["mi"] <= min(h_a, h_b) + 1e-12


def test_mutual_information_independent_and_degenerate(spark):
    # independent uniform pair: MI exactly 0 on a balanced grid
    rows = [(f"a{i % 3}", f"b{(i // 3) % 5}") for i in range(300)]
    r = mutual_information(
        spark.createDataFrame(rows, "x string, y string"), "x", "y"
    ).collect()[0]
    assert abs(r["mi"]) < 1e-12
    # single category on one side: h_a = 0, nmi NULL
    rows2 = [("k", f"b{i % 4}") for i in range(40)]
    r2 = mutual_information(
        spark.createDataFrame(rows2, "x string, y string"), "x", "y"
    ).collect()[0]
    assert r2["h_a"] == 0.0 and r2["nmi"] is None


def _naive_mwu(pairs):
    """pairs: (value, is_a). Returns n1, n2, two_r1, two_u1, tie_sum, u1, z."""
    vals = sorted({v for v, _ in pairs})
    c = Counter(v for v, _ in pairs)
    ca = Counter(v for v, ia in pairs if ia)
    n1 = sum(ca.values())
    n2 = len(pairs) - n1
    cum = 0
    two_r1 = 0
    tie_sum = 0
    for v in vals:
        two_r1 += ca[v] * (2 * cum + c[v] + 1)
        tie_sum += c[v] ** 3 - c[v]
        cum += c[v]
    two_u1 = 2 * n1 * n2 + n1 * (n1 + 1) - two_r1
    u1 = two_u1 / 2.0
    n = float(n1 + n2)
    var_u = (n1 * n2 / 12.0) * ((n + 1.0) - tie_sum / (n * (n - 1.0)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var_u) if var_u > 0 else None
    return n1, n2, two_r1, two_u1, tie_sum, u1, z


def test_mann_whitney_vs_naive(spark):
    from featureextraction_spark.operators.cache import (
        release_persisted_intermediates,
    )

    # group A stochastically larger, heavy ties (values quantized to 12)
    pairs = [((7 * i * i + 3 * i) % 12 + (8 if i % 3 == 0 else 0), i % 3 == 0)
             for i in range(240)]
    df = spark.createDataFrame(
        [(i, v, ia) for i, (v, ia) in enumerate(pairs)],
        "id long, v long, ia boolean",
    )
    r = mann_whitney_u(df, "v", F.col("ia")).collect()[0]
    release_persisted_intermediates()
    n1, n2, two_r1, two_u1, tie_sum, u1, z = _naive_mwu(pairs)
    assert (r["n1"], r["n2"], r["two_r1"], r["two_u1"], r["tie_sum"]) == (
        n1, n2, two_r1, two_u1, tie_sum,
    )
    assert r["u1"] == u1
    assert abs(r["z"] - z) < 1e-12
    # planted direction: A larger -> U1 above its mean -> z > 0... U is
    # counted for the B side in this parameterization; just check sign
    # consistency with the naive oracle (already equal) and magnitude
    assert abs(r["z"]) > 2.0  # the planted shift is detectable


def test_mann_whitney_no_ties_matches_rank_formula(spark):
    from featureextraction_spark.operators.cache import (
        release_persisted_intermediates,
    )

    pairs = [(i * 3 + (1 if i % 2 else 0), i % 2 == 0) for i in range(100)]
    df = spark.createDataFrame(
        [(i, v, ia) for i, (v, ia) in enumerate(pairs)],
        "id long, v long, ia boolean",
    )
    r = mann_whitney_u(df, "v", F.col("ia")).collect()[0]
    release_persisted_intermediates()
    assert r["tie_sum"] == 0
    # classic check: R1 = sum of 1-based ranks of the A sample
    ranks = {v: k + 1 for k, v in enumerate(sorted(v for v, _ in pairs))}
    r1 = sum(ranks[v] for v, ia in pairs if ia)
    assert r["two_r1"] == 2 * r1


def test_ips_evaluate_vs_naive(spark):
    rows = [
        (i, ["x", "y", "z"][i % 3], (i * i) % 5)  # logged action + reward
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "uid long, act string, rew long")
    target = F.when(F.col("uid") % 2 == 0, F.lit("x")).otherwise(F.lit("y"))
    out = {r["action"]: r for r in ips_evaluate(
        df, F.col("act"), target, F.col("rew")).collect()}

    per: dict[str, list[int]] = {}
    for uid, act, rew in rows:
        tgt = "x" if uid % 2 == 0 else "y"
        cnt, m, mr = per.setdefault(act, [0, 0, 0])
        per[act] = [cnt + 1, m + (tgt == act), mr + (rew if tgt == act else 0)]
    ips = sum(mr / cnt for cnt, _, mr in per.values())
    wsum = sum(m / cnt for cnt, m, _ in per.values())
    for act, (cnt, m, mr) in per.items():
        r = out[act]
        assert (r["cnt"], r["matched"], r["matched_r"]) == (cnt, m, mr)
        assert abs(r["ips_term"] - mr / cnt) < 1e-12
        assert r["snips"] is None
    tot = out["__total"]
    assert tot["cnt"] == len(rows)
    assert abs(tot["ips_term"] - ips) < 1e-12
    assert abs(tot["snips"] - ips / wsum) < 1e-12
    # 'z' never matches the deterministic target: contributes 0 weight
    assert out["z"]["matched"] == 0 and out["z"]["ips_term"] == 0.0


def test_ips_evaluate_never_matched_total(spark):
    # target policy outside the logged action set: IPS estimate 0, snips NULL
    df = spark.createDataFrame(
        [(i, "a", 1) for i in range(10)], "uid long, act string, rew long"
    )
    out = {r["action"]: r for r in ips_evaluate(
        df, F.col("act"), F.lit("other"), F.col("rew")).collect()}
    assert out["__total"]["ips_term"] == 0.0
    assert out["__total"]["snips"] is None
