"""Round-4 additions (twenty-first batch): OHLC resampling, per-slice
ROC-AUC, lift/gains deciles, order-insensitive table fingerprint — each
vs a verbatim naive python oracle."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import random
from collections import defaultdict

from featureextraction_spark.operators.evaluation import (
    gains_table,
    roc_auc_by,
)
from featureextraction_spark.operators.profiling import table_fingerprint
from featureextraction_spark.operators.rolling import resample_bars

EPOCH = dt.datetime(1970, 1, 1)
BUCKET_US = 3_600 * 1_000_000  # 1h buckets for the test


def test_resample_bars_vs_naive(spark):
    rng = random.Random(67)
    rows = []
    for u in range(20):
        t = rng.randrange(0, 48 * BUCKET_US)
        for i in range(rng.randint(1, 40)):
            t += rng.randrange(1, BUCKET_US)
            rows.append((u, u * 1000 + i, EPOCH + dt.timedelta(microseconds=t),
                         round(rng.uniform(0, 50), 3)))
    # same-ts tie: two events in one microsecond, tie-broken by event_id
    ts0 = EPOCH + dt.timedelta(microseconds=5 * BUCKET_US + 17)
    rows += [(99, 2, ts0, 1.0), (99, 1, ts0, 2.0)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = {
        (r.user_id, r.bucket): (r.n, r.open_q, r.high_q, r.low_q,
                                r.close_q, r.sum_q)
        for r in resample_bars(df, bucket_us=BUCKET_US).collect()
    }
    want = defaultdict(list)
    for u, eid, ts, v in rows:
        us = (ts - EPOCH) // dt.timedelta(microseconds=1)
        want[(u, us // BUCKET_US)].append((us, eid, math.floor(v * 10000 + 0.5)))
    exp = {}
    for k, evs in want.items():
        evs.sort()
        qs = [q for _, _, q in evs]
        exp[k] = (len(qs), evs[0][2], max(qs), min(qs), evs[-1][2], sum(qs))
    assert got == exp
    assert got[(99, 5)][1] == 20000 and got[(99, 5)][4] == 10000


def test_roc_auc_by_matches_global_per_group(spark):
    from featureextraction_spark.operators.evaluation import roc_auc

    rng = random.Random(71)
    rows = [(rng.choice(["a", "b", "c"]), round(rng.uniform(0, 1), 3),
             int(rng.random() < 0.4)) for _ in range(600)]
    rows += [("d", 0.5, 1), ("d", 0.7, 1)]  # degenerate: no negatives
    df = spark.createDataFrame(rows, "grp string, score double, label long")
    by = {r.grp: (r.n_pos, r.n_neg, r.auc_num2, r.auc)
          for r in roc_auc_by(df, "grp").collect()}
    for g in ("a", "b", "c"):
        sub = df.where(df.grp == g)
        want = roc_auc(sub).collect()[0]
        assert by[g][:3] == (want.n_pos, want.n_neg, want.auc_num2)
        assert abs(by[g][3] - want.auc) < 1e-12
    assert by["d"][3] is None


def test_gains_table_vs_naive(spark):
    rng = random.Random(73)
    rows = [(i, round(rng.uniform(0, 1), 4),
             int(rng.random() < 0.3 * (1 + rng.random())))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "event_id long, score double, label long")
    out = {r.bucket: (r.n, r.n_pos, r.cum_n, r.cum_pos, r.lift)
           for r in gains_table(df).collect()}
    ranked = sorted(rows, key=lambda r: (-math.floor(r[1] * 10000 + 0.5), -r[0]))
    n, npos = len(rows), sum(y for _, _, y in rows)
    per = defaultdict(lambda: [0, 0])
    for rk, (_, _, y) in enumerate(ranked):
        b = rk * 10 // n
        per[b][0] += 1
        per[b][1] += y
    cn = cp = 0
    for b in sorted(per):
        cn += per[b][0]
        cp += per[b][1]
        want_lift = (cp * n) / (cn * npos)
        assert out[b][:4] == (per[b][0], per[b][1], cn, cp)
        assert abs(out[b][4] - want_lift) < 1e-12
    # gains sanity: the top decile must over-index the base rate
    assert out[0][4] > 1.0
    assert abs(out[9][4] - 1.0) < 1e-12  # full population = base rate


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_table_fingerprint_vs_naive_and_order_insensitive(spark):
    rows = [(1, "a", 10), (2, None, 20), (3, "c", None)]
    want = sum(
        _h60(f"{i}|{c if c is not None else '␀'}|{v if v is not None else '␀'}")
        for i, c, v in rows
    ) % ((1 << 61) - 1)
    df1 = spark.createDataFrame(rows, "id long, cat string, v long")
    df2 = spark.createDataFrame(rows[::-1], "id long, cat string, v long")
    r1 = table_fingerprint(df1, ["id", "cat", "v"]).collect()[0]
    r2 = table_fingerprint(
        df2.repartition(7), ["id", "cat", "v"]
    ).collect()[0]
    assert r1.n_rows == 3 and r1.fingerprint == want
    assert (r2.n_rows, r2.fingerprint) == (r1.n_rows, r1.fingerprint)
    # any single-value change must move the fingerprint
    df3 = spark.createDataFrame(
        [(1, "a", 10), (2, None, 21), (3, "c", None)], "id long, cat string, v long"
    )
    assert table_fingerprint(df3, ["id", "cat", "v"]).collect()[0].fingerprint != want


def test_out_of_order_profile_vs_naive(spark):
    from featureextraction_spark.operators.profiling import out_of_order_profile

    rng = random.Random(79)
    rows = []
    for u in range(15):
        t = rng.randrange(0, 10**9)
        for i in range(rng.randint(2, 30)):
            t += rng.randrange(1, 10**6)
            # arrival jitter makes some events land late
            rows.append((u, u * 1000 + i, t, t + rng.randrange(0, 500_000)))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, t long, arrival_us long"
    ).selectExpr(
        "user_id", "event_id", "arrival_us",
        "CAST(to_timestamp(CAST(t AS DOUBLE) / 1000000.0) AS timestamp) AS ts",
    )
    got = {r.bucket: (r.n_events, r.max_late_us)
           for r in out_of_order_profile(
               df, arrival=("arrival_us", "event_id")).collect()}
    per = defaultdict(list)
    for u, eid, t, a in rows:
        per[u].append((a, eid, t))
    want = defaultdict(lambda: [0, 0])
    for evs in per.values():
        evs.sort()
        mx = None
        for _, _, t in evs:
            late = max(0, (mx - t)) if mx is not None else 0
            b = late.bit_length() if late > 0 else 0
            want[b][0] += 1
            want[b][1] = max(want[b][1], late)
            mx = t if mx is None else max(mx, t)
    assert got == {b: tuple(v) for b, v in want.items()}
    assert 0 in got and len(got) > 1  # both in-order and late mass


def test_combine_moments_equals_from_scratch(spark):
    from featureextraction_spark.operators.activity import (
        combine_moments,
        daily_moments,
    )

    rng = random.Random(83)
    rows = []
    for i in range(400):
        t = rng.randrange(0, 20 * 86_400_000_000)
        rows.append((rng.choice(["a", "b"]),
                     EPOCH + dt.timedelta(microseconds=t),
                     round(rng.uniform(-5, 50), 3)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    cutoff = EPOCH + dt.timedelta(days=10)
    old = daily_moments(df.where(df.ts < cutoff))
    delta = daily_moments(df.where(df.ts >= cutoff))
    merged = {r.event_type: (r.n, r.sum_q, r.min_q, r.max_q, r.sum_sq)
              for r in combine_moments(old.unionByName(delta)).collect()}
    scratch = {r.event_type: (r.n, r.sum_q, r.min_q, r.max_q, r.sum_sq)
               for r in combine_moments(daily_moments(df)).collect()}
    assert merged == scratch and len(merged) == 2


def test_association_rules_vs_naive(spark):
    from featureextraction_spark.operators.graph import association_rules

    rng = random.Random(89)
    baskets = []
    for b in range(60):
        items = rng.sample(range(12), rng.randint(1, 5))
        for i in items:
            baskets.append((b, i))
            if rng.random() < 0.3:
                baskets.append((b, i))  # duplicate rows must not inflate
    df = spark.createDataFrame(baskets, "basket_id long, item long")
    got = {(r.ante, r.cons): (r.pair_n, r.ante_n, r.cons_n, r.n_baskets,
                              r.confidence, r.lift)
           for r in association_rules(df, min_pair_support=2).collect()}
    sets = defaultdict(set)
    for b, i in baskets:
        sets[b].add(i)
    item_n = defaultdict(int)
    pair_n = defaultdict(int)
    for s in sets.values():
        for i in s:
            item_n[i] += 1
        for i in s:
            for j in s:
                if i != j:
                    pair_n[(i, j)] += 1
    nb = len(sets)
    want = {}
    for (i, j), pn in pair_n.items():
        if pn >= 2:
            want[(i, j)] = (pn, item_n[i], item_n[j], nb,
                            pn / item_n[i], pn * nb / (item_n[i] * item_n[j]))
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k][:4] == v[:4]
        assert abs(got[k][4] - v[4]) < 1e-12 and abs(got[k][5] - v[5]) < 1e-12


def test_tree_paths_vs_naive_forest(spark):
    from featureextraction_spark.operators.graph import tree_paths

    rng = random.Random(97)
    # random forest incl. a deep chain (depth 200 → needs log rounds)
    rows = [(0, None)]
    for i in range(1, 300):
        rows.append((i, rng.randrange(0, i) if rng.random() < 0.9 else None))
    chain_base = 1000
    rows.append((chain_base, None))
    for i in range(1, 200):
        rows.append((chain_base + i, chain_base + i - 1))
    rows.append((5000, 4999))  # dangling parent: 4999 has no node row
    df = spark.createDataFrame(rows, "id long, parent long")
    got = {r.id: (r.root_id, r.depth) for r in tree_paths(df).collect()}

    bykid = dict(rows)
    def naive(i):
        d = 0
        while bykid.get(i) is not None:
            p = bykid[i]
            if p not in bykid:
                return p, d + 1
            i = p
            d += 1
        return i, d
    want = {i: naive(i) for i, _ in rows}
    assert got == want
    assert got[chain_base + 199] == (chain_base, 199)
    assert got[5000] == (4999, 1)
