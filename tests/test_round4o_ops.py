"""Round-4 additions (fourteenth batch): rolling active users (exact +
HLL-sketched) and last-touch attribution — each vs a verbatim naive
python oracle on an adversarial synthetic event log."""

from __future__ import annotations

import datetime as dt
import hashlib
import random
from collections import Counter, defaultdict

import pytest

from featureextraction_spark.operators.activity import (
    attribution_report,
    daily_hll_registers,
    last_touch_attribution,
    rolling_active,
    rolling_active_hll,
)
from featureextraction_spark.operators.sketches import (
    HLL_EST_NUM,
    HLL_M,
    HLL_TAIL_BITS,
)

US_PER_DAY = 86_400_000_000
EPOCH = dt.datetime(1970, 1, 1)


def _mk_events(n_users=4000, n_days=12, seed=11):
    """Bursty synthetic log: multi-event days (exercising the DISTINCT
    collapse), one-shot users, ~2k+ distinct actives per trailing window
    so the raw HLL estimator is out of its small range (the portable
    contract has no log-based linear-counting correction)."""
    rng = random.Random(seed)
    rows = []
    eid = 0
    types = ["click", "view", "email", "purchase"]
    for u in range(n_users):
        n_active = rng.randint(1, 4)
        days = rng.sample(range(n_days), n_active)
        for d in days:
            for _ in range(rng.randint(1, 2)):
                us = d * US_PER_DAY + rng.randrange(US_PER_DAY)
                rows.append(
                    (
                        f"user{u:03d}",
                        f"e{eid:06d}",
                        rng.choice(types),
                        EPOCH + dt.timedelta(microseconds=us),
                        round(rng.uniform(0, 50), 3),
                    )
                )
                eid += 1
    return rows


@pytest.fixture(scope="module")
def events(spark):
    df = spark.createDataFrame(
        _mk_events(),
        "user_id string, event_id string, event_type string, "
        "ts timestamp, value double",
    )
    df.persist()
    df.count()
    return df


def _naive_user_days(rows):
    return {(u, (ts - EPOCH) // dt.timedelta(microseconds=1) // US_PER_DAY)
            for u, _e, _t, ts, _v in rows}


def test_rolling_active_vs_naive(spark, events):
    rows = [tuple(r) for r in events.collect()]
    ud = _naive_user_days(rows)
    days = sorted({d for _u, d in ud})
    want = {}
    for d in days:
        dau = sum(1 for u, dd in ud if dd == d)
        wau = len({u for u, dd in ud if d - 6 <= dd <= d})
        want[d] = (dau, wau)
    got = {
        r.day: (r.dau, r.rolling_active)
        for r in rolling_active(events, window_days=7).collect()
    }
    assert got == want


def test_rolling_active_window_one_is_dau(spark, events):
    out = rolling_active(events, window_days=1).collect()
    assert out and all(r.dau == r.rolling_active for r in out)


def _hash60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _naive_registers(users):
    regs = defaultdict(int)
    for u in users:
        h = _hash60(f"{u}:0")
        reg, tail = divmod(h, 1 << HLL_TAIL_BITS)
        rho = (HLL_TAIL_BITS + 1) - tail.bit_length() if tail else HLL_TAIL_BITS + 1
        regs[reg] = max(regs[reg], rho)
    return dict(regs)


def test_daily_hll_registers_vs_naive(spark, events):
    rows = [tuple(r) for r in events.collect()]
    ud = _naive_user_days(rows)
    by_day = defaultdict(set)
    for u, d in ud:
        by_day[d].add(u)
    want = {
        (d, reg): rho
        for d, users in by_day.items()
        for reg, rho in _naive_registers(users).items()
    }
    got = {
        (r.day, r.register): r.m_rho
        for r in daily_hll_registers(events).collect()
    }
    assert got == want


def test_rolling_active_hll_vs_naive(spark, events):
    rows = [tuple(r) for r in events.collect()]
    ud = _naive_user_days(rows)
    by_day = defaultdict(set)
    for u, d in ud:
        by_day[d].add(u)
    days = sorted(by_day)
    want = {}
    for d in days:
        win = set().union(
            *(by_day.get(dd, set()) for dd in range(d - 6, d + 1))
        )
        regs = _naive_registers(win)
        z = sum(1 << (HLL_TAIL_BITS + 1 - r) for r in regs.values())
        z += (HLL_M - len(regs)) * (1 << (HLL_TAIL_BITS + 1))
        want[d] = (z, len(regs), HLL_EST_NUM / z)
    got = {
        r.day: (r.z_sum, r.n_occupied, r.hll_active)
        for r in rolling_active_hll(events, window_days=7).collect()
    }
    assert got == want


def test_hll_estimate_tracks_exact(spark, events):
    # 256 registers → ~6.5% std error; assert within 25% on every day
    exact = {
        r.day: r.rolling_active
        for r in rolling_active(events, window_days=7).collect()
    }
    for r in rolling_active_hll(events, window_days=7).collect():
        assert abs(r.hll_active - exact[r.day]) / exact[r.day] < 0.25


def _naive_attribution(rows, conversion="purchase"):
    by_user = defaultdict(list)
    for u, e, t, ts, v in rows:
        us = (ts - EPOCH) // dt.timedelta(microseconds=1)
        by_user[u].append((us, e, t, v))
    out = []
    for u, evs in by_user.items():
        evs.sort()
        touch = None
        for _us, e, t, v in evs:
            if t == conversion:
                vq = int((v * 1e3 + 0.5) // 1)
                out.append((u, e, touch or "direct", vq))
            else:
                touch = t
    return out


def test_last_touch_attribution_vs_naive(spark, events):
    rows = [tuple(r) for r in events.collect()]
    want = sorted(_naive_attribution(rows))
    got = sorted(
        (r.user_id, r.event_id, r.channel, r.value_q)
        for r in last_touch_attribution(events).collect()
    )
    assert got == want


def test_attribution_report_vs_naive(spark, events):
    rows = [tuple(r) for r in events.collect()]
    naive = _naive_attribution(rows)
    cnt, tot = Counter(), Counter()
    for _u, _e, ch, vq in naive:
        cnt[ch] += 1
        tot[ch] += vq
    got = {
        r.channel: (r.conversions, r.value_q_sum)
        for r in attribution_report(last_touch_attribution(events)).collect()
    }
    assert got == {ch: (cnt[ch], tot[ch]) for ch in cnt}


def test_attribution_touch_is_strictly_prior(spark):
    # a purchase at the same µs as a click but later event_id IS credited
    # to it (tiebreak order); an earlier event_id purchase is not
    t0 = EPOCH + dt.timedelta(days=1)
    df = spark.createDataFrame(
        [
            ("u1", "e1", "click", t0, 1.0),
            ("u1", "e2", "purchase", t0, 10.0),  # after e1 in tiebreak
            ("u2", "e0", "purchase", t0, 5.0),  # before u2's click e9
            ("u2", "e9", "click", t0, 1.0),
        ],
        "user_id string, event_id string, event_type string, "
        "ts timestamp, value double",
    )
    got = {
        r.event_id: r.channel for r in last_touch_attribution(df).collect()
    }
    assert got == {"e2": "click", "e0": "direct"}


def test_daily_moments_merge_vs_direct(spark, events):
    """Window-merged partials must equal moments computed DIRECTLY on
    the window's raw rows — the mergeability identity the lambda
    pattern rests on."""
    from featureextraction_spark.operators.activity import (
        daily_moments,
        merge_moments,
    )

    rows = [tuple(r) for r in events.collect()]
    raw = defaultdict(list)
    for _u, _e, t, ts, v in rows:
        d = (ts - EPOCH) // dt.timedelta(microseconds=1) // US_PER_DAY
        raw[(d, t)].append(int((v * 1e3 + 0.5) // 1))
    days = sorted({d for d, _t in raw})
    types = sorted({t for _d, t in raw})
    want = {}
    for d in days:
        for t in types:
            win = [
                q
                for dd in range(d - 6, d + 1)
                for q in raw.get((dd, t), [])
            ]
            if win:
                want[(d, t)] = (
                    len(win), sum(win), min(win), max(win),
                    sum(q * q for q in win),
                )
    merged = merge_moments(daily_moments(events), window_days=7)
    got = {
        (r.day, r.event_type): (r.n, r.sum_q, r.min_q, r.max_q, r.sum_sq)
        for r in merged.collect()
    }
    assert got == want
    for r in merged.collect():
        assert r.mean_q == r.sum_q / r.n
