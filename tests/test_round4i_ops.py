"""Round-4 additions (ninth batch) — one-pass funnel, cohort retention,
bucketized range join, seasonal hour-of-day baseline — vs naive python
oracles, incl. the range join vs a brute-force theta scan and the
funnel's strict-ordering edge cases."""

from __future__ import annotations

import datetime as dt
import math
import random
from collections import defaultdict

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from featureextraction_spark.operators.cohorts import (
    cohort_retention,
    seasonal_baseline,
)
from featureextraction_spark.operators.funnel import funnel_steps
from featureextraction_spark.operators.intervals import bucketed_range_join

US = 1_000_000
WEEK_US = 7 * 86_400 * US
HOUR_US = 3_600 * US
DAY_US = 24 * HOUR_US


@pytest.fixture(scope="module")
def events(spark):
    """Adversarial: same-µs view/click ties (must NOT chain), funnels
    completed out of order, users missing steps, week-boundary first
    events, hour-boundary timestamps, negative values."""
    rng = random.Random(99)
    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for u in range(40):
        t = rng.uniform(0, 30 * 86400)
        for _ in range(rng.randint(2, 60)):
            t += rng.choice([0.0, 1.0, 59.0, 1800.0, 3600.0, 86399.0])
            rows.append(
                Row(
                    event_id=eid,
                    user_id=u,
                    event_type=rng.choice(
                        ["view", "click", "purchase", "error", "signup"]
                    ),
                    ts=base + dt.timedelta(seconds=t),
                    value=round(rng.uniform(-5, 5), 3),
                )
            )
            eid += 1
    # exact tie: view and click at the identical µs — click must NOT chain
    tie = base + dt.timedelta(seconds=999)
    rows.append(Row(event_id=eid, user_id=777, event_type="view", ts=tie, value=1.0))
    rows.append(
        Row(event_id=eid + 1, user_id=777, event_type="click", ts=tie, value=1.0)
    )
    df = spark.createDataFrame(rows)
    df.persist().count()
    return df, rows


def _us(ts) -> int:
    return int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * US)


def _naive_funnel(rows, steps=("view", "click", "purchase")):
    by_u = defaultdict(list)
    for r in rows:
        by_u[r.user_id].append(r)
    out = {}
    for u, rs in by_u.items():
        rs = sorted(rs, key=lambda r: (_us(r.ts), r.event_id))
        runs = [None] * len(steps)  # earliest valid completion per step
        for r in rs:
            us = _us(r.ts)
            for k, s in enumerate(steps):
                if r.event_type != s:
                    continue
                if k == 0 or (runs[k - 1] is not None and runs[k - 1] < us):
                    if runs[k] is None or us < runs[k]:
                        runs[k] = us
        out[u] = runs
    return out


def test_funnel_vs_naive_and_tie_no_chain(spark, events):
    df, rows = events
    got = {r.user_id: r for r in funnel_steps(df, ("view", "click", "purchase")).collect()}
    exp = _naive_funnel(rows)
    assert set(got) == set(exp)
    for u, runs in exp.items():
        g = got[u]
        assert (g.step0_us, g.step1_us, g.step2_us) == tuple(runs), u
        assert g.steps_completed == sum(1 for x in runs if x is not None)
        if runs[0] is not None and runs[1] is not None:
            assert g.gap1_us == runs[1] - runs[0]
    # the same-µs tie user: view seen, click must not chain
    g = got[777]
    assert g.step0_us is not None and g.step1_us is None and g.steps_completed == 1


def test_cohort_retention_vs_naive(spark, events):
    df, rows = events
    got = {
        (r.cohort_week, r.week_offset): (r.active_users, r.cohort_users)
        for r in cohort_retention(df).collect()
    }
    weeks = defaultdict(set)
    first = {}
    for r in rows:
        w = _us(r.ts) // WEEK_US
        first[r.user_id] = min(first.get(r.user_id, w), w)
    cohort_sizes = defaultdict(int)
    for u, cw in first.items():
        cohort_sizes[cw] += 1
    for r in rows:
        w = _us(r.ts) // WEEK_US
        weeks[(first[r.user_id], w - first[r.user_id])].add(r.user_id)
    exp = {
        k: (len(v), cohort_sizes[k[0]]) for k, v in weeks.items()
    }
    assert got == exp
    # offset-0 cell of every cohort contains the full cohort
    for cw, size in cohort_sizes.items():
        assert got[(cw, 0)][0] == size


def test_bucketed_range_join_equals_theta(spark, events):
    df, rows = events
    us = F.unix_micros(F.col("ts"))
    win = 1800 * US
    purch = df.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        us.alias("start_us"),
        (us + F.lit(win)).alias("end_us"),
    )
    clicks = df.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), us.alias("us")
    )
    # deliberately small buckets => multi-bucket intervals exercised
    got = {
        (r.purchase_id, r.click_id)
        for r in bucketed_range_join(
            clicks, purch, by="user_id", bucket_us=600 * US
        ).collect()
    }
    exp = set()
    by_u = defaultdict(lambda: ([], []))
    for r in rows:
        if r.event_type == "purchase":
            by_u[r.user_id][0].append(r)
        elif r.event_type == "click":
            by_u[r.user_id][1].append(r)
    for u, (ps, cs) in by_u.items():
        for p in ps:
            for c in cs:
                if _us(p.ts) <= _us(c.ts) <= _us(p.ts) + win:
                    exp.add((p.event_id, c.event_id))
    assert got == exp
    assert exp  # fixture produces matches


def test_bucketed_range_join_caps_fanout(spark, events):
    df, _ = events
    us = F.unix_micros(F.col("ts"))
    purch = df.limit(5).select(
        "user_id",
        us.alias("start_us"),
        (us + F.lit(30 * DAY_US)).alias("end_us"),
    )
    clicks = df.select("user_id", us.alias("us"))
    with pytest.raises(ValueError, match="buckets"):
        bucketed_range_join(
            clicks, purch, by="user_id", bucket_us=60 * US,
            max_buckets_per_interval=100,
        )


def test_seasonal_baseline_vs_naive(spark, events):
    df, rows = events
    got = {r.event_id: r for r in seasonal_baseline(df).collect()}
    groups = defaultdict(list)
    for r in rows:
        hour = (_us(r.ts) % DAY_US) // HOUR_US
        q = math.floor(r.value * 1e3 + 0.5)
        groups[(r.event_type, hour)].append((r.event_id, q))
    for (etype, hour), members in groups.items():
        qs = [q for _, q in members]
        n = len(qs)
        mu = sum(qs) / n if n else None
        for eid, q in members:
            g = got[eid]
            assert (g.event_type, g.hour, g.vq, g.n) == (etype, hour, q, n)
            if n > 1:
                var = (sum(x * x for x in qs) - sum(qs) * sum(qs) / n) / (n - 1)
                if var > 0:
                    assert g.seasonal_z == pytest.approx(
                        (q - mu) / math.sqrt(var), rel=1e-9
                    )
                else:
                    assert g.seasonal_z is None
            else:
                assert g.seasonal_z is None
