"""Round-4 additions (third batch) — trailing time-window rolling
features, leakage-free cumulative target encoding, role-transition
latency matrix and the length histogram — vs naive python oracles and
(for the encoder) the single-window spec."""

from __future__ import annotations

import datetime as dt
import math
import random
from collections import defaultdict

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from featureextraction_spark.operators.encoding import (
    cumulative_target_encode,
    cumulative_target_encode_simple,
)
from featureextraction_spark.operators.profiling import length_histogram
from featureextraction_spark.operators.rolling import rolling_time_features
from featureextraction_spark.operators.turns import role_transition_latency


def _ts(i: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


@pytest.fixture(scope="module")
def events(spark):
    """Adversarial mini-stream: timestamp TIES within a conversation
    (range-frame peers), window-boundary hits (exactly 300 s apart),
    and a category whose first row must encode to NULL."""
    rng = random.Random(7)
    rows = []
    eid = 0
    for conv in ("c1", "c2", "c3"):
        t = 0.0
        for i in range(40):
            # ties: every 7th event repeats the previous timestamp
            if i % 7 != 0 or i == 0:
                t += rng.choice([1.0, 5.0, 60.0, 300.0])
            rows.append(
                Row(
                    conv_id=conv,
                    event_id=eid,
                    ts=_ts(t),
                    role=rng.choice(["user", "assistant", "system"]),
                    tool=rng.choice([None, None, "search", "code"]),
                    value=round(rng.uniform(-5, 5), 3),
                )
            )
            eid += 1
    df = spark.createDataFrame(rows)
    df.persist().count()
    return df


def test_rolling_time_features_vs_naive(events):
    out = rolling_time_features(
        events, key="conv_id", ts="ts", role="role", tool="tool",
        value="value", window_sec=300,
    )
    got = {r.event_id: r for r in out.collect()}

    rows = events.collect()
    by_conv = defaultdict(list)
    for r in rows:
        by_conv[r.conv_id].append(r)
    for conv, rs in by_conv.items():
        for r in rs:
            lo = r.ts - dt.timedelta(seconds=300)
            win = [x for x in rs if lo <= x.ts <= r.ts]
            g = got[r.event_id]
            assert g.win_turns == len(win)
            assert g.win_tool_turns == sum(1 for x in win if x.tool is not None)
            assert g.win_roles == len({x.role for x in win})
            sum_q = sum(math.floor(x.value * 1e6 + 0.5) for x in win)
            assert g.win_value_sum_q == sum_q
            assert g.win_value_mean == pytest.approx(sum_q / (1e6 * len(win)))


def test_rolling_ties_are_peers(spark):
    """Rows sharing a timestamp see each other (RANGE peers), whatever
    their event_id order."""
    rows = [
        Row(conv_id="c", event_id=0, ts=_ts(0), role="u", tool=None, value=1.0),
        Row(conv_id="c", event_id=1, ts=_ts(0), role="a", tool="t", value=2.0),
    ]
    out = rolling_time_features(spark.createDataFrame(rows)).collect()
    assert {r.win_turns for r in out} == {2}
    assert {r.win_roles for r in out} == {2}
    assert {r.win_value_sum_q for r in out} == {3_000_000}


def test_target_encode_two_phase_equals_simple(events):
    kw = dict(category="role", ts="ts", tie=("event_id",), value="value")
    cols = ["event_id", "prior_n", "prior_sum_q", "te_mean"]
    for bucket_sec in (60, 86_400):  # many buckets / one bucket
        fast = (
            cumulative_target_encode(events, bucket_sec=bucket_sec, **kw)
            .select(cols)
            .collect()
        )
        spec = cumulative_target_encode_simple(events, **kw).select(cols).collect()
        assert sorted(fast) == sorted(spec)


def test_target_encode_naive_and_leakage_free(events):
    out = cumulative_target_encode(
        events, category="role", ts="ts", tie=("event_id",), value="value"
    )
    got = {r.event_id: r for r in out.collect()}

    rows = sorted(events.collect(), key=lambda r: (r.ts, r.event_id))
    seen: dict = defaultdict(lambda: (0, 0))
    for r in rows:
        n, s = seen[r.role]
        g = got[r.event_id]
        assert g.prior_n == n
        assert g.prior_sum_q == s
        if n == 0:
            assert g.te_mean is None  # first occurrence: no prior evidence
        else:
            assert g.te_mean == pytest.approx(s / (1e6 * n))
        seen[r.role] = (n + 1, s + math.floor(r.value * 1e6 + 0.5))


def test_target_encode_ignores_future_rows(spark, events):
    """Appending strictly-later rows must not change any existing
    encoding (the zero-temporal-leakage property)."""
    extra = spark.createDataFrame(
        [("cX", 10_000, _ts(10**6), "user", None, 99.0)],
        schema=events.schema,
    )
    base = cumulative_target_encode(
        events, category="role", ts="ts", tie=("event_id",), value="value"
    )
    grown = cumulative_target_encode(
        events.unionByName(extra), category="role", ts="ts",
        tie=("event_id",), value="value",
    ).filter(F.col("event_id") < 10_000)
    cols = ["event_id", "prior_n", "prior_sum_q"]
    assert sorted(base.select(cols).collect()) == sorted(
        grown.select(cols).collect()
    )


def test_transition_latency_vs_naive(events):
    got = {
        (r.prev_role, r.role): r for r in role_transition_latency(
            events, key="conv_id", order="event_id", role="role", ts="ts"
        ).collect()
    }

    agg = defaultdict(list)
    by_conv = defaultdict(list)
    for r in sorted(events.collect(), key=lambda r: r.event_id):
        by_conv[r.conv_id].append(r)
    for rs in by_conv.values():
        for prev, cur in zip(rs, rs[1:]):
            gap = int((cur.ts - prev.ts).total_seconds() * 1e6)
            agg[(prev.role, cur.role)].append(gap)
    assert set(got) == set(agg)
    for k, gaps in agg.items():
        g = got[k]
        assert g.n == len(gaps)
        assert g.gap_sum_us == sum(gaps)
        assert g.gap_min_us == min(gaps)
        assert g.gap_max_us == max(gaps)
        assert g.mean_gap_sec == pytest.approx(sum(gaps) / len(gaps) / 1e6)


def test_length_histogram_vs_naive(spark):
    rng = random.Random(11)
    rows = [
        Row(doc_id=i, lang=rng.choice(["en", "de", "fr"]),
            n_chars=rng.randrange(0, 1000))
        for i in range(200)
    ]
    # exact bin edges: 0, 199, 200 land in bins 0, 0, 1
    rows += [Row(doc_id=900 + j, lang="en", n_chars=v)
             for j, v in enumerate((0, 199, 200))]
    df = spark.createDataFrame(rows)
    got = {(r.lang, r.bin): r for r in
           length_histogram(df, col="n_chars", group="lang", bin_width=200).collect()}

    naive = defaultdict(int)
    totals = defaultdict(int)
    for r in rows:
        naive[(r.lang, r.n_chars // 200)] += 1
        totals[r.lang] += 1
    assert set(got) == set(naive)
    for (lang, b), n in naive.items():
        g = got[(lang, b)]
        assert g.n == n
        assert g.bin_lo == b * 200 and g.bin_hi == (b + 1) * 200 - 1
        assert g.share == pytest.approx(n / totals[lang])
    # shares sum to 1 within each language
    for lang in totals:
        assert sum(g.share for k, g in got.items() if k[0] == lang) == pytest.approx(1.0)
