"""Round-5 additions (third batch): zlib compression-ratio proxy and the
quantile-ratio tail-index estimator vs verbatim naive oracles."""

from __future__ import annotations

import math
import zlib

from pyspark.sql import functions as F

from featureextraction_spark.functions.textstats import compression_ratio_features
from featureextraction_spark.operators.profiling import tail_index


def test_compression_ratio_vs_naive_exact(spark):
    texts = [
        (0, "a" * 2000),  # degenerate: tiny ratio once past header overhead
        (1, "the quick brown fox jumps over the lazy dog " * 4),
        (2, ""),  # empty: ratio 0.0 by contract
        (3, None),  # null text = empty
        (4, "völlig unrelated Zeichen — multibyte utf-8"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["compression_ratio"])
        for r in compression_ratio_features(df).collect()
    }
    for doc_id, t in texts:
        raw = (t or "").encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        want_ratio = comp / len(raw) if raw else 0.0
        assert got[doc_id] == (len(raw), comp, want_ratio), doc_id
    # the filter signal: degenerate text compresses far below prose
    # (doc 1 is itself repetitive — x4 — so compare, don't threshold)
    assert got[0][2] < got[1][2] < 1.0


def _naive_tail(vals, p_lo=0.90, p_hi=0.99):
    s = sorted(vals)
    n = len(s)
    idx_lo = math.ceil(p_lo * float(n))
    idx_hi = math.ceil(p_hi * float(n))
    x_lo, x_hi = s[idx_lo - 1], s[idx_hi - 1]
    alpha = (
        math.log((1.0 - p_lo) / (1.0 - p_hi)) / math.log(x_hi / x_lo)
        if x_hi > x_lo
        else None
    )
    return n, idx_lo, idx_hi, x_lo, x_hi, alpha


def test_tail_index_vs_naive(spark):
    # Pareto(alpha=1.5)-ish sizes via inverse transform on a fixed grid
    vals = [max(2, int(2 * ((i + 0.5) / 400.0) ** (-1.0 / 1.5))) for i in range(400)]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, sz long")
    r = tail_index(df, "sz", "user_id").collect()[0]
    n, idx_lo, idx_hi, x_lo, x_hi, alpha = _naive_tail(vals)
    assert (r["n"], r["idx_lo"], r["idx_hi"]) == (n, idx_lo, idx_hi)
    # ties broken by id can pick a different EQUAL value only — the order
    # statistic itself is unique
    assert (r["x_lo"], r["x_hi"]) == (x_lo, x_hi)
    assert abs(r["alpha"] - alpha) < 1e-9
    # the estimator recovers the planted exponent within estimator error
    assert 1.0 < r["alpha"] < 2.2


def test_tail_index_degenerate_equal_quantiles(spark):
    df = spark.createDataFrame(
        [(i, 7) for i in range(50)], "user_id long, sz long"
    )
    r = tail_index(df, "sz", "user_id").collect()[0]
    assert r["x_lo"] == r["x_hi"] == 7 and r["alpha"] is None
