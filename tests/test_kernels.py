"""Vectorized kernels vs naive reference transcriptions — pure numpy/pandas,
no Spark. Covers edge lengths (0,1,2,3), constant series, and 200 random
series of varied lengths."""

from __future__ import annotations

import math

import numpy as np
import pytest

from featureextraction_spark.functions import series_kernels as K
from featureextraction_spark.oracle import reference_kernels as R


def _series_cases():
    rng = np.random.default_rng(123)
    cases = [
        np.array([]),
        np.array([5.0]),
        np.array([5.0, 5.0]),
        np.array([1.0, 2.0, 3.0]),
        np.array([3.0, 3.0, 3.0, 3.0]),
        np.array([0.0, 0.0, 1.0, 0.0]),
        np.arange(100, dtype=float),
        np.arange(100, dtype=float)[::-1].copy(),
    ]
    for n in (4, 5, 7, 10, 16, 33, 64, 65, 100, 257, 1000):
        for _ in range(6):
            cases.append(rng.integers(0, 300, n).astype(float))
    # plateau-heavy series (extreme dedup paths)
    for n in (20, 50, 200):
        cases.append(np.repeat(rng.integers(0, 50, n // 5 + 1), 5)[:n].astype(float))
    return cases


CASES = _series_cases()


def _close(a, b, msg=""):
    a, b = float(a), float(b)
    if math.isnan(a) and math.isnan(b):
        return
    assert a == pytest.approx(b, rel=1e-9, abs=1e-9), msg


@pytest.mark.parametrize("i", range(len(CASES)))
def test_zones(i):
    s = CASES[i]
    got = K.zones(s)
    exp = R.zones_naive(list(s))
    for g, e in zip(got, exp):
        _close(g, e, f"case {i}")


@pytest.mark.parametrize("i", range(len(CASES)))
def test_median_width(i):
    s = CASES[i]
    _close(K.median_width(s), R.median_width_naive(list(s)), f"case {i}")


@pytest.mark.parametrize("i", range(len(CASES)))
def test_contour_features(i):
    s = CASES[i]
    raw = s[s > 0]
    got = K.contour_features(raw)
    exp = R.contour_features_naive(list(raw))
    assert set(got) == set(exp)
    for key in got:
        _close(got[key], exp[key], f"case {i} key {key}")


@pytest.mark.parametrize("i", range(len(CASES)))
def test_characteristic_contour(i):
    s = CASES[i]
    raw = s[s > 0]
    got = K.characteristic_contour(raw)
    exp = np.array(R.contour_naive(list(raw)))
    assert len(got) == len(exp)
    if len(got):
        np.testing.assert_allclose(got, exp, rtol=1e-12)


@pytest.mark.parametrize("i", range(len(CASES)))
def test_slantness(i):
    s = CASES[i]
    raw = s[s > 0]
    c_vec = K.characteristic_contour(raw)
    c_naive = R.contour_naive(list(raw))
    got = K.slantness(c_vec)
    exp = R.slantness_naive(c_naive)
    for g, e in zip(got, exp):
        _close(g, e, f"case {i}")
    # independent upstream oracle: the verbatim float-sample aggregate
    # (statistics.mean/stdev) may differ from the factored form only at
    # exact .x5° rounding boundaries — one last-digit step at most
    exp_float = R.slantness_naive_float(c_naive)
    for g, e in zip(got, exp_float):
        assert abs(g - e) <= 0.1 + 1e-9, f"case {i}: factored={g} float={e}"


@pytest.mark.parametrize("i", range(len(CASES)))
def test_local_extremes(i):
    s = CASES[i]
    raw = s[s > 0]
    c = K.characteristic_contour(raw)
    for maxima in (True, False):
        got = K.local_extremes(c, 10, maxima).tolist()
        exp = R.local_extremes_naive(list(c), 10, maxima)
        assert got == exp, f"case {i} maxima={maxima}"


def test_ols_matches():
    rng = np.random.default_rng(5)
    for n in (1, 2, 3, 5, 50):
        y = rng.normal(0, 10, n)
        g = K.ols_fit(y)
        e = R.ols_naive(list(y))
        for a, b in zip(g, e):
            _close(a, b, f"n={n}")
