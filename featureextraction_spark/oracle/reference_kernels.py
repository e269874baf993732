"""Naive, loop-for-loop transcriptions of the reference feature algorithms
onto 1-D series — the independent oracle the vectorized kernels
(``functions/series_kernels.py``) are tested against.

Each function mirrors the cited reference control flow exactly (same
iteration order, same rounding, same edge behavior), with the graft's
documented NaN policy at the holes where the reference would crash.
Single-node, intentionally slow — test-only code.
"""

from __future__ import annotations

import math
import statistics

import numpy as np


def zones_naive(s, max_hist: int = 64):
    """writingzones.py:17-87 transposed; histogram = (possibly binned) series."""
    n = len(s)
    if n <= max_hist:
        hist = [float(v) for v in s]
    else:
        hist = []
        for j in range(max_hist):
            a, b = (j * n) // max_hist, ((j + 1) * n) // max_hist
            hist.append(float(sum(s[a:b])))
    height = len(hist)
    if height < 3:
        return (math.nan, math.nan, math.nan)
    total = sum(hist)

    def ideal(ub, lb):
        # writingzones.py:79-87 — double int(round()) quantization
        middle_zone = int(round(0.8 * total))
        upper_lower_zone = int(round(0.1 * total))
        middle = int(round(middle_zone / (ub - lb)))
        upper = int(round(upper_lower_zone / (height - ub)))
        lower = int(round(upper_lower_zone / lb))
        return lower, middle, upper

    minimum = (-1, -1, np.inf)
    for ub in range(1, height):  # writingzones.py:40-44 iteration order
        for lb in range(1, ub):
            low_i, mid_i, up_i = ideal(ub, lb)
            err = (
                sum((x - low_i) ** 2 for x in hist[:lb])
                + sum((x - mid_i) ** 2 for x in hist[lb:ub])
                + sum((x - up_i) ** 2 for x in hist[ub:])
            )
            if err < minimum[2]:
                minimum = (ub, lb, err)
    ub, lb, _ = minimum
    return ((height - ub) / height, (ub - lb) / height, lb / height)


def median_width_naive(s):
    """medianwidth.py:18-41 transposed: white = below-mean."""
    if len(s) == 0:
        return math.nan
    threshold = sum(float(v) for v in s) / len(s)
    prev = False
    dist = 0
    distances = []
    for v in s:
        white = v < threshold
        if white and (dist == 0 or (dist > 0 and prev)):
            dist += 1
        elif not white and prev:
            distances.append(dist)
            dist = 0
        prev = white
    if len(s) and s[0] < threshold and distances:
        distances.pop(0)
    if not distances:
        return math.nan
    return float(statistics.median(distances))


def contour_naive(raw):
    """contour.py:74-92 — clamped cumulative walk, min-normalized."""
    contours = []
    last = None
    for v in raw:
        if last is None:
            contours.append(float(v))
        else:
            contours.append(contours[-1] + float(np.sign(v - last)))
        last = float(v)
    if not contours:
        return []
    min_y = min(0.0, min(contours))
    return [y - min_y for y in contours]


def ols_naive(y):
    """contour.py:95-110 closed form (statsmodels parity: mse = SSR/(n-2))."""
    n = len(y)
    if n == 0:
        return (math.nan, math.nan, math.nan)
    if n == 1:
        return (float(y[0]), 0.0, math.nan)
    xs = list(range(n))
    xbar = sum(xs) / n
    ybar = sum(y) / n
    sxx = sum((x - xbar) ** 2 for x in xs)
    sxy = sum((x - xbar) * (v - ybar) for x, v in zip(xs, y))
    slope = sxy / sxx
    intercept = ybar - slope * xbar
    ssr = sum((v - (intercept + slope * x)) ** 2 for x, v in zip(xs, y))
    return (intercept, slope, ssr / (n - 2) if n > 2 else math.nan)


def local_extremes_naive(contour, window, maxima=True):
    """contour.py:113-148 verbatim (incl. plateau dedup via prev flag)."""
    import operator

    extreme = max if maxima else min
    comparator = operator.ge if maxima else operator.le
    extremes = []
    prev_was_extreme = False
    for i in range(len(contour)):
        extreme_left = None
        if i > 0:
            extreme_left = extreme(contour[max(0, i - window) : max(0, i)])
        extreme_right = None
        if i < len(contour) - 1:
            extreme_right = extreme(contour[min(i + 1, len(contour)) : min(i + 1 + window, len(contour))])
        if (extreme_left is None or comparator(contour[i], extreme_left)) and (
            extreme_right is None or comparator(contour[i], extreme_right)
        ):
            if not prev_was_extreme:
                extremes.append(i)
            prev_was_extreme = True
        else:
            prev_was_extreme = False
    return extremes


def local_slopes_naive(contour, extremes, distance):
    """contour.py:151-173 (slope of OLS over strict-left/right segments)."""
    lefts, rights = [], []
    for e in extremes:
        if e > 0:
            part = contour[max(0, e - distance) : e]
            lefts.append(ols_naive(part)[1])
        if e < len(contour) - 1:
            part = contour[e + 1 : min(len(contour), e + 1 + distance)]
            rights.append(ols_naive(part)[1])
    return lefts, rights


def contour_features_naive(raw, extremes_window=10, slope_distance=10):
    """contour.py:30-63 assembled."""
    nan8 = dict.fromkeys(
        [
            "slant", "slant_mse", "local_max_freq", "local_min_freq",
            "max_slopes_left_avg", "max_slopes_right_avg",
            "min_slopes_left_avg", "min_slopes_right_avg",
        ],
        math.nan,
    )
    if len(raw) == 0:
        return nan8
    c = contour_naive(raw)
    _, slant, slant_mse = ols_naive(c)
    maxima = local_extremes_naive(c, extremes_window, True)
    minima = local_extremes_naive(c, extremes_window, False)
    max_l, max_r = local_slopes_naive(c, maxima, slope_distance)
    min_l, min_r = local_slopes_naive(c, minima, slope_distance)

    def avg(a):
        return float(np.average(a)) if len(a) else math.nan

    return {
        "slant": slant,
        "slant_mse": slant_mse,
        "local_max_freq": len(maxima) / len(c),
        "local_min_freq": len(minima) / len(c),
        "max_slopes_left_avg": avg(max_l),
        "max_slopes_right_avg": avg(max_r),
        "min_slopes_left_avg": avg(min_l),
        "min_slopes_right_avg": avg(min_r),
    }


def slantness_naive(contour, n_angles=40, window=8):
    """slantness.py:20-52 aggregate stage over drift-angle votes.

    The per-vote loop (drift → theta → clipped bin) is the verbatim
    transcription. The mean/stdev aggregate uses the exact integer
    factoring (angle = bin·step ⇒ mean = step·S/n,
    var = step²·(Q − S²/n)/(n−1)) — mathematically identical to the
    reference's float-sample mean/stdev, and bit-identical to the engine
    and the SQL oracle. Summation ORDER only matters at exact .x5°
    rounding boundaries (a score-weighted mean is a small-denominator
    rational times 4.5°, so those boundaries are actually hit), where the
    reference's own float accumulation is a coin flip; the factored form
    makes all three implementations agree deterministically.
    """
    step = math.pi / n_angles
    score = {i: 0 for i in range(1, n_angles)}
    for k in range(len(contour) - window):
        drift = contour[k + window] - contour[k]
        theta = math.pi / 2.0 - math.atan(drift / float(window))
        i = int(np.clip(np.round(theta / step), 1, n_angles - 1))
        score[i] += 1
    # slantness.py:47-51
    n = sum(score.values())
    S = sum(i * c for i, c in score.items())
    Q = sum(i * i * c for i, c in score.items())
    avg_angle = (
        float(np.round(180 - math.degrees(step * S / n), 1)) if n >= 1 else 0.0
    )
    stdev_angle = (
        float(
            np.round(
                math.degrees(
                    math.sqrt(max((step * step) * (Q - S * S / n), 0.0) / (n - 1))
                ),
                1,
            )
        )
        if n > 1
        else 0.0
    )
    max_i = max(score, key=score.get)  # dict order = bin asc → first max wins
    max_angle = float(np.round(180 - math.degrees(max_i * step), 1))
    return (max_angle, avg_angle, stdev_angle)


def slantness_naive_float(contour, n_angles=40, window=8):
    """Verbatim float-sample aggregate from the reference
    (``slantness.py:47-51``): expand the score dict into a sample of
    repeated float angles, then ``statistics.mean``/``statistics.stdev``.

    Kept alongside the factored ``slantness_naive`` as an INDEPENDENT
    upstream-behavior oracle: it can catch an error in the integer
    factoring itself, at the cost of being a coin flip at exact .x5°
    rounding boundaries (float accumulation order). Tests therefore
    compare it against the factored form with a one-last-digit-step
    tolerance rather than exact equality.
    """
    import statistics

    step = math.pi / n_angles
    score = {i: 0 for i in range(1, n_angles)}
    for k in range(len(contour) - window):
        drift = contour[k + window] - contour[k]
        theta = math.pi / 2.0 - math.atan(drift / float(window))
        i = int(np.clip(np.round(theta / step), 1, n_angles - 1))
        score[i] += 1
    sample = [
        angle for i, c in score.items() for angle in [i * step] * c
    ]
    stdev_angle = (
        round(math.degrees(statistics.stdev(sample)), 1) if len(sample) > 1 else 0.0
    )
    avg_angle = (
        round(180 - math.degrees(statistics.mean(sample)), 1)
        if len(sample) >= 1
        else 0.0
    )
    max_i = max(score, key=score.get)
    max_angle = round(180 - math.degrees(max_i * step), 1)
    return (float(max_angle), float(avg_angle), float(stdev_angle))
