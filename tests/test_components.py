"""Components & blobs (A13–A15) tests.

2-D kernel oracle: a literal transposition of the reference's scan-fill /
bounded flood-fill algorithm (components_blobs.py:43-131) in plain Python,
run on small adversarial images. 1-D relational form oracle: pandas."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from featureextraction_spark.operators.components import (
    blob_shape_stats,
    components_blobs_features_2d,
    connected_components_2d,
    enclosed_runs,
    find_components_and_blobs_2d,
    island_gap_stats,
    tool_islands,
)


# --- reference-transposed oracle (pure python, list-of-lists) -------------


def _oracle_components_and_blobs(image, threshold=200, min_blob=20):
    bw = [[0 if p < threshold else 255 for p in row] for row in image]
    h, w = len(bw), len(bw[0])
    border = {(x, y) for x in range(w) for y in (0, h - 1)} | {
        (x, y) for y in range(h) for x in (0, w - 1)
    }

    def flood(x0, y0, color, bounds=None):
        seen, stack, inside = set(), [(x0, y0)], True
        while stack:
            x, y = stack.pop()
            if not (0 <= x < w and 0 <= y < h) or (x, y) in seen or bw[y][x] != color:
                continue
            if bounds and not (bounds[0] <= x <= bounds[2] and bounds[1] <= y <= bounds[3]):
                inside = False
                continue
            seen.add((x, y))
            stack += [(x - 1, y), (x + 1, y), (x, y - 1), (x, y + 1)]
        return seen, inside

    visited, comps, blobs = set(), [], []
    for y in range(h):
        for x in range(w):
            if bw[y][x] == 0 and (x, y) not in visited:
                comp, _ = flood(x, y, 0)
                visited |= comp
                xs = [p[0] for p in comp]
                ys = [p[1] for p in comp]
                box = (min(xs), min(ys), max(xs), max(ys))
                comps.append({"min_x": box[0], "min_y": box[1], "max_x": box[2],
                              "max_y": box[3], "area": len(comp)})
                bvis = set()
                for yy in range(box[1], box[3] + 1):
                    for xx in range(box[0], box[2] + 1):
                        if bw[yy][xx] != 0 and (xx, yy) not in bvis:
                            area, inside = flood(xx, yy, 255, box)
                            bvis |= area
                            if inside and len(area) >= min_blob and not (area & border):
                                per = sum(
                                    1
                                    for (px, py) in area
                                    if {(px - 1, py), (px + 1, py), (px, py - 1), (px, py + 1)}
                                    - area
                                )
                                blobs.append({"area": len(area), "perimeter": per})
    return comps, blobs


def _img_with_blob():
    """10x12 image: a black ring enclosing a 4x6=24px white blob, plus a
    separate small black component to the right."""
    img = np.full((10, 12), 255, dtype=int)
    img[1:8, 1:9] = 0  # solid block
    img[2:6, 2:8] = 255  # carve white hole (4 rows x 6 cols = 24 px)
    img[4:6, 10:12] = 0  # second component touching... keep off border
    img[4:6, 10] = 0
    return img


def test_connected_components_labels_match_bfs():
    img = _img_with_blob()
    mask = img < 200
    labels = connected_components_2d(mask)
    assert labels[mask].min() >= 1
    assert (labels[~mask] == 0).all()
    # two black components
    assert len(np.unique(labels[labels > 0])) == 2


def test_2d_kernel_matches_reference_oracle():
    img = _img_with_blob()
    comps, blobs = find_components_and_blobs_2d(img, min_blob_size=20)
    ocomps, oblobs = _oracle_components_and_blobs(img.tolist(), min_blob=20)
    assert sorted((c["min_x"], c["min_y"], c["max_x"], c["max_y"], c["area"]) for c in comps) \
        == sorted((c["min_x"], c["min_y"], c["max_x"], c["max_y"], c["area"]) for c in ocomps)
    assert sorted((b["area"], b["perimeter"]) for b in blobs) == sorted(
        (b["area"], b["perimeter"]) for b in oblobs
    )
    assert len(blobs) == 1 and blobs[0]["area"] == 24


def test_2d_feature_vector_matches_reference_formulas():
    img = _img_with_blob()
    feats = components_blobs_features_2d(img)
    _, oblobs = _oracle_components_and_blobs(img.tolist())
    area, per = oblobs[0]["area"], oblobs[0]["perimeter"]
    assert feats["avg_area"] == pytest.approx(area)
    assert feats["avg_perimeter"] == pytest.approx(per)
    assert feats["avg_shape_factor"] == pytest.approx(4 * area * math.pi / per**2)
    assert feats["avg_roundness"] == pytest.approx(per**2 / area)
    # one inter-component gap; stdev of single distance → 0 (doc'd divergence)
    assert feats["stdev_distance"] == 0.0
    assert feats["avg_within_word_distance"] == 0.0  # only one side populated


def test_2d_empty_image_all_zero_fallbacks():
    feats = components_blobs_features_2d(np.full((5, 5), 255, dtype=int))
    assert all(v == 0.0 for v in feats.values())


# --- 1-D relational form ---------------------------------------------------


@pytest.fixture(scope="module")
def conv(spark):
    # conv A: tool islands at turns [2,3], [6], [10,11]; nulls elsewhere
    # conv B: single island (no gaps); conv C: no tools at all
    rows = []
    for t in range(13):
        tool = "search" if t in (2, 3, 6, 10, 11) else None
        rows.append(("A", t, tool))
    for t in range(5):
        rows.append(("B", t, "python" if t in (1, 2) else None))
    for t in range(4):
        rows.append(("C", t, None))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "tool"])
    pdf["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(pdf["turn_idx"], unit="m")
    return spark.createDataFrame(pdf)


def test_tool_islands(spark, conv):
    isl = tool_islands(conv, order=("ts", "turn_idx")).toPandas()
    a = isl[isl.conv_id == "A"].sort_values("start_idx")
    assert list(zip(a.start_idx, a.end_idx)) == [(2, 3), (6, 6), (10, 11)]
    assert len(isl[isl.conv_id == "B"]) == 1
    assert len(isl[isl.conv_id == "C"]) == 0


def test_island_gap_stats_matches_pandas(spark, conv):
    isl = tool_islands(conv, order=("ts", "turn_idx"))
    got = island_gap_stats(isl).toPandas().set_index("conv_id")
    # conv A gaps: 6-3=3, 10-6=4
    d = np.array([3.0, 4.0])
    avg, sd = d.mean(), d.std(ddof=1)
    t = avg + sd / 3
    a = got.loc["A"]
    assert a.n_gaps == 2 and a.avg_distance == pytest.approx(avg)
    assert a.stdev_distance == pytest.approx(sd)
    within, between = d[d < t], d[d >= t]
    if len(within) and len(between):
        assert a.avg_within_word_distance == pytest.approx(within.mean())
        assert a.avg_between_word_distance == pytest.approx(between.mean())
    assert "B" not in got.index  # single island → no gaps → no row


def test_enclosed_runs_and_blob_stats(spark, conv):
    blobs = enclosed_runs(conv, min_size=2, order=("ts", "turn_idx")).toPandas()
    # conv A null-runs between islands: turns 4-5 (len 2), 7-9 (len 3);
    # leading 0-1 and trailing 12 are border-touching → excluded
    a = blobs[blobs.conv_id == "A"].sort_values("start_idx")
    assert list(zip(a.start_idx, a.end_idx, a.area)) == [(4, 5, 2), (7, 9, 3)]
    assert len(blobs[blobs.conv_id == "B"]) == 0

    stats = blob_shape_stats(
        spark.createDataFrame(
            pd.DataFrame(
                {"conv_id": ["A", "A"], "area": [2.0, 3.0], "perimeter": [2.0, 2.0]}
            )
        )
    ).toPandas()
    r = stats.iloc[0]
    assert r.n_blobs == 2
    assert r.avg_shape_factor == pytest.approx(
        np.mean([4 * 2 * math.pi / 4, 4 * 3 * math.pi / 4])
    )
    assert r.avg_roundness == pytest.approx(np.mean([4 / 2, 4 / 3]))
