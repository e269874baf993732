"""Components & blobs feature family (SURVEY.md A13–A15; reference
``src/preparation/features/components_blobs.py`` — implemented there but
never wired into the pipeline, ``writer.py:94-99``).

Two realizations of the same statistics:

1. **1-D graft reading (relational, SQL-expressible).** On transcripts the
   analog of a "connected black component" is a tool-use island — a run of
   consecutive non-null ``tool`` turns (gaps-and-islands, the same idiom as
   run-length encoding W6). Bounding boxes become ``[start_idx, end_idx]``
   intervals; inter-component distances, the word-gap threshold split
   (A13, ``components_blobs.py:154-172``) and enclosed-run "blobs" are all
   pure DataFrame aggregations.

2. **2-D image kernel (multimodal path).** ``connected_components_2d`` /
   ``find_components_and_blobs_2d`` replicate the reference's scan-fill +
   bounded flood-fill semantics (``components_blobs.py:43-131``) with
   vectorized numpy label propagation — per-image work that runs inside
   ``mapInPandas`` over decoded binary payloads. No per-pixel Python.

Divergence from the reference, documented: with exactly two components the
reference calls ``statistics.stdev`` on a single distance and CRASHES
(StatisticsError); here ``stddev_samp`` yields NULL and the threshold
split degrades to the both-zero fallback the reference uses for empty
sides (``components_blobs.py:166-172``).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featureextraction_spark.operators.runlength import run_length_encode


# ---------------------------------------------------------------------------
# 1-D relational form (tool-use islands on transcripts)
# ---------------------------------------------------------------------------


def tool_islands(
    df: DataFrame,
    col: str = "tool",
    key: str = "conv_id",
    order: tuple[str, str] = ("ts", "turn_idx"),
) -> DataFrame:
    """Islands of consecutive non-null ``col`` per ``key``.

    Returns ``(key, island_id, island_len, start_<tie>, end_<tie>)`` where
    the island bounds are in turn-index space (the 1-D bounding box).
    """
    tie = order[1]
    runs = run_length_encode(
        df.withColumn("__present", F.col(col).isNotNull()),
        "__present",
        key=key,
        order=order,
        extra_aggs=[
            F.min(tie).alias("start_idx"),
            F.max(tie).alias("end_idx"),
        ],
    )
    return (
        runs.filter(F.col("run_value") == F.lit(True))
        .select(
            key,
            F.col("run_id").alias("island_id"),
            F.col("run_length").alias("island_len"),
            "start_idx",
            "end_idx",
        )
    )


def island_gap_stats(islands: DataFrame, key: str = "conv_id") -> DataFrame:
    """A13: inter-component distance statistics with the word-gap split.

    distance = next.start - current.end (islands ordered by start, exactly
    the reference's ``z[1][0] - z[0][2]`` over sorted bounding boxes,
    ``components_blobs.py:155-157``); threshold = avg + stdev/3; averages
    within (< t) and between (>= t), both zero when either side is empty.
    """
    w = Window.partitionBy(key).orderBy("start_idx")
    gaps = (
        islands.withColumn("__next_start", F.lead("start_idx").over(w))
        .filter(F.col("__next_start").isNotNull())
        .select(key, (F.col("__next_start") - F.col("end_idx")).cast("double").alias("d"))
    )
    agg = gaps.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.avg("d").alias("avg_distance"),
        F.stddev_samp("d").alias("stdev_distance"),
    )
    thr = agg.select(
        key,
        "n_gaps",
        "avg_distance",
        F.coalesce("stdev_distance", F.lit(0.0)).alias("stdev_distance"),
        (F.col("avg_distance") + F.coalesce("stdev_distance", F.lit(0.0)) / 3).alias("__t"),
    )
    split = (
        gaps.join(thr.select(key, "__t"), key)
        .groupBy(key)
        .agg(
            F.avg(F.when(F.col("d") < F.col("__t"), F.col("d"))).alias("__within"),
            F.avg(F.when(F.col("d") >= F.col("__t"), F.col("d"))).alias("__between"),
        )
    )
    both = F.col("__within").isNotNull() & F.col("__between").isNotNull()
    return thr.join(split, key).select(
        key,
        "n_gaps",
        "avg_distance",
        "stdev_distance",
        F.when(both, F.col("__within")).otherwise(F.lit(0.0)).alias("avg_within_word_distance"),
        F.when(both, F.col("__between")).otherwise(F.lit(0.0)).alias("avg_between_word_distance"),
    )


def enclosed_runs(
    df: DataFrame,
    col: str = "tool",
    key: str = "conv_id",
    order: tuple[str, str] = ("ts", "turn_idx"),
    min_size: int = 2,
) -> DataFrame:
    """1-D "blobs": runs of NULL ``col`` fully enclosed by islands.

    The reference's blob admission test (``components_blobs.py:108-113``):
    inside the component's bounds, at least ``minimum_size`` pixels, and
    not touching the border — here: a null-run that is not the first or
    last run of the conversation and has ``run_length >= min_size``.
    """
    tie = order[1]
    runs = run_length_encode(
        df.withColumn("__present", F.col(col).isNotNull()),
        "__present",
        key=key,
        order=order,
        extra_aggs=[F.min(tie).alias("start_idx"), F.max(tie).alias("end_idx")],
    )
    w = Window.partitionBy(key)
    bounded = runs.withColumn("__max_run", F.max("run_id").over(w))
    return (
        bounded.filter(
            (F.col("run_value") == F.lit(False))
            & (F.col("run_id") > 1)
            & (F.col("run_id") < F.col("__max_run"))
            & (F.col("run_length") >= min_size)
        )
        .select(
            key,
            F.col("run_id").alias("blob_id"),
            F.col("run_length").alias("area"),
            "start_idx",
            "end_idx",
        )
    )


def blob_shape_stats(
    blobs: DataFrame,
    key: str = "conv_id",
    area: str = "area",
    perimeter: str = "perimeter",
) -> DataFrame:
    """A14: per-key means of (area, perimeter, 4πA/P², P²/A), zero fallback.

    Mirrors ``components_blobs.py:174-190``. Works for the 1-D reading
    (perimeter = 2 for an interval: its two endpoints) and for real 2-D
    blob tables produced by the image kernel.
    """
    a, p = F.col(area).cast("double"), F.col(perimeter).cast("double")
    stats = blobs.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_blobs"),
        F.avg(a).alias("avg_area"),
        F.avg(p).alias("avg_perimeter"),
        F.avg(4 * a * math.pi / (p * p)).alias("avg_shape_factor"),
        F.avg(p * p / a).alias("avg_roundness"),
    )
    return stats


# ---------------------------------------------------------------------------
# 2-D numpy kernel (multimodal / image payload path)
# ---------------------------------------------------------------------------


def connected_components_2d(mask: np.ndarray) -> np.ndarray:
    """4-connected component labels for a boolean mask, 0 = background.

    Vectorized min-label propagation to fixpoint (no per-pixel Python).
    scipy.ndimage.label is the drop-in when available; this container has
    no scipy.
    """
    labels = np.zeros(mask.shape, dtype=np.int64)
    labels[mask] = np.flatnonzero(mask.ravel()) + 1
    while True:
        shifted = np.full((4,) + mask.shape, np.iinfo(np.int64).max, dtype=np.int64)
        lab = np.where(mask, labels, np.iinfo(np.int64).max)
        shifted[0, 1:, :] = lab[:-1, :]
        shifted[1, :-1, :] = lab[1:, :]
        shifted[2, :, 1:] = lab[:, :-1]
        shifted[3, :, :-1] = lab[:, 1:]
        best = np.minimum(lab, shifted.min(axis=0))
        new = np.where(mask, best, 0)
        if np.array_equal(new, labels):
            break
        labels = new
    # compact label ids to 1..k (vectorized rank remap)
    uniq = np.unique(labels[labels > 0])
    out = np.zeros_like(labels)
    if len(uniq):
        out[labels > 0] = np.searchsorted(uniq, labels[labels > 0]) + 1
    return out


def _perimeter(region: np.ndarray) -> int:
    """# region pixels with a 4-neighbor outside the region (padded crop) —
    the reference's ``find_blob_perimeter`` (``components_blobs.py:134-148``)."""
    r = np.pad(region, 1)
    outside = ~r
    edge = r[1:-1, 1:-1] & (
        outside[:-2, 1:-1] | outside[2:, 1:-1] | outside[1:-1, :-2] | outside[1:-1, 2:]
    )
    return int(edge.sum())


def find_components_and_blobs_2d(
    image: np.ndarray, threshold: int = 200, min_blob_size: int = 20
) -> tuple[list[dict], list[dict]]:
    """Reference-parity components + blobs for one grayscale image.

    Black = pixel < threshold (``utils.get_bw_image`` semantics). Blobs:
    white regions fully inside a component's bounding box, ≥ min size, not
    touching the image border; a region inside two overlapping boxes counts
    once per component, as in the reference (fresh ``visited`` per
    component, ``components_blobs.py:100-115``).
    """
    bw_black = np.asarray(image) < threshold
    comp_labels = connected_components_2d(bw_black)
    white_labels = connected_components_2d(~bw_black)
    h, wdt = bw_black.shape

    white_info = []
    for wl in np.unique(white_labels[white_labels > 0]):
        ys, xs = np.nonzero(white_labels == wl)
        white_info.append(
            {
                "min_x": xs.min(), "max_x": xs.max(),
                "min_y": ys.min(), "max_y": ys.max(),
                "area": len(xs),
                "touches_border": bool(
                    (xs == 0).any() or (ys == 0).any()
                    or (xs == wdt - 1).any() or (ys == h - 1).any()
                ),
                "perimeter": _perimeter(white_labels == wl),
            }
        )

    components, blobs = [], []
    for cl in np.unique(comp_labels[comp_labels > 0]):
        ys, xs = np.nonzero(comp_labels == cl)
        box = {
            "min_x": int(xs.min()), "min_y": int(ys.min()),
            "max_x": int(xs.max()), "max_y": int(ys.max()),
            "area": len(xs),
        }
        components.append(box)
        for wi in white_info:
            if (
                wi["area"] >= min_blob_size
                and not wi["touches_border"]
                and wi["min_x"] >= box["min_x"]
                and wi["max_x"] <= box["max_x"]
                and wi["min_y"] >= box["min_y"]
                and wi["max_y"] <= box["max_y"]
            ):
                blobs.append({"area": int(wi["area"]), "perimeter": int(wi["perimeter"])})
    return components, blobs


def components_blobs_features_2d(image: np.ndarray) -> dict[str, float]:
    """The 8-feature vector of ``features_components_blobs``
    (``components_blobs.py:151-194``), same fallbacks."""
    import statistics as pystats

    components, blobs = find_components_and_blobs_2d(image)
    boxes = sorted((c["min_x"], c["min_y"], c["max_x"], c["max_y"]) for c in components)
    distances = [b2[0] - b1[2] for b1, b2 in zip(boxes, boxes[1:])]
    if distances:
        avg_d = sum(distances) / len(distances)
        stdev_d = pystats.stdev(distances) if len(distances) > 1 else 0.0
        t = avg_d + stdev_d / 3
        within = [d for d in distances if d < t]
        between = [d for d in distances if d >= t]
        if within and between:
            avg_within = sum(within) / len(within)
            avg_between = sum(between) / len(between)
        else:
            avg_within = avg_between = 0.0
    else:
        avg_d = stdev_d = avg_within = avg_between = 0.0

    shapes = [
        (b["area"], b["perimeter"], 4 * b["area"] * math.pi / b["perimeter"] ** 2,
         b["perimeter"] ** 2 / b["area"])
        for b in blobs
    ]
    n = len(shapes)
    return {
        "avg_distance": float(avg_d),
        "stdev_distance": float(stdev_d),
        "avg_within_word_distance": float(avg_within),
        "avg_between_word_distance": float(avg_between),
        "avg_area": sum(s[0] for s in shapes) / n if n else 0.0,
        "avg_perimeter": sum(s[1] for s in shapes) / n if n else 0.0,
        "avg_shape_factor": sum(s[2] for s in shapes) / n if n else 0.0,
        "avg_roundness": sum(s[3] for s in shapes) / n if n else 0.0,
    }
