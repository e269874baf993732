"""Embedding-evaluation dataflow: all-pairs similarity → thresholded
confusion counts → derived metrics.

Re-expresses the reference's evaluation pipeline
(``src/training/statistics.py``) relationally:

* all-pairs generation ``(i, j) for j > i`` (``statistics.py:17-25``) →
  a theta self-join with an ordering predicate (SURVEY.md J4);
* per-pair manhattan / euclidean distance (``statistics.py:9-14``) →
  JVM-side ``zip_with``/``aggregate`` fold, no Python;
* thresholded tp/tn/fp/fn (``statistics.py:28-51``: a SAME-label pair is
  a true positive iff ``distance <= threshold``, a DIFFERENT-label pair a
  true negative iff ``distance > threshold``) → explode the threshold list
  against the pair table and aggregate conditional counts (A16);
* recall / precision / accuracy / balanced accuracy / F1 with the
  reference's zero-guards (``statistics.py:102-132``) → post-aggregation
  column arithmetic (A17).

The reference fans pairs out to a process pool in 1000-pair batches and
sums partial confusion counts (``statistics.py:71-90``) — that partial →
final combine is exactly Spark's partial aggregation (A18), free in
``groupBy().agg()``.

Scale notes: all-pairs is O(n²) by definition — callers bound n (the
reference evaluates one embedded test split at a time). The pair join
broadcasts the right side when small; the threshold explode multiplies
rows BEFORE the aggregate but AFTER the distance is computed once per
pair, so each distance is evaluated once, not once per threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _manhattan(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _euclid(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(
        F.aggregate(F.transform(d, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


_METRICS = {"manhattan": _manhattan, "euclidean": _euclid}


def all_pairs_distances(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    metric: str = "manhattan",
    broadcast_right: bool = True,
) -> DataFrame:
    """J4: ordered all-pairs ``(a_id < b_id)`` with per-pair distance.

    Returns ``(a_id, b_id, distance, same_label)``. ``same_label`` is the
    reference's ``y_pair[0] == y_pair[1]`` (``statistics.py:35``).
    """
    dist_fn = _METRICS[metric]
    a = df.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("__va"),
        F.col(label_col).alias("__la"),
    )
    b = df.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("__vb"),
        F.col(label_col).alias("__lb"),
    )
    if broadcast_right:
        b = F.broadcast(b)
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            dist_fn(F.col("__va"), F.col("__vb")).alias("distance"),
            (F.col("__la") == F.col("__lb")).alias("same_label"),
        )
    )


def confusion_at_thresholds(
    pairs: DataFrame,
    thresholds: list[float],
    distance_col: str = "distance",
    same_col: str = "same_label",
) -> DataFrame:
    """A16: per-threshold tp/tn/fp/fn over the pair table.

    Predicate matches ``statistics.py:38-49``: predicted-similar iff
    ``distance <= threshold``. One row per threshold.
    """
    sim = F.col(distance_col) <= F.col("threshold")
    same = F.col(same_col)

    def cnt(pred: Column) -> Column:
        return F.sum(F.when(pred, 1).otherwise(0)).cast("long")

    return (
        pairs.select(
            distance_col,
            same_col,
            F.explode(F.array(*[F.lit(float(t)) for t in thresholds])).alias("threshold"),
        )
        .groupBy("threshold")
        .agg(
            cnt(same & sim).alias("tp"),
            cnt(~same & ~sim).alias("tn"),
            cnt(~same & sim).alias("fp"),
            cnt(same & ~sim).alias("fn"),
        )
    )


def derived_metrics(conf: DataFrame, ndigits: int = 6) -> DataFrame:
    """A17: recall/precision/accuracy/balanced-accuracy/F1 per threshold.

    Zero-guards mirror ``statistics.py:102-132``: recall and precision are
    0 when tp and the paired error count are both 0; F1 is 0 when both
    precision and recall are 0; balanced accuracy is null when ``tn+fp=0``
    (the reference would raise ZeroDivisionError there — we surface null
    instead of crashing; documented divergence).
    """
    tp, tn, fp, fn = (F.col(c).cast("double") for c in ("tp", "tn", "fp", "fn"))
    recall = F.when((tp == 0) & (fn == 0), F.lit(0.0)).otherwise(tp / (tp + fn))
    precision = F.when((tp == 0) & (fp == 0), F.lit(0.0)).otherwise(tp / (tp + fp))
    tnr = F.when(tn + fp != 0, tn / (tn + fp))
    f1 = F.when(
        (precision == 0) & (recall == 0), F.lit(0.0)
    ).otherwise(2 * precision * recall / (precision + recall))
    return conf.select(
        "threshold",
        "tp",
        "tn",
        "fp",
        "fn",
        F.round(recall, ndigits).alias("recall"),
        F.round(precision, ndigits).alias("precision"),
        F.round((tp + tn) / (tp + tn + fp + fn), ndigits).alias("accuracy"),
        F.round((recall + tnr) / 2, ndigits).alias("balanced_accuracy"),
        F.round(f1, ndigits).alias("f1_score"),
    )


def evaluate_embeddings(
    df: DataFrame,
    thresholds: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    metric: str = "manhattan",
    ndigits: int = 6,
) -> DataFrame:
    """EP3's evaluation dataflow end-to-end (J4 → A16 → A17)."""
    pairs = all_pairs_distances(df, id_col, vec_col, label_col, metric)
    return derived_metrics(confusion_at_thresholds(pairs, thresholds), ndigits)
