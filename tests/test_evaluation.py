"""Evaluation dataflow (J4 + A16 + A17) vs a numpy oracle that replays the
reference's exact logic (src/training/statistics.py:17-51, 102-132)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from featureextraction_spark.operators.evaluation import (
    all_pairs_distances,
    confusion_at_thresholds,
    derived_metrics,
    evaluate_embeddings,
)

THRESHOLDS = [0.5, 1.0, 2.0, 4.0, 8.0]


@pytest.fixture(scope="module")
def emb_pdf():
    rng = np.random.default_rng(7)
    n, d = 40, 8
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [rng.normal(size=d).round(3).tolist() for _ in range(n)],
            "label": (np.arange(n) % 5).astype(np.int64),
        }
    )


@pytest.fixture(scope="module")
def emb(spark, emb_pdf):
    return spark.createDataFrame(
        emb_pdf, schema="vec_id long, embedding array<double>, label long"
    )


def _oracle_pairs(pdf, metric):
    # reference generate_pairs: (i, j) for j > i (statistics.py:17-25)
    vecs = np.array(pdf["embedding"].tolist())
    y = pdf["label"].to_numpy()
    ids = pdf["vec_id"].to_numpy()
    rows = []
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            if metric == "manhattan":
                d = float(np.abs(vecs[i] - vecs[j]).sum())
            else:
                d = float(np.sqrt(((vecs[i] - vecs[j]) ** 2).sum()))
            rows.append((ids[i], ids[j], d, bool(y[i] == y[j])))
    return pd.DataFrame(rows, columns=["a_id", "b_id", "distance", "same_label"])


@pytest.mark.parametrize("metric", ["manhattan", "euclidean"])
def test_all_pairs_distances_match_reference(spark, emb, emb_pdf, metric):
    got = (
        all_pairs_distances(emb, metric=metric)
        .toPandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    exp = _oracle_pairs(emb_pdf, metric).sort_values(["a_id", "b_id"]).reset_index(drop=True)
    assert len(got) == len(emb_pdf) * (len(emb_pdf) - 1) // 2
    assert got["same_label"].tolist() == exp["same_label"].tolist()
    np.testing.assert_allclose(got["distance"], exp["distance"], rtol=1e-12)


def _oracle_confusion(pairs, thresholds):
    # reference get_similarity_label_pairs (statistics.py:28-51)
    out = []
    for t in thresholds:
        tp = int(((pairs.same_label) & (pairs.distance <= t)).sum())
        fn = int(((pairs.same_label) & (pairs.distance > t)).sum())
        tn = int((~pairs.same_label & (pairs.distance > t)).sum())
        fp = int((~pairs.same_label & (pairs.distance <= t)).sum())
        out.append((t, tp, tn, fp, fn))
    return pd.DataFrame(out, columns=["threshold", "tp", "tn", "fp", "fn"])


def test_confusion_counts_match_reference(spark, emb, emb_pdf):
    pairs = all_pairs_distances(emb)
    got = (
        confusion_at_thresholds(pairs, THRESHOLDS)
        .toPandas()
        .sort_values("threshold")
        .reset_index(drop=True)
    )
    exp = _oracle_confusion(_oracle_pairs(emb_pdf, "manhattan"), THRESHOLDS)
    pd.testing.assert_frame_equal(
        got[["threshold", "tp", "tn", "fp", "fn"]],
        exp,
        check_dtype=False,
    )


def test_derived_metrics_match_reference_guards(spark, emb, emb_pdf):
    got = (
        evaluate_embeddings(emb, THRESHOLDS)
        .toPandas()
        .sort_values("threshold")
        .reset_index(drop=True)
    )
    conf = _oracle_confusion(_oracle_pairs(emb_pdf, "manhattan"), THRESHOLDS)
    for _, r in conf.iterrows():
        tp, tn, fp, fn = r.tp, r.tn, r.fp, r.fn
        recall = 0 if (tp == 0 and fn == 0) else tp / (tp + fn)
        precision = 0 if (tp == 0 and fp == 0) else tp / (tp + fp)
        acc = (tp + tn) / (tp + tn + fp + fn)
        f1 = (
            0
            if (precision == 0 and recall == 0)
            else 2 * precision * recall / (precision + recall)
        )
        row = got[got.threshold == r.threshold].iloc[0]
        assert row.recall == pytest.approx(recall, abs=1e-6)
        assert row.precision == pytest.approx(precision, abs=1e-6)
        assert row.accuracy == pytest.approx(acc, abs=1e-6)
        assert row.f1_score == pytest.approx(f1, abs=1e-6)
        if tn + fp > 0:
            bal = (recall + tn / (tn + fp)) / 2
            assert row.balanced_accuracy == pytest.approx(bal, abs=1e-6)


def test_zero_guard_edge_cases(spark):
    # single label → no negative pairs at all; tiny threshold → tp=0 too
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]],
            "label": [1, 1, 1],
        }
    )
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<double>, label long")
    out = evaluate_embeddings(df, [0.001]).toPandas().iloc[0]
    assert out.tp == 0 and out.fn == 3 and out.tn == 0 and out.fp == 0
    assert out.recall == 0.0  # tp+fn>0 → 0/3
    assert out.precision == 0.0  # tp==0 and fp==0 → guard
    assert out.f1_score == 0.0
    assert pd.isna(out.balanced_accuracy)  # tn+fp == 0 → null, not crash
