"""J5 per-label sampling joins — deterministic, so exactly testable."""

from __future__ import annotations

import pandas as pd
import pytest

from featureextraction_spark.operators.sampling import (
    stratified_sample,
    triplet_sample,
)


@pytest.fixture(scope="module")
def labeled(spark):
    pdf = pd.DataFrame(
        {
            "vec_id": range(20),
            "label": [i % 4 for i in range(16)] + [9] * 3 + [7],  # label 7: singleton
        }
    )
    return spark.createDataFrame(pdf)


def test_triplet_invariants(spark, labeled):
    t = triplet_sample(labeled).toPandas()
    assert len(t) > 0
    assert (t.anchor_id != t.pos_id).all()
    assert (t.anchor_label != t.neg_label).all()
    # positive shares the anchor's label
    lab = dict(zip(labeled.toPandas().vec_id, labeled.toPandas().label))
    assert all(lab[p] == a for p, a in zip(t.pos_id, t.anchor_label))
    assert all(lab[n] != a for n, a in zip(t.neg_id, t.anchor_label))
    # singleton label 7 produces no anchor (no positive exists)
    assert 7 not in set(t.anchor_label)
    # every non-singleton row anchors exactly once
    assert len(t) == 19 and t.anchor_id.nunique() == 19


def test_triplet_deterministic(spark, labeled):
    a = triplet_sample(labeled, seed=5).toPandas().sort_values("anchor_id")
    b = triplet_sample(labeled, seed=5).toPandas().sort_values("anchor_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    c = triplet_sample(labeled, seed=6).toPandas().sort_values("anchor_id")
    assert not a.reset_index(drop=True).equals(c.reset_index(drop=True))


def test_stratified_sample_respects_labels(spark, labeled):
    out = stratified_sample(labeled, "label", {0: 1.0, 1: 0.0}, seed=1).toPandas()
    assert set(out.label) == {0}
    assert len(out) == 4


def test_triplet_per_anchor_counts(spark, labeled):
    """per_anchor=k yields min(k, n-1) distinct positives per anchor and
    never wraps onto the anchor itself."""
    t = triplet_sample(labeled, per_anchor=3).toPandas()
    assert (t.anchor_id != t.pos_id).all()
    counts = t.groupby("anchor_id")["pos_id"].nunique()
    sizes = labeled.toPandas().groupby("label")["vec_id"].count().to_dict()
    lab = dict(zip(labeled.toPandas().vec_id, labeled.toPandas().label))
    for aid, c in counts.items():
        n = sizes[lab[aid]]
        assert c == min(3, n - 1), (aid, c, n)
    # per_anchor larger than any group: every anchor still keeps n-1 positives
    big = triplet_sample(labeled, per_anchor=100).toPandas()
    bcounts = big.groupby("anchor_id")["pos_id"].nunique()
    for aid, c in bcounts.items():
        assert c == sizes[lab[aid]] - 1


def test_hash_split_matches_hashlib_and_is_stable(spark, labeled):
    import hashlib

    from featureextraction_spark.operators.sampling import hash_split

    got = hash_split(labeled, id_col="vec_id", seed=42).toPandas()
    for row in got.itertuples(index=False):
        h = int(hashlib.md5(f"{row.vec_id}:42".encode()).hexdigest()[:15], 16)
        u = float(h) / float(1 << 60)
        assert row.u == u
        exp = "train" if u < 0.8 else ("valid" if u < 0.9 else "test")
        assert row.split == exp
    # content-addressed: dropping rows never moves the survivors
    sub = hash_split(labeled.limit(7), id_col="vec_id", seed=42).toPandas()
    merged = sub.merge(got, on="vec_id", suffixes=("_sub", "_full"))
    assert (merged["split_sub"] == merged["split_full"]).all()


def test_hash_split_proportions(spark):
    from featureextraction_spark.operators.sampling import hash_split

    big = spark.range(5000).withColumnRenamed("id", "doc_id")
    frac = (
        hash_split(big, id_col="doc_id", seed=7)
        .groupBy("split")
        .count()
        .toPandas()
        .set_index("split")["count"]
        / 5000.0
    )
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["valid"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02
