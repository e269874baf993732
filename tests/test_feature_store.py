"""Feature-store sink (S4/S5) + categorise plan (EP2) tests.

Oracle: plain pandas frames manipulated with keyed merges — the semantics
the reference's writer SHOULD have had (its own TODO, writer.py:47)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from featureextraction_spark.plans.categorise import (
    categorise,
    derive_key,
    drop_and_cast,
    split_filter,
)
from featureextraction_spark.sources.feature_store import (
    FeatureStore,
    IcebergFeatureStore,
    iceberg_available,
)

from conftest import assert_pdf_equal


@pytest.fixture()
def store(spark, tmp_path):
    return FeatureStore(spark, str(tmp_path / "fs"), key_cols=["conv_id", "ts"])


def _batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "ts", "f1"]),
        schema="conv_id string, ts timestamp, f1 double",
    )


T0 = pd.Timestamp("2024-01-01 00:00:00")
T1 = pd.Timestamp("2024-01-01 01:00:00")
T2 = pd.Timestamp("2024-01-01 02:00:00")


def test_append_creates_then_extends(spark, store):
    v0 = store.append(_batch(spark, [("a", T0, 1.0), ("b", T1, 2.0)]))
    v1 = store.append(_batch(spark, [("c", T2, 3.0)]))
    assert (v0, v1) == (0, 1)
    out = store.read().toPandas()
    assert len(out) == 3 and set(out["conv_id"]) == {"a", "b", "c"}
    # time travel: snapshot 0 still shows only the first batch
    assert len(store.read(version=0).toPandas()) == 2


def test_append_aligns_columns_by_name(spark, store):
    store.append(_batch(spark, [("a", T0, 1.0)]))
    # same columns, different order — must align by NAME (the reference
    # appends positionally, writer.py:32-34; we refuse that hazard)
    shuffled = _batch(spark, [("b", T1, 2.0)]).select("f1", "ts", "conv_id")
    store.append(shuffled)
    out = store.read().toPandas().sort_values("conv_id")
    assert list(out["f1"]) == [1.0, 2.0]


def test_append_missing_column_rejected(spark, store):
    store.append(_batch(spark, [("a", T0, 1.0)]))
    with pytest.raises(ValueError, match="missing columns"):
        store.append(_batch(spark, [("b", T1, 2.0)]).drop("f1"))


def test_merge_columns_is_keyed_not_positional(spark, store):
    store.append(_batch(spark, [("a", T0, 1.0), ("b", T1, 2.0), ("c", T2, 3.0)]))
    # new feature column arrives in a DIFFERENT row order + one unmatched key
    new = spark.createDataFrame(
        pd.DataFrame(
            [("c", T2, 30.0), ("a", T0, 10.0), ("zz", T1, 99.0)],
            columns=["conv_id", "ts", "f2"],
        ),
        schema="conv_id string, ts timestamp, f2 double",
    )
    store.merge_columns(new)
    out = store.read().toPandas().sort_values("conv_id").reset_index(drop=True)
    assert list(out.columns) == ["conv_id", "ts", "f1", "f2"]
    assert list(out["f1"]) == [1.0, 2.0, 3.0]
    assert out.loc[out.conv_id == "a", "f2"].iloc[0] == 10.0
    assert pd.isna(out.loc[out.conv_id == "b", "f2"].iloc[0])  # no match → null
    assert out.loc[out.conv_id == "c", "f2"].iloc[0] == 30.0
    assert "zz" not in set(out["conv_id"])  # unmatched right row not inserted


def test_merge_columns_duplicate_right_keys_rejected(spark, store):
    store.append(_batch(spark, [("a", T0, 1.0)]))
    dup = spark.createDataFrame(
        pd.DataFrame([("a", T0, 1.0), ("a", T0, 2.0)], columns=["conv_id", "ts", "f2"]),
        schema="conv_id string, ts timestamp, f2 double",
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        store.merge_columns(dup)


def test_merge_columns_noop_when_no_new_columns(spark, store):
    v = store.append(_batch(spark, [("a", T0, 1.0)]))
    assert store.merge_columns(_batch(spark, [("a", T0, 5.0)])) == v
    assert store.read().toPandas()["f1"].iloc[0] == 1.0  # untouched


def test_expire_snapshots_keeps_latest_readable(spark, store):
    store.append(_batch(spark, [("a", T0, 1.0)]))
    store.append(_batch(spark, [("b", T1, 2.0)]))
    store.merge_columns(
        spark.createDataFrame(
            pd.DataFrame([("a", T0, 7.0)], columns=["conv_id", "ts", "f3"]),
            schema="conv_id string, ts timestamp, f3 double",
        )
    )
    removed = store.expire_snapshots(keep_last=1)
    assert removed >= 1
    out = store.read().toPandas()
    assert len(out) == 2 and "f3" in out.columns


def test_iceberg_gated_off_in_this_container(spark):
    assert not iceberg_available(spark)
    with pytest.raises(RuntimeError, match="Iceberg"):
        IcebergFeatureStore(spark, "cat.db.t", ["conv_id", "ts"])


# Exact provisioning for the skipped integration test below. The test body
# is real and complete — it runs unmodified the moment the Iceberg runtime
# is on the classpath. This container has no network and ships no Iceberg
# jar, so it skips here; on any provisioned machine run:
#
#   spark-submit (or pytest under a spark-submit-launched session) with
#     --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0
#       (match the artifact to the Spark/Scala version: Spark 4.x/2.13;
#        for Spark 3.5 use iceberg-spark-runtime-3.5_2.12)
#     --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.\
# IcebergSparkSessionExtensions
#       (extensions must be set at session START; MERGE INTO routes through
#        Iceberg's row-level-operation rules)
#   then: python -m pytest tests/test_feature_store.py -k iceberg_end_to_end
#
# The catalog itself needs no pre-provisioning — the test registers a
# hadoop-type catalog on a tmp dir at runtime (Iceberg resolves
# spark.sql.catalog.* confs lazily on first reference).
_ICEBERG_SKIP_REASON = (
    "Iceberg runtime jar not on the classpath (no network in this "
    "container); see the provisioning comment above this test"
)


def _iceberg_jar_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_feature_store_end_to_end(spark, tmp_path):
    """The declared ship path, executed for real when the jar is present:
    CREATE TABLE USING iceberg → append (writeTo + snapshot-property tag)
    → ALTER TABLE ADD COLUMNS + MERGE INTO (keyed column merge) →
    snapshot-id time travel — the same keyed-not-positional assertions as
    the parquet FeatureStore twin above."""
    if not _iceberg_jar_present(spark):
        pytest.skip(_ICEBERG_SKIP_REASON)
    wh = str(tmp_path / "wh")
    spark.conf.set("spark.sql.catalog.fexit", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.fexit.type", "hadoop")
    spark.conf.set("spark.sql.catalog.fexit.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fexit.db")
    spark.sql(
        "CREATE TABLE fexit.db.fs (conv_id string, ts timestamp, f1 double) "
        "USING iceberg"
    )
    try:
        store = IcebergFeatureStore(spark, "fexit.db.fs", ["conv_id", "ts"])
        store.append(
            _batch(spark, [("a", T0, 1.0), ("b", T1, 2.0), ("c", T2, 3.0)]),
            tag="run-1",
        )
        first_snapshot = (
            spark.sql("SELECT snapshot_id FROM fexit.db.fs.snapshots")
            .collect()[0][0]
        )
        new = spark.createDataFrame(
            pd.DataFrame(
                [("c", T2, 30.0), ("a", T0, 10.0), ("zz", T1, 99.0)],
                columns=["conv_id", "ts", "f2"],
            ),
            schema="conv_id string, ts timestamp, f2 double",
        )
        store.merge_columns(new, ["f2"])
        out = store.read().toPandas().sort_values("conv_id").reset_index(drop=True)
        assert list(out["f1"]) == [1.0, 2.0, 3.0]
        assert out.loc[out.conv_id == "a", "f2"].iloc[0] == 10.0
        assert pd.isna(out.loc[out.conv_id == "b", "f2"].iloc[0])
        assert out.loc[out.conv_id == "c", "f2"].iloc[0] == 30.0
        assert "zz" not in set(out["conv_id"])  # MERGE has no INSERT branch
        # snapshot-id time travel: the pre-merge snapshot has no f2
        old = store.read(version=first_snapshot).toPandas()
        assert "f2" not in old.columns and len(old) == 3
        # the tag landed in the snapshot summary
        tags = spark.sql(
            "SELECT summary['run-tag'] FROM fexit.db.fs.snapshots "
            "ORDER BY committed_at"
        ).collect()
        assert tags[0][0] == "run-1"
    finally:
        spark.sql("DROP TABLE IF EXISTS fexit.db.fs")


# --- EP2 categorise plan --------------------------------------------------


def test_categorise_matches_pandas_oracle(spark, transcripts, splits_pdf):
    feats = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns")
    )
    splits = spark.createDataFrame(splits_pdf, schema="conv_id string, type string")
    got = categorise(feats, splits).toPandas()

    oracle = feats.toPandas().merge(splits_pdf, on="conv_id", how="left")
    oracle["type"] = oracle["type"].fillna("unknown")
    assert_pdf_equal(got, oracle, ["conv_id"])


def test_derive_key_strips_suffix(spark):
    df = spark.createDataFrame([("a01-000u.png",), ("b.tar.png",)], ["filename"])
    out = derive_key(df, "filename", "line_id", ".png").toPandas()
    assert list(out["line_id"]) == ["a01-000u", "b.tar"]


def test_split_filter_and_drop_cast(spark, transcripts, splits_pdf):
    feats = categorise(
        transcripts.groupBy("conv_id").agg(F.avg("turn_idx").alias("mean_idx")),
        spark.createDataFrame(splits_pdf, schema="conv_id string, type string"),
    )
    train = split_filter(feats, "train")
    assert set(train.select("type").distinct().toPandas()["type"]) <= {"train"}
    casted = drop_and_cast(train, drop_cols=["type"], feature_cols=["mean_idx"])
    assert dict(casted.dtypes)["mean_idx"] == "float"
    assert "type" not in casted.columns
