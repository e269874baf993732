"""Multimodal binary-column plumbing: schema, Arrow batching, pruning."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from featureextraction_spark.sources.multimodal import (
    FEATURE_DIM,
    _fake_decode_batch,
    decode_features,
    frame_sample,
    make_multimodal_fixture,
    resize_meta,
)


@pytest.fixture(scope="module")
def mm(spark):
    df = make_multimodal_fixture(spark, n=48, seed=42)
    df.persist().count()
    return df


def test_honest_not_implemented_for_unsupported_codecs(spark, mm):
    # PNG/WAV now decode natively (sources/codecs.py; see test_codecs.py);
    # the fixture's random-byte payloads have no native decoder, so the
    # honest path still raises — at execution time, inside the kernel
    with pytest.raises(Exception, match="no native decoder"):
        decode_features(mm, fake=False).collect()


def test_fake_decode_plumbing(spark, mm):
    out = decode_features(mm, fake=True).toPandas().sort_values("sample_id")
    assert len(out) == 48
    assert all(len(f) == FEATURE_DIM for f in out["features"])
    # deterministic vs driver-side kernel on the same payloads
    src = mm.select("sample_id", "payload").toPandas().sort_values("sample_id")
    exp = _fake_decode_batch(src["payload"])
    got = np.stack(out["features"].to_numpy())
    np.testing.assert_allclose(got, exp, rtol=1e-12)
    # Arrow batches actually batched (not row-at-a-time)
    assert out["batch_rows"].max() > 1


def test_frame_sample_counts_and_pruning(spark, mm, tmp_path):
    path = str(tmp_path / "mm.parquet")
    mm.write.parquet(path)
    mm_file = spark.read.parquet(path)
    fs = frame_sample(mm_file, every_ms=5000)
    pdf = fs.toPandas()
    meta = mm.select("sample_id", "modality", "meta.duration_ms").toPandas()
    for r in meta.itertuples(index=False):
        n = (pdf["sample_id"] == r.sample_id).sum()
        if r.modality == "image":
            assert n == 0
        else:
            expected = (max(r.duration_ms - 1, 0)) // 5000 + 1
            assert n == expected, (r.sample_id, n, expected)
    # metadata-only plan: the binary payload column is pruned from the
    # parquet ReadSchema (columnar scan never touches media bytes)
    plan = fs._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("payload" not in ln for ln in read_schema), plan


def test_resize_meta(spark, mm):
    out = resize_meta(mm, max_side=128).toPandas()
    with_dims = out[out["target_width"].notna()]
    assert (with_dims["target_width"] <= 128).all()
    assert (with_dims["target_height"] <= 128).all()
    # aspect ratio preserved within rounding
    m = with_dims
    orig_ratio = m.apply(lambda r: r["meta"]["width"] / r["meta"]["height"], axis=1)
    new_ratio = m["target_width"] / m["target_height"]
    np.testing.assert_allclose(new_ratio, orig_ratio, rtol=0.15)


def _png_bytes(w: int, h: int) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">II5B", w, h, 8, 0, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def _wav_bytes(sample_rate: int, n_samples: int) -> bytes:
    import struct

    data = b"\x00\x01" * n_samples  # 16-bit mono
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "a.png").write_bytes(_png_bytes(320, 200))
    (d / "b.wav").write_bytes(_wav_bytes(16000, 8000))  # 0.5 s
    (d / "c.bin").write_bytes(b"\x00\x01\x02opaque")
    return d


def test_read_binary_dir_roundtrip_and_meta(spark, media_dir):
    from featureextraction_spark.sources.multimodal import read_binary_dir

    out = read_binary_dir(spark, str(media_dir)).toPandas()
    assert len(out) == 3
    by_name = {r.source_path.rsplit("/", 1)[-1]: r for r in out.itertuples(index=False)}
    # byte-equal payloads
    assert bytes(by_name["a.png"].payload) == _png_bytes(320, 200)
    assert bytes(by_name["b.wav"].payload) == _wav_bytes(16000, 8000)
    assert bytes(by_name["c.bin"].payload) == b"\x00\x01\x02opaque"
    # header-parsed metadata
    png = by_name["a.png"]
    assert png.modality == "image" and png.meta["codec"] == "png"
    assert png.meta["width"] == 320 and png.meta["height"] == 200
    wav = by_name["b.wav"]
    assert wav.modality == "audio" and wav.meta["codec"] == "wav"
    assert wav.meta["sample_rate"] == 16000 and wav.meta["duration_ms"] == 500
    other = by_name["c.bin"]
    assert other.modality == "unknown" and other.meta["codec"] is None
    # sample_id is the stable 60-bit md5 of the path
    assert png.sample_id == int(hashlib.md5(png.source_path.encode()).hexdigest()[:15], 16)


def test_read_binary_dir_glob(spark, media_dir):
    from featureextraction_spark.sources.multimodal import read_binary_dir

    out = read_binary_dir(spark, str(media_dir), glob="*.png").toPandas()
    assert len(out) == 1 and out.iloc[0]["modality"] == "image"


def test_read_tarballs_expand_members(spark, media_dir, tmp_path):
    import tarfile

    from featureextraction_spark.sources.multimodal import read_tarballs

    tarp = tmp_path / "bundle.tar.gz"
    with tarfile.open(tarp, "w:gz") as tf:
        tf.add(media_dir / "a.png", arcname="imgs/a.png")
        tf.add(media_dir / "b.wav", arcname="audio/b.wav")
    out = read_tarballs(spark, str(tmp_path)).toPandas()
    assert len(out) == 2
    by_member = {
        r.source_path.split("::", 1)[1]: r for r in out.itertuples(index=False)
    }
    assert bytes(by_member["imgs/a.png"].payload) == _png_bytes(320, 200)
    assert by_member["imgs/a.png"].meta["width"] == 320
    assert bytes(by_member["audio/b.wav"].payload) == _wav_bytes(16000, 8000)
    assert by_member["audio/b.wav"].modality == "audio"


def test_ingested_rows_feed_decode_pipeline(spark, media_dir):
    from featureextraction_spark.sources.multimodal import (
        decode_features,
        read_binary_dir,
    )

    df = read_binary_dir(spark, str(media_dir))
    feats = decode_features(df, fake=True).toPandas()
    assert len(feats) == 3
    assert all(len(f) == FEATURE_DIM for f in feats["features"])


def _jpeg_bytes(w: int, h: int, progressive: bool = False) -> bytes:
    """Minimal JPEG header stream: SOI + APP0(JFIF) + DQT stub + SOF0/2
    carrying the dimensions + SOS + EOI. Enough structure for the
    SOF-marker scan; not a decodable image."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x48\x00\x48\x00\x00"
    dqt = b"\x00" + bytes(64)
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = struct.pack(">BHHB", 8, h, w, 3) + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xdb" + struct.pack(">H", len(dqt) + 2) + dqt
        + sof_marker + struct.pack(">H", len(sof) + 2) + sof
        + b"\xff\xda\x00\x02"
        + b"\xff\xd9"
    )


def test_jpeg_sof_header_parse():
    for progressive in (False, True):
        from featureextraction_spark.sources.multimodal import _parse_media_header

        meta = _parse_media_header(_jpeg_bytes(640, 480, progressive))
        assert meta["codec"] == "jpeg"
        assert meta["width"] == 640 and meta["height"] == 480, meta
    # DHT (0xC4) in the C0-CF range must NOT be mistaken for an SOF
    import struct

    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\xab\xcd"
    stream = b"\xff\xd8" + dht + b"\xff\xc0" + struct.pack(">H", 10) + struct.pack(
        ">BHHB", 8, 7, 9, 1
    ) + b"\x01\x11\x00"
    from featureextraction_spark.sources.multimodal import _parse_media_header
    meta = _parse_media_header(stream)
    assert meta["width"] == 9 and meta["height"] == 7
    # truncated stream: codec detected, dims stay null
    meta = _parse_media_header(b"\xff\xd8\xff\xe0")
    assert meta["codec"] == "jpeg" and meta["width"] is None


def test_jpeg_dims_flow_through_ingestion(spark, tmp_path):
    from featureextraction_spark.sources.multimodal import read_binary_dir

    d = tmp_path / "jpegs"
    d.mkdir()
    (d / "x.jpg").write_bytes(_jpeg_bytes(123, 45))
    rows = read_binary_dir(spark, str(d)).collect()
    assert len(rows) == 1
    m = rows[0]["meta"]
    assert m["width"] == 123 and m["height"] == 45
    assert rows[0]["modality"] == "image"
