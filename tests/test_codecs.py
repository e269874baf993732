"""Native PNG/WAV decode (sources/codecs.py) vs committed golden fixtures
and the independent test-side encoder (tests/media_ref.py).

The goldens are encoder-input ground truth: the production decoder must
reproduce each committed fixture's pixel/PCM array byte-equal. Forward
filters (encoder) and inverse filters (decoder) are independent
implementations of the PNG spec, so a round-trip match is real evidence.
Closes reference S1's pixel decode (``src/preparation/iamloader.py:37``).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from featureextraction_spark.sources.codecs import (
    PngError,
    audio_features,
    decode_png,
    decode_wav,
    image_features,
)
from tests.media_ref import encode_png, encode_wav, golden_cases

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "media")

GOLDEN_NAMES = sorted(golden_cases().keys())


@pytest.mark.parametrize("name", GOLDEN_NAMES)
def test_golden_fixture_decodes_byte_equal(name):
    ext = "wav" if name.startswith("pcm") else "png"
    with open(os.path.join(FIXTURE_DIR, f"{name}.{ext}"), "rb") as f:
        payload = f.read()
    expected = np.load(os.path.join(FIXTURE_DIR, f"{name}.expected.npy"))
    if ext == "wav":
        got, sr = decode_wav(payload)
        assert sr == golden_cases()[name]["sample_rate"]
    else:
        got = decode_png(payload)
        assert got.dtype == expected.dtype
    assert got.shape == expected.shape
    assert np.array_equal(got, expected)


def test_goldens_match_generator():
    """The committed fixture BYTES are exactly what media_ref regenerates —
    guards silent drift between the committed goldens and the encoder."""
    for name, case in golden_cases().items():
        ext = "wav" if name.startswith("pcm") else "png"
        with open(os.path.join(FIXTURE_DIR, f"{name}.{ext}"), "rb") as f:
            assert f.read() == case["bytes"], name


def test_random_roundtrip_all_formats():
    rng = np.random.default_rng(99)
    combos = [(1, 1), (1, 4), (1, 8), (1, 16), (2, 8), (3, 8), (3, 16), (4, 8), (4, 16)]
    for c, d in combos:
        for interlace in (0, 1):
            h, w = int(rng.integers(1, 20)), int(rng.integers(1, 20))
            shape = (h, w) if c == 1 else (h, w, c)
            arr = rng.integers(0, 1 << d, shape).astype(
                np.uint16 if d == 16 else np.uint8
            )
            filters = [int(f) for f in rng.integers(0, 5, 5)]
            got = decode_png(
                encode_png(arr, depth=d, filters=filters, interlace=interlace)
            )
            assert np.array_equal(got, arr) and got.dtype == arr.dtype, (c, d, interlace)


def test_palette_roundtrip():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (13, 3)).astype(np.uint8)
    idx = rng.integers(0, 13, (6, 11)).astype(np.uint8)
    got = decode_png(encode_png(idx, depth=4, palette=pal, filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(got, pal[idx])


def test_wav_widths_roundtrip():
    rng = np.random.default_rng(5)
    for sw, lo, hi in ((1, -128, 128), (2, -(1 << 15), 1 << 15),
                       (3, -(1 << 23), 1 << 23), (4, -(1 << 31), 1 << 31)):
        x = rng.integers(lo, hi, (37, 2)).astype(np.int64)
        got, sr = decode_wav(encode_wav(x, 22050, sw))
        assert sr == 22050
        assert np.array_equal(got, x), sw


def test_png_error_paths():
    good = encode_png(np.zeros((3, 3), dtype=np.uint8))
    with pytest.raises(PngError, match="bad PNG signature"):
        decode_png(b"nope")
    with pytest.raises(PngError, match="truncated"):
        decode_png(good[:30])
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF
    with pytest.raises((PngError, Exception)):
        decode_png(bytes(corrupt))
    # CRC-valid but short IDAT: rebuild with an IDAT that inflates too short
    import struct
    import zlib

    sig = good[:8]
    ihdr_chunk = good[8 : 8 + 25]
    short = zlib.compress(b"\x00\x00\x00")  # one scanline of a 3x3 image, not three

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    stream = sig + ihdr_chunk + chunk(b"IDAT", short) + chunk(b"IEND", b"")
    with pytest.raises(PngError, match="shorter than scanline"):
        decode_png(stream)


def test_feature_kernels_deterministic():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    f = image_features(img)
    assert f[0] == 5 * 7 * 3 and f[5] == 5 and f[6] == 7 and f[7] == 3
    assert f[1] == pytest.approx(img.astype(float).mean())
    assert np.isnan(f[15])  # only 3 channel means for RGB
    pcm = rng.integers(-1000, 1000, (100, 2)).astype(np.int64)
    a = audio_features(pcm, 16000)
    assert a[0] == 100 and a[5] == 16000 and a[7] == 2
    assert a[6] == 100 * 1000 // 16000


# ---- Spark integration: decode_features(fake=False) end to end ----


def test_decode_features_real_spark(spark, tmp_path):
    from featureextraction_spark.sources.multimodal import (
        FEATURE_DIM,
        decode_features,
        read_binary_dir,
    )

    d = tmp_path / "media"
    d.mkdir()
    expected = {}
    for name, case in golden_cases().items():
        ext = "wav" if name.startswith("pcm") else "png"
        (d / f"{name}.{ext}").write_bytes(case["bytes"])
        if ext == "wav":
            expected[name] = audio_features(
                case["expected"], case["sample_rate"], dim=FEATURE_DIM
            )
        else:
            expected[name] = image_features(case["expected"], dim=FEATURE_DIM)

    df = read_binary_dir(spark, str(d))
    out = decode_features(df, fake=False).toPandas()
    assert len(out) == len(expected)
    src = df.select("sample_id", "source_path").toPandas()
    id_to_name = {
        r.sample_id: r.source_path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        for r in src.itertuples(index=False)
    }
    for r in out.itertuples(index=False):
        exp = expected[id_to_name[r.sample_id]]
        np.testing.assert_allclose(
            np.array(r.features, dtype=float), exp, rtol=1e-12, equal_nan=True
        )


def test_decode_features_unsupported(spark):
    from featureextraction_spark.sources.multimodal import (
        decode_features,
        make_multimodal_fixture,
    )

    mm = make_multimodal_fixture(spark, n=6, seed=1)  # random bytes, no real codec
    with pytest.raises(Exception, match="no native decoder"):
        decode_features(mm, fake=False).collect()
    out = decode_features(mm, fake=False, on_unsupported="null").toPandas()
    assert len(out) == 6
    assert all(np.isnan(np.array(f, dtype=float)).all() for f in out["features"])
