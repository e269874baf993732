"""Test-support PNG/WAV ENCODER — the independent forward implementation
used to make golden fixtures and to round-trip-test the production
decoder (``featureextraction_spark/sources/codecs.py``).

Forward filters are written directly from the PNG spec's filter
definitions (Sub/Up/Average/Paeth over the byte sequence of each
scanline); the production decoder implements the inverse independently.
Run ``python tests/media_ref.py`` to (re)generate the committed golden
fixtures under ``tests/fixtures/media/``.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _pack_row(samples: np.ndarray, depth: int) -> bytes:
    """(width*channels,) int samples → packed scanline bytes (MSB-first
    for sub-byte depths, big-endian for 16-bit)."""
    if depth == 8:
        return samples.astype(np.uint8).tobytes()
    if depth == 16:
        return samples.astype(">u2").tobytes()
    bits = (
        ((samples.astype(np.uint8)[:, None] >> np.arange(depth - 1, -1, -1)) & 1)
        .astype(np.uint8)
        .reshape(-1)
    )
    return np.packbits(bits).tobytes()


def _filter_row(ft: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Forward PNG filter over one scanline's bytes (spec formulas)."""
    cur = cur.astype(np.int64)
    prev = prev.astype(np.int64)
    left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]]) if len(cur) > bpp else np.zeros_like(cur)
    ul = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]]) if len(prev) > bpp else np.zeros_like(prev)
    if ft == 0:
        out = cur
    elif ft == 1:
        out = cur - left
    elif ft == 2:
        out = cur - prev
    elif ft == 3:
        out = cur - ((left + prev) >> 1)
    elif ft == 4:
        p = left + prev - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
        out = cur - pred
    else:
        raise ValueError(ft)
    return (out % 256).astype(np.uint8)


_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _filtered_scanlines(
    img: np.ndarray, depth: int, filters: list[int] | None
) -> bytes:
    """(h, w, c) sample array → filter-byte-prefixed filtered scanlines."""
    h, w, c = img.shape
    bpp = max(1, c * depth // 8)
    out = bytearray()
    prev = np.zeros(((w * c * depth + 7) // 8,), dtype=np.uint8)
    for y in range(h):
        raw = np.frombuffer(_pack_row(img[y].reshape(-1), depth), dtype=np.uint8)
        ft = filters[y % len(filters)] if filters else 0
        out.append(ft)
        out.extend(_filter_row(ft, raw, prev, bpp).tobytes())
        prev = raw
    return bytes(out)


def encode_png(
    arr: np.ndarray,
    depth: int = 8,
    palette: np.ndarray | None = None,
    filters: list[int] | None = None,
    interlace: int = 0,
    gray_alpha: bool = False,
) -> bytes:
    """Encode a sample array as PNG.

    ``arr``: (H, W) for gray/palette, (H, W, C) for multi-channel.
    ``palette``: (n, 3) uint8 → color type 3, ``arr`` holds indices.
    ``gray_alpha``: force color type 4 for a 2-channel array.
    """
    a = arr if arr.ndim == 3 else arr[:, :, None]
    h, w, c = a.shape
    if palette is not None:
        color_type = 3
    else:
        color_type = {1: 0, 2: 4 if gray_alpha else 4, 3: 2, 4: 6}[c]
        if c == 1:
            color_type = 0
    ihdr = struct.pack(">II5B", w, h, depth, color_type, 0, 0, interlace)
    body = PNG_SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    if interlace == 0:
        scan = _filtered_scanlines(a, depth, filters)
    else:
        parts = []
        for xoff, yoff, xstep, ystep in _ADAM7:
            sub = a[yoff::ystep, xoff::xstep, :]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_filtered_scanlines(sub, depth, filters))
        scan = b"".join(parts)
    body += _chunk(b"IDAT", zlib.compress(scan, 9)) + _chunk(b"IEND", b"")
    return body


def encode_wav(samples: np.ndarray, sample_rate: int, sampwidth: int = 2) -> bytes:
    """(n, ch) int samples → WAV PCM bytes via stdlib wave writer."""
    n, ch = samples.shape
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        if sampwidth == 1:
            data = (samples + 128).astype(np.uint8).tobytes()
        elif sampwidth == 2:
            data = samples.astype("<i2").tobytes()
        elif sampwidth == 3:
            s = samples.astype(np.int64) % (1 << 24)
            b = np.zeros((s.size, 3), dtype=np.uint8)
            flat = s.reshape(-1)
            b[:, 0] = flat & 0xFF
            b[:, 1] = (flat >> 8) & 0xFF
            b[:, 2] = (flat >> 16) & 0xFF
            data = b.tobytes()
        elif sampwidth == 4:
            data = samples.astype("<i4").tobytes()
        else:
            raise ValueError(sampwidth)
        w.writeframes(data)
    return buf.getvalue()


def golden_cases() -> dict[str, dict]:
    """Deterministic golden media: name → {png/wav bytes, expected array,
    (wav) sample_rate}. Expected = the encoder INPUT, the ground truth the
    production decoder must reproduce byte-equal."""
    rng = np.random.default_rng(20260819)
    cases: dict[str, dict] = {}

    gray = rng.integers(0, 256, (7, 13)).astype(np.uint8)
    cases["gray8_filters"] = {
        "bytes": encode_png(gray, filters=[0, 1, 2, 3, 4, 0, 3]),
        "expected": gray,
    }

    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    cases["rgb8"] = {"bytes": encode_png(rgb, filters=[4, 3, 2, 1, 0]), "expected": rgb}

    pal = rng.integers(0, 256, (11, 3)).astype(np.uint8)
    idx = rng.integers(0, 11, (5, 9)).astype(np.uint8)
    cases["palette4"] = {
        "bytes": encode_png(idx, depth=4, palette=pal, filters=[0, 1, 2]),
        "expected": pal[idx],
    }

    checker = (np.indices((8, 8)).sum(axis=0) % 2).astype(np.uint8)
    cases["gray1"] = {"bytes": encode_png(checker, depth=1), "expected": checker}

    g2 = rng.integers(0, 4, (3, 5)).astype(np.uint8)
    cases["gray2"] = {"bytes": encode_png(g2, depth=2, filters=[1, 2]), "expected": g2}

    rgba16 = rng.integers(0, 65536, (4, 6, 4)).astype(np.uint16)
    cases["rgba16"] = {
        "bytes": encode_png(rgba16, depth=16, filters=[4, 2, 3, 1]),
        "expected": rgba16,
    }

    ga = rng.integers(0, 256, (6, 10, 2)).astype(np.uint8)
    cases["graya8"] = {
        "bytes": encode_png(ga, gray_alpha=True, filters=[3, 4]),
        "expected": ga,
    }

    gi = rng.integers(0, 256, (13, 21)).astype(np.uint8)
    cases["gray8_adam7"] = {
        "bytes": encode_png(gi, interlace=1, filters=[0, 1, 2, 3, 4]),
        "expected": gi,
    }

    rgb16i = rng.integers(0, 65536, (9, 7, 3)).astype(np.uint16)
    cases["rgb16_adam7"] = {
        "bytes": encode_png(rgb16i, depth=16, interlace=1, filters=[2, 4]),
        "expected": rgb16i,
    }

    t = np.arange(200)
    stereo = np.stack(
        [
            (1000 * np.sin(t / 7)).astype(np.int64),
            (700 * np.cos(t / 5)).astype(np.int64),
        ],
        axis=1,
    )
    cases["pcm16_stereo"] = {
        "bytes": encode_wav(stereo, 16000, 2),
        "expected": stereo,
        "sample_rate": 16000,
    }
    mono8 = (rng.integers(-128, 128, (64, 1))).astype(np.int64)
    cases["pcm8_mono"] = {
        "bytes": encode_wav(mono8, 8000, 1),
        "expected": mono8,
        "sample_rate": 8000,
    }
    m24 = rng.integers(-(1 << 23), 1 << 23, (50, 1)).astype(np.int64)
    cases["pcm24_mono"] = {
        "bytes": encode_wav(m24, 44100, 3),
        "expected": m24,
        "sample_rate": 44100,
    }
    return cases


def write_goldens(outdir: str) -> None:
    import os

    os.makedirs(outdir, exist_ok=True)
    for name, case in golden_cases().items():
        ext = "wav" if name.startswith("pcm") else "png"
        with open(os.path.join(outdir, f"{name}.{ext}"), "wb") as f:
            f.write(case["bytes"])
        np.save(os.path.join(outdir, f"{name}.expected.npy"), case["expected"])


if __name__ == "__main__":
    import os

    write_goldens(os.path.join(os.path.dirname(__file__), "fixtures", "media"))
    print("golden media fixtures written")
