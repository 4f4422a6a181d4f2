"""PNG codec (functions/png.py). PNG is lossless, so roundtrips pin
EXACT byte equality; filter coverage is forced by hand-built scanline
streams (one per filter type) rather than trusting the encoder's
adaptive choice to hit all five."""

import struct
import zlib

import numpy as np
import pytest

from coastsat_spark.functions import png


def _noise(h, w, c=None, seed=5):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def test_roundtrip_exact_gray_rgb_rgba():
    for c in (None, 3, 4):
        for h, w in [(1, 1), (7, 5), (16, 16), (9, 31)]:
            img = _noise(h, w, c, seed=(c or 1) * 100 + h + w)
            out = png.decode_png(png.encode_png(img))
            assert out.shape == img.shape
            assert np.array_equal(out, img), (c, h, w)


def test_roundtrip_exact_smooth_image():
    yy, xx = np.mgrid[0:24, 0:33].astype(float)
    img = np.clip(
        np.stack([128 + 80 * np.sin(xx / 5), yy * 7 % 256, (xx * yy) % 256], -1),
        0,
        255,
    ).astype(np.uint8)
    assert np.array_equal(png.decode_png(png.encode_png(img)), img)


def _hand_png(rows_with_filters: list[tuple[int, bytes]], w: int, ctype: int = 0) -> bytes:
    """Assemble a PNG whose scanlines use EXACTLY the given filter types,
    with pre-filtered byte payloads supplied by the test."""
    h = len(rows_with_filters)
    raw = b"".join(bytes([f]) + data for f, data in rows_with_filters)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(raw))
        + png._chunk(b"IEND", b"")
    )


def test_each_filter_type_reconstructs():
    """Grayscale 4x4 with rows filtered None/Sub/Up/Average/Paeth by
    hand; expected pixels derived by applying the spec reconstruction
    formulas manually."""
    # target image rows (unfiltered truth)
    r0 = np.array([10, 20, 30, 40], np.uint8)
    r1 = np.array([15, 25, 35, 45], np.uint8)
    r2 = np.array([17, 28, 39, 50], np.uint8)
    r3 = np.array([20, 30, 40, 50], np.uint8)
    # row0 None: payload = raw
    f0 = (0, r0.tobytes())
    # row1 Sub: Filt(x) = Orig(x) - Orig(x-1)
    f1 = (1, bytes([15, (25 - 15) & 255, (35 - 25) & 255, (45 - 35) & 255]))
    # row2 Up: Filt(x) = Orig(x) - Above(x)
    f2 = (2, bytes([(17 - 15) & 255, (28 - 25) & 255, (39 - 35) & 255, (50 - 45) & 255]))
    # row3 Average: Filt(x) = Orig(x) - floor((left + above)/2)
    f3_bytes = []
    left = 0
    for x in range(4):
        v = int(r3[x]) - (left + int(r2[x])) // 2
        f3_bytes.append(v & 255)
        left = int(r3[x])
    f3 = (3, bytes(f3_bytes))
    data = _hand_png([f0, f1, f2, f3], w=4)
    out = png.decode_png(data)
    assert np.array_equal(out, np.stack([r0, r1, r2, r3]))

    # Paeth row appended after a known row: predictor chosen per spec
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    r4 = np.array([23, 33, 43, 53], np.uint8)
    f4_bytes = []
    for x in range(4):
        a = int(r4[x - 1]) if x else 0
        b = int(r3[x])
        c = int(r3[x - 1]) if x else 0
        f4_bytes.append((int(r4[x]) - paeth(a, b, c)) & 255)
    data = _hand_png([f0, f1, f2, f3, (4, bytes(f4_bytes))], w=4)
    out = png.decode_png(data)
    assert np.array_equal(out[4], r4)


def test_palette_and_trns():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 1]], np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()
    data = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"PLTE", pal.tobytes())
        + png._chunk(b"tRNS", bytes([128]))
        + png._chunk(b"IDAT", zlib.compress(raw))
        + png._chunk(b"IEND", b"")
    )
    out = png.decode_png(data)
    assert out.shape == (2, 2, 4)
    assert np.array_equal(out[0, 0], [255, 0, 0, 128])  # index 0 has tRNS
    assert np.array_equal(out[1, 0], [0, 0, 255, 255])


def test_crc_corruption_and_unsupported_fail_loudly():
    img = _noise(8, 8, 3)
    data = bytearray(png.encode_png(img))
    data[50] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        png.decode_png(bytes(data))
    # 16-bit depth rejected
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    data16 = (
        b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr) + png._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="16-bit"):
        png.decode_png(data16)
    # interlace rejected
    ihdr7 = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    data7 = (
        b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr7) + png._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="Adam7"):
        png.decode_png(data7)
    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"\x89PNH" + b"\x00" * 20)


def test_multimodal_dispatch_decodes_png():
    from coastsat_spark.operators import multimodal as MM

    img = _noise(12, 16, 3, seed=9)
    out = MM.decode_image_bytes(png.encode_png(img))
    assert np.array_equal(out, img)
    g = _noise(5, 6, seed=2)
    out = MM.decode_image_bytes(png.encode_png(g))
    assert out.shape == (5, 6, 1) and np.array_equal(out[:, :, 0], g)
