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
    # invalid depth rejected
    ihdr = struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0)
    bad = b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr) + png._chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="depth"):
        png.decode_png(bad)
    # 16-bit palette is spec-invalid
    ihdr16p = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    bad16p = (
        b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr16p) + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette"):
        png.decode_png(bad16p)
    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"\x89PNH" + b"\x00" * 20)


def test_roundtrip_16bit_exact():
    """uint16 input writes depth-16 PNG; decode returns uint16 with the
    exact big-endian sample values, for grey / RGB / RGBA."""
    rng = np.random.default_rng(11)
    for c in (None, 3, 4):
        shape = (9, 13) if c is None else (9, 13, c)
        img = rng.integers(0, 65536, shape, dtype=np.uint16)
        out = png.decode_png(png.encode_png(img))
        assert out.dtype == np.uint16
        assert np.array_equal(out, img), c


def test_roundtrip_adam7_exact():
    """Adam7 interlaced roundtrips bit-exactly, including sizes below
    8 px where several passes are empty, for 8- and 16-bit depths."""
    rng = np.random.default_rng(12)
    for h, w in [(1, 1), (2, 2), (3, 5), (7, 7), (8, 8), (9, 31), (16, 17)]:
        img8 = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out8 = png.decode_png(png.encode_png(img8, interlace=True))
        assert np.array_equal(out8, img8), (h, w, 8)
        img16 = rng.integers(0, 65536, (h, w), dtype=np.uint16)
        out16 = png.decode_png(png.encode_png(img16, interlace=True))
        assert np.array_equal(out16, img16), (h, w, 16)
    # interlaced stream really differs from sequential (same pixels)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert png.encode_png(img, interlace=True) != png.encode_png(img)


def _hand_png_depth(w, h, depth, ctype, scanlines, extra=b""):
    """Assemble a PNG with the given bit depth from pre-packed rows
    (each scanline = filter byte + packed payload)."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + extra
        + png._chunk(b"IDAT", zlib.compress(scanlines))
        + png._chunk(b"IEND", b"")
    )


def test_sub8bit_grey_decode_scales_to_full_range():
    """1-bit grey: packed MSB-first, scaled 0/255. 4-bit: 0..15 -> x*17."""
    # 1-bit, w=10: bits 1010101011 -> padded to 2 bytes 0b10101010 0b11000000
    row = bytes([0]) + bytes([0b10101010, 0b11000000])
    out = png.decode_png(_hand_png_depth(10, 1, 1, 0, row))
    assert out.shape == (1, 10)
    assert np.array_equal(out[0], [255, 0] * 4 + [255, 255])
    # 4-bit, w=3: samples 15, 7, 1 -> bytes 0xF7 0x10
    row4 = bytes([0]) + bytes([0xF7, 0x10])
    out4 = png.decode_png(_hand_png_depth(3, 1, 4, 0, row4))
    assert np.array_equal(out4[0], [255, 119, 17])


def test_sub8bit_palette_decode():
    """2-bit palette indexes unpack MSB-first and look up PLTE."""
    pal = np.array([[10, 0, 0], [0, 20, 0], [0, 0, 30], [40, 40, 40]], np.uint8)
    # w=5 indexes 3,0,1,2,3 -> bits 11 00 01 10 11 -> bytes 0b11000110 0b11000000
    row = bytes([0]) + bytes([0b11000110, 0b11000000])
    data = _hand_png_depth(5, 1, 2, 3, row, extra=png._chunk(b"PLTE", pal.tobytes()))
    out = png.decode_png(data)
    assert out.shape == (1, 5, 3)
    assert np.array_equal(out[0], pal[[3, 0, 1, 2, 3]])
    # out-of-range palette index fails loudly
    row_bad = bytes([0]) + bytes([0b11111111, 0b11000000])
    pal2 = pal[:2]
    bad = _hand_png_depth(5, 1, 2, 3, row_bad, extra=png._chunk(b"PLTE", pal2.tobytes()))
    with pytest.raises(ValueError, match="palette index"):
        png.decode_png(bad)


def test_adam7_hand_built_pass_placement():
    """Hand-assemble a 8x8 1-channel Adam7 stream with filter 0
    everywhere and distinct per-pass values; decode must place each
    pass's pixels at the spec grid positions."""
    vals = {1: 10, 2: 20, 3: 30, 4: 40, 5: 50, 6: 60, 7: 70}
    dims = [(1, 1), (1, 1), (2, 1), (2, 2), (4, 2), (4, 4), (8, 4)]  # (pw, ph)
    stream = b""
    for p, (pw, ph) in enumerate(dims, start=1):
        for _ in range(ph):
            stream += bytes([0]) + bytes([vals[p]] * pw)
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 1)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(stream))
        + png._chunk(b"IEND", b"")
    )
    out = png.decode_png(data)
    expect = np.zeros((8, 8), np.uint8)
    for val, (x0, y0, dx, dy) in zip(
        [10, 20, 30, 40, 50, 60, 70], png._ADAM7
    ):
        expect[y0::dy, x0::dx] = val
    assert np.array_equal(out, expect)


def test_multimodal_dispatch_decodes_png():
    from coastsat_spark.operators import multimodal as MM

    img = _noise(12, 16, 3, seed=9)
    out = MM.decode_image_bytes(png.encode_png(img))
    assert np.array_equal(out, img)
    g = _noise(5, 6, seed=2)
    out = MM.decode_image_bytes(png.encode_png(g))
    assert out.shape == (5, 6, 1) and np.array_equal(out[:, :, 0], g)


# ----------------------------------------------------- property fuzzing

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    depth16=st.booleans(),
    c=st.sampled_from([None, 3, 4]),
    interlace=st.booleans(),
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_png_roundtrip_property(depth16, c, interlace, h, w, seed):
    """PNG is lossless: encode->decode is EXACT for every shape x
    channel-count x bit-depth x interlace combination, including the
    degenerate 1-px rows/columns where Adam7 passes go empty."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    if depth16:
        img = rng.integers(0, 65536, shape, dtype=np.uint16)
    else:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = png.decode_png(png.encode_png(img, interlace=interlace))
    assert out.dtype == img.dtype and out.shape == img.shape
    assert np.array_equal(out, img)
