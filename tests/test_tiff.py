"""TIFF / GeoTIFF codec (functions/tiff.py). TIFF is lossless, so
roundtrips pin EXACT equality across dtype x compression x predictor x
strip/tile x endianness. Conformance beyond self-roundtrip is pinned by
hand-derived byte vectors: the LZW stream for b"aaabbb" worked out bit
by bit from the TIFF 6.0 early-change protocol, and the PackBits
example string from the spec (Section 9)."""

import struct

import numpy as np
import pytest

from coastsat_spark.functions import tiff as tf


def _img(dt: str, shape, seed=0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if dt[0] == "f":
        return rng.standard_normal(shape).astype(dt)
    info = np.iinfo(np.dtype(dt))
    return rng.integers(info.min, info.max, shape, dtype=dt)


# ------------------------------------------------------------------ LZW


def test_lzw_pinned_vector():
    # Hand-derived: Clear(256) 'a'(97) 258 'b'(98) 260 EOI(257), 9-bit
    # codes MSB-first, zero-padded -> 80 18 60 46 28 24 04.
    assert tf.lzw_encode(b"aaabbb").hex() == "80186046282404"
    assert tf.lzw_decode(bytes.fromhex("80186046282404")) == b"aaabbb"


@pytest.mark.parametrize("n", [0, 1, 2, 255, 4096, 70_000])
def test_lzw_roundtrip_random(n):
    data = _img("u1", n, seed=n).tobytes()
    assert tf.lzw_decode(tf.lzw_encode(data)) == data


def test_lzw_roundtrip_deep_table():
    # Compressible stream long enough to fill the 12-bit table and force
    # the encoder's Clear/reset cycle (the width-resync hot spot).
    rng = np.random.default_rng(7)
    data = bytes(rng.integers(0, 3, 200_000, dtype=np.uint8)) + b"ab" * 20_000
    assert tf.lzw_decode(tf.lzw_encode(data)) == data


def test_lzw_widen_boundary_roundtrip():
    # All-distinct pairs: table grows by 1 per input byte, marching the
    # code width through every early-change boundary (511/1023/2047).
    data = bytes(range(256)) * 20
    assert tf.lzw_decode(tf.lzw_encode(data)) == data


def test_lzw_truncated_stream_tolerated():
    enc = tf.lzw_encode(b"abcabcabc")
    out = tf.lzw_decode(enc[:-1])
    assert b"abcabc".startswith(out[:6])


def test_lzw_bad_first_code():
    # 9-bit Clear followed by 9-bit code 300 (> last literal, nothing
    # assigned yet) must be rejected, not crash.
    bits = "100000000" + format(300, "09b")
    bits += "0" * (-len(bits) % 8)  # left-aligned stream, pad on the right
    raw = int(bits, 2).to_bytes(len(bits) // 8, "big")
    with pytest.raises(ValueError, match="first code"):
        tf.lzw_decode(raw)


# ------------------------------------------------------------- PackBits


def test_packbits_spec_example():
    # TIFF 6.0 spec, PackBits section: the canonical Apple example.
    enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    exp = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22" + "AA" * 10)
    assert tf.packbits_decode(enc) == exp


@pytest.mark.parametrize("n", [0, 1, 127, 128, 129, 5000])
def test_packbits_roundtrip(n):
    data = _img("u1", n, seed=n).tobytes()
    assert tf.packbits_decode(tf.packbits_encode(data)) == data
    runs = b"\x00" * n + data[: n // 2] + b"\xff" * 300
    assert tf.packbits_decode(tf.packbits_encode(runs)) == runs


# ------------------------------------------------- full-file roundtrips


@pytest.mark.parametrize("dt", ["u1", "u2", "u4", "i1", "i2", "i4", "f4", "f8"])
@pytest.mark.parametrize("comp", ["none", "lzw", "deflate", "packbits"])
def test_roundtrip_dtype_x_compression(dt, comp):
    for shape in [(7, 5), (17, 9, 3)]:
        img = _img(dt, shape, seed=hash((dt, comp)) % 1000)
        out = tf.decode_tiff(tf.encode_tiff(img, compression=comp))
        exp = img if img.ndim == 3 else img[:, :, None]
        assert out.shape == exp.shape and np.array_equal(out, exp)


@pytest.mark.parametrize("dt", ["u1", "u2", "u4", "i2", "i4"])
@pytest.mark.parametrize("be", [False, True])
@pytest.mark.parametrize("tile", [None, (16, 16)])
def test_roundtrip_predictor_endianness_layout(dt, be, tile):
    img = _img(dt, (33, 17, 3), seed=3)
    b = tf.encode_tiff(img, compression="deflate", predictor=True, tile=tile, big_endian=be)
    assert b[:2] == (b"MM" if be else b"II")
    assert np.array_equal(tf.decode_tiff(b), img)


def test_roundtrip_multi_strip():
    img = _img("u2", (100, 13), seed=9)
    b = tf.encode_tiff(img, compression="lzw", rows_per_strip=7)
    _, tags = tf._read_tags(b)
    assert len(tags[273]) == -(-100 // 7)  # 15 strips actually written
    assert np.array_equal(tf.decode_tiff(b)[:, :, 0], img)


def test_roundtrip_tile_padding():
    # Image not a multiple of the tile size: padded tiles must crop back.
    img = _img("u1", (19, 21, 3), seed=4)
    b = tf.encode_tiff(img, compression="packbits", tile=(16, 32))
    assert np.array_equal(tf.decode_tiff(b), img)


def test_roundtrip_single_pixel_and_wide():
    for shape in [(1, 1), (1, 500), (500, 1)]:
        img = _img("f8", shape, seed=shape[0])
        assert np.array_equal(tf.decode_tiff(tf.encode_tiff(img))[:, :, 0], img)


# -------------------------------------------------------------- GeoTIFF


def test_geotiff_transform_epsg_roundtrip():
    img = _img("u2", (20, 30, 5), seed=1)
    gt = (500000.0, 10.0, 0.0, 4100000.0, 0.0, -10.0)
    arr, meta = tf.decode_geotiff(
        tf.encode_geotiff(img, transform=gt, epsg=32630, compression="lzw", predictor=True)
    )
    assert np.array_equal(arr, img)
    assert meta["transform"] == pytest.approx(gt)
    assert meta["epsg"] == 32630


def test_geotiff_geographic_epsg():
    img = _img("u1", (4, 4), seed=2)
    _, meta = tf.decode_geotiff(tf.encode_geotiff(img, epsg=4326))
    assert meta["epsg"] == 4326


def test_geotiff_model_transformation_tag():
    # Hand-built file with ModelTransformation (34264): a 16-double
    # affine matrix overrides PixelScale+Tiepoint and supports rotation.
    img = np.arange(6, dtype=np.uint8).reshape(2, 3)
    m = np.zeros(16)
    m[0], m[1], m[3] = 2.0, 0.5, 100.0   # sx, rx, x0
    m[4], m[5], m[7] = 0.25, -2.0, 900.0  # ry, sy, y0
    data = img.tobytes()
    mt = m.astype("<f8").tobytes()
    entries = [
        (256, 4, 1, struct.pack("<I", 3)),
        (257, 4, 1, struct.pack("<I", 2)),
        (258, 3, 1, struct.pack("<H", 8)),
        (259, 3, 1, struct.pack("<H", 1)),
        (273, 4, 1, struct.pack("<I", 8)),
        (277, 3, 1, struct.pack("<H", 1)),
        (278, 4, 1, struct.pack("<I", 2)),
        (279, 4, 1, struct.pack("<I", len(data))),
        (34264, 12, 16, mt),
    ]
    overflow_base = 8 + len(data)
    overflow = bytearray()
    packed = []
    for tag, typ, count, val in entries:
        if len(val) <= 4:
            packed.append(struct.pack("<HHI", tag, typ, count) + val.ljust(4, b"\x00"))
        else:
            packed.append(
                struct.pack("<HHII", tag, typ, count, overflow_base + len(overflow))
            )
            overflow += val
    ifd_off = overflow_base + len(overflow)
    blob = (
        b"II" + struct.pack("<HI", 42, ifd_off) + data + bytes(overflow)
        + struct.pack("<H", len(packed)) + b"".join(packed) + struct.pack("<I", 0)
    )
    arr, meta = tf.decode_geotiff(blob)
    assert np.array_equal(arr[:, :, 0], img)
    assert meta["transform"] == (100.0, 2.0, 0.5, 900.0, 0.25, -2.0)


def test_geotiff_rotated_transform_rejected():
    with pytest.raises(NotImplementedError, match="rotated"):
        tf.encode_geotiff(_img("u1", (2, 2)), transform=(0, 1, 0.5, 0, 0, -1))


# ------------------------------------------------- planar + hand-built


def _hand_planar_tiff(img: np.ndarray) -> bytes:
    """Minimal uncompressed PlanarConfiguration=2 writer (decode-only
    feature of the codec, so the test supplies the file)."""
    h, w, spp = img.shape
    data = img.astype("<u2")
    planes = [np.ascontiguousarray(data[:, :, b]).tobytes() for b in range(spp)]
    offsets, pos = [], 8
    for p in planes:
        offsets.append(pos)
        pos += len(p)
    entries = [
        (256, 4, 1, struct.pack("<I", w)),
        (257, 4, 1, struct.pack("<I", h)),
        (258, 3, spp, struct.pack(f"<{spp}H", *([16] * spp))),
        (259, 3, 1, struct.pack("<H", 1)),
        (273, 4, spp, struct.pack(f"<{spp}I", *offsets)),
        (277, 3, 1, struct.pack("<H", spp)),
        (278, 4, 1, struct.pack("<I", h)),
        (279, 4, spp, struct.pack(f"<{spp}I", *[len(p) for p in planes])),
        (284, 3, 1, struct.pack("<H", 2)),
    ]
    overflow = bytearray()
    ifd_probe = pos  # overflow lands at pos, IFD after it
    packed = []
    for tag, typ, count, val in entries:
        if len(val) <= 4:
            packed.append(struct.pack("<HHI", tag, typ, count) + val.ljust(4, b"\x00"))
        else:
            packed.append(
                struct.pack("<HHII", tag, typ, count, ifd_probe + len(overflow))
            )
            overflow += val
    ifd_off = ifd_probe + len(overflow)
    out = bytearray(b"II" + struct.pack("<HI", 42, ifd_off))
    for p in planes:
        out += p
    out += overflow
    out += struct.pack("<H", len(packed)) + b"".join(packed) + struct.pack("<I", 0)
    return bytes(out)


def test_planar_configuration_2_decode():
    img = _img("u2", (6, 9, 3), seed=11)
    out = tf.decode_tiff(_hand_planar_tiff(img))
    assert np.array_equal(out, img)


# ---------------------------------------------------------- error edges


def test_bigtiff_roundtrip():
    # BigTIFF layout: 16-byte header, u64 IFD offset, 20-byte entries,
    # LONG8 segment offsets — exact roundtrip incl. geo tags, both
    # byte orders, strips and tiles.
    img = _img("u2", (20, 30, 5), seed=8)
    gt = (500000.0, 10.0, 0.0, 4100000.0, 0.0, -10.0)
    for be, tile in [(False, None), (True, None), (False, (16, 16))]:
        b = tf.encode_geotiff(
            img, transform=gt, epsg=32630, compression="lzw",
            predictor=True, tile=tile, big_endian=be, bigtiff=True,
        )
        assert struct.unpack_from(("<" if not be else ">") + "H", b, 2)[0] == 43
        arr, meta = tf.decode_geotiff(b)
        assert np.array_equal(arr, img)
        assert meta["transform"] == pytest.approx(gt)
        assert meta["epsg"] == 32630


def test_bigtiff_bad_offset_size_rejected():
    with pytest.raises(ValueError, match="BigTIFF header"):
        tf.decode_tiff(b"II" + struct.pack("<HHHQ", 43, 4, 0, 16) + b"\x00" * 16)


def test_not_a_tiff():
    with pytest.raises(ValueError, match="byte-order"):
        tf.decode_tiff(b"PK\x03\x04junk")
    with pytest.raises(ValueError, match="magic"):
        tf.decode_tiff(b"II" + struct.pack("<HI", 99, 8) + b"\x00" * 8)


def test_float_predictor_rejected():
    with pytest.raises(NotImplementedError, match="predictor"):
        tf.encode_tiff(_img("f4", (4, 4)), predictor=True)


def test_bad_tile_dims_rejected():
    with pytest.raises(ValueError, match="multiples of 16"):
        tf.encode_tiff(_img("u1", (4, 4)), tile=(10, 16))


def test_unknown_compression_name():
    with pytest.raises(ValueError, match="compression"):
        tf.encode_tiff(_img("u1", (4, 4)), compression="zstd")


def test_truncated_segment_detected():
    b = bytearray(tf.encode_tiff(_img("u2", (8, 8), seed=3), compression="none"))
    _, tags = tf._read_tags(bytes(b))
    # shrink the declared strip byte count so the decoder sees too few
    cnt_off = None
    n_entries = struct.unpack_from("<H", b, struct.unpack_from("<I", b, 4)[0])[0]
    ifd = struct.unpack_from("<I", b, 4)[0]
    for i in range(n_entries):
        off = ifd + 2 + 12 * i
        tag = struct.unpack_from("<H", b, off)[0]
        if tag == 279:
            cnt_off = off + 8
    struct.pack_into("<I", b, cnt_off, 10)
    with pytest.raises(ValueError, match="expected"):
        tf.decode_tiff(bytes(b))


# ----------------------------------------------------- property fuzzing

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    dt=st.sampled_from(["u1", "u2", "u4", "i1", "i2", "i4", "f4", "f8"]),
    comp=st.sampled_from(["none", "lzw", "deflate", "packbits"]),
    pred=st.booleans(),
    be=st.booleans(),
    bigtiff=st.booleans(),
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    bands=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_roundtrip_property(dt, comp, pred, be, bigtiff, h, w, bands, seed):
    if pred and dt in ("f4", "f8"):
        pred = False
    img = _img(dt, (h, w, bands), seed=seed)
    out = tf.decode_tiff(
        tf.encode_tiff(
            img, compression=comp, predictor=pred, big_endian=be, bigtiff=bigtiff
        )
    )
    assert out.shape == img.shape and np.array_equal(out, img)


@settings(max_examples=60, deadline=None)
@given(data=st.binary(max_size=20_000))
def test_lzw_roundtrip_property(data):
    assert tf.lzw_decode(tf.lzw_encode(data)) == data


@settings(max_examples=60, deadline=None)
@given(data=st.binary(max_size=20_000))
def test_packbits_roundtrip_property(data):
    assert tf.packbits_decode(tf.packbits_encode(data)) == data
