"""GIF codec: exact paletted roundtrips (plain, interlaced, 256-color,
LZW-stress, animated, transparent, local-table-free), composition
semantics, and hostile-input guards. GIF is lossless, so every
roundtrip pins byte-exact pixel equality."""

import struct

import numpy as np
import pytest

from coastsat_spark.functions.gif import decode_gif, encode_gif
from coastsat_spark.operators.multimodal import decode_image_bytes


def _rng():
    return np.random.default_rng(3)


def test_single_frame_roundtrip():
    rng = _rng()
    pal = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, size=(13, 17), dtype=np.uint8)
    frames, delays = decode_gif(encode_gif(idx, pal))
    assert frames.shape == (1, 13, 17, 3) and delays == [0]
    np.testing.assert_array_equal(frames[0], pal[idx])


def test_interlaced_roundtrip():
    rng = _rng()
    pal = rng.integers(0, 256, size=(9, 3), dtype=np.uint8)
    # heights that exercise every Adam-style pass boundary, incl. h < 8
    for h in (1, 2, 3, 5, 8, 13):
        idx = rng.integers(0, 9, size=(h, 11), dtype=np.uint8)
        frames, _ = decode_gif(encode_gif(idx, pal, interlace=True))
        np.testing.assert_array_equal(frames[0], pal[idx])


def test_full_palette_and_lzw_stress():
    rng = _rng()
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(64, 71), dtype=np.uint8)
    frames, _ = decode_gif(encode_gif(idx, pal))
    np.testing.assert_array_equal(frames[0], pal[idx])
    # long random low-entropy stream: forces code-width growth through 12
    # bits and a table-full clear/reset mid-stream
    pal4 = pal[:4]
    idx4 = rng.integers(0, 4, size=(200, 157), dtype=np.uint8)
    frames, _ = decode_gif(encode_gif(idx4, pal4))
    np.testing.assert_array_equal(frames[0], pal4[idx4])


def test_animation_roundtrip_and_delays():
    rng = _rng()
    pal = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    anim = rng.integers(0, 7, size=(3, 10, 12), dtype=np.uint8)
    frames, delays = decode_gif(encode_gif(anim, pal, delays_cs=[10, 20, 30]))
    assert frames.shape == (3, 10, 12, 3) and delays == [10, 20, 30]
    for i in range(3):
        np.testing.assert_array_equal(frames[i], pal[anim[i]])


def test_transparency_composites_over_background():
    rng = _rng()
    pal = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    anim = rng.integers(0, 7, size=(2, 10, 12), dtype=np.uint8)
    frames, _ = decode_gif(encode_gif(anim, pal, transparent=0))
    # frame 0: transparent pixels show the background (palette entry 0)
    m = anim[0] == 0
    assert (frames[0][m] == pal[0]).all()
    np.testing.assert_array_equal(frames[0][~m], pal[anim[0]][~m])
    # frame 1: transparent pixels show frame 0's pixels (disposal 0 leaves)
    m1 = anim[1] == 0
    np.testing.assert_array_equal(frames[1][m1], frames[0][m1])
    np.testing.assert_array_equal(frames[1][~m1], pal[anim[1]][~m1])


def test_disposal_restore_background():
    rng = _rng()
    pal = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    anim = rng.integers(1, 5, size=(2, 6, 6), dtype=np.uint8)
    frames, _ = decode_gif(encode_gif(anim, pal, transparent=0, disposal=2))
    # disposal 2 restores the canvas to background between frames, so
    # frame 1's transparent pixels (none here: indexes >= 1) are fully
    # its own content and frame 0 leaked nothing forward
    np.testing.assert_array_equal(frames[1], pal[anim[1]])


def test_decode_image_bytes_dispatch():
    rng = _rng()
    pal = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, size=(8, 9), dtype=np.uint8)
    im = decode_image_bytes(encode_gif(idx, pal))
    np.testing.assert_array_equal(im, pal[idx])


def test_hostile_dimensions_rejected_before_allocation():
    rng = _rng()
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    payload = bytearray(encode_gif(rng.integers(0, 4, size=(8, 9), dtype=np.uint8), pal))
    # logical screen claiming 65535 x 65535
    struct.pack_into("<HH", payload, 6, 65535, 65535)
    with pytest.raises(ValueError, match="implausible"):
        decode_gif(bytes(payload))


def test_lzw_expansion_capped_by_declared_frame():
    """A frame declaring w*h pixels never expands its LZW stream past
    that: craft a payload whose stream would decode far more."""
    rng = _rng()
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    big = encode_gif(rng.integers(0, 4, size=(64, 64), dtype=np.uint8), pal)
    small = encode_gif(rng.integers(0, 4, size=(4, 4), dtype=np.uint8), pal)
    # graft the big image's LZW payload under the small header geometry
    hdr = small[: small.index(b"\x2c")]  # through GCT
    img_desc = struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0)
    big_lzw = big[big.index(b"\x2c") + 10 :]  # mcs byte + subblocks + trailer
    frames, _ = decode_gif(hdr + img_desc + big_lzw[:-1] + b"\x3b")
    assert frames.shape == (1, 4, 4, 3)  # capped at 16 pixels, no blow-up


def test_malformed_inputs_raise_cleanly():
    rng = _rng()
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    payload = encode_gif(rng.integers(0, 4, size=(8, 9), dtype=np.uint8), pal)
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with pytest.raises(Exception):
        decode_gif(payload[:-2])  # missing trailer / truncated stream
    with pytest.raises(ValueError):
        decode_gif(payload[:6] + payload[6:13])  # no frames, no trailer
    # oversized palette index in the stream
    bad = bytearray(payload)
    with pytest.raises(Exception):
        decode_gif(bytes(bad[: len(bad) // 2]))


def test_video_frame_features_accepts_gif(spark):
    """Animated GIFs flow through the same frame-sampling operator as
    AVI: one binary row -> n_frames/every feature rows."""
    import pandas as pd

    from coastsat_spark.operators.multimodal import video_frame_features

    rng = _rng()
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    anim = rng.integers(0, 8, size=(6, 9, 11), dtype=np.uint8)
    payload = encode_gif(anim, pal, delays_cs=[4] * 6)
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [7], "payload": [payload]})
    )
    got = video_frame_features(df, every=2).toPandas().sort_values("frame_idx")
    assert list(got.frame_idx) == [0, 2, 4]
    exp0 = pal[anim[0]].reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(
        got.iloc[0][["mean_r", "mean_g", "mean_b"]].to_numpy(float), exp0
    )
