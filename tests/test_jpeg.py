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
    # SOF2 with a baseline full-band interleaved scan is MALFORMED
    # progressive (DC scan must have Se=0) -> ValueError, not silence
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se != 0"):
        jpeg.decode_jpeg(bytes(data))
    data[sof + 1] = 0xCA  # SOF10: progressive + arithmetic coding
    with pytest.raises(NotImplementedError, match="arithmetic"):
        jpeg.decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG\r\n")


# ---------------------------------------------------------- progressive


@pytest.mark.parametrize(
    "shape,sub",
    [
        ((16, 16), "444"),          # grayscale
        ((24, 31, 3), "444"),       # odd width, no subsampling
        ((33, 18, 3), "420"),       # odd height, 2x2 chroma subsampling
        ((8, 8, 3), "420"),         # single MCU
    ],
)
@pytest.mark.parametrize("quality", [75, 95])
def test_progressive_roundtrip_bit_identical_to_baseline(shape, sub, quality):
    """The DC-first(Al=1)/DC-refine/AC-first(Al=1)/AC-refine scan script
    is lossless w.r.t. the quantized coefficients (the refine scans
    restore the successive-approximation bit), so decode(progressive)
    must equal decode(baseline) BIT FOR BIT on the same input."""
    rng = np.random.default_rng(hash((shape, quality)) % 2**32)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    img = (img.astype(np.float32) * 0.3 + 128 * 0.7).astype(np.uint8)
    sub_eff = sub if len(shape) == 3 else "444"
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=quality, subsample=sub_eff))
    prog = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, quality=quality, subsample=sub_eff, progressive=True)
    )
    assert prog.shape == base.shape and prog.dtype == base.dtype
    assert np.array_equal(prog, base)


def test_progressive_stream_is_sof2_multiscans():
    img = _smooth(16, 24)
    data = jpeg.encode_jpeg(img, quality=85, progressive=True)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    # DC-first + DC-refine + 3x AC-first + 3x AC-refine = 8 SOS scans
    assert data.count(b"\xff\xda") == 8


def test_progressive_eobn_hand_assembled():
    """EOBn runs spanning >1 block (which our encoder never emits: it
    keeps EOB runs at 1) — hand-assemble a grayscale SOF2 stream whose
    AC-first scan uses EOB3 (r=2, eobrun covering 4 blocks), and pin the
    decode against the literal IDCT of the intended coefficients.

    Layout: 8x32 grayscale, all-1 quant table. DC-first scan (Al=0)
    writes DC=16 for block 0 then zero diffs. AC-first scan (Ss=1,
    Se=63, Al=0): block 0 sets zigzag k=1 to +3 then EOB0; block 1
    opens with EOB3 (run-length r=2, two extra bits 0b01 -> eobrun =
    (1<<2)-1 + 1 = 4), ending blocks 1..3 with no further symbols."""
    import struct

    # DC: Annex-K luma table. AC: EOBn symbols (0x20 = EOB3) are NOT in
    # Annex K, so hand-build a 3-symbol canonical table — length-2 codes
    # 00 -> 0x02 (run0,size2), 01 -> 0x00 (EOB0), 10 -> 0x20 (EOBn r=2).
    dc_codes = jpeg._canonical_codes(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    AC_BITS = [0, 3] + [0] * 14
    AC_VALS = [0x02, 0x00, 0x20]
    ac_codes = jpeg._canonical_codes(AC_BITS, AC_VALS)

    # --- DC-first scan: diffs 16, 0, 0, 0 at Al=0
    bw = jpeg._BitWriter()
    for diff in (16, 0, 0, 0):
        s = jpeg._csize(diff)
        c, ln = dc_codes[s]
        bw.put(c, ln)
        if s:
            jpeg._put_amp(bw, diff, s)
    bw.pad_to_byte()
    dc_scan = bytes(bw.out)

    # --- AC-first scan: block0 (run=0,size=2)->+3 then EOB0; block1 EOB3
    bw = jpeg._BitWriter()
    c, ln = ac_codes[0x02]  # run 0, size 2
    bw.put(c, ln)
    jpeg._put_amp(bw, 3, 2)
    c, ln = ac_codes[0x00]  # EOB0: ends block 0
    bw.put(c, ln)
    c, ln = ac_codes[0x20]  # (r=2, s=0): EOBn symbol
    bw.put(c, ln)
    bw.put(0b01, 2)  # eobrun = (1<<2)-1 + 1 = 4 -> blocks 1..3 done
    bw.pad_to_byte()
    ac_scan = bytes(bw.out)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 32, 1)
    out += struct.pack("BBB", 1, 0x11, 0)
    for tc_th, hb, hv in (
        (0x00, jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS),
        (0x10, AC_BITS, AC_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(hv), tc_th)
        out += bytes(hb) + bytes(hv)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0x00])
    out += dc_scan
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0x00])
    out += ac_scan
    out += b"\xff\xd9"

    got = jpeg.decode_jpeg(bytes(out))
    assert got.shape == (8, 32)

    # Independent expectation: block 0 has DC=16, natural (0,1)=3 (zigzag
    # index 1); blocks 1..3 have DC=16 (zero diffs) and no AC.
    coef = np.zeros((4, 8, 8))
    coef[:, 0, 0] = 16.0
    coef[0, 0, 1] = 3.0
    pix = jpeg.idct2d(coef) + 128.0
    want = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    want = np.concatenate([want[i] for i in range(4)], axis=1)
    assert np.array_equal(got, want)


def test_multimodal_dispatch_decodes_jpeg():
    from coastsat_spark.operators import multimodal as MM

    payload = MM.make_jpeg_image(5, w=16, h=12)
    img = MM.decode_image_bytes(payload)
    assert img.shape == (12, 16, 3) and img.dtype == np.uint8
    # deterministic payloads: same idx -> same bytes, different idx differs
    assert MM.make_jpeg_image(5) == payload
    assert MM.make_jpeg_image(6) != payload
    # progressive payloads flow through the same dispatch, same pixels
    prog = MM.make_jpeg_image(5, w=16, h=12, progressive=True)
    assert prog != payload and prog[3] == 0xE0  # distinct bytes, real JFIF
    assert np.array_equal(MM.decode_image_bytes(prog), img)


# ----------------------------------------------------- property fuzzing

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=80, deadline=None)
@given(
    gray=st.booleans(),
    sub=st.sampled_from(["444", "420"]),
    quality=st.integers(min_value=30, max_value=100),
    restart=st.integers(min_value=0, max_value=4),
    h=st.integers(min_value=1, max_value=36),
    w=st.integers(min_value=1, max_value=36),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_jpeg_decode_equivalence_property(gray, sub, quality, restart, h, w, seed):
    """Content-independent invariant: restart markers and the
    progressive scan script re-encode the SAME quantized coefficients,
    so decode(baseline), decode(baseline+DRI) and decode(progressive)
    must agree pixel-for-pixel on arbitrary noise images of arbitrary
    (incl. sub-MCU) sizes."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=quality, subsample=sub))
    assert base.shape == shape and base.dtype == np.uint8
    dri = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, quality=quality, subsample=sub, restart_interval=restart)
    )
    assert np.array_equal(dri, base)
    prog = jpeg.decode_jpeg(
        jpeg.encode_jpeg(
            img,
            quality=quality,
            subsample=sub,
            progressive=True,
            restart_interval=restart,
        )
    )
    assert np.array_equal(prog, base)


@settings(max_examples=150, deadline=None)
@given(data=st.data())
def test_jpeg_arbitrary_scan_script_property(data):
    """The G.2 decoder's general paths — arbitrary spectral-selection
    band splits, successive-approximation depth 0-3, per-component
    (non-interleaved) DC scans — pinned by fuzzing the scan script:
    every complete script must reconstruct the exact baseline decode."""
    gray = data.draw(st.booleans(), label="gray")
    sub = data.draw(st.sampled_from(["444", "420"]), label="sub")
    h = data.draw(st.integers(1, 32), label="h")
    w = data.draw(st.integers(1, 32), label="w")
    seed = data.draw(st.integers(0, 2**31), label="seed")
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    ncomp = 1 if gray else 3

    script = []
    if data.draw(st.booleans(), label="dc_interleaved") and ncomp > 1:
        script.append((list(range(ncomp)), 0, 0, data.draw(st.integers(0, 2))))
    else:
        for ci in range(ncomp):
            script.append(([ci], 0, 0, data.draw(st.integers(0, 2))))
    for ci in range(ncomp):
        ncuts = data.draw(st.integers(0, 2), label=f"ncuts{ci}")
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(2, 63), min_size=ncuts, max_size=ncuts, unique=True
                ),
                label=f"cuts{ci}",
            )
        )
        lo = 1
        for cut in cuts + [64]:
            script.append(([ci], lo, cut - 1, data.draw(st.integers(0, 3))))
            lo = cut

    restart = data.draw(st.integers(0, 4), label="restart")
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=75, subsample=sub))
    prog = jpeg.decode_jpeg(
        jpeg.encode_jpeg(
            img,
            quality=75,
            subsample=sub,
            progressive=True,
            scan_script=script,
            restart_interval=restart,
        )
    )
    assert np.array_equal(prog, base)


def test_jpeg_libjpeg_style_scan_script():
    """The scan script libjpeg actually emits by default (interleaved
    DC at Al=1, luma AC split 1-5 / 6-63 at Al=2, chroma full-band)
    decodes identically to baseline."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 29, 3), dtype=np.uint8)
    script = [
        ([0, 1, 2], 0, 0, 1),
        ([0], 1, 5, 2),
        ([0], 6, 63, 2),
        ([1], 1, 63, 1),
        ([2], 1, 63, 1),
    ]
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=80, subsample="420"))
    prog = jpeg.decode_jpeg(
        jpeg.encode_jpeg(
            img, quality=80, subsample="420", progressive=True, scan_script=script
        )
    )
    assert np.array_equal(prog, base)
    with pytest.raises(ValueError, match="progressive"):
        jpeg.encode_jpeg(img, scan_script=script)
    with pytest.raises(ValueError, match="single-component"):
        jpeg.encode_jpeg(
            img, progressive=True, scan_script=[([0, 1], 1, 63, 0)]
        )
