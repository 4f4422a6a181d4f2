"""FLAC codec: exact (lossless) round-trips across subframe types,
stereo decorrelation modes, rice partitions, wasted bits and bit
depths; integrity checks (CRC-8/CRC-16/MD5) and hostile-input guards."""

import numpy as np
import pytest

from coastsat_spark.functions.flac import decode_flac, encode_flac
from coastsat_spark.operators import multimodal as MM


def _mono(n=3000, seed=1, amp=9000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = amp * np.sin(t / 23.0) + rng.normal(0, 150, n)
    return np.clip(x, -32768, 32767).astype(np.int16)


def _stereo(n=2500, seed=2):
    l = _mono(n, seed)
    r = np.clip(l.astype(np.int32) // 2 + _mono(n, seed + 1, amp=500), -32768, 32767)
    return np.stack([l, r.astype(np.int16)], axis=1)


def test_mono_roundtrip_exact():
    x = _mono()
    sr, out, bps = decode_flac(encode_flac(x, 8000))
    assert (sr, bps) == (8000, 16)
    assert np.array_equal(out, x)


def test_short_final_block_and_block_sizes():
    x = _mono(n=1000)
    for bs in (192, 256, 333, 4096):
        _, out, _ = decode_flac(encode_flac(x, 44100, block_size=bs))
        assert np.array_equal(out, x), bs


@pytest.mark.parametrize("mode", ["indep", "ls", "rs", "ms", "auto"])
def test_stereo_modes_roundtrip_exact(mode):
    x = _stereo()
    sr, out, _ = decode_flac(encode_flac(x, 22050, channel_mode=mode))
    assert sr == 22050
    assert out.shape == x.shape
    assert np.array_equal(out, x)


def test_constant_and_verbatim_subframes():
    sil = np.zeros(500, dtype=np.int16)
    _, out, _ = decode_flac(encode_flac(sil, 8000))
    assert np.array_equal(out, sil)
    rng = np.random.default_rng(3)
    noise = rng.integers(-32768, 32768, 700).astype(np.int16)  # defeats prediction
    _, out, _ = decode_flac(encode_flac(noise, 8000, force="verbatim"))
    assert np.array_equal(out, noise)
    # unforced encode of pure noise must also survive (whatever it picks)
    _, out, _ = decode_flac(encode_flac(noise, 8000))
    assert np.array_equal(out, noise)


def test_rice_partitions_roundtrip():
    x = _mono(n=4096 * 2 + 100)
    for po in (1, 2, 4):
        _, out, _ = decode_flac(encode_flac(x, 16000, partition_order=po))
        assert np.array_equal(out, x), po


def test_lpc_and_fixed_only():
    x = _mono(n=2000)
    for order in (0, 4, 8, 12):
        _, out, _ = decode_flac(encode_flac(x, 16000, lpc_order=order))
        assert np.array_equal(out, x), order


def test_wasted_bits_roundtrip():
    x = (_mono(n=800).astype(np.int32) // 64 * 64).astype(np.int16)  # 6 wasted bits
    payload = encode_flac(x, 8000)
    _, out, _ = decode_flac(payload)
    assert np.array_equal(out, x)
    # wasted-bits encode must actually shrink vs the same data declared full-depth
    assert len(payload) < len(encode_flac(x, 8000, force="verbatim"))


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_bit_depths(bps):
    rng = np.random.default_rng(bps)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    x = rng.integers(lo // 2, hi // 2, 900).astype(np.int32)
    sr, out, got_bps = decode_flac(encode_flac(x, 48000, bps=bps))
    assert got_bps == bps
    assert np.array_equal(out, x)


def test_integrity_checks():
    x = _mono(n=600)
    payload = bytearray(encode_flac(x, 8000))
    with pytest.raises(NotImplementedError, match="not a FLAC"):
        decode_flac(b"fLaX" + bytes(payload[4:]))
    # flip one residual byte mid-frame -> CRC-16 (or earlier) must catch it
    bad = bytearray(payload)
    bad[len(bad) // 2] ^= 0xFF
    with pytest.raises(Exception):
        decode_flac(bytes(bad))
    # corrupt the STREAMINFO MD5 only: frames decode, MD5 verify must fire
    bad = bytearray(payload)
    bad[8 + 18] ^= 0xFF  # first md5 byte (4 magic + 4 block header + 18)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad))
    decode_flac(bytes(bad), verify_md5=False)  # opt-out path still decodes


def test_truncation_raises():
    payload = encode_flac(_mono(n=400), 8000)
    with pytest.raises(Exception):
        decode_flac(payload[: len(payload) // 2])


def test_decode_audio_bytes_flac_mono_and_stereo():
    x = _mono(n=512)
    sr, out = MM.decode_audio_bytes(encode_flac(x, 8000))
    assert sr == 8000 and np.array_equal(out, x)
    st = _stereo(n=512)
    sr, out = MM.decode_audio_bytes(encode_flac(st, 8000))
    want = (st[:, 0].astype(np.int64) + st[:, 1]) // 2
    assert np.array_equal(out, want.astype(np.int16))


def test_audio_frame_samples_over_flac(spark):
    """The Spark audio feature operator accepts FLAC payloads unchanged."""
    import pandas as pd

    x = _mono(n=2048)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [7], "kind": ["audio"], "payload": [encode_flac(x, 8000)]}
        ),
        schema="media_id long, kind string, payload binary",
    )
    pdf = MM.audio_frame_samples(df).toPandas()
    assert len(pdf) > 0 and (pdf.rms > 0).all()


def test_compression_beats_raw_on_tonal_signal():
    x = _mono(n=8000)
    payload = encode_flac(x, 8000, lpc_order=8)
    assert len(payload) < 2 * len(x) * 0.75  # >25% under raw PCM
