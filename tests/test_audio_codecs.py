"""G.711 (mu-law / A-law) and IMA ADPCM codecs: exact involution
properties, an independent scalar reference for the vectorized ADPCM
loops, WAV container plumbing for all four tags, and hostile-input
behavior (truncation sweeps must raise cleanly, never hang)."""

import struct

import numpy as np
import pytest

from coastsat_spark.functions import audio
from coastsat_spark.operators import multimodal as MM

ALL_INT16 = np.arange(-32768, 32768, dtype=np.int16)


def test_mulaw_involution_and_error_bound():
    # encode(decode(byte)) == byte for every code except 0x7F ("minus
    # zero", which decodes to 0 and re-encodes as the positive zero 0xFF)
    codes = np.arange(256, dtype=np.uint8)
    rt = audio.mulaw_encode(audio.mulaw_decode(codes))
    keep = codes != 0x7F
    np.testing.assert_array_equal(rt[keep], codes[keep])
    assert rt[~keep][0] == 0xFF
    # decode(encode(x)) error is bounded by half the segment step
    dec = audio.mulaw_decode(audio.mulaw_encode(ALL_INT16))
    err = np.abs(dec.astype(np.int32) - ALL_INT16.astype(np.int32))
    assert err.max() <= 1024  # top-segment step is 2048
    assert np.abs(err[np.abs(ALL_INT16.astype(np.int32)) < 30]).max() <= 4


def test_alaw_involution_and_error_bound():
    codes = np.arange(256, dtype=np.uint8)
    np.testing.assert_array_equal(
        audio.alaw_encode(audio.alaw_decode(codes)), codes
    )
    dec = audio.alaw_decode(audio.alaw_encode(ALL_INT16))
    err = np.abs(dec.astype(np.int32) - ALL_INT16.astype(np.int32))
    assert err.max() <= 512  # top-segment step is 1024
    assert err[np.abs(ALL_INT16.astype(np.int32)) < 200].max() <= 16


def _ima_decode_scalar(data, block_align, n_samples=None):
    """Independent scalar IMA reference (straight off the spec)."""
    out = []
    for b0 in range(0, len(data) - block_align + 1, block_align):
        blk = data[b0 : b0 + block_align]
        pred = struct.unpack_from("<h", blk, 0)[0]
        index = blk[2]
        out.append(pred)
        for byte in blk[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                step = int(audio._STEP_TABLE[index])
                diff = step >> 3
                if nib & 4:
                    diff += step
                if nib & 2:
                    diff += step >> 1
                if nib & 1:
                    diff += step >> 2
                pred = pred - diff if nib & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                index = max(0, min(88, index + int(audio._INDEX_TABLE[nib])))
                out.append(pred)
    a = np.array(out, dtype=np.int16)
    return a[:n_samples] if n_samples is not None else a


def _sine(n, sr=8000, f=440.0, amp=12000):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.int16)


def test_ima_vectorized_matches_scalar_reference():
    rng = np.random.default_rng(11)
    x = (rng.integers(-32768, 32768, size=1500)).astype(np.int16)
    data, n = audio.ima_adpcm_encode(x, block_align=64)
    vec = audio.ima_adpcm_decode(data, 64, n)
    ref = _ima_decode_scalar(data, 64, n)
    np.testing.assert_array_equal(vec, ref)
    assert n == 1500 and len(vec) == 1500


def test_ima_roundtrip_tracks_smooth_signal():
    x = _sine(4000)
    data, n = audio.ima_adpcm_encode(x, block_align=256)
    dec = audio.ima_adpcm_decode(data, 256, n)
    e = dec.astype(np.float64) - x.astype(np.float64)
    snr = 10 * np.log10(np.mean(x.astype(np.float64) ** 2) / np.mean(e**2))
    # typical IMA-ADPCM quality on a 440 Hz sine at 8 kHz is ~30 dB
    assert snr > 25.0, snr
    assert np.abs(e).max() < 1500


def test_ima_hostile_headers():
    with pytest.raises(ValueError, match="block_align"):
        audio.ima_adpcm_decode(b"\x00" * 64, 4)
    with pytest.raises(ValueError, match="complete block"):
        audio.ima_adpcm_decode(b"\x00" * 7, 8)
    bad = bytearray(64)
    bad[2] = 89  # step index out of range
    with pytest.raises(ValueError, match="step index"):
        audio.ima_adpcm_decode(bytes(bad), 64)
    with pytest.raises(ValueError):
        audio.ima_adpcm_encode(np.array([], dtype=np.int16))
    with pytest.raises(ValueError):
        audio.ima_adpcm_encode(np.ones(10, np.int16), block_align=6)


@pytest.mark.parametrize("codec,tag", [("pcm", 1), ("ulaw", 7), ("alaw", 6), ("ima", 0x11)])
def test_wav_container_all_tags(codec, tag):
    x = _sine(1017)  # odd length: exercises the RIFF pad byte
    payload = MM.encode_wav(x, 8000, codec=codec)
    assert struct.unpack_from("<H", payload, 20)[0] == tag
    sr, dec = MM.decode_wav(payload)
    assert sr == 8000 and len(dec) == 1017
    err = np.abs(dec.astype(np.int32) - x.astype(np.int32))
    if codec == "pcm":
        assert err.max() == 0
    else:
        assert err.max() < 1024
    # decode_audio_bytes routes the same way
    sr2, dec2 = MM.decode_audio_bytes(payload)
    np.testing.assert_array_equal(dec2, dec)


def test_wav_pcm_bytes_unchanged():
    """codec='pcm' must produce the exact original encoder layout — the
    multimodal oracle replays these payloads byte-for-byte."""
    x = _sine(16)
    data = x.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    legacy = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert MM.encode_wav(x, 8000) == legacy


def test_wav_truncation_sweep():
    x = _sine(600)
    for codec in ("ulaw", "alaw", "ima"):
        payload = MM.encode_wav(x, 8000, codec=codec)
        for cut in range(0, len(payload), 97):
            try:
                MM.decode_wav(payload[:cut])
            except Exception:
                pass  # clean raise is fine; hang/corruption is not
    with pytest.raises(ValueError, match="codec"):
        MM.encode_wav(x, 8000, codec="mp3")
