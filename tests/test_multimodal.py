"""Multimodal plumbing: fake-container codecs, mapInPandas feature
extraction, resize, frame sampling, and the explicit stub contract."""

import numpy as np
import pytest

from coastsat_spark.operators import multimodal as MM


def test_image_roundtrip():
    b = MM.make_fake_image(7, w=10, h=6, c=3)
    im = MM.decode_image_bytes(b)
    assert im.shape == (6, 10, 3)
    assert MM.decode_image_bytes(MM.make_fake_image(7, 10, 6, 3)).tobytes() == im.tobytes()


def test_audio_roundtrip():
    sr, samples = MM.decode_audio_bytes(MM.make_fake_audio(3))
    assert sr == 8000 and len(samples) == 1600


def test_real_codecs_are_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_image_bytes(b"\x89PNG\r\n....")
    with pytest.raises(NotImplementedError):
        MM.decode_audio_bytes(b"RIFFxxxxWAVE")


def test_media_table_and_features(spark):
    media = MM.media_table(spark, 100)
    assert media.count() == 100
    feats = MM.image_features(media).toPandas()
    assert len(feats) == 50
    assert ((feats["mean_r"] >= 0) & (feats["mean_r"] <= 255)).all()
    # deterministic across partitionings
    f2 = MM.image_features(media.repartition(13)).toPandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = f2.sort_values("media_id").reset_index(drop=True)
    assert np.allclose(a["brightness"], b["brightness"])


def test_resize_preserves_container(spark):
    media = MM.media_table(spark, 20)
    out = MM.resize_images(media, 8, 8).toPandas()
    assert (out["width"] == 8).all() and (out["height"] == 8).all()
    im = MM.decode_image_bytes(bytes(out["payload"].iloc[0]))
    assert im.shape == (8, 8, 3)


def test_audio_frames(spark):
    media = MM.media_table(spark, 20)
    frames = MM.audio_frame_samples(media, frame_ms=25).toPandas()
    # 1600 samples @ 8kHz / 200-sample frames = 8 frames per clip, 10 clips
    assert len(frames) == 80
    assert (frames["rms"] > 0).all()


def test_resize_bilinear_parity_and_identity(spark):
    """S6 both modes (SDS_download.py:903-964): bilinear at the source
    size is the identity; a 2x upscale of a constant image stays constant;
    a gradient upscale is monotone with interpolated interior values."""
    import numpy as np
    import struct

    media = MM.media_table(spark, 8)
    same = MM.resize_images(media, 16, 12, mode="bilinear").toPandas()
    for _, r in same.iterrows():
        orig = MM.decode_image_bytes(MM.make_fake_image(int(r["media_id"])))
        got = MM.decode_image_bytes(bytes(r["payload"]))
        assert np.array_equal(orig, got)  # identity at source resolution

    # gradient image: interior bilinear samples are strictly interpolated
    grad = np.tile(np.arange(0, 160, 10, dtype=np.uint8)[None, :, None], (4, 1, 3))
    up = MM._resize_bilinear(grad, 32, 4)
    nn = MM._resize_nearest(grad, 32, 4)
    assert up.shape == (4, 32, 3) and nn.shape == (4, 32, 3)
    assert not np.array_equal(up, nn)  # bilinear differs from NN on gradients
    assert (np.diff(up[0, :, 0].astype(int)) >= 0).all()  # monotone gradient
    # exact value check: doubling a 2-px row [0, 100] center-aligned
    two = np.array([[[0], [100]]], dtype=np.uint8)
    out = MM._resize_bilinear(two, 4, 1)[0, :, 0]
    assert out.tolist() == [0, 25, 75, 100]


def test_resize_rejects_unknown_mode(spark):
    media = MM.media_table(spark, 2)
    import pytest as _pt
    with _pt.raises(ValueError, match="nearest"):
        MM.resize_images(media, 4, 4, mode="cubic")
