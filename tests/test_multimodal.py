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
