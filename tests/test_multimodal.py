from __future__ import annotations

import numpy as np
import pytest

from vrtility_spark import multimodal as mm


def _spark_df(spark, pdf, schema):
    return spark.createDataFrame(pdf, schema=schema)


def test_audio_features_spark_and_caption_passthrough(spark):
    pdf = mm.audio_pandas(n=8)
    df = _spark_df(spark, pdf, mm.AUDIO_SCHEMA)
    out = mm.audio_features(df).toPandas().sort_values("audio_id")
    assert len(out) == 8
    assert list(out.caption) == sorted(pdf.caption)
    # tone frequency rises with clip index mod 5 → centroid ordering
    c0 = out.iloc[0].spectral_centroid_hz
    c4 = out.iloc[4].spectral_centroid_hz
    assert c4 > c0 > 0
    assert (out.duration_sec == 0.5).all()
    assert (out.rms > 0.1).all() and (out.rms < 1.0).all()


def test_audio_features_match_numpy_oracle(spark):
    pdf = mm.audio_pandas(n=3)
    out = mm.audio_features(_spark_df(spark, pdf, mm.AUDIO_SCHEMA)) \
        .toPandas().set_index("audio_id")
    for r in pdf.itertuples(index=False):
        wave = mm.decode_audio(r.bytes, "pcm16")
        exp = mm.audio_features_np(wave, r.sample_rate)
        got = out.loc[r.audio_id]
        for k, v in exp.items():
            np.testing.assert_allclose(got[k], v, rtol=1e-9, err_msg=k)


def test_video_features_motion_ordering(spark):
    pdf = mm.video_pandas(n=6)
    df = _spark_df(spark, pdf, mm.VIDEO_SCHEMA)
    out = mm.video_features(df).toPandas().set_index("video_id")
    # faster square → larger frame-to-frame difference
    assert out.loc["v0002"].motion_energy > out.loc["v0000"].motion_energy
    assert (out.n_frames_sampled == 10).all()


def test_frame_sampling_prunes_payload(spark):
    pdf = mm.video_pandas(n=3, n_frames=12)
    df = _spark_df(spark, pdf, mm.VIDEO_SCHEMA)
    out = mm.video_features(df, sample_every_k=3).toPandas()
    assert (out.n_frames_sampled == 4).all()


def test_resize_video_roundtrip(spark):
    pdf = mm.video_pandas(n=2, w=24, h=16)
    df = _spark_df(spark, pdf, mm.VIDEO_SCHEMA)
    out = mm.resize_video(df, 12, 8).toPandas()
    frames = mm.decode_video(out.bytes.iloc[0], 12, 8, "rawgray8")
    assert frames.shape == (10, 8, 12)
    # bright square survives downsampling
    assert frames.max() > 150


def test_compressed_codecs_are_stubbed():
    with pytest.raises(NotImplementedError, match="mp3"):
        mm.decode_audio(b"\x00", "mp3")
    with pytest.raises(NotImplementedError, match="h264"):
        mm.decode_video(b"\x00", 8, 8, "h264")
