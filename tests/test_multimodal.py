"""Multimodal operators: resize, frame-sample, PCM audio features — real
Arrow-batched plumbing over binary columns with deterministic payloads."""

from __future__ import annotations

import numpy as np
import pytest

from auto_ria_spark.functions import imaging, multimodal as MM
from auto_ria_spark.sources import worldgen
from auto_ria_spark.util import local_df


def test_resize_images_roundtrip(spark):
    corpus = worldgen.corpus_df(spark, 12, partitions=2)
    out = MM.resize_images(corpus, 32, 24).collect()
    assert len(out) == 12
    for r in out:
        assert (r.w, r.h, r.fmt) == (32, 24, "png")
        px = imaging.decode_image(bytes(r.bytes))
        assert px.shape == (24, 32, 3)
        # resize is deterministic: re-deriving from the source matches
        g = int(r.image_id.removeprefix("img"))
        src = imaging.decode_image(worldgen.corpus_row(g)["bytes"])
        assert np.array_equal(px, MM._area_resize(src, 32, 24))


def test_area_resize_matches_reference_and_rejects_upscale():
    """The vectorized reduceat kernel must be bit-identical to the naive
    per-pixel reference on awkward (non-divisible) block boundaries, and
    refuse to upscale (the old kernel silently cast empty-slice NaNs)."""
    from auto_ria_spark.oracle import resize_reference

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    for out_w, out_h in ((16, 12), (53, 37), (1, 1), (10, 36)):
        got = MM._area_resize(px, out_w, out_h)
        assert np.array_equal(got, resize_reference(px, out_w, out_h))
    with pytest.raises(ValueError, match="upscale"):
        MM._area_resize(px, 54, 12)
    with pytest.raises(ValueError, match="upscale"):
        MM._area_resize(px, 16, 38)


def test_sample_frames_stride_and_decode(spark):
    vids = []
    for v in range(3):
        frames = [imaging.encode_png(worldgen.gen_pixels(v * 7 + k))
                  for k in range(7)]
        vids.append((f"vid{v}", MM.encode_fvid(frames)))
    df = local_df(spark, vids, "video_id string, bytes binary")
    out = MM.sample_frames(df, every_n=3).collect()
    # 7 frames, stride 3 -> indices 0, 3, 6 per video
    assert sorted((r.video_id, r.frame_index) for r in out) == [
        (f"vid{v}", i) for v in range(3) for i in (0, 3, 6)]
    r0 = next(r for r in out if r.video_id == "vid1" and r.frame_index == 3)
    assert np.array_equal(imaging.decode_image(bytes(r0.bytes)),
                          worldgen.gen_pixels(1 * 7 + 3))


def test_sample_frames_foreign_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM._decode_fvid(b"\x00\x00\x01\xb3mpeg-ish")


def test_pcm16_audio_features(spark):
    sr = 16_000
    t = np.arange(sr, dtype=np.float64) / sr          # 1 s
    sine = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    silence = np.zeros(sr // 2, np.int16)
    df = local_df(spark, [("a", sine.tobytes()), ("b", silence.tobytes())],
                  "audio_id string, bytes binary")
    got = {r.audio_id: r for r in MM.pcm16_features(df, sr).collect()}
    a = got["a"]
    assert a.n_samples == sr and abs(a.duration_s - 1.0) < 1e-9
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2)
    assert abs(a.rms - 0.5 / np.sqrt(2)) < 1e-3
    assert 0.49 < a.peak <= 0.5
    # 440 Hz over 1 s crosses zero ~880 times
    assert 870 <= a.zero_crossings <= 890
    b = got["b"]
    assert b.rms == 0.0 and b.peak == 0.0 and b.zero_crossings == 0
