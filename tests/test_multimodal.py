"""Multimodal plumbing: binary payload + typed metadata through Arrow-batched
mapInPandas kernels (stub codecs — the Spark contract is what's under test:
schemas, batch iteration, determinism, partition parallelism)."""

from __future__ import annotations

import hashlib
import math

import pytest

from nspc_etl_basic_spark.operators.multimodal import (
    audio_features,
    image_features,
    resize_images,
    sample_frames,
    synthesize_media,
)


def test_image_features_deterministic(spark):
    df = synthesize_media(spark, n=32, kind="image").repartition(4)
    feats = image_features(df).orderBy("media_id")
    rows = feats.collect()
    assert len(rows) == 32
    # deterministic: md5 of the synthesized payload is reproducible
    seed = hashlib.md5(b"image_0").digest()
    payload = (seed * 8)[:64]
    assert rows[0].payload_md5 == hashlib.md5(payload).hexdigest()
    assert all(0.0 <= r.mean_intensity <= 1.0 for r in rows)
    assert rows[5].width == 32 + 5 % 64


def test_image_features_requires_real_decode_raises(spark):
    # synthesize_media payloads are md5 keystreams, not decodable images:
    # the strict tier must fail at execution rather than silently stub
    df = synthesize_media(spark, n=2, kind="image")
    with pytest.raises(Exception, match="not a decodable image"):
        image_features(df, require_real_decode=True).collect()


def _png_media(spark, arrays):
    from nspc_etl_basic_spark.operators.codecs import encode_png
    from nspc_etl_basic_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [
        (i, bytearray(encode_png(a)),
         ("image", a.shape[1], a.shape[0], None, None))
        for i, a in enumerate(arrays)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_real_png_decode(spark):
    import numpy as np

    # 2x2 gray image with known pixels: real decode must report the PIXEL
    # mean and the FILE dimensions, not the byte-stub values
    a = np.array([[0, 255], [100, 45]], dtype=np.uint8)
    rows = image_features(
        _png_media(spark, [a]), require_real_decode=True
    ).collect()
    assert rows[0].width == 2 and rows[0].height == 2
    assert rows[0].mean_intensity == math.floor((0 + 255 + 100 + 45) / 4 / 255.0 * 1e6) / 1e6


def test_resize_really_resizes_png_payload(spark):
    import numpy as np

    from nspc_etl_basic_spark.operators.codecs import decode_png

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    out = resize_images(_png_media(spark, [a]), max_dim=30).collect()
    # metadata reflects the clamp (60x40 -> 30x20) AND the payload is
    # genuinely re-encoded at the new size
    assert (out[0].meta.width, out[0].meta.height) == (30, 20)
    decoded = decode_png(bytes(out[0].payload))
    assert decoded.shape == (20, 30, 3)


def test_audio_features_real_wav_decode(spark):
    import numpy as np

    from nspc_etl_basic_spark.operators.codecs import encode_wav
    from nspc_etl_basic_spark.operators.multimodal import MEDIA_SCHEMA

    samples = np.array([0, 16384, -16384, 32767], dtype=np.int16)
    wav = encode_wav(samples, 16000)
    df = spark.createDataFrame(
        [(1, bytearray(wav), ("audio", None, None, None, 999))], MEDIA_SCHEMA
    )
    r = audio_features(df, require_real_decode=True).collect()[0]
    # sample_rate comes from the WAV header (16000), NOT the meta (999)
    assert r.sample_rate == 16000
    assert r.duration_s == math.floor(4 / 16000 * 1e6) / 1e6
    acc = sum(int(s) * int(s) for s in samples)
    assert r.rms == math.floor((acc / (4 * 32768 * 32768)) ** 0.5 * 1e6) / 1e6


def test_resize_clamps_dimensions(spark):
    df = synthesize_media(spark, n=16, kind="image")
    out = resize_images(df, max_dim=24).collect()
    for r in out:
        assert max(r.meta.width, r.meta.height) <= 24
    assert {r.media_id for r in out} == set(range(16))


def test_sample_frames_explodes_video(spark):
    df = synthesize_media(spark, n=8, kind="video")
    frames = sample_frames(df, every_n=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    for i in range(8):
        n_frames = 4 + i % 7
        expected = len(range(0, n_frames, 2))
        assert len(by_id[i]) == expected
        assert all(len(bytes(f.frame_payload)) > 0 for f in by_id[i])


def test_audio_features_pcm16_duration(spark):
    df = synthesize_media(spark, n=8, kind="audio")
    rows = audio_features(df).orderBy("media_id").collect()
    for i, r in enumerate(rows):
        payload_len = 64 + (i % 17)
        assert r.sample_rate == 8000
        assert r.duration_s == math.floor((payload_len / 2) / 8000 * 1e6) / 1e6
        assert 0.0 <= r.rms <= 1.0
