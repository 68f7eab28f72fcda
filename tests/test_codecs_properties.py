"""Property-based codec tests (hypothesis): the PNG/WAV round trip must
hold for arbitrary shapes/contents, and decode must never mis-report
dimensions."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from nspc_etl_basic_spark.operators.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resize_nearest,
    sniff_media,
)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    data = encode_png(arr)
    assert sniff_media(data) == "png"
    out = decode_png(data)
    assert out.shape == (h, w, ch)
    assert (out == arr).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 2000),
    channels=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, channels, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, (n, channels)).astype(np.int16)
    data = encode_wav(samples, rate)
    assert sniff_media(data) == "wav"
    got_rate, got = decode_wav(data)
    assert got_rate == rate
    assert got.shape == (n, channels)
    assert (got == samples).all()


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 32),
    w=st.integers(1, 32),
    nh=st.integers(1, 32),
    nw=st.integers(1, 32),
)
def test_resize_nearest_shape_and_value_membership(h, w, nh, nw):
    arr = np.arange(h * w, dtype=np.uint8).reshape(h, w)[:, :, None] % 251
    out = resize_nearest(arr, nw, nh)
    assert out.shape == (nh, nw, 1)
    # nearest-neighbor only ever copies source pixels
    assert np.isin(out, arr).all()
