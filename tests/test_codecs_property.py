"""Property tests for the stdlib media codecs: PNG and WAV round-trip
identity on arbitrary content and shapes (hypothesis), so every
scanline-filter interaction and chunk-alignment case is exercised, not
just the fixtures'."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from heatmap_spark.operators.multimodal import (
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=70),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_is_identity(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    hh, ww, out = png_decode(png_encode(px))
    assert (hh, ww) == (h, w)
    assert np.array_equal(out, px)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=300),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_is_identity(n, seed, rate):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n, dtype=np.int64).astype(np.int16)
    got_rate, out = wav_decode(wav_encode(samples, sample_rate=rate))
    assert got_rate == rate
    assert np.array_equal(out, samples)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(min_value=2, max_value=8),
    w=st.integers(min_value=2, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    flip=st.integers(min_value=0, max_value=10_000),
)
def test_png_corruption_is_detected(h, w, seed, flip):
    """Flipping any byte of an encoded PNG must either be detected
    (CRC/structure ValueError) or leave the image identical (the flip
    can only hit a redundant byte if it hits nothing at all — with
    CRCs over every chunk there is no silent-corruption window)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    data = bytearray(png_encode(px))
    pos = flip % len(data)
    data[pos] ^= 0xFF
    try:
        hh, ww, out = png_decode(bytes(data))
    except Exception:
        return  # detected — the desired outcome (no silent corruption)
    assert (hh, ww) == (h, w) and np.array_equal(out, px)
