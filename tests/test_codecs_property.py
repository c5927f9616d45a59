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


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=10),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    rgb=st.booleans(),
    deep=st.booleans(),
)
def test_png_ex_roundtrip_all_modes(h, w, seed, rgb, deep):
    """The generalized codec round-trips gray/RGB at depth 8/16 — all
    five byte-level filters with the bpp-stride 'left' exercised by
    the row cycle."""
    from heatmap_spark.operators.multimodal import png_decode_ex, png_encode_ex

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    if deep:
        px = rng.integers(0, 65536, size=shape, dtype=np.int64).astype(np.uint16)
    else:
        px = rng.integers(0, 256, size=shape, dtype=np.int64).astype(np.uint8)
    hh, ww, ch, depth, out = png_decode_ex(png_encode_ex(px))
    assert (hh, ww, ch, depth) == (h, w, 3 if rgb else 1, 16 if deep else 8)
    assert out.dtype == px.dtype
    assert np.array_equal(out, px)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=8),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_ex_gray8_bitstream_equals_legacy_codec(h, w, seed):
    """On gray-8 input the generalized encoder must produce the SAME
    bitstream as the round-4 codec (bpp=1 reduces every stride to the
    special case) — so the oracle-gated q_media_decode path and the
    general path can never diverge."""
    from heatmap_spark.operators.multimodal import png_encode, png_encode_ex

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert png_encode_ex(px) == png_encode(px)


def test_png_ex_rejects_corruption_and_unsupported():
    import pytest

    from heatmap_spark.operators.multimodal import png_decode_ex, png_encode_ex

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    blob = bytearray(png_encode_ex(px))
    blob[40] ^= 0xFF  # flip a byte inside a chunk
    with pytest.raises(ValueError):
        png_decode_ex(bytes(blob))
    with pytest.raises(ValueError):
        png_decode_ex(b"\x89PNG\r\n\x1a\njunk")
    # palette color type (3) is declared unsupported, not mis-decoded
    import struct
    import zlib

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    pal = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="gray/RGB"):
        png_decode_ex(pal)


def test_decode_real_reports_channels_and_depth():
    from heatmap_spark.operators.multimodal import decode_real, png_encode_ex

    px = (np.arange(24, dtype=np.int64) * 999 % 65536).astype(np.uint16).reshape(2, 4, 3)
    img = decode_real(png_encode_ex(px))
    assert (img["channels"], img["depth"]) == (3, 16)
    assert np.array_equal(img["pixels"], px)
