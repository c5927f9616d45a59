"""Kernel-injection contract of the media decode operators.

The from-scratch codecs are the default AND the correctness oracle;
``kernel=`` swaps only the per-Arrow-batch Python callable (the
measured 88%-of-wall JPEG entropy decode), never the plan.  These
tests prove the interface: an injected kernel (a) is actually invoked
on executors and (b) produces byte-identical operator output when it
honors the decode contract — exactly what a PIL/libjpeg adapter from
``library_kernels()`` must satisfy to drop in.
"""

import pytest

from heatmap_spark.operators import multimodal as M


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _counting(spark, delegate):
    """Wrap a decoder so executor-side invocations are observable on
    the driver (accumulators survive the closure pickle)."""
    acc = spark.sparkContext.accumulator(0)

    def kernel(data, *a, **kw):
        acc.add(1)
        return delegate(data, *a, **kw)

    return kernel, acc


@pytest.mark.parametrize(
    "op, delegate",
    [
        (M.media_decode_jpeg, M.jpeg_decode),
        (M.media_decode_gif, M.gif_decode),
        (M.media_decode_bmp, M.bmp_decode),
        (M.media_decode_wav, M.wav_decode),
    ],
)
def test_injected_kernel_identical_output(spark, sf_smoke, op, delegate):
    base = _rows(op(spark, sf_smoke))
    kernel, acc = _counting(spark, delegate)
    injected = _rows(op(spark, sf_smoke, kernel=kernel))
    assert injected == base
    assert acc.value > 0, "injected kernel was never invoked"


def test_video_frame_kernel_identical_output(spark, sf_smoke):
    media = M.avi_media_table(spark, sf_smoke)
    base = _rows(M.video_frame_sample(media, every=2))
    kernel, acc = _counting(spark, M.jpeg_decode)
    injected = _rows(M.video_frame_sample(media, every=2, kernel=kernel))
    assert injected == base
    assert acc.value > 0


def test_bad_kernel_fails_loudly(spark, sf_smoke):
    """A kernel that corrupts pixels WITHIN a block trips the
    operator's constancy gate; a uniform level shift survives the gate
    but must change the emitted value hash (the driver-oracle catch)."""
    import numpy as np

    def intra_block(data):
        h, w, ch, px = M.jpeg_decode(data)
        return h, w, ch, (px + (np.arange(px.size) % 2)).astype(np.uint8)

    with pytest.raises(Exception):
        M.media_decode_jpeg(spark, sf_smoke, kernel=intra_block).collect()

    def shifted(data):
        h, w, ch, px = M.jpeg_decode(data)
        return h, w, ch, ((px.astype(np.int64) + 1) % 256).astype(np.uint8)

    base = {r["doc_id"]: r["blocks_md5"] for r in
            M.media_decode_jpeg(spark, sf_smoke).collect()}
    bad = {r["doc_id"]: r["blocks_md5"] for r in
           M.media_decode_jpeg(spark, sf_smoke, kernel=shifted).collect()}
    assert all(bad[d] != base[d] for d in base)


def test_stdlib_wave_kernel_cross_validates(spark, sf_smoke):
    """The stdlib `wave` adapter is live in EVERY environment: an
    independent RIFF implementation must agree with the from-scratch
    parser sample-for-sample, unit-level and through the operator."""
    import numpy as np

    kernels = M.library_kernels()
    pcm = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int16)
    data = M.wav_encode(pcm)
    rate, out = kernels["wav"](data)
    ref_rate, ref = M.wav_decode(data)
    assert rate == ref_rate and (out == ref).all()
    base = _rows(M.media_decode_wav(spark, sf_smoke))
    injected = _rows(M.media_decode_wav(spark, sf_smoke, kernel=kernels["wav"]))
    assert injected == base


def test_library_kernels_pil_arm():
    """The PIL arms are present iff PIL exists; when it does, the JPEG
    adapter must match the from-scratch decoder on the unit-quant path
    (constant 8x8 blocks decode bit-exactly in any conformant
    decoder)."""
    kernels = M.library_kernels()
    if "jpeg" not in kernels:
        pytest.skip("no imaging library in this environment")
    import numpy as np

    img = np.kron(
        np.arange(6, dtype=np.int64).reshape(2, 3) * 40,
        np.ones((8, 8), dtype=np.int64),
    ).astype(np.uint8)
    data = M.jpeg_encode(img)
    assert tuple(kernels["jpeg"](data)[:3]) == (16, 24, 1)
    assert (kernels["jpeg"](data)[3] == M.jpeg_decode(data)[3]).all()
