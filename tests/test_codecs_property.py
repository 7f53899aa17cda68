"""Property tests for the stdlib media codecs (hypothesis): round
trips over arbitrary shapes/values, not just the hand-picked
fixtures. Lossless codecs (GIF, WAV) must be bit-exact; JPEG must be
exact on the mathematically-lossless block-constant family and
PSNR-bounded on arbitrary content."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feast_hive_spark.functions import gif, jpeg, wav

_settings = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@_settings
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    n_pal=st.integers(2, 64),
    seed=st.integers(0, 2**31),
)
def test_gif_roundtrip_exact(h, w, n_pal, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_pal, 3), dtype=np.uint8)
    idx = rng.integers(0, n_pal, (h, w), dtype=np.uint8)
    np.testing.assert_array_equal(
        gif.decode(gif.encode(idx, palette=pal)), pal[idx]
    )


@_settings
@given(
    n=st.integers(1, 200),
    ch=st.integers(1, 4),
    width=st.sampled_from([1, 2, 4]),
    rate=st.integers(1000, 96000),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_exact(n, ch, width, rate, seed):
    rng = np.random.default_rng(seed)
    lo, hi = (0, 256) if width == 1 else (
        -(1 << (8 * width - 1)),
        1 << (8 * width - 1),
    )
    s = rng.integers(lo, hi, (n, ch), dtype=np.int64)
    frames, got_rate = wav.decode(wav.encode(s, sample_rate=rate, width=width))
    assert got_rate == rate
    np.testing.assert_array_equal(frames, s)


@_settings
@given(
    bh=st.integers(1, 4),
    bw=st.integers(1, 4),
    seed=st.integers(0, 2**31),
)
def test_jpeg_block_constant_exact(bh, bw, seed):
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)[:, :, None]
    np.testing.assert_array_equal(jpeg.decode(jpeg.encode(img, qluma=1)), img)


@_settings
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31),
)
def test_jpeg_arbitrary_content_psnr(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    dec = jpeg.decode(jpeg.encode(img, qluma=1, qchroma=1))
    assert dec.shape == img.shape
    err = dec.astype(np.float64) - img.astype(np.float64)
    mse = (err**2).mean()
    # q=1 on uniform noise: only float/chroma rounding remains
    assert mse < 2.0 or 10 * np.log10(255.0**2 / mse) > 40.0
