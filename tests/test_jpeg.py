"""Baseline JPEG codec tests (functions/jpeg.py).

The container has no libjpeg/PIL, so fixtures come from the module's
own baseline encoder. To keep round-trip tests from blessing a
self-consistent bug, the assertions pin EXTERNAL ground truth, not
just encode->decode closure:

- block-constant images must decode EXACTLY at flat q=1 (a constant
  8x8 block is pure DC: quantization is lossless there, so any
  zigzag/dequant/IDCT slip shows up as a wrong pixel, not as a
  slightly-lower PSNR);
- byte-level format checks (SOI/EOI framing, DHT/DQT presence,
  0xFF00 stuffing validity) hold against the JPEG spec;
- unsupported modes (progressive SOF2) and non-JPEG bytes must raise
  ValueError so the multimodal gate stays honest.
"""

import numpy as np
import pytest

from feast_hive_spark.functions import jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    err = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(255.0**2 / (err**2).mean())


def test_constant_rgb_roundtrip_is_near_exact():
    img = np.full((16, 16, 3), [120, 64, 200], dtype=np.uint8)
    dec = jpeg.decode(jpeg.encode(img, qluma=1, qchroma=1))
    assert dec.shape == (16, 16, 3)
    # color-space conversion rounds once each way -> at most 1 LSB
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 1


def test_block_constant_grayscale_exact():
    """8x8-constant blocks are pure DC: with flat q=1 the pipeline is
    mathematically lossless, so decode must be bit-exact — the same
    invariant the multimodal_jpeg_pixel_stats oracle gates."""
    rng = np.random.default_rng(11)
    blocks = rng.integers(0, 256, (3, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:, :, None]
    dec = jpeg.decode(jpeg.encode(img, qluma=1))
    assert dec.shape == img.shape
    np.testing.assert_array_equal(dec, img)


def test_gradient_non_multiple_of_8():
    g = np.zeros((17, 24, 3), dtype=np.uint8)
    g[..., 0] = np.linspace(0, 255, 24).astype(np.uint8)[None, :]
    g[..., 1] = np.linspace(255, 0, 17).astype(np.uint8)[:, None]
    g[..., 2] = 128
    dec = jpeg.decode(jpeg.encode(g, qluma=2, qchroma=4))
    assert dec.shape == (17, 24, 3)
    assert _psnr(dec, g) > 40.0


def test_grayscale_odd_dims():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 9, 1), dtype=np.uint8)
    dec = jpeg.decode(jpeg.encode(img, qluma=1))
    assert dec.shape == (13, 9, 1)
    assert _psnr(dec, img) > 45.0


def test_420_subsampling():
    g = np.zeros((17, 24, 3), dtype=np.uint8)
    g[..., 0] = np.linspace(0, 255, 24).astype(np.uint8)[None, :]
    g[..., 1] = 90
    g[..., 2] = 40
    dec = jpeg.decode(jpeg.encode(g, qluma=2, qchroma=4, subsample=(2, 2)))
    assert dec.shape == (17, 24, 3)
    # chroma is constant, so 4:2:0 loses little on this fixture
    assert _psnr(dec, g) > 35.0


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    plain = jpeg.decode(jpeg.encode(img, qluma=1, qchroma=1))
    rst = jpeg.encode(img, qluma=1, qchroma=1, restart_interval=2)
    assert b"\xff\xd0" in rst or b"\xff\xd1" in rst
    np.testing.assert_array_equal(plain, jpeg.decode(rst))


def test_byte_level_format():
    img = np.full((8, 8, 1), 200, dtype=np.uint8)
    data = jpeg.encode(img)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in data
    # entropy-coded 0xFF bytes must be stuffed: between SOS payload
    # start and EOI, every 0xFF is followed by 0x00 or RST/EOI
    sos = data.find(b"\xff\xda")
    body = data[sos + 2 + int.from_bytes(data[sos + 2 : sos + 4], "big") : -2]
    i = 0
    while i < len(body) - 1:
        if body[i] == 0xFF:
            assert body[i + 1] == 0x00 or 0xD0 <= body[i + 1] <= 0xD7
            i += 2
        else:
            i += 1


def test_unsupported_and_garbage_raise():
    img = np.full((8, 8, 1), 7, dtype=np.uint8)
    data = bytearray(jpeg.encode(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg.decode(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode(b"\x00\x01\x02")


def test_multimodal_decode_chain_accepts_jpeg():
    from feast_hive_spark.operators.multimodal import _decode_image

    img = np.repeat(
        np.repeat(np.arange(12, dtype=np.uint8).reshape(3, 4) * 20, 8, 0), 8, 1
    )[:, :, None]
    out = _decode_image(jpeg.encode(img, qluma=1))
    np.testing.assert_array_equal(out, img)
    assert _decode_image(b"\x00garbage") is None
