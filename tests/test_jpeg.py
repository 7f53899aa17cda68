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


def test_restart_interval_sweep_random_images_exact():
    """ADVICE r4 regression: when a restart interval's final codes
    decode entirely from already-buffered bits, the RST marker is NOT
    yet latched when restart() runs; the old code then never consumed
    the marker and the next fill padded zero bits forever — silently
    corrupting every MCU after the boundary (reproduced on 81/300
    random images at intervals 1-7). Block-constant random images at
    flat q=1 must decode BIT-EXACT for every interval."""
    rng = np.random.default_rng(41)
    for trial in range(30):
        bh, bw = int(rng.integers(2, 6)), int(rng.integers(2, 6))
        blocks = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
        img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:, :, None]
        for interval in range(1, 8):
            data = jpeg.encode(img, qluma=1, restart_interval=interval)
            np.testing.assert_array_equal(
                jpeg.decode(data), img,
                err_msg=f"trial={trial} interval={interval}",
            )


def test_restart_interval_rgb_matches_plain_decode():
    """Same ADVICE regression on the 3-component interleaved path:
    arbitrary random RGB content; the RST-coded stream must decode to
    exactly the same pixels as the stream without restarts."""
    rng = np.random.default_rng(42)
    for trial in range(10):
        h = int(rng.integers(9, 40))
        w = int(rng.integers(9, 40))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        plain = jpeg.decode(jpeg.encode(img, qluma=1, qchroma=1))
        for interval in (1, 2, 3, 5):
            rst = jpeg.encode(
                img, qluma=1, qchroma=1, restart_interval=interval
            )
            np.testing.assert_array_equal(
                plain, jpeg.decode(rst),
                err_msg=f"trial={trial} interval={interval}",
            )


def test_non_interleaved_scan_raises():
    """A baseline multi-component JPEG with a partial scan (SOS ns <
    frame components) must hit the ValueError gate, not decode the
    first plane and silently leave the others zero (ADVICE r4)."""
    img = np.full((8, 8, 3), [10, 200, 90], dtype=np.uint8)
    data = bytearray(jpeg.encode(img, qluma=1, qchroma=1))
    i = data.find(b"\xff\xda")
    # SOS for 3 comps: len=2+1+6+3=12. Rewrite to a 1-component scan
    # (len=2+1+2+3=8) covering only component 1.
    old_len = int.from_bytes(data[i + 2 : i + 4], "big")
    sos_tail = data[i + 4 + 1 + 6 :i + 2 + old_len]  # Ss/Se/Ah-Al
    new_seg = (8).to_bytes(2, "big") + bytes([1, 1, 0x00]) + bytes(sos_tail)
    data[i + 2 : i + 2 + old_len] = new_seg
    with pytest.raises(ValueError, match="non-interleaved"):
        jpeg.decode(bytes(data))


def test_truncation_sweep_raises_valueerror_only():
    """Truncated/malformed payloads must surface as ValueError (never
    IndexError/struct.error/StopIteration) so the multimodal fallback
    chain holds on corrupt data (ADVICE r4)."""
    rng = np.random.default_rng(43)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = jpeg.encode(img, qluma=2, qchroma=4)
    for cut in range(2, len(data), max(1, len(data) // 60)):
        try:
            jpeg.decode(data[:cut])
        except ValueError:
            pass  # the only acceptable failure mode
    # bad SOS component id must also be ValueError, not StopIteration
    bad = bytearray(data)
    i = bad.find(b"\xff\xda")
    bad[i + 5] = 0x77  # first scan-component selector -> unknown id
    with pytest.raises(ValueError):
        jpeg.decode(bytes(bad))
