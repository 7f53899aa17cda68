"""GIF codec tests (functions/gif.py). GIF is lossless, so round
trips assert bit-exact pixels against the known source matrix; the
interlace test builds its frame by hand (the encoder only writes
sequential rows) so the deinterlacer is checked against the spec's
row order, not against the encoder."""

import struct

import numpy as np
import pytest

from feast_hive_spark.functions import gif


def test_rgb_roundtrip_exact():
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (23, 31), dtype=np.uint8)
    img = pal[idx]
    dec = gif.decode(gif.encode(img))
    np.testing.assert_array_equal(dec, img)


def test_palette_form_and_width_growth():
    """200 colors + 12k pixels force LZW code-width growth and (via
    repetition) long matches; decode must stay exact."""
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (200, 3), dtype=np.uint8)
    idx = rng.integers(0, 200, (100, 120), dtype=np.uint8)
    np.testing.assert_array_equal(
        gif.decode(gif.encode(idx, palette=pal)), pal[idx]
    )


def test_extension_blocks_are_skipped():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    data = gif.encode(idx, palette=pal)
    # splice a graphic-control extension after the header+GCT
    gct_end = 13 + 3 * 2  # header + 2-entry... table is padded to 2^depth
    # find the image descriptor and insert before it
    i = data.find(b"\x2c")
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = data[:i] + ext + data[i:]
    np.testing.assert_array_equal(gif.decode(spliced), pal[idx])
    assert gct_end <= i


def test_interlaced_frame():
    """Hand-build an interlaced image: rows stored in pass order
    (0,8,16.. then 4,12.. then 2,6.. then odd) must come back in
    display order."""
    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (13, 5), dtype=np.uint8)
    h = idx.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    stored = idx[order]  # what an interlaced file physically contains
    data = bytearray(gif.encode(stored, palette=pal))
    i = 13 + 3 * (2 << (data[10] & 0x07))  # 0x2c can occur in palette bytes
    assert data[i] == 0x2C
    flags = data[i + 9]
    data[i + 9] = flags | 0x40  # set the interlace bit
    np.testing.assert_array_equal(gif.decode(bytes(data)), pal[idx])


def test_gates():
    with pytest.raises(ValueError, match="signature"):
        gif.decode(b"NOTAGIF")
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    big = rng.integers(0, 64, (50, 50), dtype=np.uint8)
    data = bytearray(gif.encode(big, palette=pal))
    # locate the image descriptor structurally (0x2c can occur inside
    # palette bytes), then cut inside the first LZW sub-block: must
    # raise, not return garbage
    desc = 13 + 3 * (2 << (data[10] & 0x07))
    assert data[desc] == 0x2C
    cut = desc + 11 + 30
    with pytest.raises(ValueError, match="truncated"):
        gif.decode(bytes(data[:cut]))
    with pytest.raises(ValueError, match="256"):
        p = np.arange(18 * 18, dtype=np.int64)
        rgb = np.stack([p % 256, p // 256, np.full_like(p, 7)], axis=1)
        gif.encode(rgb.astype(np.uint8).reshape(18, 18, 3))


def test_decode_chain_accepts_gif():
    from feast_hive_spark.operators.multimodal import _decode_image

    pal = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    idx = np.array([[0, 1, 0]], dtype=np.uint8)
    out = _decode_image(gif.encode(idx, palette=pal))
    np.testing.assert_array_equal(out, pal[idx])


def test_animated_frames_roundtrip_and_gates():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    frames = [rng.integers(0, 16, (9, 11), dtype=np.uint8) for _ in range(4)]
    data = gif.encode_frames(frames, pal)
    dec = gif.decode_frames(data)
    assert len(dec) == 4
    for d, f in zip(dec, frames):
        np.testing.assert_array_equal(d, pal[f])
    # decode() = first frame only
    np.testing.assert_array_equal(gif.decode(data), pal[frames[0]])
    # a partial frame must be refused by decode_frames (no disposal
    # state), while single-frame decode still works
    data2 = bytearray(data)
    i = 13 + 3 * (2 << (data2[10] & 0x07))
    assert data2[i] == 0x2C
    struct.pack_into("<HH", data2, i + 1, 1, 0)  # shift frame 1 right
    struct.pack_into("<H", data2, i + 5, 10)  # and shrink its width
    with pytest.raises(ValueError, match="partial frames"):
        gif.decode_frames(bytes(data2))


def test_sample_video_frames_operator(spark):
    import pandas as pd

    from feast_hive_spark.operators.multimodal import sample_video_frames

    pal = np.array([[1, 2, 3], [10, 20, 30]], dtype=np.uint8)
    frames = [np.full((4, 5), i % 2, dtype=np.uint8) for i in range(5)]
    payload = gif.encode_frames(frames, pal)
    df = spark.createDataFrame(pd.DataFrame({"vid": [7], "payload": [payload]}))
    got = {
        r["frame_index"]: (r["n_frames"], r["sum_pixel"], r["max_pixel"])
        for r in sample_video_frames(df, "payload", "vid", every_n=2).collect()
    }
    assert set(got) == {0, 2, 4}
    assert got[0] == (5, 4 * 5 * 6, 3)  # all-index-0 frame: sum(1+2+3)*20
    assert got[2] == (5, 4 * 5 * 6, 3)
