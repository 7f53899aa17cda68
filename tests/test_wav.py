"""WAV codec tests (functions/wav.py): round trips against known
sample matrices (external ground truth, not codec closure), byte-level
RIFF structure, width/channel handling, and the honesty gates."""

import struct

import numpy as np
import pytest

from feast_hive_spark.functions import wav


def test_roundtrip_16bit_stereo_exact():
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32768, (100, 2), dtype=np.int64)
    frames, rate = wav.decode(wav.encode(s, sample_rate=44100, width=2))
    assert rate == 44100
    np.testing.assert_array_equal(frames, s)


def test_roundtrip_8bit_and_32bit():
    s8 = np.arange(0, 256, dtype=np.int64).reshape(-1, 1)
    f8, _ = wav.decode(wav.encode(s8, width=1))
    np.testing.assert_array_equal(f8, s8)
    s32 = np.array([[2**30, -(2**30)], [7, -7]], dtype=np.int64)
    f32, _ = wav.decode(wav.encode(s32, width=4))
    np.testing.assert_array_equal(f32, s32)


def test_byte_level_riff_structure():
    data = wav.encode(np.zeros((10, 1), dtype=np.int64), sample_rate=8000)
    assert data[0:4] == b"RIFF" and data[8:12] == b"WAVE"
    (riff_len,) = struct.unpack("<I", data[4:8])
    assert riff_len == len(data) - 8
    assert b"fmt " in data and b"data" in data
    # fmt facts: PCM tag, mono, 8 kHz, 16-bit
    i = data.find(b"fmt ") + 8
    tag, ch, rate, _, _, bits = struct.unpack("<HHIIHH", data[i : i + 16])
    assert (tag, ch, rate, bits) == (1, 1, 8000, 16)


def test_skips_extra_chunks():
    """Decoders must walk past LIST/INFO-style chunks (word-aligned)."""
    s = np.array([[1], [-2], [3]], dtype=np.int64)
    data = wav.encode(s)
    # splice an odd-length junk chunk between header and fmt
    junk = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"  # pad byte
    spliced = data[:12] + junk + data[12:]
    frames, _ = wav.decode(spliced)
    np.testing.assert_array_equal(frames, s)


def test_gates():
    with pytest.raises(ValueError, match="RIFF"):
        wav.decode(b"\x00" * 16)
    # float PCM (format tag 3) must be refused, not mis-decoded
    data = bytearray(wav.encode(np.zeros((4, 1), dtype=np.int64)))
    i = data.find(b"fmt ") + 8
    struct.pack_into("<H", data, i, 3)
    with pytest.raises(ValueError, match="non-PCM"):
        wav.decode(bytes(data))
    with pytest.raises(ValueError):
        wav.encode(np.zeros((4,), dtype=np.int64))  # wrong ndim
