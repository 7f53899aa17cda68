"""Pure-stdlib WAV (RIFF PCM) codec.

Third leg of the native media codecs (png.py, jpeg.py): de-stubs the
AUDIO decode gate without soundfile/librosa. Supported: RIFF/WAVE
with a PCM ``fmt `` chunk — 8-bit unsigned, 16-bit and 32-bit signed
little-endian integer samples, any channel count/sample rate.
Float-PCM, ADPCM, and other compressed formats raise ``ValueError``
so callers fall through to the documented gate
(operators/multimodal.py) — honest scope, not silent garbage.

Decode returns the interleaved sample matrix plus the header facts a
pipeline features on (rate, channels, width). Like the image codecs,
this is a per-payload kernel for Arrow-batched ``mapInPandas`` map
stages — payload bytes stay off every shuffle path.

Reference parity: the reference only ever moves opaque bytes
(feast_hive/hive.py:316-352); decode is beyond-reference
functionality for the training-data tier.
"""

from __future__ import annotations

import struct

import numpy as np

_WIDTH_DTYPE = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n_frames, n_channels) int array, sample_rate).

    8-bit samples are returned as their unsigned stored values;
    16/32-bit as signed. Raises ``ValueError`` for non-WAV bytes,
    non-integer-PCM encodings, and truncated/malformed payloads
    (parse failures are normalized to ValueError)."""
    try:
        return _decode(data)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"corrupt WAV: {type(e).__name__}: {e}") from e


def _decode(data: bytes) -> tuple[np.ndarray, int]:
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("corrupt WAV: short fmt chunk")
            (audio_fmt, n_ch, rate, _br, _ba, bits) = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:  # integer PCM only
                raise ValueError(
                    f"unsupported WAV: non-PCM format tag {audio_fmt}"
                )
            if bits not in (8, 16, 32):
                raise ValueError(f"unsupported WAV: {bits}-bit samples")
            fmt = (n_ch, rate, bits // 8)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("corrupt WAV: data before fmt")
            n_ch, rate, width = fmt
            usable = (len(body) // (width * n_ch)) * width * n_ch
            arr = np.frombuffer(body[:usable], dtype=_WIDTH_DTYPE[width])
            frames = arr.reshape(-1, n_ch).astype(np.int64)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or frames is None:
        raise ValueError("corrupt WAV: missing fmt or data chunk")
    return frames, fmt[1]


def encode(
    samples: np.ndarray, sample_rate: int = 16_000, width: int = 2
) -> bytes:
    """(n_frames, n_channels) int array -> WAV bytes (integer PCM)."""
    if samples.ndim != 2:
        raise ValueError("expected (n_frames, n_channels)")
    if width not in _WIDTH_DTYPE:
        raise ValueError("width must be 1, 2 or 4 bytes")
    n_ch = samples.shape[1]
    body = samples.astype(_WIDTH_DTYPE[width]).tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,
        n_ch,
        sample_rate,
        sample_rate * n_ch * width,
        n_ch * width,
        width * 8,
    )
    out = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)),
            b"WAVE",
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(body)),
            body,
        ]
    )
    return out
