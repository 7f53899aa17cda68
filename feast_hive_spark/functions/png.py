"""Pure-stdlib PNG codec (zlib + struct + numpy).

De-stubs the multimodal image-decode boundary without new
dependencies: the container has no PIL, but PNG is just zlib-deflated
filtered scanlines, so an 8-bit decoder/encoder is ~100 lines of
stdlib. The reference offline store never decodes media at all (it
moves opaque columns, feast_hive/hive.py:316-352); decode here powers
the beyond-the-reference multimodal operators (operators/multimodal.py).

Supported: 8-bit depth, non-interlaced, color types 0 (gray),
2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), all five scanline
filters. Anything else raises ``ValueError`` — callers treat that as
"not decodable here" and fall back to their documented stub gate.

Scale note: this runs inside Arrow-batched ``mapInPandas`` workers —
per-image Python cost is the known price of the decode stage; the
plumbing keeps it map-only and off the shuffle path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # n_channels -> color type


def decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array. Palette images are expanded
    to RGB. Raises ``ValueError`` for non-PNG, unsupported variants,
    and truncated/malformed payloads (struct/zlib/index parse failures
    are normalized to ValueError so callers' fallback chain holds)."""
    try:
        return _decode(data)
    except (struct.error, zlib.error, IndexError, KeyError) as e:
        raise ValueError(f"corrupt PNG: {type(e).__name__}: {e}") from e


def _decode(data: bytes) -> np.ndarray:
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={color} "
            f"interlace={interlace}); only 8-bit non-interlaced supported"
        )
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong size")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        off = r * (stride + 1)
        f = raw[off]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if f == 0:  # None
            pass
        elif f == 1:  # Sub (sequential in x)
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif f == 2:  # Up (vectorized)
            cur += prev
        elif f == 3:  # Average
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[r] = cur
        prev = cur
    img = out.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        img = plte[img[:, :, 0]]
    return img


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode(arr: np.ndarray, level: int = 6) -> bytes:
    """(H, W) or (H, W, C) uint8 array -> PNG bytes (filter 0 rows)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"cannot encode {ch}-channel image as PNG")
    raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )
