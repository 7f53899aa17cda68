"""Pure-stdlib GIF decoder/encoder (GIF87a/89a, LZW).

Completes the native still-image codecs (png.py, jpeg.py): palette
images with LZW-compressed index streams, no PIL needed. Supported:
global or local color tables, interlaced images, extension blocks
(skipped), first image frame of animated files (each subsequent frame
needs disposal/composition state a stats kernel does not want —
callers that need frames use the documented gate). Malformed or
truncated streams raise ``ValueError``.

Like the other codecs this is a per-payload kernel for Arrow-batched
``mapInPandas`` map stages — payload bytes stay off shuffle paths.
The reference moves opaque bytes only (feast_hive/hive.py:316-352);
decode is beyond-reference functionality.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: LSB-first across the concatenated sub-block bytes.
    # r14 (guide §4.2): the per-BIT Python loop (width iterations per
    # code) is replaced by one 3-byte slice + int.from_bytes per code —
    # bit i of the value is bit ((bitpos+i)&7) of byte ((bitpos+i)>>3),
    # which is exactly the little-endian integer of the 3 bytes at
    # bitpos>>3 shifted right by bitpos&7 (width <= 12 and shift <= 7
    # always fit in 24 bits; a short slice near EOF zero-extends, and
    # the explicit truncation check still guards bits past the stream).
    bitpos = 0
    nbits = len(data) * 8

    def reset():
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return table, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    mask = (1 << width) - 1
    while len(out) < n_expected:
        if bitpos + width > nbits:
            raise ValueError("corrupt GIF: LZW stream truncated")
        bi = bitpos >> 3
        code = (
            int.from_bytes(data[bi : bi + 3], "little") >> (bitpos & 7)
        ) & mask
        bitpos += width
        if code == clear:
            table, width = reset()
            mask = (1 << width) - 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF: bad LZW code")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
                mask = (1 << width) - 1
        prev = entry
    return bytes(out[:n_expected])


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode(data: bytes) -> np.ndarray:
    """GIF bytes -> (H, W, 3) uint8 RGB of the first image frame.
    Raises ``ValueError`` for non-GIF or malformed payloads (parse
    failures on truncated data are normalized to ValueError so the
    caller's fallback chain holds)."""
    try:
        return _decode(data, all_frames=False)[0]
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"corrupt GIF: {type(e).__name__}: {e}") from e


def decode_frames(data: bytes) -> list[np.ndarray]:
    """Animated GIF -> list of (H, W, 3) uint8 RGB frames.

    Supports FULL-frame animations (every image descriptor covers the
    whole canvas — the shape deterministic fixture generators and many
    screen-capture tools produce). Partial frames would need
    disposal/composition state; they raise ``ValueError`` so callers
    fall through to the PIL gate rather than getting mis-composited
    pixels. Transparency indices are ignored (frames are treated as
    opaque)."""
    try:
        return _decode(data, all_frames=True)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"corrupt GIF: {type(e).__name__}: {e}") from e


def _decode(data: bytes, all_frames: bool) -> list[np.ndarray]:
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    frames: list[np.ndarray] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            ix, iy, iw, ih, ipacked = struct.unpack(
                "<HHHHB", data[pos + 1 : pos + 10]
            )
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("corrupt GIF: no color table")
            min_code = data[pos]
            pos += 1
            blocks = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                blocks.extend(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx_bytes = _lzw_decode(min_code, bytes(blocks), iw * ih)
            idx = np.frombuffer(idx_bytes, dtype=np.uint8).reshape(ih, iw)
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("corrupt GIF: palette index out of range")
            if not all_frames:
                return [pal[idx]]
            if (ix, iy, iw, ih) != (0, 0, w, h):
                raise ValueError(
                    "unsupported GIF: partial frames need disposal/"
                    "composition state"
                )
            frames.append(pal[idx])
        else:
            raise ValueError(f"corrupt GIF: unknown block 0x{b:02x}")
    if frames:
        return frames
    raise ValueError("corrupt GIF: no image frame")


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    # r14 (guide §4.2): the classic dict-of-bytes LZW built a fresh
    # ``run + bytes([byte])`` candidate PER PIXEL (an allocation + hash
    # of a growing bytes object). Keys are now the integer
    # (run_code << 8) | byte — unique (codes < 4096, bytes < 256) and
    # hashable without allocation — and ``run`` is tracked as its CODE
    # (single bytes are their own code < clear, so the base table is
    # implicit). Emitted code sequence is identical by construction.
    table: dict[int, int] = {}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run_code = -1
    for byte in indices:
        if run_code < 0:
            run_code = byte
            continue
        key = (run_code << 8) | byte
        c = table.get(key)
        if c is not None:
            run_code = c
            continue
        emit(run_code, width)
        table[key] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:  # table full: reset
            emit(clear, width)
            table = {}
            next_code = eoi + 1
            width = min_code_size + 1
        run_code = byte
    if run_code >= 0:
        emit(run_code, width)
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_frames(
    frames: "list[np.ndarray]", palette: np.ndarray
) -> bytes:
    """List of (H, W) palette-index frames -> animated GIF89a bytes
    (full-frame animation: one image descriptor per frame, shared
    global palette)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    n_pal = len(palette)
    depth = max(1, (max(n_pal - 1, 1)).bit_length())
    full = 1 << depth
    pal_bytes = np.zeros((full, 3), dtype=np.uint8)
    pal_bytes[:n_pal] = palette
    min_code = max(2, depth)
    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0))
    out.extend(pal_bytes.tobytes())
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share the canvas size")
        out.extend(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
        out.append(min_code)
        lzw = _lzw_encode(min_code, fr.astype(np.uint8).tobytes())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out.extend(chunk)
        out.append(0)
    out.extend(b"\x3b")
    return bytes(out)


def encode(img: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """(H, W) palette-index uint8 + (n, 3) palette -> GIF89a bytes.
    Pass ``palette=None`` with an (H, W, 3) RGB image to derive the
    palette from the distinct colors (must be <= 256)."""
    if img.ndim == 3:
        flat = img.reshape(-1, 3)
        palette, idx = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError("more than 256 distinct colors")
        indices = idx.astype(np.uint8).reshape(img.shape[:2])
    else:
        if palette is None:
            raise ValueError("palette required for index images")
        indices = img.astype(np.uint8)
    h, w = indices.shape
    n_pal = len(palette)
    depth = max(1, (max(n_pal - 1, 1)).bit_length())
    full = 1 << depth
    pal_bytes = np.zeros((full, 3), dtype=np.uint8)
    pal_bytes[:n_pal] = palette
    min_code = max(2, depth)
    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0))
    out.extend(pal_bytes.tobytes())
    out.extend(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
    out.append(min_code)
    lzw = _lzw_encode(min_code, indices.tobytes())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.extend(b"\x00\x3b")
    return bytes(out)
