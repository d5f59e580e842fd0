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

Scope (the profile our encoder emits; everything else raises):
  - SOF0 baseline, 8-bit, grayscale or YCbCr 4:4:4, no restart
    intervals, no progressive (``JPEGUnsupportedError`` → PIL tier);
  - structurally broken payloads raise ``JPEGCorruptError``
    (sentinel tier), mirroring the PNG/GIF/WAV kernels.

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


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        while self.n == 0:
            if self.pos >= len(self.data):
                raise JPEGCorruptError("entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise JPEGCorruptError("dangling 0xFF in stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise JPEGCorruptError(f"marker 0xFF{nxt:02x} in scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, dec: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = dec.get((ln, code))
            if sym is not None:
                return sym
        raise JPEGCorruptError("invalid Huffman code")


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


# ---------------------------------------------------------------- encode

def jpeg_encode(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    qtable: list[int] | None = None,
) -> bytes:
    """Encode 8-bit pixels into a baseline JPEG.

    ``pixels`` is row-major gray (``channels=1``) or interleaved RGB
    (``channels=3``, converted to YCbCr 4:4:4).  Width/height need not
    be multiples of 8 (edge blocks replicate the last row/column).
    ``qtable`` is one 64-entry natural-order quant table used for all
    components (default ``DEFAULT_QTABLE``: exact-DC contract).
    """
    if _np is None:  # pragma: no cover
        raise JPEGUnsupportedError("jpeg codec requires numpy")
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"need {width * height * channels} pixel bytes, got {len(pixels)}"
        )
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
    else:
        planes = [arr[:, :, 0].astype(_np.float64)]

    bw = (width + 7) // 8
    bh = (height + 7) // 8
    qv = _np.array(q, dtype=_np.float64).reshape(8, 8)
    c = _cmat()

    dc_enc, _ = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_enc, _ = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    w = _BitWriter()
    pred = [0] * len(planes)
    for by in range(bh):
        for bx in range(bw):
            for ci, plane in enumerate(planes):
                # edge replication keeps the block mean = pixel mean
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
                quant = _np.sign(coeff) * _np.floor(
                    _np.abs(coeff) / qv + 0.5
                )
                zz = quant.reshape(64)[ZIGZAG].astype(_np.int64)
                dc = int(zz[0])
                diff = dc - pred[ci]
                pred[ci] = dc
                size = _category(diff)
                code, ln = dc_enc[size]
                w.put(code, ln)
                if size:
                    mag = diff if diff >= 0 else diff + (1 << size) - 1
                    w.put(mag, size)
                run = 0
                last_nz = 0
                for i in range(1, 64):
                    if zz[i]:
                        last_nz = i
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
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    n_comp = len(planes)
    dqt = seg(0xFFDB, bytes([0x00]) + bytes(q))
    sof_comps = b"".join(
        struct.pack(">BBB", i + 1, 0x11, 0) for i in range(n_comp)
    )
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, n_comp) + sof_comps,
    )
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
        + bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS),
    )
    sos_comps = b"".join(struct.pack(">BB", i + 1, 0x00) for i in range(n_comp))
    sos = seg(0xFFDA, bytes([n_comp]) + sos_comps + bytes([0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


# ---------------------------------------------------------------- decode

@corrupt_guard(JPEGCorruptError, JPEGUnsupportedError)
def jpeg_decode_planes(payload: bytes):
    """Decode a baseline JPEG → ``(width, height, [plane, ...])``
    where each plane is a full-resolution numpy uint8 array (YCbCr
    for 3-component images, gray for 1)."""
    if _np is None:  # pragma: no cover
        raise JPEGUnsupportedError("jpeg codec requires numpy")
    if not is_jpeg(payload):
        raise JPEGCorruptError("missing SOI marker")
    pos = 2
    n = len(payload)
    qtables: dict[int, list[int]] = {}
    huff_dec: dict[tuple[int, int], dict] = {}
    width = height = None
    comps = None  # list of (id, h, v, tq)
    scan_comps = None
    scan_start = None
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise JPEGCorruptError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
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
                _, dec = _canonical_codes(bits, vals)
                huff_dec[(tc, th)] = dec
                i += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise JPEGUnsupportedError(f"precision {prec}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                if hv != 0x11:
                    raise JPEGUnsupportedError("subsampled JPEG (not 4:4:4)")
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise JPEGUnsupportedError(f"SOF 0x{marker:02x} (not baseline)")
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", body, 0)
            if ri:
                raise JPEGUnsupportedError("restart intervals")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan_comps.append((cs, tt >> 4, tt & 0x0F))
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    if width is None or comps is None:
        raise JPEGCorruptError("no SOF before SOS")
    if scan_start is None or scan_comps is None:
        raise JPEGCorruptError("no SOS marker")
    if len(scan_comps) != len(comps):
        raise JPEGUnsupportedError("multi-scan JPEG")

    # entropy data runs to EOI
    end = payload.rfind(b"\xff\xd9")
    if end < scan_start:
        raise JPEGCorruptError("no EOI marker")
    reader = _BitReader(payload[scan_start:end])

    bw = (width + 7) // 8
    bh = (height + 7) // 8
    c = _cmat()
    planes = [
        _np.empty((bh * 8, bw * 8), dtype=_np.uint8) for _ in comps
    ]
    pred = [0] * len(comps)
    comp_q = []
    comp_dc = []
    comp_ac = []
    for (cid, tq), (scs, td, ta) in zip(comps, scan_comps):
        if scs != cid:
            raise JPEGUnsupportedError("scan order differs from SOF order")
        if tq not in qtables:
            raise JPEGCorruptError(f"missing quant table {tq}")
        if (0, td) not in huff_dec or (1, ta) not in huff_dec:
            raise JPEGCorruptError("missing Huffman table")
        comp_q.append(_np.array(qtables[tq], dtype=_np.int64))
        comp_dc.append(huff_dec[(0, td)])
        comp_ac.append(huff_dec[(1, ta)])

    zz_idx = _np.array(ZIGZAG)
    for by in range(bh):
        for bx in range(bw):
            for ci in range(len(comps)):
                zz = _np.zeros(64, dtype=_np.int64)
                size = reader.huff(comp_dc[ci])
                diff = _extend(reader.bits(size), size) if size else 0
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = reader.huff(comp_ac[ci])
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    if k > 63:
                        raise JPEGCorruptError("AC run past block end")
                    sz = rs & 0x0F
                    zz[k] = _extend(reader.bits(sz), sz)
                    k += 1
                deq = zz * comp_q[ci]
                if not deq[1:].any():
                    # DC-only fast path: exact integer reconstruction
                    # (IDCT of a DC-only block is the constant dc/8)
                    dc = int(deq[0])
                    # floor(dc/8 + 0.5) == (dc+4) floor-div 8 for all
                    # signs — same half-toward-+inf convention as the
                    # general float-IDCT path below
                    v = (dc + 4) // 8 + 128
                    blk = _np.full((8, 8), max(0, min(255, v)), dtype=_np.uint8)
                else:
                    nat = _np.zeros(64, dtype=_np.float64)
                    nat[zz_idx] = deq
                    f = nat.reshape(8, 8)
                    sp = c.T @ f @ c + 128.0
                    blk = _np.clip(_np.floor(sp + 0.5), 0, 255).astype(_np.uint8)
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    return width, height, [p[:height, :width] for p in planes]


def jpeg_decode(payload: bytes) -> tuple[int, int, float]:
    """Decode a JPEG → ``(width, height, mean_intensity)``.

    Gray: mean of the single plane.  Color: the decoded Y plane IS the
    luma (JFIF Y ≈ the ITU-R 601 weights the other codecs use), so the
    mean is taken over Y directly — no RGB round-trip noise.
    """
    width, height, planes = jpeg_decode_planes(payload)
    total = int(planes[0].astype(_np.int64).sum())
    return width, height, total / (width * height)
