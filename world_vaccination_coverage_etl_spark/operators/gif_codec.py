"""Pure-stdlib GIF codec (LZW + palette) — third leg of the real
multimodal decode surface (PNG: ``png_codec``, WAV: ``wav_codec``).

GIF needs nothing beyond the stdlib: header + logical screen
descriptor parse, global color table, LZW decompression of the image
data sub-blocks, palette expansion.  Decode is EXACT (palette indices
are lossless), so the decoded luma statistics certify bit-for-bit
against an oracle that recomputes them from the generating formulas —
same ``decode(encode(x)) == x`` contract as the PNG query.

Scope (the baseline profile):
  - GIF87a/GIF89a, global color table, first image frame, no local
    color table; 4-pass interlace decoded for real since r9.
    89a extension blocks (graphic
    control, comments, application) are skipped; transparency is
    ignored like the PNG path ignores alpha (Pillow ``convert("L")``
    on the raw palette).
  - A local color table raises ``GIFUnsupportedError`` (PIL fallback
    tier); structurally broken payloads raise ``GIFCorruptError``
    (sentinel tier).

The encoder emits valid single-frame GIF87a with the classic
"uncompressed LZW" scheme — literal codes at the minimum width with a
clear code re-sent before the decoder's dictionary would force a code
-width change — so encoded bytes are a pure deterministic function of
(pixels, palette) and any conforming decoder (including PIL) reads
them back exactly.

Grayscale reduction reuses the PNG module's Pillow-parity integer
luma ((R*19595 + G*38470 + B*7471) >> 16).
"""

from __future__ import annotations

import struct

from ._codec_guard import corrupt_guard
from .png_codec import _luma

try:
    import numpy as _np
except ImportError:  # pragma: no cover - numpy is baked into this env
    _np = None


class GIFCorruptError(ValueError):
    """Payload claims to be a GIF but is structurally broken."""


class GIFUnsupportedError(ValueError):
    """Valid GIF outside the baseline profile (local color table)."""


def is_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF87a", b"GIF89a")


def _bits_for(n: int) -> int:
    b = 1
    while (1 << b) < n:
        b += 1
    return b


def _interlace_rows(height: int):
    """GIF 4-pass interlace row order (spec: 8/8, 8/8+4, 4/4+2, 2/2+1)."""
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        yield from range(start, height, step)


def gif_encode(
    width: int,
    height: int,
    indices: bytes,
    palette: bytes,
    interlace: bool = False,
) -> bytes:
    """Encode palette indices into a single-frame GIF87a.

    ``indices`` is the row-major index stream (``width * height``
    bytes); ``palette`` is ``3 * n_colors`` RGB bytes, ``n_colors``
    a power of two between 2 and 256 (padded up if not).
    ``interlace=True`` stores rows in the 4-pass interlace order and
    sets the descriptor flag (round-trip pin for the decoder's
    deinterlacer).
    """
    if len(indices) != width * height:
        raise ValueError(f"need {width * height} index bytes, got {len(indices)}")
    if len(palette) % 3:
        raise ValueError("palette must be 3*n bytes")
    n_colors = len(palette) // 3
    if n_colors < 1 or n_colors > 256:
        raise ValueError("palette must hold 1..256 colors")
    if indices and max(indices) >= n_colors:
        raise ValueError("index out of palette range")
    # pad palette to a power of two (GIF stores size as 2^(k+1))
    k = max(1, _bits_for(n_colors))
    pal = palette + b"\x00" * (3 * ((1 << k) - n_colors))
    mcs = max(2, k)  # LZW minimum code size (spec floor is 2)

    clear = 1 << mcs
    end = clear + 1
    code_size = mcs + 1
    # re-send clear before the decoder's dict growth would widen codes:
    # after a clear, the p-th following pixel (p>=2) adds one dict
    # entry; width changes when the dict reaches 2^(mcs+1)
    max_run = (1 << mcs) - 2

    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    if interlace:
        src = bytearray()
        for y in _interlace_rows(height):
            src += indices[y * width : (y + 1) * width]
        indices = bytes(src)

    emit(clear)
    run = 0
    for px in indices:
        if run >= max_run:
            emit(clear)
            run = 0
        emit(px)
        run += 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)

    sub = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        sub.append(len(chunk))
        sub += chunk
    sub.append(0)

    lsd = struct.pack("<HHBBB", width, height, 0x80 | ((k - 1) << 4) | (k - 1), 0, 0)
    idesc = struct.pack(
        "<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0
    )
    return (
        b"GIF87a" + lsd + pal + idesc + bytes([mcs]) + bytes(sub) + b"\x3B"
    )


def _lzw_decode(mcs: int, data: bytes, max_pixels: int) -> bytes:
    if mcs < 2 or mcs > 11:
        raise GIFCorruptError(f"LZW min code size {mcs} out of range")
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    table: list[bytes] = []
    code_size = mcs + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = mcs + 1
        prev = None

    reset()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                # missing explicit end code: tolerated like most
                # decoders when the pixel count is already satisfied
                if len(out) >= max_pixels:
                    return bytes(out[:max_pixels])
                raise GIFCorruptError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if code < len(table) and code != clear and code != end:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise GIFCorruptError(f"LZW code {code} out of table")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
        if len(out) >= max_pixels:
            break
    if len(out) < max_pixels:
        raise GIFCorruptError(
            f"decoded {len(out)} pixels, image declares {max_pixels}"
        )
    return bytes(out[:max_pixels])


@corrupt_guard(GIFCorruptError, GIFUnsupportedError)
def gif_decode_pixels(payload: bytes) -> tuple[int, int, bytes, bytes]:
    """Decode the first frame → ``(width, height, indices, palette)``."""
    if not is_gif(payload):
        raise GIFCorruptError("missing GIF signature")
    if len(payload) < 13:
        raise GIFCorruptError("truncated logical screen descriptor")
    _w, _h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = b""
    if packed & 0x80:
        n = 3 * (1 << ((packed & 0x07) + 1))
        palette = payload[pos : pos + n]
        if len(palette) < n:
            raise GIFCorruptError("truncated global color table")
        pos += n
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < n and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise GIFCorruptError(f"unexpected block 0x{b:02x}")
        if pos + 10 > n:
            raise GIFCorruptError("truncated image descriptor")
        _, _left, _top, width, height, ipacked = struct.unpack_from(
            "<BHHHHB", payload, pos
        )
        pos += 10
        interlaced = bool(ipacked & 0x40)
        if ipacked & 0x80:
            raise GIFUnsupportedError("local color table outside baseline")
        if not palette:
            raise GIFCorruptError("no global color table")
        if width == 0 or height == 0:
            raise GIFCorruptError("zero dimension")
        if pos >= n:
            raise GIFCorruptError("missing LZW data")
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while pos < n and payload[pos] != 0:
            ln = payload[pos]
            if pos + 1 + ln > n:
                raise GIFCorruptError("truncated data sub-block")
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        if pos >= n:
            raise GIFCorruptError("unterminated data sub-blocks")
        indices = _lzw_decode(mcs, bytes(data), width * height)
        if indices and max(indices) * 3 + 3 > len(palette):
            raise GIFCorruptError("palette index out of range")
        if interlaced:
            out = bytearray(len(indices))
            for si, y in enumerate(_interlace_rows(height)):
                out[y * width : (y + 1) * width] = indices[
                    si * width : (si + 1) * width
                ]
            indices = bytes(out)
        return width, height, indices, palette
    raise GIFCorruptError("no image descriptor")


def gif_decode(payload: bytes) -> tuple[int, int, float]:
    """Decode a GIF → ``(width, height, mean_intensity)`` with the
    same Pillow-parity integer luma as the PNG path."""
    width, height, idx, pal = gif_decode_pixels(payload)
    npx = width * height
    if _np is not None:
        p = _np.frombuffer(pal[: (len(pal) // 3) * 3], dtype=_np.uint8)
        p = p.reshape(-1, 3).astype(_np.int64)
        lut = (p[:, 0] * 19595 + p[:, 1] * 38470 + p[:, 2] * 7471) >> 16
        total = int(lut[_np.frombuffer(idx, dtype=_np.uint8)].sum())
    else:
        lut = [
            _luma(pal[i * 3], pal[i * 3 + 1], pal[i * 3 + 2])
            for i in range(len(pal) // 3)
        ]
        total = sum(lut[i] for i in idx)
    return width, height, total / npx
