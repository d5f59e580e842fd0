"""Pure-stdlib Y4M (YUV4MPEG2) codec — the VIDEO leg of the real
multimodal decode surface (PNG/GIF/JPEG images, WAV audio, now video).

YUV4MPEG2 is the public uncompressed video interchange format
(mjpegtools): a plain-text stream header ``YUV4MPEG2 W<w> H<h>
F<num>:<den> [C<chroma>]\\n`` followed by ``FRAME\\n`` + planar pixel
data per frame.  Decode is EXACT (no entropy coding), so frame
sampling — the operation a 100 TB training-data pipeline actually
runs over video (pick every k-th frame, compute per-frame features)
— certifies bit-for-bit against a formula oracle, the same
``decode(encode(x)) == x`` contract as the other codecs.

Scope: chroma ``mono`` (luma-only) and ``420jpeg``/``420`` (luma +
quarter-res Cb/Cr; the stats here read the luma plane and SKIP the
chroma bytes — frame geometry still validates).  Interlaced streams
(``I`` tag other than ``Ip``) raise ``Y4MUnsupportedError``;
structurally broken payloads raise ``Y4MCorruptError`` — the standard
two-tier contract the decode kernels map to raise / sentinel.
"""

from __future__ import annotations

from ._codec_guard import corrupt_guard

try:
    import numpy as _np
except ImportError:  # pragma: no cover - numpy is baked into this env
    _np = None

_MAGIC = b"YUV4MPEG2"


class Y4MCorruptError(ValueError):
    """Payload claims to be Y4M but is structurally broken."""


class Y4MUnsupportedError(ValueError):
    """Valid Y4M outside the mono/420 progressive baseline."""


def is_y4m(payload: bytes) -> bool:
    return payload[: len(_MAGIC)] == _MAGIC


def y4m_encode(
    width: int,
    height: int,
    frames: list[bytes],
    fps: tuple[int, int] = (25, 1),
    chroma: str = "mono",
) -> bytes:
    """Encode luma frames into a Y4M stream.

    ``frames`` is a list of ``width*height``-byte luma planes.  With
    ``chroma='420jpeg'`` each frame is padded with neutral (128)
    quarter-res chroma planes; ``'mono'`` stores luma only.
    """
    if chroma not in ("mono", "420jpeg"):
        raise Y4MUnsupportedError(f"encoder emits mono/420jpeg, not {chroma}")
    if chroma == "420jpeg" and (width % 2 or height % 2):
        raise ValueError("420 chroma needs even dimensions")
    for i, f in enumerate(frames):
        if len(f) != width * height:
            raise ValueError(f"frame {i}: need {width * height} luma bytes")
    head = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 "
        f"C{chroma}\n"
    ).encode()
    out = bytearray(head)
    cb = bytes([128]) * ((width // 2) * (height // 2)) if chroma != "mono" else b""
    for f in frames:
        out += b"FRAME\n" + f + cb + cb
    return bytes(out)


@corrupt_guard(Y4MCorruptError, Y4MUnsupportedError)
def y4m_decode_frames(payload: bytes):
    """Decode a Y4M stream → ``(width, height, fps, [luma plane, ...])``."""
    if not is_y4m(payload):
        raise Y4MCorruptError("missing YUV4MPEG2 magic")
    nl = payload.find(b"\n")
    if nl < 0:
        raise Y4MCorruptError("unterminated stream header")
    try:
        tags = payload[len(_MAGIC) : nl].decode("ascii").split()
    except UnicodeDecodeError:
        raise Y4MCorruptError("non-ascii stream header") from None
    width = height = None
    fps = (25, 1)
    chroma = "420jpeg"  # the spec default when C is absent
    for tag in tags:
        if not tag:
            continue
        k, v = tag[0], tag[1:]
        if k == "W":
            width = int(v)
        elif k == "H":
            height = int(v)
        elif k == "F":
            num, den = v.split(":")
            fps = (int(num), int(den))
        elif k == "C":
            chroma = v
        elif k == "I" and v not in ("p", ""):
            raise Y4MUnsupportedError(f"interlaced stream I{v}")
    if not width or not height:
        raise Y4MCorruptError("header missing W/H")
    if chroma == "mono":
        frame_extra = 0
    elif chroma in ("420", "420jpeg", "420mpeg2", "420paldv"):
        if width % 2 or height % 2:
            raise Y4MCorruptError("odd dimensions with 420 chroma")
        frame_extra = 2 * ((width // 2) * (height // 2))
    else:
        raise Y4MUnsupportedError(f"chroma C{chroma}")
    luma_len = width * height
    frames = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise Y4MCorruptError(f"expected FRAME header at byte {pos}")
        data_start = fnl + 1
        data_end = data_start + luma_len + frame_extra
        if data_end > n:
            raise Y4MCorruptError("truncated frame data")
        frames.append(payload[data_start : data_start + luma_len])
        pos = data_end
    return width, height, fps, frames


def y4m_sample_stats(
    payload: bytes, every_k: int = 1
) -> tuple[int, int, int, int, int, int]:
    """Frame-sample a Y4M stream → ``(width, height, n_frames,
    n_sampled, luma_sum, luma_peak)``.

    Keeps frames ``0, k, 2k, ...`` (the pipeline's every-k-th-frame
    sampling) and reduces them to exact INTEGER statistics — sum and
    peak of the sampled luma bytes — so certification is
    layout-independent by construction.
    """
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    width, height, _fps, frames = y4m_decode_frames(payload)
    sampled = frames[::every_k]
    if _np is not None and sampled:
        arr = _np.frombuffer(b"".join(sampled), dtype=_np.uint8)
        return (
            width, height, len(frames), len(sampled),
            int(arr.astype(_np.int64).sum()), int(arr.max()),
        )
    total = 0
    peak = 0
    for f in sampled:
        total += sum(f)
        m = max(f) if f else 0
        if m > peak:
            peak = m
    return width, height, len(frames), len(sampled), total, peak
