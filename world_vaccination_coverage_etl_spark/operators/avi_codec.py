"""Pure-stdlib AVI (RIFF) container codec with MJPEG video streams —
the real-video-container leg of the multimodal surface (r9).

Y4M covers uncompressed video; real crawl data ships video in
CONTAINERS.  AVI is the RIFF container (public Microsoft "AVI RIFF
File Reference"), and Motion-JPEG is the one compressed video codec
this engine can already decode for real — every frame is a baseline/
progressive JPEG, handled by ``operators/jpeg_codec.py``.  So
container parsing here is honest end-to-end decode: RIFF chunk walk →
``hdrl`` headers (dims, frame count) → ``movi`` frame chunks →
per-sampled-frame JPEG decode.

The frame-sampling contract matches ``y4m_codec.y4m_sample_stats``:
keep frames ``0, k, 2k, ...`` and reduce to exact INTEGER luma stats.
Only SAMPLED frames are JPEG-decoded — the container walk skips the
other chunks entirely, which is the point of frame sampling at 100 TB
(compressed frames are never even entropy-decoded).

Scope: 'vids' MJPEG streams (``MJPG``/``mjpg``/``dmb1`` fourccs plus
``biCompression == 0x47504A4D``), single video stream; audio streams
are skipped.  Other codecs (H.264, VP9, ...) raise
``AVIUnsupportedError`` — no video library ships in this environment;
structurally broken payloads raise ``AVICorruptError``.  Same
two-tier error contract as the other codecs.
"""

from __future__ import annotations

import struct

from ._codec_guard import corrupt_guard
from .jpeg_codec import JPEGCorruptError, jpeg_decode_planes

try:
    import numpy as _np
except ImportError:  # pragma: no cover - numpy is baked into this env
    _np = None


class AVICorruptError(ValueError):
    """Payload claims to be an AVI but is structurally broken."""


class AVIUnsupportedError(ValueError):
    """Valid AVI outside the MJPEG video profile."""


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


_MJPEG_FOURCCS = {b"MJPG", b"mjpg", b"dmb1", b"MJPA"}


def avi_encode_mjpeg(
    width: int,
    height: int,
    frames: list[bytes],
    fps: int = 25,
) -> bytes:
    """Write a minimal MJPEG AVI: ``hdrl`` (avih + one vids strl),
    ``movi`` with one ``00dc`` chunk per JPEG frame, and an ``idx1``
    index (players expect one; the decoder here does not need it)."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec = 1_000_000 // fps
    avih = chunk(
        b"avih",
        struct.pack(
            "<14I", usec, 0, 0, 0x10, len(frames), 0, 1, 0,
            width, height, 0, 0, 0, 0,
        ),
    )
    strh = chunk(
        b"strh",
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), 0, 0, 0, 0, 0, width, height),
    )
    strf = chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
            width * height * 3, 0, 0, 0, 0,
        ),
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi_chunks = []
    offsets = []
    off = 4  # idx1 offsets are relative to the 'movi' fourcc
    for f in frames:
        c = chunk(b"00dc", f)
        offsets.append((off, len(f)))
        off += len(c)
        movi_chunks.append(c)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, o, ln)
            for o, ln in offsets
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) of the chunks in a span."""
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        start = pos + 8
        if start + length > end:
            raise AVICorruptError(f"truncated chunk {fourcc!r}")
        yield fourcc, start, length
        pos = start + length + (length & 1)  # word-aligned


@corrupt_guard(AVICorruptError, AVIUnsupportedError)
def avi_decode_frames(payload: bytes):
    """Decode an MJPEG AVI → ``(width, height, [jpeg bytes, ...])``.

    Returns the COMPRESSED frame payloads — callers decide which to
    JPEG-decode (frame sampling never touches the rest).
    """
    if not is_avi(payload):
        raise AVICorruptError("missing RIFF/AVI signature")
    width = height = None
    video_ok = False
    saw_vids = False
    frames: list[bytes] = []
    for fourcc, start, length in _walk_chunks(payload, 12, len(payload)):
        if fourcc != b"LIST":
            continue
        kind = payload[start : start + 4]
        if kind == b"hdrl":
            for f2, s2, l2 in _walk_chunks(payload, start + 4, start + length):
                if f2 == b"avih":
                    if l2 < 40:
                        raise AVICorruptError("avih too short")
                    vals = struct.unpack_from("<10I", payload, s2)
                    width, height = vals[8], vals[9]
                elif f2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                    fcc_type = fcc_handler = None
                    compression = None
                    for f3, s3, l3 in _walk_chunks(payload, s2 + 4, s2 + l2):
                        if f3 == b"strh" and l3 >= 8:
                            fcc_type = payload[s3 : s3 + 4]
                            fcc_handler = payload[s3 + 4 : s3 + 8]
                        elif f3 == b"strf" and l3 >= 20:
                            compression = payload[s3 + 16 : s3 + 20]
                    if fcc_type == b"vids":
                        saw_vids = True
                        if (
                            fcc_handler in _MJPEG_FOURCCS
                            or compression in _MJPEG_FOURCCS
                        ):
                            video_ok = True
                        else:
                            raise AVIUnsupportedError(
                                f"video codec {fcc_handler!r}/"
                                f"{compression!r} (MJPEG only)"
                            )
        elif kind == b"movi":
            for f2, s2, l2 in _walk_chunks(payload, start + 4, start + length):
                # '##dc'/'##db': compressed/uncompressed video frame
                if f2[2:4] in (b"dc", b"db"):
                    frames.append(payload[s2 : s2 + l2])
    if width is None:
        raise AVICorruptError("no avih header")
    if not saw_vids:
        raise AVICorruptError("no video stream")
    if not video_ok:
        raise AVIUnsupportedError("video stream is not MJPEG")
    return width, height, frames


def avi_sample_stats(
    payload: bytes, every_k: int = 1
) -> tuple[int, int, int, int, int, int]:
    """Frame-sample an MJPEG AVI → ``(width, height, n_frames,
    n_sampled, luma_sum, luma_peak)`` — the same exact-integer
    contract as ``y4m_sample_stats``, with luma = each sampled
    frame's decoded JPEG Y plane.

    Frames NOT sampled are never JPEG-decoded (the container walk
    only slices their chunk spans), so cost scales with
    ``n_sampled``, not ``n_frames``.
    """
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    width, height, frames = avi_decode_frames(payload)
    sampled = frames[::every_k]
    total = 0
    peak = 0
    for f in sampled:
        try:
            fw, fh, planes = jpeg_decode_planes(f)
        except JPEGCorruptError as exc:
            raise AVICorruptError(f"bad MJPEG frame: {exc}") from exc
        if (fw, fh) != (width, height):
            raise AVICorruptError(
                f"frame dims {fw}x{fh} != container {width}x{height}"
            )
        y = planes[0]
        if _np is not None:
            total += int(y.astype(_np.int64).sum())
            peak = max(peak, int(y.max()))
        else:  # pragma: no cover - numpy is baked into this env
            total += sum(int(v) for row in y for v in row)
            peak = max(peak, max(max(row) for row in y))
    return width, height, len(frames), len(sampled), total, peak
