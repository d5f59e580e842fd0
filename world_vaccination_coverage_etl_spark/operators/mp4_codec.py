"""Pure-stdlib MP4 (ISO Base Media File Format) container codec with
Motion-JPEG video tracks — the second real-video-container leg of the
multimodal surface (r9).

AVI covers the RIFF container family; the web's OTHER container is
ISO BMFF (ISO/IEC 14496-12 — public spec), the ``ftyp``/``moov``/
``mdat`` box format behind .mp4/.mov.  Motion-JPEG remains the one
compressed video codec this engine decodes for real (every sample is
a baseline/progressive JPEG via ``operators/jpeg_codec.py``), so the
container walk here is honest end-to-end decode: box tree walk →
``moov``/``trak``/``mdia`` handler probe → ``stbl`` sample tables
(``stsd`` entry + dims, ``stsz`` sizes, ``stsc`` sample→chunk map,
``stco``/``co64`` chunk offsets) → absolute sample spans in ``mdat``
→ per-SAMPLED-frame JPEG decode.

The frame-sampling contract matches ``avi_codec.avi_sample_stats`` /
``y4m_codec.y4m_sample_stats``: keep samples ``0, k, 2k, ...`` and
reduce to exact INTEGER luma stats.  Only sampled frames are
JPEG-decoded — unsampled spans are sliced by the sample-table
arithmetic and never entropy-decoded, which is the point of frame
sampling at 100 TB (stsz/stco even make frame N's span pure table
arithmetic — no chunk walk past N-1 frames).

Scope: one 'vide' track whose sample entry is Motion-JPEG (``jpeg``,
the QuickTime/ISO sample-entry fourcc, plus ``mjpa``/``mjpb``).
Modern codecs (``avc1``, ``hvc1``, ``vp09``, ``av01``, ...) raise
``MP4UnsupportedError`` — no video library ships in this
environment; structurally broken payloads raise ``MP4CorruptError``.
Same two-tier error contract as the other codecs.
"""

from __future__ import annotations

import struct

from ._codec_guard import corrupt_guard
from .jpeg_codec import JPEGCorruptError, jpeg_decode_planes

try:
    import numpy as _np
except ImportError:  # pragma: no cover - numpy is baked into this env
    _np = None


class MP4CorruptError(ValueError):
    """Payload claims to be an MP4 but is structurally broken."""


class MP4UnsupportedError(ValueError):
    """Valid ISO BMFF outside the MJPEG video profile."""


_MJPEG_ENTRIES = {b"jpeg", b"mjpa", b"mjpb", b"MJPG"}


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


# ---------------------------------------------------------------- encode

def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def mp4_encode_mjpeg(
    width: int,
    height: int,
    frames: list[bytes],
    fps: int = 25,
    samples_per_chunk: int = 2,
) -> bytes:
    """Write a minimal MJPEG MP4: ``ftyp`` + ``mdat`` (samples
    back-to-back) + ``moov`` with one 'vide' track whose ``stbl``
    maps samples into chunks of ``samples_per_chunk`` — so the
    decoder's stsc/stco arithmetic is exercised for real, not just a
    single-chunk degenerate layout."""
    if not frames:
        raise ValueError("at least one frame required")
    if samples_per_chunk < 1:
        raise ValueError("samples_per_chunk must be >= 1")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp41")
    mdat_body = b"".join(frames)
    mdat_off = len(ftyp) + 8  # first sample's absolute file offset

    n = len(frames)
    sizes = [len(f) for f in frames]
    # chunk layout: fixed samples_per_chunk, remainder in the last chunk
    chunk_offsets = []
    off = mdat_off
    for i in range(0, n, samples_per_chunk):
        chunk_offsets.append(off)
        off += sum(sizes[i : i + samples_per_chunk])
    # stsc run-length entries (first_chunk is 1-based)
    stsc_entries = [(1, samples_per_chunk, 1)]
    rem = n % samples_per_chunk
    if rem and n > samples_per_chunk:
        stsc_entries.append((len(chunk_offsets), rem, 1))
    elif rem:  # single short chunk
        stsc_entries = [(1, rem, 1)]

    timescale = fps * 1000
    dur = n * 1000

    stsd_entry = (
        struct.pack(">I4s", 86, b"jpeg")
        + b"\x00" * 6 + struct.pack(">H", 1)     # reserved + data_ref_index
        + b"\x00" * 16                            # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)                    # reserved
        + struct.pack(">H", 1)                    # frame_count
        + b"\x00" * 32                            # compressorname
        + struct.pack(">Hh", 24, -1)              # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1000))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">4H", 0, 0, 0, 0))
    dinf = _box(
        b"dinf",
        _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")),
    )
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"video handler\x00",
    )
    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov


# ---------------------------------------------------------------- decode

def _walk_boxes(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) of the boxes in a span.
    Handles 64-bit largesize (size==1) and to-end boxes (size==0)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, pos)
        fourcc = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise MP4CorruptError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", payload, body)
            body += 8
            box_end = pos + size
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if size != 0 and (box_end < body or box_end > end):
            raise MP4CorruptError(f"box {fourcc!r} overruns its parent")
        yield fourcc, body, box_end
        pos = box_end


def _children(payload: bytes, start: int, end: int) -> dict[bytes, tuple[int, int]]:
    return {f: (s, e) for f, s, e in _walk_boxes(payload, start, end)}


def _full_body(payload: bytes, start: int, end: int) -> tuple[int, int]:
    """Skip a FullBox's version/flags word; returns (version, body_start)."""
    if start + 4 > end:
        raise MP4CorruptError("truncated full box header")
    return payload[start], start + 4


@corrupt_guard(MP4CorruptError, MP4UnsupportedError)
def mp4_decode_frames(payload: bytes):
    """Decode an MJPEG MP4 → ``(width, height, [jpeg bytes, ...])``.

    Returns the COMPRESSED sample payloads — callers decide which to
    JPEG-decode (frame sampling never touches the rest).
    """
    if not is_mp4(payload):
        raise MP4CorruptError("missing ftyp box")
    top = _children(payload, 0, len(payload))
    if b"moov" not in top:
        raise MP4CorruptError("no moov box")
    moov_s, moov_e = top[b"moov"]

    vide = None  # (width, height, stbl span)
    saw_video_entry = None
    for f, s, e in _walk_boxes(payload, moov_s, moov_e):
        if f != b"trak":
            continue
        trak = _children(payload, s, e)
        if b"mdia" not in trak:
            continue
        mdia = _children(payload, *trak[b"mdia"])
        if b"hdlr" not in mdia or b"minf" not in mdia:
            continue
        _v, hb = _full_body(payload, *mdia[b"hdlr"])
        if payload[hb + 4 : hb + 8] != b"vide":
            continue
        minf = _children(payload, *mdia[b"minf"])
        if b"stbl" not in minf:
            raise MP4CorruptError("video track without stbl")
        stbl = _children(payload, *minf[b"stbl"])
        if b"stsd" not in stbl:
            raise MP4CorruptError("stbl without stsd")
        _v, sb = _full_body(payload, *stbl[b"stsd"])
        (n_entries,) = struct.unpack_from(">I", payload, sb)
        if n_entries < 1:
            raise MP4CorruptError("empty stsd")
        entry_fourcc = payload[sb + 8 : sb + 12]
        saw_video_entry = entry_fourcc
        if entry_fourcc not in _MJPEG_ENTRIES:
            continue  # maybe another trak is MJPEG
        # VisualSampleEntry: 8 (reserved+dri) + 16 (pre_defined) then dims
        w, h = struct.unpack_from(">HH", payload, sb + 12 + 24)
        vide = (w, h, stbl)
        break
    if vide is None:
        if saw_video_entry is not None:
            raise MP4UnsupportedError(
                f"video sample entry {saw_video_entry!r} (MJPEG only)"
            )
        raise MP4CorruptError("no video track")
    width, height, stbl = vide

    # sample sizes
    if b"stsz" not in stbl:
        raise MP4CorruptError("stbl without stsz")
    _v, zb = _full_body(payload, *stbl[b"stsz"])
    uniform, n_samples = struct.unpack_from(">II", payload, zb)
    if uniform:
        sizes = [uniform] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", payload, zb + 8))

    # chunk offsets (stco 32-bit or co64 64-bit)
    if b"stco" in stbl:
        _v, cb = _full_body(payload, *stbl[b"stco"])
        (n_chunks,) = struct.unpack_from(">I", payload, cb)
        offsets = list(struct.unpack_from(f">{n_chunks}I", payload, cb + 4))
    elif b"co64" in stbl:
        _v, cb = _full_body(payload, *stbl[b"co64"])
        (n_chunks,) = struct.unpack_from(">I", payload, cb)
        offsets = list(struct.unpack_from(f">{n_chunks}Q", payload, cb + 4))
    else:
        raise MP4CorruptError("stbl without stco/co64")

    # sample -> chunk map: stsc run-length entries (first_chunk 1-based)
    if b"stsc" not in stbl:
        raise MP4CorruptError("stbl without stsc")
    _v, kb = _full_body(payload, *stbl[b"stsc"])
    (n_runs,) = struct.unpack_from(">I", payload, kb)
    runs = [
        struct.unpack_from(">III", payload, kb + 4 + 12 * i)
        for i in range(n_runs)
    ]
    if not runs or runs[0][0] != 1:
        raise MP4CorruptError("stsc must start at chunk 1")

    frames: list[bytes] = []
    si = 0
    n_len = len(payload)
    for ri, (first, per_chunk, _sdi) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < n_runs else len(offsets)
        for ci in range(first - 1, last):
            if si >= n_samples:
                break
            off = offsets[ci]
            for _ in range(per_chunk):
                if si >= n_samples:
                    break
                sz = sizes[si]
                if off + sz > n_len:
                    raise MP4CorruptError(f"sample {si} overruns mdat")
                frames.append(payload[off : off + sz])
                off += sz
                si += 1
    if si != n_samples:
        raise MP4CorruptError(
            f"sample tables cover {si} of {n_samples} samples"
        )
    return width, height, frames


def mp4_sample_stats(
    payload: bytes, every_k: int = 1
) -> tuple[int, int, int, int, int, int]:
    """Frame-sample an MJPEG MP4 → ``(width, height, n_frames,
    n_sampled, luma_sum, luma_peak)`` — the same exact-integer
    contract as ``avi_sample_stats`` / ``y4m_sample_stats``.

    Samples NOT kept are never JPEG-decoded, so decode cost scales
    with ``n_sampled``, not ``n_frames``.
    """
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    width, height, frames = mp4_decode_frames(payload)
    sampled = frames[::every_k]
    total = 0
    peak = 0
    for f in sampled:
        try:
            fw, fh, planes = jpeg_decode_planes(f)
        except JPEGCorruptError as exc:
            raise MP4CorruptError(f"bad MJPEG sample: {exc}") from exc
        if (fw, fh) != (width, height):
            raise MP4CorruptError(
                f"sample dims {fw}x{fh} != track {width}x{height}"
            )
        y = planes[0]
        if _np is not None:
            total += int(y.astype(_np.int64).sum())
            peak = max(peak, int(y.max()))
        else:  # pragma: no cover - numpy is baked into this env
            total += sum(int(v) for row in y for v in row)
            peak = max(peak, max(max(row) for row in y))
    return width, height, len(frames), len(sampled), total, peak
