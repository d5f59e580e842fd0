"""Pure-stdlib WAV (RIFF PCM) codec — the audio half of the real
multimodal decode surface.

Same design as ``png_codec``: the engine's media decode must be REAL
and oracle-certifiable on every deployment, and PCM WAV needs nothing
beyond ``struct`` — RIFF chunk walk → fmt parse → data samples.  The
encoder exists so registry queries can synthesize deterministic WAVs
from table columns and the oracle can recompute the decoded stats
from the generating formulas: a green hash certifies
``decode(encode(x)) == x`` through the byte pipeline.

Scope: uncompressed PCM (format tag 1), 8-bit unsigned or 16-bit
signed little-endian, any channel count / sample rate; and COMPRESSED
IMA ADPCM (format tag 0x11, the RIFF spec's DVI/IMA profile — r9:
the first compressed-audio tier, 4-bit block-coded with the public
89-entry step table) in mono or stereo.  Anything else (float PCM,
MS-ADPCM, MP3/Opus, extensible) raises ``WAVUnsupportedError``;
structurally broken payloads raise ``WAVCorruptError`` — the same
two-tier error contract the image kernel maps to sentinel / raise.

The ADPCM decode is a pure-integer automaton (predictor + step-index
walk), so decoded stats are exact and a SQL oracle can replay the
same automaton with a recursive CTE — ``adpcm_pack`` exists so
registry fixtures can DEFINE the nibble stream and certify the
decoder bit-exactly despite the format being lossy for general
signals (the JPEG exact-DC lesson applied to audio).

All decoded statistics are INTEGERS (frame count, Σ|sample|, peak),
so certification is exact and layout-independent by construction —
the fixed-point lesson from ``embedding_covariance`` applied from
day one.
"""

from __future__ import annotations

import struct

from ._codec_guard import corrupt_guard

try:
    import numpy as _np
except ImportError:  # pragma: no cover - numpy is baked into this env
    _np = None


class WAVCorruptError(ValueError):
    """Payload claims to be a WAV but is structurally broken."""


class WAVUnsupportedError(ValueError):
    """Valid WAV outside the PCM-8/16 baseline profile."""


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def wav_encode(
    sample_rate: int, channels: int, samples: list[int], bits: int = 16
) -> bytes:
    """Encode interleaved integer samples into a PCM WAV.

    ``samples`` is frame-major interleaved (len must be a multiple of
    ``channels``); 16-bit values in [-32768, 32767], 8-bit in [0, 255].
    """
    if channels <= 0 or sample_rate <= 0:
        raise ValueError("channels and sample_rate must be positive")
    if len(samples) % channels:
        raise ValueError("sample count must be a multiple of channels")
    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        data = struct.pack(f"<{len(samples)}B", *samples)
    else:
        raise WAVUnsupportedError(f"encoder emits 8/16-bit PCM, not {bits}")
    block_align = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# IMA/DVI ADPCM tables (public: IMA Digital Audio Focus Group 1992 /
# Microsoft RIFF spec, format tag 0x0011)
ADPCM_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
ADPCM_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _adpcm_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: (pred, index) x nibble -> new state."""
    step = ADPCM_STEPS[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + ADPCM_INDEX[nibble & 7]))
    return pred, index


def adpcm_pack(
    sample_rate: int,
    channels: int,
    headers: list[tuple[int, int]],
    nibbles: list[int],
    samples_per_block: int,
) -> bytes:
    """Pack an EXPLICIT nibble stream into an IMA ADPCM WAV.

    ``headers`` is one ``(first_sample, step_index)`` per block per
    channel, block-major then channel-major; ``nibbles`` the 4-bit
    codes (0-15) per block per channel, ``samples_per_block - 1`` each
    (data nibbles per channel round up to a multiple of 8 — the 4-byte
    channel word — with zero padding the DECODER IGNORES beyond the
    sample count).  Fixtures use this to define the decoded signal
    exactly: the decode automaton is deterministic integer math, so an
    oracle can replay it.
    """
    if channels not in (1, 2):
        raise ValueError("IMA ADPCM packer supports mono/stereo")
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 1 + multiple of 8")
    npb = samples_per_block - 1  # data nibbles per channel per block
    n_blocks = len(headers) // channels
    if len(headers) != n_blocks * channels or len(nibbles) != n_blocks * channels * npb:
        raise ValueError("headers/nibbles length mismatch")
    block_align = channels * (4 + npb // 2)
    body = bytearray()
    k = 0
    for b in range(n_blocks):
        for c in range(channels):
            first, idx = headers[b * channels + c]
            if not (0 <= idx <= 88):
                raise ValueError("step index out of range")
            body += struct.pack("<hBB", first, idx, 0)
        # channel-interleaved 4-byte words: 8 nibbles ch0, 8 nibbles ch1, ...
        chans = [
            nibbles[(b * channels + c) * npb : (b * channels + c + 1) * npb]
            for c in range(channels)
        ]
        for g in range(npb // 8):
            for c in range(channels):
                grp = chans[c][g * 8 : g * 8 + 8]
                for lo, hi in zip(grp[0::2], grp[1::2]):
                    body.append((lo & 0x0F) | ((hi & 0x0F) << 4))
        k += 1
    n_frames = n_blocks * samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, sample_rate,
        (sample_rate * block_align + samples_per_block - 1) // samples_per_block,
        block_align, 4, 2, samples_per_block,
    )
    out = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_frames)
        + b"data" + struct.pack("<I", len(body)) + bytes(body)
    )
    return b"RIFF" + struct.pack("<I", len(out)) + out


def adpcm_encode(
    sample_rate: int,
    channels: int,
    samples: list[int],
    samples_per_block: int = 9,
) -> bytes:
    """Greedy IMA ADPCM encoder (the canonical quantizer): lossy for
    general signals — pytest covers it with tolerance round-trips;
    exact fixtures use ``adpcm_pack``."""
    if len(samples) % channels:
        raise ValueError("sample count must be a multiple of channels")
    n_frames = len(samples) // channels
    npb = samples_per_block - 1
    if n_frames % samples_per_block:
        raise ValueError("frames must be a multiple of samples_per_block")
    headers: list[tuple[int, int]] = []
    nibbles: list[int] = []
    index = [0] * channels
    for b in range(n_frames // samples_per_block):
        base = b * samples_per_block
        for c in range(channels):
            first = samples[base * channels + c]
            headers.append((first, index[c]))
            pred = first
            for i in range(npb):
                want = samples[(base + 1 + i) * channels + c]
                step = ADPCM_STEPS[index[c]]
                delta = want - pred
                nib = 8 if delta < 0 else 0
                delta = abs(delta)
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                pred, index[c] = _adpcm_step(pred, index[c], nib)
                nibbles.append(nib)
    return adpcm_pack(sample_rate, channels, headers, nibbles, samples_per_block)


def _adpcm_decode_data(
    data: bytes, channels: int, block_align: int, samples_per_block: int
) -> list[int]:
    """Decode IMA ADPCM data chunk -> interleaved int16 samples."""
    npb = samples_per_block - 1
    need_words = (npb + 7) // 8  # 4-byte words per channel
    if block_align != channels * (4 + need_words * 4):
        raise WAVCorruptError(
            f"block align {block_align} inconsistent with "
            f"{samples_per_block} samples/block x {channels} ch"
        )
    out: list[int] = []
    rem = len(data) % block_align
    if rem:
        # a legitimately short FINAL block (real-world encoders write
        # one when the stream ends mid-block; r10 ADVICE — rejecting
        # it dropped valid files).  It is self-contained (per-channel
        # header + fewer nibble words), so decode it like any block —
        # but it must still carry complete per-channel headers and
        # whole 4-byte data words, or it is not ADPCM state at all
        if rem < 4 * channels or (rem - 4 * channels) % (4 * channels):
            raise WAVCorruptError(
                f"trailing {rem} B is not a header plus whole "
                f"per-channel words (block align {block_align})"
            )
    n_blocks = (len(data) + block_align - 1) // block_align
    for b in range(n_blocks):
        pos = b * block_align
        end = min(pos + block_align, len(data))
        pred = [0] * channels
        idx = [0] * channels
        frame0 = []
        for c in range(channels):
            first, sidx, _rsv = struct.unpack_from("<hBB", data, pos)
            pos += 4
            if sidx > 88:
                raise WAVCorruptError(f"step index {sidx} > 88")
            pred[c], idx[c] = first, sidx
            frame0.append(first)
        out.extend(frame0)
        # decode per channel, then re-interleave frame-major; a short
        # final block simply supplies fewer word groups
        chan_samples = [[] for _ in range(channels)]
        for _g in range(need_words):
            if pos >= end:
                break
            for c in range(channels):
                word = data[pos : pos + 4]
                pos += 4
                for byte in word:
                    for nib in (byte & 0x0F, byte >> 4):
                        if len(chan_samples[c]) >= npb:
                            continue  # pad nibbles beyond sample count
                        pred[c], idx[c] = _adpcm_step(pred[c], idx[c], nib)
                        chan_samples[c].append(pred[c])
        for i in range(min(len(s) for s in chan_samples) if channels else 0):
            for c in range(channels):
                out.append(chan_samples[c][i])
    return out


@corrupt_guard(WAVCorruptError, WAVUnsupportedError)
def wav_decode_samples(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a PCM WAV → ``(sample_rate, channels, bits, samples)``.

    ``samples`` is the interleaved integer stream exactly as stored
    (16-bit signed / 8-bit unsigned — no normalization, decode is
    lossless by construction).
    """
    if not is_wav(payload):
        raise WAVCorruptError("missing RIFF/WAVE signature")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    samples_per_block = 0
    fact_frames = None  # true frame count for compressed profiles
    while pos + 8 <= n:
        ctype = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        start = pos + 8
        if start + length > n:
            raise WAVCorruptError("truncated chunk")
        if ctype == b"fmt ":
            if length < 16:
                raise WAVCorruptError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", payload, start)
            if fmt[0] == 0x11:  # IMA ADPCM: cbSize + wSamplesPerBlock
                if length < 20:
                    raise WAVCorruptError("ADPCM fmt missing extension")
                (samples_per_block,) = struct.unpack_from(
                    "<H", payload, start + 18
                )
        elif ctype == b"data":
            data = payload[start : start + length]
        elif ctype == b"fact" and length >= 4:
            (fact_frames,) = struct.unpack_from("<I", payload, start)
        pos = start + length + (length & 1)  # chunks are word-aligned
    if fmt is None:
        raise WAVCorruptError("no fmt chunk")
    if data is None:
        raise WAVCorruptError("no data chunk")
    audio_format, channels, sample_rate, _brate, balign, bits = fmt
    if channels == 0 or sample_rate == 0:
        raise WAVCorruptError("zero channels or sample rate")
    if audio_format == 0x11:  # IMA ADPCM (r9 compressed-audio tier)
        if bits != 4:
            raise WAVUnsupportedError(f"IMA ADPCM with {bits}-bit codes")
        if channels not in (1, 2):
            raise WAVUnsupportedError("IMA ADPCM beyond stereo")
        if samples_per_block < 1 or (samples_per_block - 1) % 8:
            raise WAVCorruptError(
                f"bad ADPCM samples/block {samples_per_block}"
            )
        samples = _adpcm_decode_data(
            data, channels, balign, samples_per_block
        )
        # the fact chunk records the TRUE frame count for compressed
        # profiles; a final block zero-padded to samples_per_block must
        # not decode the pad as audio (r9 ADVICE)
        if fact_frames is not None:
            if fact_frames * channels > len(samples):
                raise WAVCorruptError(
                    f"fact chunk claims {fact_frames} frames but data "
                    f"decodes to {len(samples) // channels}"
                )
            samples = samples[: fact_frames * channels]
        return sample_rate, channels, 4, samples
    if audio_format != 1 or bits not in (8, 16):
        raise WAVUnsupportedError(
            f"outside PCM-8/16/IMA-ADPCM profile: "
            f"format={audio_format} bits={bits}"
        )
    width = bits // 8
    usable = len(data) - (len(data) % (width * channels))
    count = usable // width
    if bits == 16:
        samples = list(struct.unpack_from(f"<{count}h", data))
    else:
        samples = list(struct.unpack_from(f"<{count}B", data))
    return sample_rate, channels, bits, samples


def wav_decode(payload: bytes) -> tuple[int, int, int, int, int]:
    """Decode a PCM WAV → ``(sample_rate, channels, n_frames,
    sum_abs, peak)``.

    All five are exact integers (``sum_abs`` = Σ|sample| over the
    interleaved stream, ``peak`` = max |sample|; 0 for an empty data
    chunk), so the certification hash cannot depend on summation
    order or float rounding.
    """
    sample_rate, channels, _bits, samples = wav_decode_samples(payload)
    n_frames = len(samples) // channels
    if _np is not None and samples:
        a = _np.abs(_np.asarray(samples, dtype=_np.int64))
        return sample_rate, channels, n_frames, int(a.sum()), int(a.max())
    sum_abs = 0
    peak = 0
    for s in samples:
        a = -s if s < 0 else s
        sum_abs += a
        if a > peak:
            peak = a
    return sample_rate, channels, n_frames, sum_abs, peak
