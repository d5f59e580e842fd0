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
signed little-endian, any channel count / sample rate.  Anything else
(float PCM, ADPCM, extensible) raises ``WAVUnsupportedError``;
structurally broken payloads raise ``WAVCorruptError`` — the same
two-tier error contract the image kernel maps to sentinel / raise.

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
        elif ctype == b"data":
            data = payload[start : start + length]
        pos = start + length + (length & 1)  # chunks are word-aligned
    if fmt is None:
        raise WAVCorruptError("no fmt chunk")
    if data is None:
        raise WAVCorruptError("no data chunk")
    audio_format, channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise WAVUnsupportedError(
            f"outside PCM-8/16 baseline: format={audio_format} bits={bits}"
        )
    if channels == 0 or sample_rate == 0:
        raise WAVCorruptError("zero channels or sample rate")
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
