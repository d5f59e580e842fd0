"""Shared corrupt-payload guard for the stdlib media codecs.

The decode kernels (``decode_image_batch``, ``decode_audio_batch``,
``sample_video_batch``) catch only the codec's typed ``*CorruptError``
/ ``*UnsupportedError`` and degrade a bad payload to the documented
sentinel row.  A malformed payload that escapes the typed tiers — a
truncated SOF body raising ``struct.error``, a non-numeric Y4M header
tag raising bare ``ValueError`` from ``int()``, an out-of-range index
raising ``IndexError`` — would instead fail the whole mapInPandas
task.  ``corrupt_guard`` wraps a decoder entry point so every
low-level parse exception is re-raised as the format's CorruptError,
while the codec's own typed errors (which subclass ValueError) pass
through unchanged.
"""

from __future__ import annotations

import functools
import struct
import zlib

_LOW_LEVEL = (
    struct.error,
    IndexError,
    UnicodeDecodeError,
    OverflowError,
    ZeroDivisionError,
    zlib.error,
    ValueError,  # bare int()/unpack ValueErrors; typed errors re-raised first
)


def corrupt_guard(corrupt_cls, unsupported_cls):
    """Decorator factory: map stray parse exceptions to ``corrupt_cls``."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (corrupt_cls, unsupported_cls):
                raise
            except _LOW_LEVEL as exc:
                raise corrupt_cls(
                    f"malformed payload ({type(exc).__name__}: {exc})"
                ) from exc

        return wrapped

    return deco
