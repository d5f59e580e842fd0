"""Process-scoped scratch directories for stage materialization.

Registered queries sometimes need a short-lived filesystem location —
a parquet stage checkpoint (curation), a streaming sink + its
checkpoint dir.  ``tempfile.mkdtemp`` per invocation leaks one
directory per call (the bench's best-of-2 doubles it; advisor-flagged
r3).  Instead, every caller allocates under ONE per-process root that
is removed at interpreter exit, so repeated invocations in a process
cannot accumulate garbage beyond that process's lifetime.

Callers still get a FRESH subdirectory per call: a streaming
checkpoint dir must not be reused by an independent run (reuse means
"resume that stream"), and concurrent queries must not collide.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def _scratch_base() -> str | None:
    """Prefer a RAM-backed base when one exists: streaming checkpoint
    commits are many small fsync'd files, and /tmp here is ext4 — a
    tmpfs base removes the disk round-trips from every micro-batch
    (r6/r7 stream-harness overhead item).  On a real cluster the
    analogous choice is local SSD for state/checkpoint scratch."""
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return None  # tempfile default


def scratch_dir(prefix: str) -> str:
    """A fresh scratch subdirectory, auto-removed at process exit."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="wvce_spark_scratch_", dir=_scratch_base())
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
