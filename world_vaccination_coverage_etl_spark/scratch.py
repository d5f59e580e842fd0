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
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh scratch subdirectory, auto-removed at process exit."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="wvce_spark_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
