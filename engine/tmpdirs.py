"""Process-scoped scratch directories for operators that materialize
intermediate files (sink roundtrips, streaming sources/checkpoints,
stored indexes).

Every operator that wrote to a bare ``tempfile.mkdtemp`` leaked one dir
per invocation per process — harmless for a single run, but a day of
test/bench/driver cycles accumulated hundreds of corpus-sized dirs in
/tmp (the refresh-index cache hit the same class first and grew its own
atexit hook; this generalizes that fix to all ~40 sites).

``scratch_dir(prefix)`` is a drop-in mkdtemp: dirs live for the PROCESS
lifetime — required, because operators return LAZY DataFrames that
resolve their files at execution time, so removal any earlier than exit
could break a plan the caller hasn't collected yet — and one atexit
sweep removes everything. Scratch dirs are per-process by construction
(mkdtemp), so exit-time removal cannot race another process.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp registered for one process-exit rmtree."""
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH.append(d)
    return d


@atexit.register
def _cleanup_scratch() -> None:
    for d in _SCRATCH:
        shutil.rmtree(d, ignore_errors=True)
