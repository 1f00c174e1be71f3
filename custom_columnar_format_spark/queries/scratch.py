"""Process-lifetime scratch tracking for store-building queries (r9
ADVICE): every temp dataset a registered query materializes — IVF stores,
streaming sources/checkpoints/match tables, signature stores — registers
its root here and is removed at interpreter exit, so repeated bench/driver
runs do not leak corpus-sized directories into the system temp dir.

atexit (not per-query teardown) is deliberate: the bench reuses a query's
scratch between its two passes, and the driver's oracle comparison may
re-read a store after the query callable returns — the artifacts must
outlive the call, just not the process."""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOTS: set = set()


def _cleanup() -> None:
    for p in list(_ROOTS):
        shutil.rmtree(p, ignore_errors=True)


atexit.register(_cleanup)


def track(path: str) -> str:
    """Register an existing path for removal at process exit."""
    _ROOTS.add(path)
    return path


def scratch_dir(prefix: str) -> str:
    """mkdtemp + track: a fresh scratch dir that dies with the process."""
    return track(tempfile.mkdtemp(prefix=prefix))
