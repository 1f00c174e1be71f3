"""Vacuum: remove orphaned scratch artifacts from an SCBF dataset directory —
hidden ``.tmp-*.scbf`` files left by tasks that died between write and
commit, and ``*.merge-tmp`` / ``*.merge-old`` / ``*.compact-tmp`` /
``*.compact-old`` staging directories left by a driver that crashed mid-swap.

Committed data is never touched: visible ``*.scbf`` files and hive partition
directories are not candidates. Like Delta's VACUUM, an age threshold guards
against deleting scratch that a LIVE job is still writing (default 1 hour;
pass 0 in tests)."""

from __future__ import annotations

import glob
import os
import shutil
import time


def vacuum(path: str, older_than_seconds: float = 3600.0) -> dict:
    """Delete orphaned tmp files/dirs under ``path`` older than the
    threshold. Returns counts: {"tmp_files": n, "staging_dirs": n}."""
    now = time.time()
    stats = {"tmp_files": 0, "staging_dirs": 0}

    for p in glob.glob(os.path.join(path, "**", ".tmp-*.scbf"), recursive=True):
        try:
            if now - os.path.getmtime(p) >= older_than_seconds:
                os.remove(p)
                stats["tmp_files"] += 1
        except FileNotFoundError:
            pass

    for suffix in (".merge-tmp", ".merge-old", ".compact-tmp", ".compact-old"):
        for p in glob.glob(os.path.join(path + suffix)) + glob.glob(
            os.path.join(path, "**", f"*{suffix}"), recursive=True
        ):
            try:
                if os.path.isdir(p) and now - os.path.getmtime(p) >= older_than_seconds:
                    shutil.rmtree(p)
                    stats["staging_dirs"] += 1
            except FileNotFoundError:
                pass
    return stats
