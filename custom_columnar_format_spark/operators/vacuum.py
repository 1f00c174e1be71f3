"""Vacuum + crash recovery for SCBF dataset scratch artifacts.

``vacuum`` removes orphans: hidden ``.tmp-*.scbf`` files left by tasks that
died between write and commit, and staging/backup directories left by a
driver that crashed mid-swap (``operators/merge.py`` / ``operators/
compact.py``). Scratch dirs use the hidden-sibling naming of
``operators/_staging.py`` (``root/.k=v.compact-tmp``); the legacy visible
naming (``root/k=v.compact-tmp``) is still recognised. Because Python's
``glob`` never matches dot-prefixed components with ``*``/``**``, discovery
walks the tree with ``os.walk`` and classifies names via
``_staging.split_scratch`` instead of globbing.

Two safety rules:

- Committed data is never touched: visible ``*.scbf`` files and hive
  partition directories are not candidates.
- A ``*-old`` BACKUP whose dataset directory is missing is the only
  surviving copy of that data (the driver died between the two swap
  renames). ``vacuum`` refuses to delete it; ``recover`` renames it back
  into place. ``compact``/``merge`` call ``recover`` on entry so a crashed
  swap heals on the next maintenance run.

Like Delta's VACUUM, an age threshold guards against deleting scratch that a
LIVE job is still writing (default 1 hour; pass 0 in tests).
"""

from __future__ import annotations

import glob
import os
import shutil
import time

from ._staging import split_scratch

#: sibling link-dirs merge stages its touched-file symlinks in; always
#: disposable scratch, never a restorable backup
_LINK_SUFFIX = ".touched"


def _scratch_of(name: str):
    """Classify a directory NAME: return (dataset_dir_basename, suffix,
    is_backup) for scratch names, else None. ``.touched`` link dirs are
    scratch but never backups."""
    probe = name
    if probe.endswith(_LINK_SUFFIX):
        probe = probe[: -len(_LINK_SUFFIX)]
    hit = split_scratch(probe)
    if hit is None:
        return None
    ds, suffix = hit
    is_backup = suffix.endswith("-old") and not name.endswith(_LINK_SUFFIX)
    return ds, suffix, is_backup


def _scratch_dirs(path: str) -> list[tuple[str, str, bool]]:
    """All scratch dirs belonging to the dataset at ``path``:
    hidden/legacy siblings of the root itself, plus any found inside the
    tree (scratch of hive partition dirs). Returns
    (scratch_path, dataset_dir, is_backup); does not descend into scratch."""
    out = []
    root = os.path.abspath(path)
    parent, base = os.path.split(root)
    # scratch of the dataset root lives NEXT TO it in the parent dir
    if os.path.isdir(parent):
        for name in os.listdir(parent):
            hit = _scratch_of(name)
            if hit is None:
                continue
            ds_base, _suffix, is_backup = hit
            if os.path.basename(ds_base) == base:
                out.append((os.path.join(parent, name), root, is_backup))
    # scratch of partition dirs lives inside the tree
    for walk_root, dirs, _files in os.walk(root):
        keep = []
        for dname in dirs:
            hit = _scratch_of(dname)
            if hit is None:
                keep.append(dname)
                continue
            ds_base, _suffix, is_backup = hit
            out.append(
                (
                    os.path.join(walk_root, dname),
                    os.path.join(walk_root, os.path.basename(ds_base)),
                    is_backup,
                )
            )
        dirs[:] = keep  # never vacuum inside scratch
    return out


def recover(path: str) -> list[str]:
    """Heal a crashed swap: any ``*-old`` backup whose dataset directory is
    MISSING (driver died between ``rename(d, backup)`` and
    ``rename(staging, d)``) is renamed back to the dataset directory.
    Returns the restored dataset dirs. Backups whose dataset dir exists are
    left alone (the swap completed; vacuum deletes them by age)."""
    restored = []
    for scratch, ds, is_backup in _scratch_dirs(path):
        if is_backup and not os.path.exists(ds):
            os.rename(scratch, ds)
            restored.append(ds)
    return restored


def vacuum(path: str, older_than_seconds: float = 3600.0) -> dict:
    """Delete orphaned tmp files and scratch dirs for the dataset at
    ``path`` older than the threshold. Backups that are the only copy of a
    vanished dataset dir are NEVER deleted (see ``recover``). Returns
    counts: {"tmp_files": n, "staging_dirs": n}."""
    now = time.time()
    stats = {"tmp_files": 0, "staging_dirs": 0}

    for p in glob.glob(os.path.join(path, "**", ".tmp-*.scbf"), recursive=True):
        try:
            if now - os.path.getmtime(p) >= older_than_seconds:
                os.remove(p)
                stats["tmp_files"] += 1
        except FileNotFoundError:
            pass

    for scratch, ds, is_backup in _scratch_dirs(path):
        if is_backup and not os.path.exists(ds):
            continue  # only surviving copy — recover() restores it
        try:
            if now - os.path.getmtime(scratch) >= older_than_seconds:
                shutil.rmtree(scratch)
                stats["staging_dirs"] += 1
        except FileNotFoundError:
            pass
    return stats
