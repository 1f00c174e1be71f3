"""MERGE (upsert) into an SCBF dataset with file-level copy-on-write.

Semantics: SQL ``MERGE ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
THEN INSERT *`` — target rows whose key appears in the source are replaced by
the source row, source rows with new keys are appended.

Scale design (what Delta/Iceberg/Hudi do, expressed over SCBF v2):
- The source's key bounds are checked against every target file's footer
  min/max stats (``codec_v2.file_may_match`` — the same check the
  DataSource's filter pushdown uses). Files that PROVABLY contain no
  matching key are **carried over without being read or rewritten** — at
  100 TB with a narrow update set, that's almost all of them.
- Only the possibly-touched files are read, anti-joined against the source
  keys, unioned with the full source, and rewritten. The anti-join strategy
  is STATS-DRIVEN by default (broadcast when Catalyst can prove the key set
  small, shuffle otherwise); ``broadcast_keys`` forces it either way — pass
  False for merge sources whose size estimates cannot be trusted (never
  lets a wrong estimate broadcast a huge key set onto the driver).
- The output is written to a fresh directory and the swap is last, so a
  failed merge leaves the target untouched (the caller can also merge to a
  new path and swap atomically at the catalog level).

The reference format has no notion of update at all (SURVEY.md: write-once
CSV converter); this is Spark-native table-maintenance on top of the v2
stats the format already carries.
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..scbf import codec_v2
from . import vacuum as _vacuum
from ._staging import staging_path


def _target_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.scbf")))


def split_touched_files(
    files: Sequence[str], key: str, key_min, key_max
) -> tuple[list[str], list[str]]:
    """Partition target files into (maybe_touched, untouched) using footer
    min/max stats on the merge key — no data blocks are read."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    probe = [GreaterThanOrEqual((key,), key_min), LessThanOrEqual((key,), key_max)]
    touched, untouched = [], []
    for p in files:
        try:
            meta = codec_v2.read_meta(p)
        except Exception:
            touched.append(p)  # unknown/v1 file: rewrite conservatively
            continue
        (touched if codec_v2.file_may_match(meta, probe) else untouched).append(p)
    return touched, untouched


def merge_into(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    key: str,
    out_path: str | None = None,
    n_files: int = 8,
    rows_per_group: int | None = None,
    broadcast_keys: bool | None = None,
) -> dict:
    """Merge ``source`` into the SCBF dataset at ``target_path`` on ``key``.

    Returns stats: files carried over untouched vs rewritten. When
    ``out_path`` is None the merge replaces ``target_path`` (write to a
    sibling tmp dir, then swap). ``rows_per_group`` writes the rewritten
    files with intra-file row groups (see scbf/codec_v2.py) — carried-over
    files keep their existing layout."""
    _vacuum.recover(target_path)  # heal a swap a previous driver crashed in
    files = _target_files(target_path)
    if not files:
        raise ValueError(f"no SCBF files at {target_path}")

    b = source.agg(F.min(key).alias("mn"), F.max(key).alias("mx")).collect()[0]
    touched, untouched = split_touched_files(files, key, b.mn, b.mx)

    final_dest = out_path or target_path
    # hidden-sibling scratch (operators/_staging.py): invisible to the
    # DataSource's file lister, so a crash can't surface half-written rows
    staging = staging_path(final_dest, ".merge-tmp") if out_path is None else out_path
    os.makedirs(staging, exist_ok=True)

    # The DataSource reads directories — stage the touched files as symlinks
    # in a scratch dir so ONLY they are scanned (no data I/O for the link).
    schema = spark.read.format("scbf").load(target_path).schema
    if touched:
        link_dir = staging_path(final_dest, ".merge-tmp") + ".touched"
        os.makedirs(link_dir, exist_ok=True)
        for p in touched:
            dst = os.path.join(link_dir, os.path.basename(p))
            if not os.path.exists(dst):
                os.symlink(os.path.abspath(p), dst)
        touched_df = spark.read.format("scbf").load(link_dir)
    else:
        touched_df = spark.createDataFrame([], schema)
    keys_df = source.select(key).distinct()
    if broadcast_keys is True:
        keys_df = F.broadcast(keys_df)
    elif broadcast_keys is False:
        keys_df = keys_df.hint("shuffle_hash")  # never driver-built
    kept = touched_df.join(keys_df, key, "left_anti")
    rewritten = kept.unionByName(source.select(*[f.name for f in schema.fields]))
    w = (
        rewritten.repartition(max(1, min(n_files, len(touched) or 1)))
        .write.format("scbf")
        .option("version", "2")
        .mode("overwrite")
    )
    if rows_per_group:
        w = w.option("rows_per_group", str(rows_per_group))
    w.save(staging)
    if touched:
        shutil.rmtree(staging_path(final_dest, ".merge-tmp") + ".touched", ignore_errors=True)
    for p in untouched:
        shutil.copy2(p, os.path.join(staging, os.path.basename(p)))

    if out_path is None:
        _swap_into_place(target_path, staging)

    return {
        "files_total": len(files),
        "files_rewritten": len(touched),
        "files_carried_over": len(untouched),
    }


def _swap_into_place(target_path: str, staging: str) -> None:
    """Backup-rename-swap with dataset metadata carry-over (snapshot
    manifests etc.); the swap is the LAST step so a crash before it leaves
    the target untouched and vacuum.recover() heals a crash inside it."""
    backup = staging_path(target_path, ".merge-old")
    shutil.rmtree(backup, ignore_errors=True)  # stale backup from a prior crash
    os.rename(target_path, backup)
    os.rename(staging, target_path)
    for name in os.listdir(backup):
        if name.startswith("_"):
            os.rename(os.path.join(backup, name), os.path.join(target_path, name))
    shutil.rmtree(backup)


def delete_keys(
    spark: SparkSession,
    target_path: str,
    keys: DataFrame,
    key: str,
    out_path: str | None = None,
    n_files: int = 8,
    rows_per_group: int | None = None,
    broadcast_keys: bool | None = None,
) -> dict:
    """DELETE-by-key with file-level copy-on-write — the right-to-be-
    forgotten / retention-purge primitive (SQL ``DELETE FROM t WHERE key IN
    (SELECT key FROM keys)``), sharing MERGE's machinery:

    - footer min/max stats prove which files CANNOT contain a doomed key;
      those are carried over byte-identical, never read (at 100 TB with a
      narrow deletion set that is almost every file);
    - only possibly-touched files are scanned, LEFT ANTI-joined against the
      key set (stats-driven broadcast by default; ``broadcast_keys=False``
      pins shuffle so a bad estimate can never driver-build a huge set),
      and rewritten; staged write, swap last, metadata carried over.

    Returns {files_total, files_rewritten, files_carried_over,
    rows_deleted}."""
    _vacuum.recover(target_path)
    files = _target_files(target_path)
    if not files:
        raise ValueError(f"no SCBF files at {target_path}")

    b = keys.agg(F.min(key).alias("mn"), F.max(key).alias("mx")).collect()[0]
    if b.mn is None:  # empty deletion set: nothing to do, nothing rewritten
        return {
            "files_total": len(files),
            "files_rewritten": 0,
            "files_carried_over": len(files),
            "rows_deleted": 0,
        }
    touched, untouched = split_touched_files(files, key, b.mn, b.mx)

    final_dest = out_path or target_path
    staging = staging_path(final_dest, ".merge-tmp") if out_path is None else out_path
    os.makedirs(staging, exist_ok=True)

    schema = spark.read.format("scbf").load(target_path).schema
    rows_deleted = 0
    if touched:
        link_dir = staging_path(final_dest, ".merge-tmp") + ".touched"
        os.makedirs(link_dir, exist_ok=True)
        for p in touched:
            dst = os.path.join(link_dir, os.path.basename(p))
            if not os.path.exists(dst):
                os.symlink(os.path.abspath(p), dst)
        touched_df = spark.read.format("scbf").load(link_dir)
        keys_df = keys.select(key).distinct()
        if broadcast_keys is True:
            keys_df = F.broadcast(keys_df)
        elif broadcast_keys is False:
            keys_df = keys_df.hint("shuffle_hash")
        kept = touched_df.join(keys_df, key, "left_anti")
        rows_deleted = touched_df.count() - kept.count()
        w = (
            kept.repartition(max(1, min(n_files, len(touched))))
            .write.format("scbf")
            .option("version", "2")
            .mode("overwrite")
        )
        if rows_per_group:
            w = w.option("rows_per_group", str(rows_per_group))
        w.save(staging)
        shutil.rmtree(link_dir, ignore_errors=True)
    for p in untouched:
        shutil.copy2(p, os.path.join(staging, os.path.basename(p)))

    if not glob.glob(os.path.join(staging, "*.scbf")):
        # every row was deleted and the Spark sink wrote no files for the
        # empty result — materialize one explicit 0-row v2 file so the
        # dataset stays readable (the DataSource errors on empty dirs)
        import pyarrow as pa

        empty = pa.Table.from_pylist([], schema=spark.createDataFrame([], schema).toArrow().schema)
        codec_v2.write_arrow_table(os.path.join(staging, "part-empty.scbf"), empty)

    if out_path is None:
        _swap_into_place(target_path, staging)

    return {
        "files_total": len(files),
        "files_rewritten": len(touched),
        "files_carried_over": len(untouched),
        "rows_deleted": int(rows_deleted),
    }
