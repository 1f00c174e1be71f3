"""CLI with the reference's exact command surface (reference cli.py:33-43):

    python -m custom_columnar_format_spark.cli csv_to_custom in.csv out.scbf
    python -m custom_columnar_format_spark.cli custom_to_csv f.scbf out.csv [--cols a b]

plus engine extensions the reference lacks. Conversion runs on Spark
(distributed CSV parse, Catalyst projection) with ``--single-file`` output
parity: the result is one plain ``.scbf`` file byte-readable by the
reference's reader. ``--local`` bypasses the JVM entirely and uses the pure
codec — handy for small files and air-gapped metadata peeks.

Schema inference follows Spark semantics (all-rows sampling) by default;
``--compat-inference`` reproduces the reference's first-non-empty-value rule
(reference writer.py:41-47) via ``scbf.inference``.
"""

from __future__ import annotations

import argparse
import csv as _csv
import glob
import os
import shutil
import sys


def _get_spark(cpus: str = "*"):
    """(session, owned): reuse the caller's active session when one exists —
    and never stop a session the CLI doesn't own (stopping a shared session
    out from under a host application would be hostile)."""
    from pyspark.sql import SparkSession

    existing = SparkSession.getActiveSession()
    if existing is not None:
        return existing, False
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("scbf-cli")
        .getOrCreate()
    ), True


def _finalize_single_file(out_dir: str, target: str) -> None:
    (part,) = glob.glob(os.path.join(out_dir, "part-*.scbf"))
    shutil.move(part, target)
    shutil.rmtree(out_dir, ignore_errors=True)


def csv_to_custom(args) -> None:
    if args.local:
        from .scbf import codec, inference

        with open(args.csv_path, newline="", encoding="utf-8") as f:
            rows = list(_csv.reader(f))
        header, data = rows[0], rows[1:]
        infer = inference.infer_compat if args.compat_inference else inference.infer_full
        types = infer(data, len(header))
        columns = [
            inference.parse_column([r[i] for r in data], types[i]) for i in range(len(header))
        ]
        codec.write_table_path(args.out_path, header, types, columns, level=args.compression_level)
        return

    from .sources.scbf_datasource import register

    spark, owned = _get_spark()
    try:
        register(spark)
        df = spark.read.option("header", True).option("inferSchema", True).csv(args.csv_path)
        # SCBF v1 carries int32/float64/utf8 — narrow Spark's inferred types.
        from pyspark.sql import functions as F
        from pyspark.sql.types import DoubleType, FloatType, IntegerType, LongType

        for f_ in df.schema.fields:
            if isinstance(f_.dataType, LongType):
                df = df.withColumn(f_.name, F.col(f_.name).cast("int"))
            elif isinstance(f_.dataType, (FloatType,)):
                df = df.withColumn(f_.name, F.col(f_.name).cast("double"))
            elif not isinstance(f_.dataType, (IntegerType, DoubleType)):
                df = df.withColumn(f_.name, F.col(f_.name).cast("string"))
        tmp = args.out_path + ".spark-out"
        writer = df.coalesce(1) if args.single_file else df
        writer.write.format("scbf").mode("overwrite").option(
            "compression_level", str(args.compression_level)
        ).save(tmp if args.single_file else args.out_path)
        if args.single_file:
            _finalize_single_file(tmp, args.out_path)
    finally:
        if owned:
            spark.stop()


def custom_to_csv(args) -> None:
    if args.local:
        from .scbf import codec

        if args.cols:
            data = codec.read_columns(args.file_path, args.cols)
            names = list(data.keys())
            rows = zip(*[data[n] for n in names])
        else:
            names, rows = codec.read_all(args.file_path)
        with open(args.out_path, "w", newline="", encoding="utf-8") as f:
            w = _csv.writer(f)
            w.writerow(names)
            w.writerows(rows)
        return

    from .sources.scbf_datasource import register

    spark, owned = _get_spark()
    try:
        register(spark)
        reader = spark.read.format("scbf")
        if args.cols:
            reader = reader.option("columns", ",".join(args.cols))
        df = reader.load(args.file_path)
        tmp = args.out_path + ".spark-out"
        df.coalesce(1).write.option("header", True).mode("overwrite").csv(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.csv"))
        shutil.move(part, args.out_path)
        shutil.rmtree(tmp, ignore_errors=True)
    finally:
        if owned:
            spark.stop()


def inspect(args) -> None:
    """Engine extension: print schema/rows/compression of an SCBF file
    without touching data blocks (header + metadata only). ``--head N``
    additionally previews the first N rows (or, with ``--cols``, the
    first N values of each requested column) through the pure-Python
    codec path — the reference's reader demo surface
    (reference reader.py:164-198), no Spark session."""
    from .scbf.reader_api import SCBFReader

    r = SCBFReader(args.file_path)
    print(f"rows: {r.num_rows}")
    for name, tp in r.schema().items():
        print(f"  {name}: {tp}")
    if args.head:
        if args.cols:
            data = r.read_columns(args.cols)
            for k, v in data.items():
                print(f"--- Column: {k} ({len(v)} rows) ---")
                print(v[: args.head])
        else:
            names, rows = r.read_all()
            print("Columns:", names)
            print(f"First {args.head} rows:")
            for row in rows[: args.head]:
                print(row)


def compact_cmd(args) -> None:
    """Table maintenance from the command line (operators/compact.py)."""
    from .operators import compact as compact_op
    from .sources.scbf_datasource import register

    spark, owned = _get_spark()
    register(spark)
    try:
        stats = compact_op.compact(
            spark,
            args.path,
            target_files=args.target_files,
            rows_per_file=args.rows_per_file,
            sort_by=args.sort_by.split(",") if args.sort_by else None,
            zorder_by=args.zorder_by.split(",") if args.zorder_by else None,
            rows_per_group=args.rows_per_group,
        )
        print(stats)
    finally:
        if owned:
            spark.stop()


def vacuum_cmd(args) -> None:
    from .operators import vacuum

    if args.recover:
        print({"recovered": vacuum.recover(args.path)})
    print(vacuum.vacuum(args.path, older_than_seconds=args.older_than))


def snapshot_cmd(args) -> None:
    from .operators import snapshot

    if args.action == "create":
        m = snapshot.create_snapshot(args.path, tag=args.tag)
        print({"snapshot_id": m["snapshot_id"], "files": len(m["files"])})
    elif args.action == "list":
        for m in snapshot.list_snapshots(args.path):
            print(
                {"snapshot_id": m["snapshot_id"], "tag": m.get("tag"), "files": len(m["files"])}
            )
    elif args.action == "rollback":
        print(snapshot.rollback(args.path, args.snapshot))
    elif args.action == "expire":
        print({"expired": snapshot.expire_snapshots(args.path, keep_last=args.keep_last)})


def ivf_cmd(args) -> None:
    """IVF embedding-store maintenance from the command line — the ops
    surface of operators/similarity.py's store lifecycle (init-generational
    / compact / rebuild / vacuum-generations / heal / info). Engine
    extension; the reference has no similarity search (SURVEY.md §2.2)."""
    from .operators import similarity

    if args.action == "init-generational":
        print({"generation_dir": similarity.ivf_init_generational(args.path)})
        return
    if args.action == "vacuum-generations":
        print({"removed": similarity.ivf_vacuum_generations(args.path, keep=args.keep_last)})
        return
    if args.action == "heal":
        print({"action": similarity.ivf_rebuild_heal(args.path)})
        return
    if args.action == "info":
        gen = similarity.ivf_current_generation(args.path)
        cent = similarity.ivf_store_centroids(args.path)
        print({
            "layout": "generational" if gen else "flat",
            "current_generation": gen,
            "data_dir": similarity._resolve_store(args.path),
            "quantizer": list(cent.shape) if cent is not None else None,
        })
        return

    spark, owned = _get_spark()
    try:
        if args.action == "compact":
            print(similarity.ivf_compact_store(spark, args.path))
        elif args.action == "rebuild":
            cent, stats = similarity.ivf_rebuild_store(
                spark, args.path, nlist=args.nlist, sample_cap=args.sample_cap
            )
            print(stats)
    finally:
        if owned:
            spark.stop()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="scbf", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c2s = sub.add_parser("csv_to_custom", help="CSV → SCBF")
    c2s.add_argument("csv_path")
    c2s.add_argument("out_path")
    c2s.add_argument("--compression-level", type=int, default=6)
    c2s.add_argument("--single-file", action="store_true", default=True)
    c2s.add_argument("--dataset", dest="single_file", action="store_false",
                     help="write a directory of per-partition SCBF files instead of one file")
    c2s.add_argument("--local", action="store_true", help="pure-Python codec, no Spark")
    c2s.add_argument("--compat-inference", action="store_true",
                     help="reference-compatible first-non-empty-value type inference (--local only)")
    c2s.set_defaults(fn=csv_to_custom)

    s2c = sub.add_parser("custom_to_csv", help="SCBF → CSV, optionally projecting columns")
    s2c.add_argument("file_path")
    s2c.add_argument("out_path")
    s2c.add_argument("--cols", nargs="+", default=None)
    s2c.add_argument("--local", action="store_true", help="pure-Python codec, no Spark")
    s2c.set_defaults(fn=custom_to_csv)

    ins = sub.add_parser("inspect", help="print schema and row count (metadata-only read)")
    ins.add_argument("file_path")
    ins.add_argument("--head", type=int, default=0, metavar="N",
                     help="also preview the first N rows (codec path, no Spark)")
    ins.add_argument("--cols", nargs="+", default=None,
                     help="with --head: preview only these columns, reference demo style")
    ins.set_defaults(fn=inspect)

    cp = sub.add_parser("compact", help="rewrite small files; optional (z-)ordering")
    cp.add_argument("path")
    cp.add_argument("--target-files", type=int, default=None)
    cp.add_argument("--rows-per-file", type=int, default=None)
    cp.add_argument("--sort-by", default=None, help="comma-separated sort columns")
    cp.add_argument("--zorder-by", default=None, help="comma-separated Morton-cluster columns")
    cp.add_argument("--rows-per-group", type=int, default=None,
                    help="write v2 files with intra-file row groups of this many rows")
    cp.set_defaults(fn=compact_cmd)

    vc = sub.add_parser("vacuum", help="remove orphaned scratch; optionally heal crashed swaps")
    vc.add_argument("path")
    vc.add_argument("--older-than", type=float, default=3600.0)
    vc.add_argument("--recover", action="store_true",
                    help="first restore any only-copy backups from crashed swaps")
    vc.set_defaults(fn=vacuum_cmd)

    sn = sub.add_parser("snapshot", help="create/list/rollback/expire dataset snapshots")
    sn.add_argument("action", choices=["create", "list", "rollback", "expire"])
    sn.add_argument("path")
    sn.add_argument("--tag", default=None)
    sn.add_argument("--snapshot", default=None, help="id or tag (rollback)")
    sn.add_argument("--keep-last", type=int, default=1)
    sn.set_defaults(fn=snapshot_cmd)

    iv = sub.add_parser("ivf", help="IVF embedding-store maintenance "
                        "(init-generational/compact/rebuild/vacuum-generations/heal/info)")
    iv.add_argument("action", choices=["init-generational", "compact", "rebuild",
                                       "vacuum-generations", "heal", "info"])
    iv.add_argument("path")
    iv.add_argument("--nlist", type=int, default=16, help="rebuild: quantizer size")
    iv.add_argument("--sample-cap", type=int, default=50_000,
                    help="rebuild: bounded training-sample size")
    iv.add_argument("--keep-last", type=int, default=1,
                    help="vacuum-generations: superseded generations to retain")
    iv.set_defaults(fn=ivf_cmd)

    args = p.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
