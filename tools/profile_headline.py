"""Round-11 optimization profiler: per-query repeated noop-sink timings plus
``explain("formatted")`` capture for the bench HEADLINE set (and any extra
names given), against a bench-identical session.

    python tools/profile_headline.py [--plans-dir plans/r11 --suffix before]
                                     [--reps 3] [--sf-dir DIR] [query ...]

Emits one JSON line per query: {"name": ..., "reps": [...], "best": ...},
and (when --plans-dir is set) writes <plans-dir>/<name>_<suffix>.txt with the
formatted physical plan. Methodology matches bench.py: same session confs,
same noop-sink forcing, clearCache between queries, JVM/codegen pre-warm.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import bench
    from custom_columnar_format_spark.queries.registry import all_queries

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .appName("scbf-profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().count()

    # same MinHash codegen pre-warm as bench.main()
    from custom_columnar_format_spark.operators.dedup import minhash_neardup_pairs as _mh
    from custom_columnar_format_spark.queries.tables import load as _load

    _tiny = _load(spark, args.sf_dir, "documents").limit(64).cache()
    _tiny.count()
    bench._force(_mh(_tiny, "text", "doc_id", persist=False))
    _tiny.unpersist()
    spark.catalog.clearCache()

    qs = all_queries()
    names = args.names or bench.HEADLINE
    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
    results = {}
    for name in names:
        if name not in qs:
            print(json.dumps({"name": name, "error": "unknown"}))
            continue
        reps = []
        for _ in range(args.reps):
            t0 = time.time()
            bench._force(qs[name].fn(spark, args.sf_dir))
            reps.append(round(time.time() - t0, 4))
            spark.catalog.clearCache()
        results[name] = reps
        if args.plans_dir:
            import contextlib
            import io

            df = qs[name].fn(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            spark.catalog.clearCache()
        print(json.dumps({"name": name, "reps": reps, "best": min(reps)}), flush=True)
    print(json.dumps({"total_best": round(sum(min(r) for r in results.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
