"""Per-JOB wall-clock breakdown for one registered query: runs the query with
the Spark event log enabled (warm session, bench-identical confs, noop sink),
then parses the event log into (job id, seconds, description/first stage name)
lines plus the total gap time not covered by any job (driver-side think time:
planning, py4j construction, eager collects queued behind each other).

    python tools/job_breakdown.py q_dedup_minhash [--reps 2] [--sf-dir DIR]

The LAST rep's jobs are reported (warm steady state).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    import bench
    from custom_columnar_format_spark.queries.registry import all_queries

    evdir = tempfile.mkdtemp(prefix="spark-events-")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .appName("scbf-jobs")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().count()
    from custom_columnar_format_spark.operators.dedup import minhash_neardup_pairs as _mh
    from custom_columnar_format_spark.queries.tables import load as _load

    _tiny = _load(spark, args.sf_dir, "documents").limit(64).cache()
    _tiny.count()
    bench._force(_mh(_tiny, "text", "doc_id", persist=False))
    _tiny.unpersist()
    spark.catalog.clearCache()

    qs = all_queries()
    fn = qs[args.name].fn
    marks = []
    for _ in range(args.reps):
        t0 = time.time()
        bench._force(fn(spark, args.sf_dir))
        t1 = time.time()
        marks.append((t0, t1))
        spark.catalog.clearCache()
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Spark 4 writes a rolling dir: eventlog_v2_<app>/events_*_<app>.zstd
    import glob
    import io

    candidates = glob.glob(os.path.join(evdir, app_id)) + sorted(
        glob.glob(os.path.join(evdir, f"eventlog_v2_{app_id}", "events_*"))
    )

    def _open(p):
        if p.endswith(".zstd"):
            import zstandard

            return io.TextIOWrapper(
                zstandard.ZstdDecompressor().stream_reader(open(p, "rb"))
            )
        return open(p)

    jobs: dict[int, dict] = {}
    for logf in candidates:
        f = _open(logf)
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"] / 1000.0,
                    "desc": props.get("spark.job.description")
                    or (ev.get("Stage Infos") or [{}])[0].get("Stage Name", ""),
                    "callsite": props.get("callSite.short", ""),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"] / 1000.0

    t0, t1 = marks[-1]
    span = [j for j in jobs.values() if "t1" in j and j["t0"] >= t0 and j["t1"] <= t1 + 1]
    span.sort(key=lambda j: j["t0"])
    covered = 0.0
    cursor = t0
    for j in span:
        covered += max(0.0, min(j["t1"], t1) - max(j["t0"], cursor))
        cursor = max(cursor, j["t1"])
        print(
            f"{j['t0'] - t0:7.3f}s +{j['t1'] - j['t0']:6.3f}s  {j['desc'][:110]}"
        )
    print(f"\nrep total {t1 - t0:.3f}s; {len(span)} jobs; job-covered {covered:.3f}s; "
          f"driver gaps {t1 - t0 - covered:.3f}s")


if __name__ == "__main__":
    main()
