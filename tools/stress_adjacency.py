"""Intersect-tier adjacency at SERVING-scale nlist (r10 VERDICT #7).

The symmetric-multiprobe matcher prunes the store scan to ``P ∪ {lists
probing into P}`` via the hidden ``(ivf_list, probe)`` adjacency table.
That table is bounded by nlist² in theory; the pruning is only useful if
real data keeps it SPARSE (only centroid neighborhoods cross-probe) at
production quantizer sizes — proven at nlist=64 in stress_scale.py, unproven
beyond. This stage builds the intersect-tier store over the 500k-vector
synthetic corpus at nlist ≥ 1024, then measures:

- adjacency cardinality vs the nlist² ceiling (sparsity) and its fan-in
  distribution (max/median lists probing into one list — the quantity that
  decides how many candidate partitions a batch probing P drags in);
- candidate-partition count for a 2k planted-twin ingest batch (pruned vs
  full store scan);
- the match stage's wall-clock, planted recall, and straggler ratio.

Usage:
    python tools/stress_adjacency.py [n_vecs] [nlist ...]   # default 500_000 1024
Emits one JSON line per stage (same contract as stress_scale.py); paste the
lines into SCALE.md.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stress_scale import (  # noqa: E402
    completed_stage_ids,
    straggler_ratio,
    synth_embeddings,
)

from custom_columnar_format_spark.plans.session import get_spark  # noqa: E402

from custom_columnar_format_spark.functions.vector import cosine as cos_col  # noqa: E402
from custom_columnar_format_spark.operators import similarity  # noqa: E402
from custom_columnar_format_spark.streaming.vectors import semantic_match_batch  # noqa: E402

NPROBE = 2
T_MATCH = 0.92
DIM = 64


def synth_clustered(spark, n: int, k_centers: int = 4096, eps: float = 0.15):
    """n vectors drawn around k_centers hash-derived centers with ±eps/2
    per-dim noise — the REALISTIC embedding regime (semantic embeddings
    cluster; stress_scale's uniform corpus is the adversarial no-structure
    case where multiprobe adjacency provably cannot prune)."""
    cid = F.pmod(F.xxhash64(F.col("id")), F.lit(k_centers))
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: (
            (F.pmod(F.xxhash64(cid * DIM + i.cast("long")), F.lit(2000)) / 1000.0 - 1.0)
            + (F.pmod(F.xxhash64(F.col("id") * DIM * 7 + i.cast("long")), F.lit(2000))
               / 1000.0 - 1.0) * eps
        ).cast("float"),
    )
    return spark.range(1, n + 1, 1, 64).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def main():
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    nlists = [int(a) for a in sys.argv[2:]] or [1024]
    spark = get_spark("stress-adjacency", extra_conf={"spark.ui.enabled": "true"})
    total0 = time.time()
    root = tempfile.mkdtemp(prefix="stress_adj_")

    for corpus, emb in (
        ("uniform", synth_embeddings(spark, n_vecs).localCheckpoint(eager=True)),
        ("clustered", synth_clustered(spark, n_vecs).localCheckpoint(eager=True)),
    ):
        run_corpus(spark, root, corpus, emb, n_vecs, nlists)

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"stage": "TOTAL", "seconds": round(time.time() - total0, 2)}), flush=True)
    spark.stop()


def run_corpus(spark, root, corpus, emb, n_vecs, nlists):

    # planted near-twins: every 250th stored vector re-emitted with ~0.96
    # cosine noise, same recipe as stress_scale's matcher stage
    twin_src = emb.filter(F.col("vec_id") % 250 == 0)
    batch_vecs = twin_src.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda v, i: v + (
                F.pmod(F.xxhash64(F.col("vec_id") * 97 + i.cast("long")), F.lit(1000))
                .cast("double") / 1000.0 - 0.5
            ) * 0.35,
        ).alias("embedding"),
    ).localCheckpoint(eager=True)
    planted_true = (
        twin_src.alias("s")
        .join(
            batch_vecs.withColumn("orig", F.col("vec_id") - 10_000_000).alias("b"),
            F.col("s.vec_id") == F.col("orig"),
        )
        .select(
            (F.floor(cos_col(F.col("s.embedding"), F.col("b.embedding")) * 1e4 + 0.5) / 1e4).alias("c")
        )
        .filter(F.col("c") >= T_MATCH)
    )
    n_true = planted_true.count()

    for nlist in nlists:
        t0 = time.time()
        cent = similarity.ivf_centroids(emb, nlist=nlist, sample_cap=50_000, seed=7)
        train_dt = time.time() - t0
        store = os.path.join(root, f"store_{corpus}_{nlist}")

        t0 = time.time()
        probed = emb.select(
            "vec_id", "embedding",
            similarity.ivf_probe_lists(cent, NPROBE).alias("ivf_probes"),
        ).withColumn("ivf_list", F.element_at("ivf_probes", 1))
        similarity._write_listed(probed, store, "parquet", "overwrite", cluster=True)
        build_dt = time.time() - t0

        adj = similarity.ivf_probe_adjacency(spark, store)
        pairs = adj.count() if adj is not None else 0
        if pairs:
            fanin = (
                adj.groupBy("probe").agg(F.count(F.lit(1)).alias("d"))
                .agg(
                    F.max("d").alias("mx"),
                    F.expr("percentile_approx(d, 0.5)").alias("md"),
                    F.avg("d").alias("avg"),
                )
                .first()
            )
        else:
            # degenerate quantizer (e.g. nlist=1): single-element probe
            # sets record no cross-probe pairs — zero fan-in, not a crash
            fanin = {"mx": 0, "md": 0, "avg": 0.0}
        print(json.dumps({
            "stage": f"adjacency_{corpus}_nlist{nlist}",
            "n_vecs": n_vecs, "nprobe": NPROBE,
            "quantizer_train_s": round(train_dt, 2),
            "store_build_s": round(build_dt, 2),
            "adj_pairs": pairs,
            "nlist_sq_ceiling": nlist * (nlist - 1),
            "sparsity": round(pairs / (nlist * (nlist - 1)), 6),
            "fanin_max": fanin["mx"], "fanin_median": int(fanin["md"]),
            "fanin_avg": round(float(fanin["avg"]), 2),
        }), flush=True)

        # the matcher's candidate-partition pruning, exactly the ingest
        # loop's arithmetic (streaming/vectors.py _fold_batch)
        bp = batch_vecs.withColumn(
            "ivf_probes", similarity.ivf_probe_lists(cent, NPROBE)
        ).withColumn("ivf_list", F.element_at("ivf_probes", 1)).localCheckpoint(eager=True)

        def cand_partitions(b):
            P = {r[0] for r in b.select(F.explode("ivf_probes").alias("p")).distinct().collect()}
            if adj is None:
                # no recorded adjacency (degenerate nlist): the matcher's
                # own fallback is a full store scan — candidates = all lists
                return set(range(nlist))
            return set(P) | {
                r[0]
                for r in adj.filter(F.col("probe").isin(list(P)))
                .select("ivf_list").distinct().collect()
            }

        # pruning effectiveness is a batch-size/nlist story: candidate
        # partitions ≈ min(nlist, |P|·(1 + fan-in)), so a nightly 2k batch
        # probes essentially the whole directory (amortized — fine), while
        # the trickle regime (single vectors per micro-batch) is where the
        # adjacency pays. Measure the curve.
        for sel, tag in (
            (F.col("vec_id") == F.lit(10_000_250), "1row"),
            (F.col("vec_id") % 64 == 0, "micro"),
        ):
            sub = bp.filter(sel)
            cand_sub = cand_partitions(sub)
            print(json.dumps({
                "stage": f"prune_{tag}_{corpus}_nlist{nlist}",
                "batch_rows": sub.count(),
                "cand_partitions": len(cand_sub), "of_nlist": nlist,
                "pruned_frac": round(1 - len(cand_sub) / nlist, 4),
            }), flush=True)
        cand = cand_partitions(bp)
        store_df = spark.read.parquet(store).filter(F.col("ivf_list").isin(sorted(cand)))

        before = completed_stage_ids(spark)
        t0 = time.time()
        m = semantic_match_batch(bp, store_df, cent, T_MATCH, blocking="intersect", nprobe=NPROBE)
        hits = m.filter(F.col("id_b") - F.col("id_a") == 10_000_000).count()
        match_dt = time.time() - t0
        ratio, sid = straggler_ratio(spark, before)
        heavy_ratio = _heavy_branch_ratio(spark, sid) if sid is not None else None
        print(json.dumps({
            "stage": f"match_pruned_{corpus}_nlist{nlist}",
            "rows": hits, "seconds": round(match_dt, 2),
            "planted_recall": round(hits / n_true, 4) if n_true else None,
            "n_true_pairs": n_true,
            "cand_partitions": len(cand), "of_nlist": nlist,
            "pruned_frac": round(1 - len(cand) / nlist, 4),
            "straggler_ratio": ratio, "straggler_stage": sid,
            "straggler_ratio_heavy": heavy_ratio,
            "bounded": (heavy_ratio if heavy_ratio is not None else ratio) is None
            or (heavy_ratio if heavy_ratio is not None else ratio) <= 8.0,
        }), flush=True)
        shutil.rmtree(store, ignore_errors=True)


def _heavy_branch_ratio(spark, stage_id):
    """max/median executorRunTime among the stage's HEAVY tasks only (≥1%
    of the stage's input records). Union collapses the 2k-row within-batch
    branch and the 500k-row store branch into ONE stage, so the raw
    max/median compares a heavy store task against a near-empty batch task
    and reads 15-40× on a perfectly even scan (r11 root-cause: NOT skew).
    This variant answers the question the lint actually asks — is work
    uneven among the tasks that HAVE work?"""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    if base is None:
        return None
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages/{stage_id}/0/taskList?length=2000",
            timeout=10,
        ) as r:
            tasks = json.load(r)
    except Exception:
        return None
    recs = [
        (t.get("taskMetrics", {}).get("executorRunTime", 0),
         t.get("taskMetrics", {}).get("inputMetrics", {}).get("recordsRead", 0))
        for t in tasks
    ]
    total = sum(n for _, n in recs)
    heavy = sorted(rt for rt, n in recs if total and n >= total * 0.01)
    if len(heavy) < 4:
        return None
    med = heavy[len(heavy) // 2]
    return round(heavy[-1] / max(med, 1.0), 2)


if __name__ == "__main__":
    main()
