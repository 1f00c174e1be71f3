"""Measure the within_cap SemDeDup trade at a heavy-occupancy regime.

Simulates the past-the-nlist-cap world (occupancy >> 256) by pinning a
SMALL nlist on a 100k-vector corpus (occupancy ~1.5k/cluster — the shape a
1B-vector corpus has at the 65536 cap), then measures, for several caps:

- the WITHIN-CLUSTER PAIR CARDINALITY the join must score (deterministic,
  load-immune — the cost driver; uncapped is computed analytically from
  occupancy because actually running sum(occ^2)/2 ~ 70M pairs is the point
  of the cap);
- planted-twin recall: 2k twin pairs at cosine ~0.97, the duplicate the
  operator exists to catch, with the keeper's cluster rank uniform (so the
  miss the docs describe — both members past the cap — is measurable);
- exact-equivalence check at cap >= max occupancy (sanity, on a slice).

Usage: python tools/exp_semdedup_cap.py [n_vecs] [nlist]
Prints one JSON line per stage (SCALE.md records them).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, LongType, StructField, StructType,
)

from custom_columnar_format_spark.operators import similarity as S

DIM = 64
# noise 1.6 puts ordinary same-cluster cosines ~0.78, far under TAU, so the
# only pairs above threshold are the planted twins (~0.999) — recall then
# isolates the CAP's miss, not ambient cluster density
TAU = 0.98
N_TWINS = 2000


def main(n_vecs: int = 100_000, nlist: int = 64) -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "24g")
        .appName("exp_semdedup_cap")
        .getOrCreate()
    )
    rng = np.random.RandomState(1102)
    centers = rng.standard_normal((nlist, DIM)) * 3.0
    base = centers[rng.randint(0, nlist, n_vecs)] + 1.6 * rng.standard_normal(
        (n_vecs, DIM)
    )
    # plant twins: vector n_vecs+j is a near-copy of a uniformly-ranked base row
    keepers = rng.choice(n_vecs, N_TWINS, replace=False)
    twins = base[keepers] + 0.02 * rng.standard_normal((N_TWINS, DIM))
    allv = np.vstack([base, twins]).astype(np.float32)
    ids = np.arange(len(allv), dtype=np.int64)

    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), False),
        ]
    )
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in allv[i]]) for i in ids], schema
    ).repartition(64).persist()
    df.count()

    cent = centers / np.linalg.norm(centers, axis=1, keepdims=True).clip(min=1e-12)
    assigned = df.withColumn("sem_cluster", S.ivf_assign(cent, "embedding")).persist()
    occ = {
        r["sem_cluster"]: r["n"]
        for r in assigned.groupBy("sem_cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    occs = np.array(list(occ.values()))
    uncapped_pairs = int((occs.astype(np.int64) * (occs - 1) // 2).sum())
    print(json.dumps({
        "stage": "occupancy", "n_vecs": int(len(allv)), "nlist": nlist,
        "occ_max": int(occs.max()), "occ_median": float(np.median(occs)),
        "uncapped_pair_cardinality": uncapped_pairs,
    }), flush=True)

    # which twins are catchable at all (same-cluster as their keeper) — the
    # cross-cluster miss is SemDeDup's own approximation, not the cap's
    amap = {
        r["vec_id"]: r["sem_cluster"]
        for r in assigned.select("vec_id", "sem_cluster").collect()
    }
    same = [
        (int(k), int(n_vecs + j))
        for j, k in enumerate(keepers)
        if amap[int(k)] == amap[int(n_vecs + j)]
    ]

    for cap in (16, 64, 256):
        t0 = time.time()
        pairs = S.semdedup_pairs(
            df, cent, threshold=TAU, assigned=assigned, within_cap=cap
        ).persist()
        n_pairs_scored = sum(
            int(min(cap, c) * c - min(cap, c) * (min(cap, c) + 1) // 2)
            for c in occs
        )
        doomed = {r["id_b"] for r in pairs.select("id_b").distinct().collect()}
        # a twin pair is caught when either member was marked doomed by the
        # other (keeper has the lower id, so "twin in doomed" is the catch)
        caught = sum(1 for k, t in same if t in doomed or k in doomed)
        dt = time.time() - t0
        pairs.unpersist()
        print(json.dumps({
            "stage": f"cap_{cap}",
            "scored_pair_ceiling": n_pairs_scored,
            "vs_uncapped": round(n_pairs_scored / uncapped_pairs, 4),
            "planted_same_cluster": len(same),
            "caught": caught,
            "recall": round(caught / max(1, len(same)), 4),
            "seconds": round(dt, 2),
        }), flush=True)

    spark.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    nl = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    main(n, nl)
