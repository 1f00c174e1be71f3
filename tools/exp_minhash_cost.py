"""One-off measurement for VERDICT r4 #2: where does the km-md5 MinHash
scheme spend its extra ~1.2 s vs xxhash64, and do the candidate cuts pay?

Variants timed (full signature pass only, sf dir from argv):
  A  km-md5 current      — md5 per doc-gram, two conv(12-hex) parses
  B  km-md5 distinct-join — md5 once per corpus-distinct gram, join back
  C  km-md5 one-conv     — ONE conv(12-hex) parse; h2 derived from h1 by an
                           odd multiplicative scramble (mod 2^48)
  D  xxhash64            — the all-JVM fast path

Run: python tools/exp_minhash_cost.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import dedup
from custom_columnar_format_spark.plans.session import get_spark
from custom_columnar_format_spark.queries.tables import load

MASK48 = dedup.MASK48


def _force(df):
    df.write.mode("overwrite").format("noop").save()


def sig_km_current(base):
    hashed = dedup.km_hash_table(base.select("id", F.col("grams")))
    return hashed.select("id", dedup.minhash_signature_km(F.col("h1"), F.col("h2")).alias("sig"))


def sig_km_distinct_join(base):
    g = base.select("id", F.explode("grams").alias("g"))
    dg = g.select("g").distinct()
    hx = dg.select(
        "g",
        F.conv(F.substring(F.md5("g"), 1, 12), 16, 10).cast("bigint").alias("h1"),
        F.conv(F.substring(F.md5("g"), 13, 12), 16, 10)
        .cast("bigint")
        .bitwiseOR(F.lit(1))
        .alias("h2"),
    )
    joined = g.join(hx, "g")
    aggs = [
        F.min((F.col("h1") + F.lit(j) * F.col("h2")).bitwiseAND(F.lit(MASK48))).alias(f"s{j}")
        for j in range(dedup.DEFAULT_NUM_HASHES)
    ]
    return joined.groupBy("id").agg(*aggs)


def sig_km_one_conv(base):
    m = base.select("id", F.transform("grams", F.md5).alias("m"))
    hashed = m.select(
        "id",
        F.transform("m", lambda x: F.conv(F.substring(x, 1, 12), 16, 10).cast("bigint")).alias(
            "h1"
        ),
    ).select(
        "id",
        "h1",
        F.transform(
            "h1",
            # scramble only the low 24 bits (24+32 < 63: no int64 overflow)
            lambda a: (a.bitwiseAND(F.lit((1 << 24) - 1)) * F.lit(2654435761))
            .bitwiseAND(F.lit(MASK48))
            .bitwiseOR(F.lit(1)),
        ).alias("h2"),
    )
    return hashed.select("id", dedup.minhash_signature_km(F.col("h1"), F.col("h2")).alias("sig"))


def sig_km_short_h2(base):
    m = base.select("id", F.transform("grams", F.md5).alias("m"))
    hashed = m.select(
        "id",
        F.transform("m", lambda x: F.conv(F.substring(x, 1, 12), 16, 10).cast("bigint")).alias(
            "h1"
        ),
        F.transform(
            "m",
            # h2 from md5 bits 49-72 (independent of h1's bits 1-48): a 6-hex
            # parse costs ~half a 12-hex parse; spread the 24 bits across the
            # 48-bit range with an odd multiplier (24+32 < 63: no overflow)
            lambda x: (
                F.conv(F.substring(x, 13, 6), 16, 10).cast("bigint") * F.lit(2654435761)
            )
            .bitwiseAND(F.lit(MASK48))
            .bitwiseOR(F.lit(1)),
        ).alias("h2"),
    )
    return hashed.select("id", dedup.minhash_signature_km(F.col("h1"), F.col("h2")).alias("sig"))


def sig_xxh(base64):
    return base64.select("id", dedup.minhash_signature(F.col("shingles")).alias("sig"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("exp-minhash")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    gbase = dedup.gram_table(docs, "text", "doc_id").withColumnRenamed("grams", "shingles")
    gbase = gbase.select("id", F.col("shingles").alias("grams")).persist()
    gbase.count()
    sbase = dedup.shingle_table(docs, "text", "doc_id").persist()
    sbase.count()

    variants = {
        "A_km_current": lambda: sig_km_current(gbase),
        "B_km_distinct_join": lambda: sig_km_distinct_join(gbase),
        "C_km_one_conv": lambda: sig_km_one_conv(gbase),
        "E_km_short_h2": lambda: sig_km_short_h2(gbase),
        "D_xxhash64": lambda: sig_xxh(sbase),
    }
    for name, fn in variants.items():
        _force(fn())  # warm codegen
        ts = []
        for _ in range(reps):
            t0 = time.time()
            _force(fn())
            ts.append(time.time() - t0)
        print(f"{name}: min={min(ts):.3f}s  all={[round(t, 3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
