"""Benchmark decontamination: find corpus documents that share word n-grams
with a held-out evaluation/benchmark set — the standard pre-training hygiene
step (GPT-3 §C / PaLM-style n-gram collision checks).

Scale shape (the point — a 100 TB corpus vs a few-MB benchmark set):

- The benchmark side is tiny by construction (eval sets are thousands of
  documents). Its distinct gram-hash set is aggregated and **broadcast** —
  the corpus-side probe is a broadcast LEFT SEMI join, so the 100 TB side
  never shuffles; each corpus partition streams its grams past an in-memory
  hash set.
- Grams are xxhash64'd (reusing ``dedup.shingle_table``), so the broadcast
  set and every probe row are fixed-width i64s, not strings.
- Output is one row per *contaminated* doc (doc_id, n_grams,
  n_contaminated, contamination_ratio) — the removal list a pipeline feeds
  back into its filter stage — not a row per doc.

The reference has nothing like this (SURVEY.md §2.2: no filters/joins at
all); it's part of the north-star LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingle_table


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_k: int = 5,
) -> DataFrame:
    """(doc_id, n_grams, n_contaminated, contamination_ratio) for every
    corpus doc sharing at least one word ``gram_k``-gram with the benchmark.

    ``corpus`` and ``benchmark`` must be disjoint slices (filter upstream);
    a doc present in both would trivially self-collide."""
    # persisted: consumed by BOTH the sizes projection and the exploded-hits
    # branch, and Generate over the HOF-built shingle array re-evaluates the
    # shingling lambda per emitted element unless it reads from cache (the
    # gram_postings pathology in operators/dedup.py, measured 160×)
    corpus_grams = shingle_table(corpus, text_col, id_col, k=gram_k).persist()
    bench_grams = (
        shingle_table(benchmark, text_col, id_col, k=gram_k)
        .select(F.explode("shingles").alias("gram"))
        .distinct()
    )
    sizes = corpus_grams.select("id", F.size("shingles").alias("n_grams"))
    hits = (
        corpus_grams.select("id", F.explode("shingles").alias("gram"))
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))  # grams are distinct per doc
    )
    return (
        hits.join(sizes, "id")
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_grams"), 4).alias("contamination_ratio"),
        )
    )


def fuzzy_contamination_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    prefix_words: int = 8,
    tau: int = 10,
    probe_mod: int = 50,
    probes: DataFrame | None = None,
) -> DataFrame:
    """FUZZY decontamination: (doc, probe) pairs whose normalized
    ``prefix_words``-word prefixes are within Levenshtein ``tau`` — the
    near-verbatim eval-set leakage (reformatted whitespace, one swapped
    word, truncated tail) that exact n-gram overlap misses.

    ``probes`` defaults to a deterministic md5-bucket sample of the corpus
    itself (doc_id hash % ``probe_mod`` == 0), standing in for a benchmark
    prompt set; pass a real benchmark DataFrame (id_col, lang_col,
    text_col) in production.

    Scale shape: the probe side is bounded (a benchmark is thousands of
    rows, never corpus-scale) and BROADCASTS; the corpus joins it on the
    ``lang_col`` equi-key with the edit distance as a residual join filter
    — a BroadcastHashJoin, not a cartesian/BNLJ (the fleet-wide plan lint
    enforces this), so every doc row scores only its own language's probes
    map-side. Cost is linear in corpus size × probes-per-language, with
    only 8-word prefixes (bounded strings) entering the O(m·n) Levenshtein
    — never full documents. No corpus shuffle at all."""
    from .dedup import normalize_text

    norm = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.array_join(
            F.slice(F.split(normalize_text(F.col(text_col)), " "), 1, prefix_words), " "
        ).alias("pfx"),
    )
    if probes is None:
        bucket = F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10
        ).cast("bigint")
        probes = norm.filter(bucket % probe_mod == 0).select(
            F.col("doc_id").alias("probe_id"),
            F.col("lang").alias("p_lang"),
            F.col("pfx").alias("probe_pfx"),
        )
    dist = F.levenshtein(F.col("pfx"), F.col("probe_pfx"))
    return (
        norm.join(
            F.broadcast(probes),
            (F.col("lang") == F.col("p_lang")) & (F.col("doc_id") != F.col("probe_id")),
        )
        .filter(dist <= tau)
        .select("doc_id", "probe_id", dist.cast("bigint").alias("edit_dist"))
    )
