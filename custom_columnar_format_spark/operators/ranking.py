"""BM25 full-text ranking: score documents against a small query-term set
and return the top-k — the retrieval primitive under search, RAG corpus
curation, and nearest-neighbor text filtering.

Scale design:
- Term frequencies are PER-ROW array expressions (``filter`` over the
  pre-split token array) — no explode, no shuffle: with m query terms each
  doc row computes m integer tf columns in one codegen'd pass.
- Corpus statistics (N, avgdl, per-term document frequencies) reduce to ONE
  row via a partial-aggregating global agg, then broadcast back — the
  scalar-subquery shape; the 100 TB side is scanned exactly once for stats
  and once for scoring (a production engine caches the stats row between
  queries).
- The final top-k is ``TakeOrderedAndProject`` (sort-free), with a
  deterministic doc_id tiebreak.
- All doc-side quantities are exact integers (tf, doclen); the floating
  score is a FIXED-ORDER sum of per-term contributions, so any engine
  replaying the same arithmetic produces bit-identical doubles — which is
  what lets the DuckDB oracle value-check the ranking, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _eq_term(t: str):
    return lambda x: x == F.lit(t)


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """Top-``topk`` documents by BM25 score for ``terms``. Returns
    (doc_id, score) with score rounded to 6 decimals, ordered by
    (score desc, doc_id) — ties broken deterministically."""
    from .dedup import normalize_text

    toks = docs.select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("w"),
    ).select(
        id_col,
        F.size("w").alias("dl"),
        *[
            # one-arg closure: a two-arg lambda would make F.filter pass the
            # element INDEX as the second argument
            F.size(F.filter("w", _eq_term(t))).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("int")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = toks.join(F.broadcast(stats))  # 1-row build side
    # Fixed-order sum: contribution of terms[0], then [1], ... — the same
    # association order the oracle SQL writes out, so the double is
    # bit-identical across engines.
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5)) / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf_{i}")
        denom = tf + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        score = score + idf * (tf * F.lit(k1 + 1)) / denom
    return (
        scored.select(id_col, F.round(score, 6).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), id_col)
        .limit(topk)
    )
