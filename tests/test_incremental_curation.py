"""End-to-end incremental curation loop over the engine's OWN storage: the
dedup artifacts (content digests, chunk digests, MinHash signatures) persist
as SCBF tables between batches, each new batch is scrubbed against them,
and the artifact tables grow by append — the steady-state shape of a
continuously-crawled 100 TB pipeline, where history bodies are never
re-read and only bounded artifacts survive between runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import dedup

_PASSAGE = (
    "the migratory cranes assembled at dawn along the shallow estuary while "
    "research volunteers recorded wing tags and departure headings for the "
    "long flight south across two mountain ranges and an inland sea"
)


@pytest.fixture(autouse=True)
def _register_scbf(spark):
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_incremental_loop_artifacts_roundtrip_scbf(spark, tmp_path):
    sig_store = str(tmp_path / "sig_store")
    chunk_store = str(tmp_path / "chunk_store")

    # ---- batch 1: bootstrap the stores -----------------------------------
    b1 = _batch(
        spark,
        [(1, _PASSAGE + " unique tail one about riverbanks and reeds"),
         (2, "completely different text about database engines and columnar files")],
    )
    # SCBF v2 is scalar-typed (int/float/bool/utf8): the 64-long signature
    # stores as CSV text and parses back losslessly — the artifact encoding
    def _write_sigs(df, mode):
        df.select(
            "id", F.concat_ws(",", F.col("sig").cast("array<string>")).alias("sig_csv")
        ).write.format("scbf").option("version", "2").mode(mode).save(sig_store)

    def _read_sigs():
        return (
            spark.read.format("scbf")
            .load(sig_store)
            .select("id", F.split("sig_csv", ",").cast("array<bigint>").alias("sig"))
        )

    _write_sigs(dedup.minhash_signatures(b1, "text", "doc_id"), "overwrite")
    dedup.cdc_chunks(b1, "text", "doc_id").filter(F.col("chunk_len") >= 20).select(
        "chunk_hash"
    ).write.format("scbf").option("version", "2").mode("overwrite").save(chunk_store)

    # ---- batch 2: scrub against the stored artifacts ---------------------
    b2 = _batch(
        spark,
        [
            (10, "prefix words " + _PASSAGE + " different continuation here"),  # near-dup + shared span
            (11, "a fresh document with entirely novel content about glaciers"),
        ],
    )
    hist_sigs = _read_sigs()
    matches = {
        (r.id_new, r.id_hist): r.est_jaccard
        for r in dedup.minhash_history_matches(
            b2, hist_sigs, "text", "doc_id", est_threshold=0.3
        ).collect()
    }
    assert (10, 1) in matches and not any(i == 11 for i, _ in matches)

    hist_chunks = spark.read.format("scbf").load(chunk_store)
    cleaned = {
        r.id: r
        for r in dedup.exactsubstr_clean_incremental(
            b2, hist_chunks, "text", "doc_id"
        ).collect()
    }
    # doc 10 loses the shared passage's QUALIFYING (>=20-char) chunks —
    # history wins; short interior chunks stay by the operator contract
    # (expected cut fraction ~0.5 of the passage at the 16-char mean chunk)
    assert cleaned[10].chars_removed > len(_PASSAGE) // 4
    assert cleaned[11].chars_removed == 0
    assert "prefix words" in cleaned[10].clean_text  # novel prefix survives

    # ---- append batch-2 artifacts; batch 3 sees BOTH prior batches -------
    _write_sigs(dedup.minhash_signatures(b2, "text", "doc_id"), "append")
    b3 = _batch(
        spark,
        [(20, "a fresh document with entirely novel content about glaciers")],  # = doc 11
    )
    all_sigs = _read_sigs()
    assert all_sigs.count() == 4  # 2 + 2 docs' signatures accumulated
    m3 = {
        (r.id_new, r.id_hist): r.est_jaccard
        for r in dedup.minhash_history_matches(
            b3, all_sigs, "text", "doc_id", est_threshold=0.5
        ).collect()
    }
    # exact copy of a BATCH-2 doc: only visible because the store accumulated
    assert m3[(20, 11)] == pytest.approx(1.0)


def test_streaming_neardup_against_accumulating_sig_store(spark, tmp_path):
    """Streaming curation: each micro-batch near-dups against the signature
    store accumulated from ALL prior batches, then appends its own
    signatures — foreachBatch + the stored-artifact operators, the streaming
    form of the incremental crawl loop. Batch 2 contains a near-copy of a
    batch-1 doc; it must be flagged even though the two never co-exist in
    any micro-batch."""
    import time

    sig_store = str(tmp_path / "stream_sigs")

    b1 = [(1, _PASSAGE + " tail words for batch one"),
          (2, "other material about storage formats and arrow buffers")]
    b2 = [(10, _PASSAGE + " tail words for batch TWO edition"),  # near-dup of 1
          (11, "novel second-batch text about telescopes and mirrors")]
    src = tmp_path / "stream_src"
    src.mkdir()
    _batch(spark, b1).coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    time.sleep(1.1)
    _batch(spark, b2).coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))

    flags: list = []

    def scrub(bdf, bid):
        import os

        if not bdf.count():
            return
        ss = bdf.sparkSession
        sigs = dedup.minhash_signatures(bdf, "text", "doc_id")
        if os.path.exists(sig_store) and any(
            f.endswith(".scbf") for f in os.listdir(sig_store)
        ):
            hist = (
                ss.read.format("scbf")
                .load(sig_store)
                .select("id", F.split("sig_csv", ",").cast("array<bigint>").alias("sig"))
            )
            for r in dedup.minhash_history_matches(
                bdf, hist, "text", "doc_id", est_threshold=0.3
            ).collect():
                flags.append((r.id_new, r.id_hist))
        sigs.select(
            "id", F.concat_ws(",", F.col("sig").cast("array<string>")).alias("sig_csv")
        ).write.format("scbf").option("version", "2").mode("append").save(sig_store)

    schema = "doc_id LONG, text STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(scrub)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert (10, 1) in flags                       # cross-batch near-dup caught
    assert not any(i in (2, 11) for i, _ in flags)  # unrelated docs clean
    # the store accumulated both batches' signatures
    n = spark.read.format("scbf").load(sig_store).count()
    assert n == 4


def test_stream_curation_loop_equals_one_batch(spark, tmp_path):
    """The registered q_stream_curation loop (r9): drained multi-batch
    matches == the one-batch all-pairs signature computation, with the
    cross-batch path genuinely exercised (pairs must span batches)."""
    from custom_columnar_format_spark.streaming import curation

    rows = [
        (1, _PASSAGE + " tail one with riverbank reeds"),
        (2, "unrelated text about columnar storage and codecs"),
        (3, "another unrelated piece concerning alpine weather patterns"),
        (4, _PASSAGE + " tail two with riverbank reeds"),   # near-dups doc 1 (cross-batch: 1 is odd... see split)
        (5, _PASSAGE + " tail one with riverbank reeds"),   # exact text of doc 1 -> within/cross
        (6, "a sixth document on tidal charts and harbor logistics"),
    ]
    docs = _batch(spark, rows)
    src = str(tmp_path / "src")
    for i in range(2):  # batch 0: even ids, batch 1: odd ids
        docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    sig_store = str(tmp_path / "sigs")
    matches_store = str(tmp_path / "matches")
    clusters_store = str(tmp_path / "clusters")
    ck = str(tmp_path / "ck")
    q = curation.start_curation_loop(
        stream, sig_store, matches_store, ck, est_threshold=0.5,
        clusters_store=clusters_store,
    )
    q.awaitTermination()

    got = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in spark.read.format("scbf").load(matches_store).collect()
    }
    # one-batch ground truth: run the within-batch path over ALL docs at once
    sigs = dedup.minhash_signatures(docs, "text", "doc_id")
    want = {
        (min(r.id_new, r.id_hist), max(r.id_new, r.id_hist)): r.est_jaccard
        for r in dedup.minhash_history_matches(
            docs, sigs, "text", "doc_id", est_threshold=0.5
        )
        .filter(F.col("id_new") != F.col("id_hist"))
        .collect()
    }
    assert got == want
    # the planted trio {1, 4, 5} must be found, and at least one pair spans
    # the even/odd batch split (cross-batch path exercised)
    assert (1, 5) in got and got[(1, 5)] == 1.0
    assert any((a % 2) != (b % 2) for a, b in got)
    # signature store holds every doc exactly once after the merge
    hist = curation.read_sig_store(spark, sig_store)
    assert hist.count() == len(rows)
    assert hist.select("id").distinct().count() == len(rows)
    # the stream-maintained cluster table == a from-scratch closure over
    # ALL matches (delta-only upserts must converge to the full rebuild)
    from custom_columnar_format_spark.operators import clustering

    state = {
        r.node: r.label
        for r in spark.read.format("scbf").load(clusters_store).collect()
    }
    edges_df = spark.createDataFrame(
        [(a, b) for a, b in want], "id_a: long, id_b: long"
    )
    rebuild = {
        r.node: r.component
        for r in clustering.connected_components(edges_df).collect()
    }
    assert state == rebuild
    spark.catalog.clearCache()


def test_sig_store_maintenance_bounds_files_recall_unchanged(spark, tmp_path):
    """r8 verdict task #4: across N batches with per-batch maintenance the
    store's file count stays bounded, matches are identical to the
    unmaintained store, and a deleted doc's signature stops matching."""
    from custom_columnar_format_spark.streaming import curation

    n_batches, max_files = 5, 4
    maintained = str(tmp_path / "maintained")
    raw = str(tmp_path / "raw")

    def batch_rows(b):
        rows = [(b * 10 + k, f"batch {b} doc {k} " + " ".join(
            f"w{b}x{k}y{j}" for j in range(25)
        )) for k in range(4)]
        if b == 3:  # re-plant batch 0's doc 1 text -> must match history
            rows.append((b * 10 + 9, _PASSAGE))
        if b == 0:
            rows.append((9, _PASSAGE))
        return rows

    import glob as _glob

    for b in range(n_batches):
        bdf = _batch(spark, batch_rows(b))
        sigs = dedup.minhash_signatures(bdf, "text", "doc_id")
        for store in (maintained, raw):
            if _glob.glob(f"{store}/*.scbf"):
                curation.write_sig_store(sigs, store, mode="append")
            else:
                curation.write_sig_store(sigs, store)
        stats = curation.maintain_sig_store(spark, maintained, max_files=max_files)
        assert stats["files_after"] <= max_files
    n_raw = len(_glob.glob(f"{raw}/*.scbf"))
    n_maint = len(_glob.glob(f"{maintained}/*.scbf"))
    assert n_raw >= n_batches  # the unmaintained store really does sprawl
    assert n_maint <= max_files

    # recall unchanged: a probe batch matches both stores identically
    probe = _batch(spark, [(999, _PASSAGE), (998, "novel text about nothing shared")])
    def matches(store):
        return {
            (r.id_new, r.id_hist)
            for r in dedup.minhash_history_matches(
                probe, curation.read_sig_store(spark, store), "text", "doc_id",
                est_threshold=0.5,
            ).collect()
        }
    m_maint, m_raw = matches(maintained), matches(raw)
    assert m_maint == m_raw
    assert (999, 9) in m_maint and (999, 39) in m_maint

    # deletion: purge doc 9's signature; it must stop matching, others stay
    deleted = spark.createDataFrame([(9,)], "id: long")
    stats = curation.maintain_sig_store(
        spark, maintained, max_files=max_files, deleted_ids=deleted
    )
    assert stats["deleted_rows"] == 1
    m_after = matches(maintained)
    assert (999, 9) not in m_after
    assert m_after == m_maint - {(999, 9)}
    spark.catalog.clearCache()
