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
