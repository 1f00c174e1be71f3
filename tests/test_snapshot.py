"""Snapshots: time-travel reads pin the file set, rollback restores it,
rewrites invalidate loudly, manifests are invisible to normal reads."""

import os

import pytest
from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import snapshot


@pytest.fixture(autouse=True)
def _register_scbf(spark):
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)


def _write(spark, sf_small, path, key_max):
    (
        spark.read.parquet(f"{sf_small}/orders.parquet")
        .filter(F.col("o_orderkey") <= key_max)
        .select("o_orderkey", "o_totalprice")
        .coalesce(2)
        .write.format("scbf")
        .option("version", "2")
        .mode("append")
        .save(path)
    )


def test_snapshot_time_travel_and_rollback(spark, sf_small, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, sf_small, path, 1000)
    n1 = spark.read.format("scbf").load(path).count()
    m1 = snapshot.create_snapshot(path, tag="first-batch")
    assert m1["snapshot_id"] == 1 and len(m1["files"]) >= 1

    _write(spark, sf_small, path, 500)  # append a second batch
    n2 = spark.read.format("scbf").load(path).count()
    assert n2 > n1
    snapshot.create_snapshot(path)

    # time travel: snapshot 1 sees only the first batch (by id and by tag)
    assert snapshot.read_snapshot(spark, path, 1).count() == n1
    assert snapshot.read_snapshot(spark, path, "first-batch").count() == n1
    # snapshot 2 = everything; current read unaffected by manifests
    assert snapshot.read_snapshot(spark, path, 2).count() == n2
    assert spark.read.format("scbf").load(path).count() == n2

    # rollback to snapshot 1: the bad second batch disappears
    stats = snapshot.rollback(path, 1)
    assert stats["kept"] == len(m1["files"]) and stats["deleted"] >= 1
    assert spark.read.format("scbf").load(path).count() == n1


def test_snapshot_invalidated_by_rewrite_fails_loudly(spark, sf_small, tmp_path):
    from custom_columnar_format_spark.operators import compact

    path = str(tmp_path / "ds2")
    _write(spark, sf_small, path, 1000)
    snapshot.create_snapshot(path)
    compact.compact(spark, path, target_files=1)  # rewrites every file

    with pytest.raises(Exception, match="no longer readable"):
        snapshot.read_snapshot(spark, path, 1).count()
    # current reads still fine; a fresh snapshot of the compacted set works
    n = spark.read.format("scbf").load(path).count()
    m = snapshot.create_snapshot(path)
    assert m["snapshot_id"] == 2
    assert snapshot.read_snapshot(spark, path, 2).count() == n


def test_snapshot_expiry_and_pruned_reads(spark, sf_small, tmp_path):
    path = str(tmp_path / "ds3")
    _write(spark, sf_small, path, 1000)
    snapshot.create_snapshot(path)
    _write(spark, sf_small, path, 500)
    snapshot.create_snapshot(path)

    # snapshot read composes with column projection + filters
    df = (
        spark.read.format("scbf")
        .option("snapshot", "1")
        .option("columns", "o_totalprice")
        .load(path)
    )
    assert df.columns == ["o_totalprice"]
    assert df.count() == snapshot.read_snapshot(spark, path, 1).count()

    assert snapshot.expire_snapshots(path, keep_last=1) == 1
    assert [m["snapshot_id"] for m in snapshot.list_snapshots(path)] == [2]
    with pytest.raises(Exception, match="not found"):
        snapshot.snapshot_files(path, 1)


def test_change_feed_between_snapshots(spark, sf_small, tmp_path):
    """Incremental consumption: read_changes returns exactly the rows
    appended between two snapshots; rewrites in between fail loudly."""
    path = str(tmp_path / "cdf")
    _write(spark, sf_small, path, 500)
    snapshot.create_snapshot(path, tag="t1")
    n1 = spark.read.format("scbf").load(path).count()

    _write(spark, sf_small, path, 1000)  # append batch 2
    snapshot.create_snapshot(path, tag="t2")
    n2 = spark.read.format("scbf").load(path).count()

    delta = snapshot.read_changes(spark, path, "t1", "t2")
    assert delta.count() == n2 - n1
    # empty delta between a snapshot and itself
    assert snapshot.read_changes(spark, path, "t1", "t1").count() == 0

    # a rollback between the snapshots breaks the append-only premise
    snapshot.rollback(path, "t1")
    snapshot.create_snapshot(path, tag="t3")
    with pytest.raises(ValueError, match="not append-only"):
        snapshot.changed_files(path, "t2", "t3")


def test_concurrent_snapshot_id_claims_never_clobber(spark, sf_small, tmp_path):
    """A concurrently-claimed id (simulated by a pre-existing manifest and a
    zero-byte claim) is skipped, not overwritten; unfilled claims are
    invisible to listing."""
    import json as _json

    path = str(tmp_path / "race")
    _write(spark, sf_small, path, 500)
    m1 = snapshot.create_snapshot(path, tag="mine")

    # another writer claimed the next id but hasn't filled it yet
    open(os.path.join(path, "_snapshots", f"snap-{m1['snapshot_id'] + 1}.json"), "w").close()
    m2 = snapshot.create_snapshot(path, tag="later")
    assert m2["snapshot_id"] == m1["snapshot_id"] + 2  # skipped the claim

    listed = snapshot.list_snapshots(path)
    assert [m["snapshot_id"] for m in listed] == [m1["snapshot_id"], m2["snapshot_id"]]
    # the original manifest was never clobbered
    with open(os.path.join(path, "_snapshots", f"snap-{m1['snapshot_id']}.json")) as f:
        assert _json.load(f)["tag"] == "mine"


def test_expire_reclaims_abandoned_claims_only_when_old(spark, sf_small, tmp_path):
    """A creator that died between the O_EXCL claim and the content rename
    leaves a zero-byte snap-*.json; expiry deletes it once it is older than
    the abandonment threshold, but leaves young claims (a live creator may
    still fill them) and never miscounts them as expired manifests."""
    path = str(tmp_path / "claims")
    _write(spark, sf_small, path, 500)
    snapshot.create_snapshot(path)
    snapshot.create_snapshot(path)

    snap_dir = os.path.join(path, "_snapshots")
    young = os.path.join(snap_dir, "snap-90.json")
    old = os.path.join(snap_dir, "snap-91.json")
    open(young, "w").close()
    open(old, "w").close()
    stale = os.path.getmtime(old) - snapshot.ABANDONED_CLAIM_SECONDS - 60
    os.utime(old, (stale, stale))

    assert snapshot.expire_snapshots(path, keep_last=1) == 1  # claims not counted
    assert not os.path.exists(old)  # abandoned claim reclaimed
    assert os.path.exists(young)  # live claim untouched
    assert [m["snapshot_id"] for m in snapshot.list_snapshots(path)] == [2]
