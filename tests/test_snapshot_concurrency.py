"""Optimistic concurrency on the snapshot layer: manifest publish is an
atomic conditional-put (os.link), appends CAS-retry by re-chaining,
non-append commits raise CommitConflict, and orphan data dirs from lost
races or crashes are vacuumed after a grace period."""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import pytest

from receiptanalyzerpipeline_spark.sources import snapshots as snap


def test_concurrent_appends_all_commit_without_loss(spark, tmp_path):
    """8 writers race to append: every commit must land (distinct
    versions 0..7) and the final table must hold every batch's rows —
    no lost update, no duplicated chain."""
    path = str(tmp_path / "tbl")

    def append(i: int) -> int:
        df = spark.range(i * 100, i * 100 + 10).toDF("id")
        return snap.write_snapshot(df, path, mode="append")

    with ThreadPoolExecutor(max_workers=8) as ex:
        got_versions = sorted(ex.map(append, range(8)))
    assert got_versions == list(range(8))
    ids = sorted(r["id"] for r in snap.read_snapshot(spark, path).collect())
    assert ids == sorted(x for i in range(8) for x in range(i * 100, i * 100 + 10))
    # Every version's manifest chains completely: version k holds k+1 batches.
    for v in range(8):
        assert len(snap._read_manifest(path, v)["files"]) >= v + 1


def test_nonappend_commit_conflict_raises(spark, tmp_path, monkeypatch):
    """A racer claiming the version an overwrite/merge/delete computed
    against must surface as CommitConflict, never a silent overwrite.
    The race window is simulated exactly: a rival commits version 1, and
    versions() is patched to hide it — each op therefore computes against
    version 0 and collides at publish time."""
    path = str(tmp_path / "tbl")
    snap.write_snapshot(spark.createDataFrame([(1, "a")], "k long, v string"), path)
    rival = {**snap._read_manifest(path, 0), "version": 1, "mode": "append"}
    snap._write_manifest_exclusive(path, 1, rival)

    real_versions = snap.versions
    monkeypatch.setattr(snap, "versions", lambda p: [v for v in real_versions(p) if v != 1])

    with pytest.raises(snap.CommitConflict):
        snap.write_snapshot(
            spark.createDataFrame([(9, "z")], "k long, v string"),
            path,
            mode="overwrite",
        )
    with pytest.raises(snap.CommitConflict):
        snap.merge_upsert(
            spark, spark.createDataFrame([(1, "A")], "k long, v string"), path, ["k"]
        )
    with pytest.raises(snap.CommitConflict):
        snap.delete_where(spark, path, "k = 1")

    # Appends never conflict: with the same stale view they re-chain on
    # whatever versions() reports at retry time and land on a free slot.
    monkeypatch.setattr(snap, "versions", real_versions)
    v = snap.write_snapshot(
        spark.createDataFrame([(2, "b")], "k long, v string"), path, mode="append"
    )
    assert v == snap.versions(path)[-1]
    assert snap.read_snapshot(spark, path).count() == 2


def test_manifest_publish_is_atomic_and_exclusive(tmp_path):
    path = str(tmp_path / "tbl")
    snap._write_manifest_exclusive(path, 0, {"version": 0, "mode": "append", "files": []})
    with pytest.raises(FileExistsError):
        snap._write_manifest_exclusive(path, 0, {"version": 0, "mode": "x", "files": []})
    # Loser's temp file must not linger.
    assert not list((Path(path) / "manifests").glob("*.tmp"))
    assert json.loads(snap._manifest_path(path, 0).read_text())["mode"] == "append"


def test_sink_retries_past_interleaved_commit(spark, tmp_path, monkeypatch):
    """The streaming sink losing the conditional-put race to an
    interleaved maintenance commit must re-chain and retry, committing
    the batch on the next free version with the full chain intact."""
    path = str(tmp_path / "tbl")
    sink = snap.snapshot_sink(path)
    sink(spark.range(10).toDF("id"), 0)

    # Interleave a maintenance commit, then deliver the next batch with a
    # stale versions() view (as if the compaction landed between the
    # sink's chain read and its manifest publish). The view turns real
    # after the first publish conflict, so the retry re-chains correctly.
    snap.compact_snapshot(spark, path)
    real_versions = snap.versions
    state = {"stale": True}

    def racy_versions(p):
        out = real_versions(p)
        return out[:-1] if state["stale"] and len(out) >= 2 else out

    real_publish = snap._write_manifest_exclusive

    def tracking_publish(p, version, m):
        try:
            real_publish(p, version, m)
        except FileExistsError:
            state["stale"] = False  # conflict observed: view turns real
            raise

    monkeypatch.setattr(snap, "versions", racy_versions)
    monkeypatch.setattr(snap, "_write_manifest_exclusive", tracking_publish)
    sink(spark.range(10, 15).toDF("id"), 1)
    assert not state["stale"], "the stale view never caused a publish conflict"
    monkeypatch.setattr(snap, "versions", real_versions)
    monkeypatch.setattr(snap, "_write_manifest_exclusive", real_publish)

    assert snap.read_snapshot(spark, path).count() == 15
    m = snap._read_manifest(path, snap.current_version(path))
    assert m["batch_id"] == 1
    # The batch chained on the compaction's head, not the stale one.
    assert any("compaction_of" in snap._read_manifest(path, v) for v in snap.versions(path))


def test_orphan_data_dirs_vacuumed_after_grace(spark, tmp_path):
    """A crash between data write and manifest publish leaves an
    unreferenced dir: expire_snapshots removes it once it is older than
    the grace period, and never touches referenced dirs."""
    path = str(tmp_path / "tbl")
    snap.write_snapshot(spark.range(5).toDF("id"), path)
    orphan = Path(path) / "data" / "snap-9-deadbeef"
    spark.range(99).toDF("id").write.parquet(str(orphan))

    # Within grace: kept.
    snap.expire_snapshots(path, keep_last=2, orphan_grace_s=3600)
    assert orphan.exists()
    # Past grace: swept; the live dir survives.
    snap.expire_snapshots(path, keep_last=2, orphan_grace_s=0)
    assert not orphan.exists()
    assert snap.read_snapshot(spark, path).count() == 5


def test_stale_read_overwrite_conflicts_instead_of_lost_update(spark, tmp_path):
    """Round-10 soak finding: a read-modify-write (compaction) whose READ
    predates an interleaved commit must CONFLICT, not publish — before
    expected_head, the stale rewrite landed as a fresh version and the
    interleaved commit's rows silently vanished from the live view."""
    import pytest as _pytest

    path = str(tmp_path / "t")
    snap.write_snapshot(spark.range(5).toDF("id"), path, mode="overwrite")
    base = snap.current_version(path)
    stale = snap.read_snapshot(spark, path, version=base)
    # Interleaved commit lands after the reader took its base.
    snap.write_snapshot(spark.range(5, 8).toDF("id"), path, mode="append")
    with _pytest.raises(snap.CommitConflict):
        snap.write_snapshot(
            stale, path, mode="overwrite", expected_head=base,
            validate_constraints=False,
        )
    # The interleaved rows are still live.
    ids = {r["id"] for r in snap.read_snapshot(spark, path).collect()}
    assert ids == set(range(8))


def test_compact_snapshot_conflicts_on_concurrent_commit(spark, tmp_path, monkeypatch):
    """compact_snapshot passes its read version as expected_head: inject
    a commit between its read and its publish and assert the compaction
    conflicts rather than dropping the injected batch."""
    import pytest as _pytest

    path = str(tmp_path / "t")
    snap.write_snapshot(spark.range(10).toDF("id"), path, mode="overwrite")

    real_read = snap.read_snapshot

    def read_then_interleave(s, p, version=None):
        df = real_read(s, p, version=version)
        # A live sink commits right after the compaction's read.
        snap.write_snapshot(spark.range(10, 12).toDF("id"), p, mode="append")
        return df

    monkeypatch.setattr(snap, "read_snapshot", read_then_interleave)
    with _pytest.raises(snap.CommitConflict):
        snap.compact_snapshot(spark, path)
    monkeypatch.undo()
    ids = {r["id"] for r in snap.read_snapshot(spark, path).collect()}
    assert ids == set(range(12))
