"""Incremental view maintenance over snapshot tables (operators/ivm.py):
delta-only refresh equals full recompute; the incremental plan reads only
the delta files; MERGE/DELETE commits refresh via the retraction change
feed; compaction in the chain is a logical no-op for the feed."""

from __future__ import annotations

from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.operators.ivm import (
    additive_agg,
    refresh_additive_agg,
)
from receiptanalyzerpipeline_spark.sources.snapshots import (
    compact_snapshot,
    read_snapshot,
    write_snapshot,
)

SUMS = {"sum_v": "v"}


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 2).cast("double").alias("v")
    )


def _rows(df):
    return {(r["k"], r["n_rows"], r["sum_v"]) for r in df.collect()}


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v0 = write_snapshot(_batch(spark, 0, 100), path)
    mat = additive_agg(read_snapshot(spark, path, version=v0), ["k"], SUMS)

    v1 = write_snapshot(_batch(spark, 100, 160), path)
    v2 = write_snapshot(_batch(spark, 160, 200), path)

    refreshed = refresh_additive_agg(
        spark, path, mat, ["k"], SUMS, from_version=v0, to_version=v2
    )
    full = additive_agg(read_snapshot(spark, path, version=v2), ["k"], SUMS)
    assert _rows(refreshed) == _rows(full)
    assert v1 == 1  # sanity: appends chained


def test_incremental_plan_reads_only_delta_files(spark, tmp_path):
    from receiptanalyzerpipeline_spark.sources.snapshots import (
        _read_manifest,
        read_changes,
    )

    path = str(tmp_path / "tbl")
    v0 = write_snapshot(_batch(spark, 0, 100), path)
    v1 = write_snapshot(_batch(spark, 100, 120), path)
    delta = read_changes(spark, path, v0, v1)
    delta_files = {f.removeprefix("file://") for f in delta.inputFiles()}
    all_files = set(_read_manifest(path, v1)["files"])
    v0_files = set(_read_manifest(path, v0)["files"])
    assert delta_files and delta_files == all_files - v0_files


def test_refresh_is_noop_at_same_version(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v0 = write_snapshot(_batch(spark, 0, 50), path)
    mat = additive_agg(read_snapshot(spark, path, version=v0), ["k"], SUMS)
    same = refresh_additive_agg(
        spark, path, mat, ["k"], SUMS, from_version=v0, to_version=v0
    )
    assert same is mat


def test_compaction_in_chain_stays_incremental_and_correct(spark, tmp_path):
    """Compaction is a logical no-op: the change feed skips it entirely,
    so the refresh stays incremental (reads only genuinely-new files,
    never the compaction rewrite) and matches a full recompute."""
    from receiptanalyzerpipeline_spark.sources.snapshots import read_row_changes

    path = str(tmp_path / "tbl")
    v0 = write_snapshot(_batch(spark, 0, 100), path)
    mat = additive_agg(read_snapshot(spark, path, version=v0), ["k"], SUMS)
    write_snapshot(_batch(spark, 100, 150), path)
    compact_snapshot(spark, path)
    v3 = write_snapshot(_batch(spark, 150, 180), path)

    refreshed = refresh_additive_agg(
        spark, path, mat, ["k"], SUMS, from_version=v0, to_version=v3
    )
    full = additive_agg(read_snapshot(spark, path, version=v3), ["k"], SUMS)
    assert _rows(refreshed) == _rows(full)
    # The feed contains exactly the appended rows (80), no retractions
    # from the compaction rewrite.
    feed = read_row_changes(spark, path, v0, v3)
    assert feed.where("_op = 'delete'").count() == 0
    assert feed.count() == 80


def test_refresh_across_merge_and_delete_uses_retractions(spark, tmp_path):
    """MERGE and DELETE commits refresh incrementally: deletes subtract
    from the materialized partials, and a key whose rows all vanish
    drops out of the view — identical to a full recompute."""
    from receiptanalyzerpipeline_spark.sources.snapshots import (
        delete_where,
        merge_upsert,
    )

    path = str(tmp_path / "tbl")
    # Keys 0..4; k=4 appears only in rows id in {4,9,...}.
    v0 = write_snapshot(_batch(spark, 0, 100), path)
    mat = additive_agg(read_snapshot(spark, path, version=v0), ["k"], SUMS)

    # Upsert: change some rows' v; insert brand-new key 7.
    src = spark.createDataFrame(
        [(0, 1000.0), (7, 5.0)], "k long, v double"
    )
    merge_upsert(spark, src, path, ["k"])
    # Delete an entire key: it must disappear from the refreshed view.
    v2 = delete_where(spark, path, "k = 4")

    refreshed = refresh_additive_agg(
        spark, path, mat, ["k"], SUMS, from_version=v0, to_version=v2
    )
    full = additive_agg(read_snapshot(spark, path, version=v2), ["k"], SUMS)
    assert _rows(refreshed) == _rows(full)
    assert not [r for r in refreshed.collect() if r["k"] == 4]
    assert {r["k"]: r["sum_v"] for r in refreshed.collect()}[7] == 5.0


def test_refresh_with_expired_watermark_falls_back(spark, tmp_path):
    """Retention can outrun an IVM consumer: when from_version's manifest
    is gone, the refresh silently degrades to a (correct) full recompute
    instead of failing or guessing."""
    from receiptanalyzerpipeline_spark.sources.snapshots import expire_snapshots

    path = str(tmp_path / "tbl")
    v0 = write_snapshot(_batch(spark, 0, 100), path)
    mat = additive_agg(read_snapshot(spark, path, version=v0), ["k"], SUMS)
    write_snapshot(_batch(spark, 100, 150), path)
    v2 = write_snapshot(_batch(spark, 150, 180), path)
    assert v0 in expire_snapshots(path, keep_last=2)

    refreshed = refresh_additive_agg(
        spark, path, mat, ["k"], SUMS, from_version=v0, to_version=v2
    )
    full = additive_agg(read_snapshot(spark, path, version=v2), ["k"], SUMS)
    assert _rows(refreshed) == _rows(full)


def test_snapshot_op_interleavings_preserve_contents(spark, tmp_path):
    """Randomized (seeded) interleavings of append / replay / compact /
    expire must always leave the latest read equal to the multiset of
    appended rows — the invariant every other layer (curation state,
    IVM) builds on."""
    import random

    from receiptanalyzerpipeline_spark.sources.snapshots import (
        compact_snapshot,
        expire_snapshots,
        read_snapshot,
        snapshot_sink,
        versions,
    )

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        path = str(tmp_path / f"tbl_{seed}")
        sink = snapshot_sink(path)
        appended: list[int] = []
        next_batch = 0
        delivered: dict[int, tuple[int, int]] = {}
        for _ in range(10):
            op = rng.choice(["append", "append", "replay", "compact", "expire"])
            if op == "append":
                lo = next_batch * 100
                hi = lo + rng.randint(1, 30)
                delivered[next_batch] = (lo, hi)
                sink(spark.range(lo, hi).toDF("id"), next_batch)
                appended.extend(range(lo, hi))
                next_batch += 1
            elif op == "replay" and delivered:
                b = rng.choice(sorted(delivered))
                lo, hi = delivered[b]
                sink(spark.range(lo, hi).toDF("id"), b)  # must be a no-op
            elif op == "compact" and versions(path):
                compact_snapshot(spark, path)
            elif op == "expire" and len(versions(path)) > 2:
                expire_snapshots(path, keep_last=2)
            if versions(path):
                got = sorted(r["id"] for r in read_snapshot(spark, path).collect())
                assert got == sorted(appended), (seed, op)


def test_replay_of_expired_batch_stays_a_noop(spark, tmp_path):
    """The ledger closes the expire-then-replay hole: after retention
    removes a batch's manifest, re-delivering that batch must STILL be
    recognized as committed (no duplicate rows)."""
    from receiptanalyzerpipeline_spark.sources.snapshots import (
        batch_committed,
        expire_snapshots,
        read_snapshot,
        snapshot_sink,
        versions,
    )

    path = str(tmp_path / "tbl")
    sink = snapshot_sink(path)
    for b in range(4):
        sink(spark.range(b * 10, (b + 1) * 10).toDF("id"), b)
    expired = expire_snapshots(path, keep_last=2)
    assert expired == [0, 1]
    assert batch_committed(path, 0) and batch_committed(path, 1)

    sink(spark.range(0, 10).toDF("id"), 0)  # late replay of expired batch
    assert read_snapshot(spark, path).count() == 40  # no duplicates
    assert versions(path) == [2, 3]


def test_materialized_view_over_streaming_upserts(spark, tmp_path):
    """merge_sink + materialize_view compose into a continuously
    maintained aggregate: after every upsert batch the view equals a full
    recompute, refreshes are incremental from the recorded base-version
    watermark, and both replayed batches and refreshes on an unchanged
    base are no-ops."""
    from receiptanalyzerpipeline_spark.operators.ivm import materialize_view
    from receiptanalyzerpipeline_spark.sources import snapshots as snap

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    sink = snap.merge_sink(base, ["k"], order_col="seq")
    schema = "k long, grp string, v double, seq long"
    batches = [
        [(1, "a", 10.0, 1), (2, "a", 20.0, 2), (3, "b", 30.0, 3)],
        [(2, "a", 25.0, 4), (4, "b", 40.0, 5)],   # update k=2, insert k=4
        [(3, "b", 31.0, 6), (3, "b", 32.0, 7)],   # in-batch last-wins on k=3
    ]
    for bid, rows in enumerate(batches):
        sink(spark.createDataFrame(rows, schema), bid)
        materialize_view(spark, base, view, ["grp"], {"sum_v": "v"})
        got = {
            (r["grp"], r["n_rows"], r["sum_v"])
            for r in snap.read_snapshot(spark, view).collect()
        }
        from receiptanalyzerpipeline_spark.operators.ivm import additive_agg

        full = {
            (r["grp"], r["n_rows"], r["sum_v"])
            for r in additive_agg(
                snap.read_snapshot(spark, base), ["grp"], {"sum_v": "v"}
            ).collect()
        }
        assert got == full, bid
    assert got == {("a", 2, 35.0), ("b", 2, 72.0)}

    # Unchanged base: refresh is a version-stable no-op.
    v1 = materialize_view(spark, base, view, ["grp"], {"sum_v": "v"})
    v2 = materialize_view(spark, base, view, ["grp"], {"sum_v": "v"})
    assert v1 == v2 == snap.current_version(view)

    # Replayed batch is a base no-op, so the view stays put too.
    sink(spark.createDataFrame(batches[1], schema), 1)
    assert materialize_view(spark, base, view, ["grp"], {"sum_v": "v"}) == v2
