"""Snapshot tables as streaming sources (sources/snapshot_stream.py):
version-number offsets, retraction rows for MERGE/DELETE, compaction
invisibility, and exactly-once resume from the checkpointed offset."""

from __future__ import annotations

from receiptanalyzerpipeline_spark.sources import snapshots as snap
from receiptanalyzerpipeline_spark.sources.snapshot_stream import (
    SnapshotCdcDataSource,
)


def _drain(spark, path, checkpoint, out_name, starting=None):
    spark.dataSource.register(SnapshotCdcDataSource)
    reader = spark.readStream.format("snapshot_cdc").option("path", path)
    if starting is not None:
        reader = reader.option("startingVersion", str(starting))
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(out_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    return {
        (r["k"], r["v"], r["_op"], r["_version"])
        for r in spark.sql(f"SELECT * FROM {out_name}").collect()
    }


def test_cdc_stream_tails_inserts_and_retractions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").coalesce(1),
        path,
    )
    snap.merge_upsert(
        spark, spark.createDataFrame([(2, "B!")], "k long, v string"), path, ["k"]
    )
    snap.compact_snapshot(spark, path)  # must be invisible to the feed
    v3 = snap.delete_where(spark, path, "k = 1")

    got = _drain(spark, path, str(tmp_path / "cp1"), "cdc_all", starting=0)
    # Version 0: inserts. Version 1 (merge): old file retracted (both
    # rows), survivors + update inserted. Version 2 (compaction): nothing.
    # Version 3 (delete): touched file retracted, survivor reinserted.
    inserts_v0 = {(1, "a", "insert", 0), (2, "b", "insert", 0)}
    assert inserts_v0 <= got
    assert (2, "b", "delete", 1) in got and (2, "B!", "insert", 1) in got
    assert not any(ver == 2 for _, _, _, ver in got)
    assert (1, "a", "delete", v3) in got
    # Net state from the feed equals the live table.
    net: dict = {}
    for k, v, op, ver in sorted(got, key=lambda t: t[3]):
        if op == "insert":
            net.setdefault(k, []).append(v)
        else:
            net[k].remove(v)
    alive = {(k, v) for k, vs in net.items() for v in vs}
    live = {tuple(r) for r in snap.read_snapshot(spark, path).select("k", "v").collect()}
    assert alive == live


def test_cdc_stream_resumes_exactly_once(spark, tmp_path):
    """A second availableNow run on the same checkpoint emits nothing for
    already-committed versions and exactly the new commits' changes."""
    path = str(tmp_path / "tbl")
    snap.write_snapshot(
        spark.createDataFrame([(1, "a")], "k long, v string"), path
    )
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")

    def run() -> None:
        spark.dataSource.register(SnapshotCdcDataSource)
        q = (
            spark.readStream.format("snapshot_cdc")
            .option("path", path)
            .option("startingVersion", "0")
            .load()
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)

    run()
    rows = lambda: {  # noqa: E731
        (r["k"], r["v"], r["_op"], r["_version"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows() == {(1, "a", "insert", 0)}

    snap.merge_upsert(
        spark, spark.createDataFrame([(1, "A!")], "k long, v string"), path, ["k"]
    )
    run()  # resume from the checkpointed version offset
    assert rows() == {
        (1, "a", "insert", 0),
        (1, "a", "delete", 1),
        (1, "A!", "insert", 1),
    }


def test_cdc_stream_default_start_is_latest(spark, tmp_path):
    """Without startingVersion the stream tails only NEW commits (the
    Delta default): history before stream start is not replayed."""
    path = str(tmp_path / "tbl")
    snap.write_snapshot(
        spark.createDataFrame([(1, "a")], "k long, v string"), path
    )
    got = _drain(spark, path, str(tmp_path / "cp"), "cdc_latest")
    assert got == set()


def test_streaming_view_maintenance_from_cdc(spark, tmp_path):
    """snapshot_cdc stream + view_maintenance_sink = a continuously
    maintained aggregate table: after each drain the view equals a full
    recompute of the live base, retraction-exact across MERGE and DELETE,
    and a drain with no new commits leaves the view version untouched."""
    from receiptanalyzerpipeline_spark.operators.ivm import (
        additive_agg,
        view_maintenance_sink,
    )

    base, view, cp = (
        str(tmp_path / "base"),
        str(tmp_path / "view"),
        str(tmp_path / "cp"),
    )
    snap.write_snapshot(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "k long, grp string, v long"
        ),
        base,
    )

    def drain() -> None:
        spark.dataSource.register(SnapshotCdcDataSource)
        q = (
            spark.readStream.format("snapshot_cdc")
            .option("path", base)
            .option("startingVersion", "0")
            .load()
            .writeStream.foreachBatch(
                view_maintenance_sink(view, ["grp"], {"sum_v": "v"})
            )
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)

    def check() -> None:
        got = {
            (r["grp"], r["n_rows"], r["sum_v"])
            for r in snap.read_snapshot(spark, view).collect()
        }
        full = {
            (r["grp"], r["n_rows"], r["sum_v"])
            for r in additive_agg(
                snap.read_snapshot(spark, base), ["grp"], {"sum_v": "v"}
            ).collect()
        }
        assert got == full

    drain()
    check()

    snap.merge_upsert(
        spark,
        spark.createDataFrame([(2, "a", 25), (4, "b", 40)], "k long, grp string, v long"),
        base,
        ["k"],
    )
    snap.delete_where(spark, base, "grp = 'b' AND k = 3")
    drain()
    check()

    # No new base commits: the drain must not churn the view.
    v_before = snap.current_version(view)
    drain()
    assert snap.current_version(view) == v_before
