"""Incremental view maintenance for additive aggregates over snapshot
tables (sources/snapshots.py).

An additive aggregate — per-key SUMs and COUNTs, and anything derived
from them (averages, rates) — can be refreshed from version A to version
B by aggregating ONLY the changed rows and merging the partials into the
materialized result: the map-side-combine identity
``agg(base ∪ delta) = merge(agg(base), agg(delta))``. At 100 TB this is
the difference between a nightly full rescan and touching the day's new
files; it is exactly the partial/final split Spark's hash aggregate
already performs inside one job, lifted across table versions.

Two refresh modes, picked automatically:

- **Append-only chain** (the streaming sink's mode): the delta is the
  added files (``read_changes``), inserts only.
- **Retraction chain** (MERGE/DELETE commits present): the delta is the
  row-level change feed (``read_row_changes``) — deletes SUBTRACT from
  the materialized partials, inserts add, and keys whose row count
  reaches zero drop out. Compaction commits are logical no-ops and cost
  nothing. This is classic retraction-stream IVM (the Flink/DBSP shape)
  over a table log.

Only a plain (non-compaction) OVERWRITE forces a full recompute: it
rewrites every file, so the retraction delta would be
retract-everything + insert-everything — correct but strictly worse
than recomputing. MIN/MAX and DISTINCT are deliberately out of scope:
they are not subtractable, which is why production IVM engines restrict
themselves to the same additive class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.sources import snapshots as snap

__all__ = ["additive_agg", "refresh_additive_agg", "materialize_view", "view_maintenance_sink"]


def additive_agg(
    df: DataFrame, keys: list[str], sums: dict[str, str]
) -> DataFrame:
    """Materializable per-key additive aggregate: one ``n_rows`` count
    plus a SUM per entry of ``sums`` (out_col -> input_col)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")] + [
        F.sum(src).alias(out) for out, src in sums.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def _chain_is_append(path: str, from_version: int, to_version: int) -> bool:
    for v in snap.versions(path):
        if from_version < v <= to_version:
            if snap._read_manifest(path, v).get("mode") != "append":
                return False
    return True


def _chain_is_retractable(path: str, from_version: int, to_version: int) -> bool:
    """True when every commit in the (present) chain is append, merge,
    delete, or compaction — i.e. the row-level change feed is both exact
    and cheaper than a recompute. ``from_version`` must still exist."""
    present = snap.versions(path)
    if from_version not in present:
        return False
    for v in present:
        if from_version < v <= to_version:
            m = snap._read_manifest(path, v)
            if m.get("mode") == "overwrite" and "compaction_of" not in m:
                return False
    return True


def refresh_additive_agg(
    spark: SparkSession,
    path: str,
    materialized: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Refresh ``materialized`` (= ``additive_agg`` at ``from_version``)
    to ``to_version`` (default: latest) by aggregating only the changed
    rows and merging partials — inserts add, deletes subtract, emptied
    keys drop out. Falls back to a full recompute only when the chain
    contains a plain overwrite commit (or ``from_version`` expired)."""
    if to_version is None:
        to_version = snap.current_version(path)
    if to_version == from_version:
        return materialized
    if not _chain_is_retractable(path, from_version, to_version):
        return additive_agg(
            snap.read_snapshot(spark, path, version=to_version), keys, sums
        )
    if _chain_is_append(path, from_version, to_version):
        # Insert-only fast path: reads the added files, no _op column.
        delta_agg = additive_agg(
            snap.read_changes(spark, path, from_version, to_version), keys, sums
        )
    else:
        changes = snap.read_row_changes(spark, path, from_version, to_version)
        sign = F.when(F.col("_op") == "insert", F.lit(1)).otherwise(F.lit(-1))
        delta_agg = changes.groupBy(*keys).agg(
            F.sum(sign).cast("long").alias("n_rows"),
            *[F.sum(sign * F.col(src)).alias(out) for out, src in sums.items()],
        )
    merge = [F.sum("n_rows").cast("long").alias("n_rows")] + [
        F.sum(out).alias(out) for out in sums
    ]
    return (
        materialized.unionByName(delta_agg)
        .groupBy(*keys)
        .agg(*merge)
        .where(F.col("n_rows") > 0)
    )


def materialize_view(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    keys: list[str],
    sums: dict[str, str],
) -> int:
    """Create-or-refresh a MATERIALIZED VIEW (additive aggregate of the
    base table) stored as its own snapshot table; returns the committed
    view version.

    The view manifest records ``base_version`` — the base-table version
    the stored result reflects — ATOMICALLY with the view commit, so the
    watermark can never drift from the data. Each call refreshes
    incrementally from that watermark (retraction feed across
    append/MERGE/DELETE commits, compactions free) and commits a new view
    version; when the base hasn't moved the call is a no-op returning the
    current view version. Crash-safe by construction: a replayed refresh
    re-reads the same watermark and overwrites forward — the view never
    double-applies a delta. This composes with ``snapshots.merge_sink``
    into a continuously-maintained aggregate over a streaming upsert
    table."""
    cur_base = snap.current_version(base_path)
    if cur_base is None:
        raise FileNotFoundError(f"no committed version at {base_path}")
    view_cur = snap.current_version(view_path)
    if view_cur is None:
        agg = additive_agg(snap.read_snapshot(spark, base_path), keys, sums)
        return snap.write_snapshot(
            agg, view_path, mode="overwrite",
            manifest_extra={"base_version": cur_base},
        )
    vm = snap._read_manifest(view_path, view_cur)
    from_v = vm.get("base_version")
    if from_v == cur_base:
        return view_cur
    if from_v is None:
        refreshed = additive_agg(snap.read_snapshot(spark, base_path), keys, sums)
    else:
        refreshed = refresh_additive_agg(
            spark, base_path, snap.read_snapshot(spark, view_path),
            keys, sums, from_version=from_v, to_version=cur_base,
        )
    return snap.write_snapshot(
        refreshed, view_path, mode="overwrite",
        manifest_extra={"base_version": cur_base},
    )


def view_maintenance_sink(view_path: str, keys: list[str], sums: dict[str, str]):
    """``foreachBatch`` function for a ``snapshot_cdc`` stream: applies
    each micro-batch's retraction delta (_op-tagged rows) to a
    materialized additive-aggregate table, EXACTLY-ONCE by the same
    batch-id manifest contract as the snapshot sinks. The continuously
    maintained twin of ``materialize_view``: instead of polling the base
    table for new versions, the view updates as the CDC stream delivers —
    inserts add, deletes subtract, emptied keys drop.

    Usage::

        (spark.readStream.format("snapshot_cdc")
              .option("path", base).option("startingVersion", "0").load()
              .writeStream
              .foreachBatch(view_maintenance_sink(view, ["grp"], {"s": "v"}))
              .option("checkpointLocation", cp).start())
    """

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if snap.batch_committed(view_path, batch_id):
            snap._repair_pointer(view_path)
            return
        sign = F.when(F.col("_op") == "insert", F.lit(1)).otherwise(F.lit(-1))
        delta = batch_df.groupBy(*keys).agg(
            F.sum(sign).cast("long").alias("n_rows"),
            *[F.sum(sign * F.col(src)).alias(out) for out, src in sums.items()],
        )
        spark = batch_df.sparkSession
        if snap.current_version(view_path) is not None:
            merge = [F.sum("n_rows").cast("long").alias("n_rows")] + [
                F.sum(out).alias(out) for out in sums
            ]
            delta = (
                snap.read_snapshot(spark, view_path)
                .unionByName(delta)
                .groupBy(*keys)
                .agg(*merge)
            )
        snap.write_snapshot(
            delta.where(F.col("n_rows") > 0),
            view_path,
            mode="overwrite",
            manifest_extra={"batch_id": batch_id},
        )

    return commit
