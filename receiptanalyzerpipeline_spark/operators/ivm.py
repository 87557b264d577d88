"""Incremental view maintenance for additive aggregates over snapshot
tables (sources/snapshots.py).

An additive aggregate — per-key SUMs and COUNTs, and anything derived
from them (averages, rates) — can be refreshed from version A to version
B by aggregating ONLY the delta files (``read_changes``) and merging the
partials into the materialized result: the map-side-combine identity
``agg(base ∪ delta) = merge(agg(base), agg(delta))``. At 100 TB this is
the difference between a nightly full rescan and touching the day's new
files; it is exactly the partial/final split Spark's hash aggregate
already performs inside one job, lifted across table versions.

Contract: the snapshot chain between the two versions must be APPEND
commits (the streaming sink's mode). Across an overwrite commit —
compaction rewrites every file — the file diff no longer equals the row
delta, so ``refresh_additive_agg`` detects any non-append manifest in
(from_version, to_version] and falls back to a full recompute (correct,
just not incremental). MIN/MAX and DISTINCT are deliberately out of
scope: they are not subtractable, which is why production IVM engines
restrict themselves to the same additive class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.sources import snapshots as snap

__all__ = ["additive_agg", "refresh_additive_agg"]


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
    to ``to_version`` (default: latest) by aggregating only the delta
    files and merging partials. Falls back to a full recompute when the
    version chain contains a non-append (overwrite/compaction) commit."""
    if to_version is None:
        to_version = snap.current_version(path)
    if to_version == from_version:
        return materialized
    if not _chain_is_append(path, from_version, to_version):
        return additive_agg(
            snap.read_snapshot(spark, path, version=to_version), keys, sums
        )
    delta = snap.read_changes(spark, path, from_version, to_version)
    delta_agg = additive_agg(delta, keys, sums)
    merge = [F.sum("n_rows").cast("long").alias("n_rows")] + [
        F.sum(out).alias(out) for out in sums
    ]
    return materialized.unionByName(delta_agg).groupBy(*keys).agg(*merge)
