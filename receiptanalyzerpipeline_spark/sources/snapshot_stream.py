"""Snapshot tables as STREAMING SOURCES: tail the table's commit log as
a row-level CDC stream (the Delta streaming-source / table_changes
analogue, built on the manifest layer in ``snapshots.py``).

    spark.dataSource.register(SnapshotCdcDataSource)
    (spark.readStream.format("snapshot_cdc")
          .option("path", table_path)
          .option("startingVersion", "0")
          .load())

Rows carry the table columns plus ``_op`` ('insert' | 'delete') and
``_version`` — the same retraction feed ``snapshots.read_row_changes``
derives in batch, so a downstream pipeline (materialized aggregate,
search index, replica) can apply exact deltas instead of rescanning.

Why this shape scales:

- **Offset = committed version number.** ``latestOffset`` is one
  manifest-listing away; no per-file bookkeeping in the checkpoint, and
  replaying (start, end] after a crash re-derives the identical file
  diff (manifests are immutable) — deterministic exactly-once.
- **Driver does offset arithmetic only.** The micro-batch plan is a
  manifest diff (O(files touched)); file BYTES are read executor-side
  via Arrow (``read`` yields RecordBatches), so a backlog drains at
  cluster width.
- **Compactions are invisible** (logical no-ops, skipped by the diff),
  and MERGE/DELETE commits surface as delete(old files) + insert(new
  files) retraction pairs — O(change), never O(table).
- **Retention contract**: expiring a version older than a live stream's
  committed offset breaks the diff chain, exactly like expiring an IVM
  watermark — retention must keep at least the slowest consumer's
  offset (``startingVersion`` restart recovers otherwise).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StringType, StructField, StructType


def _manifest(path: str, version: int) -> dict:
    return json.loads(
        (Path(path) / "manifests" / f"{version}.json").read_text()
    )


def _versions(path: str) -> list[int]:
    mdir = Path(path) / "manifests"
    if not mdir.exists():
        return []
    return sorted(int(p.stem) for p in mdir.glob("*.json") if p.stem.isdigit())


def _change_files(
    path: str, from_version: int, to_version: int
) -> list[tuple[str, str, int]]:
    """(file, op, version) tuples for commits in (from_version,
    to_version] — the same consecutive-present-manifest diff as
    ``snapshots.read_row_changes`` (compactions skipped; an expired
    intermediate version folds into the next surviving diff)."""
    # Driver-side only (partitions()); imported here so executors never
    # need the snapshots module to unpickle the reader.
    from receiptanalyzerpipeline_spark.sources.snapshots import _diff_file_sets

    present = [v for v in _versions(path) if from_version <= v <= to_version]
    if from_version >= 0 and (not present or present[0] != from_version):
        raise FileNotFoundError(
            f"version {from_version} at {path} expired; the CDC stream "
            "cannot derive changes (retention must keep consumer offsets)"
        )
    prev_m: dict = _manifest(path, from_version) if from_version >= 0 else {}
    out: list[tuple[str, str, int]] = []
    for v in present:
        if v == from_version:
            continue
        m = _manifest(path, v)
        # Manifest-tree aware diff: group references shared by both sides
        # cancel without being opened — the micro-batch plan stays
        # O(changed groups) even on a 50k-file table.
        removed, added = _diff_file_sets(path, prev_m, m)
        if "compaction_of" not in m:
            for f in removed:
                out.append((f, "delete", v))
            for f in added:
                out.append((f, "insert", v))
        prev_m = m
    return out


@dataclass(frozen=True)
class ChangesPartition(InputPartition):
    files: tuple  # of (file, op, version)


def _lpt_bins(files: list[tuple[str, str, int]], n: int) -> list[ChangesPartition]:
    """Longest-processing-time binning by file size: balanced executor
    work even when change files are wildly uneven."""
    sized = sorted(
        files,
        key=lambda t: os.path.getsize(t[0]) if os.path.exists(t[0]) else 0,
        reverse=True,
    )
    bins: list[list] = [[] for _ in range(max(1, min(n, len(sized))))]
    loads = [0] * len(bins)
    for t in sized:
        i = loads.index(min(loads))
        bins[i].append(t)
        loads[i] += os.path.getsize(t[0]) if os.path.exists(t[0]) else 0
    return [ChangesPartition(files=tuple(b)) for b in bins if b]


class SnapshotCdcStreamReader(DataSourceStreamReader):
    def __init__(self, options, base_schema_json: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("snapshot_cdc requires a path: .option('path', table_dir)")
        self.num_partitions = int(options.get("numPartitions", "8"))
        self.starting = options.get("startingVersion")  # None = latest
        # Declared base schema (JSON — picklable) so executor-side reads
        # emit columns in order AND fill typed NULLs for columns a file
        # predates (schema evolution).
        self.base_schema_json = base_schema_json

    def initialOffset(self) -> dict:  # noqa: N802
        if self.starting is not None:
            # startingVersion=N means "include version N's changes".
            return {"version": int(self.starting) - 1}
        vs = _versions(self.path)
        return {"version": vs[-1] if vs else -1}

    def latestOffset(self) -> dict:  # noqa: N802
        vs = _versions(self.path)
        return {"version": vs[-1] if vs else -1}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        if end["version"] <= start["version"]:
            return [ChangesPartition(files=())]
        files = _change_files(self.path, start["version"], end["version"])
        if not files:
            return [ChangesPartition(files=())]
        return _lpt_bins(files, self.num_partitions)

    def read(self, partition: ChangesPartition) -> Iterator:
        # Executor-side Arrow reads: yield RecordBatches (vectorized),
        # appending the _op/_version columns to each file's batches.
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        arrow_schema = to_arrow_schema(StructType.fromJson(self.base_schema_json))
        for fpath, op, version in partition.files:
            raw = pq.read_table(fpath)
            n = raw.num_rows
            if n == 0:
                continue
            # Project onto the declared schema: typed NULLs for columns
            # this file predates (schema evolution), declared order.
            cols = [
                raw.column(f.name).cast(f.type)
                if f.name in raw.column_names
                else pa.nulls(n, type=f.type)
                for f in arrow_schema
            ]
            table = pa.table(cols, schema=arrow_schema)
            table = table.append_column("_op", pa.array([op] * n, pa.string()))
            table = table.append_column(
                "_version", pa.array([version] * n, pa.int64())
            )
            yield from table.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are self-contained version watermarks


class SnapshotCdcDataSource(DataSource):
    """``spark.dataSource.register(SnapshotCdcDataSource)`` then
    ``spark.readStream.format("snapshot_cdc").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_cdc"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("snapshot_cdc requires a path option")
        vs = _versions(path)
        if not vs:
            raise FileNotFoundError(f"no committed version at {path}")
        sch = _manifest(path, vs[-1]).get("schema")
        if sch is None:
            raise ValueError(
                f"{path} has no schema in its manifest (pre-round-5 table); "
                "recommit or compact once to record it"
            )
        base = StructType.fromJson(sch)
        from pyspark.sql.types import LongType

        return StructType(
            list(base.fields)
            + [
                StructField("_op", StringType(), False),
                StructField("_version", LongType(), False),
            ]
        )

    def streamReader(self, schema: StructType) -> SnapshotCdcStreamReader:  # noqa: N802
        base = StructType([f for f in schema.fields if f.name not in ("_op", "_version")])
        return SnapshotCdcStreamReader(self.options, base.jsonValue())
