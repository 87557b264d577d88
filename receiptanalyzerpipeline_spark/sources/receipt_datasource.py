"""The receipt landing zone as a native Spark 4 Python DataSource.

Reference parity: the watcher topology (`/root/reference/anarcpt/watcher.py:32-147`)
polls landing directories, waits for files to become size-stable, and hands
complete images one at a time to the OCR stage. This module expresses that
contract as a first-class source the engine can mount with

    spark.read.format("receipts").load(landing_dir)          # backlog scan
    spark.readStream.format("receipts").load(landing_dir)    # watcher

so the landing zone participates in Catalyst planning like any other table
instead of living in a side thread (the reference's busy-spin worker,
SURVEY §7.4 T8).

Scale design, in the terms the batch/stream planners see:

- **Partition planning** (batch): the driver lists once, then bins files
  into ``numPartitions`` InputPartitions by greedy longest-processing-time
  on file size, so one 4 GB scan cannot straggle a task while 31 cores idle.
  Listing is the only driver-side work; bytes are read executor-side.
- **Filter pushdown at LISTING time** (batch): ``img_id``/``path``
  equality and prefix predicates prune files before partitions are even
  planned — the pruned files are never assigned to an executor, the
  moral equivalent of partition pruning for a directory source.
- **Bounded streaming offsets**: the stream offset is the ``(mtime_ns,
  name)`` watermark of the newest ingested file — O(1) regardless of how
  many files ever landed (a seen-set offset would grow forever). Replay
  between two committed offsets is deterministic because the ingestion
  contract is write-then-rename (a renamed file's mtime/name never
  change), the same atomicity streaming/ingest.py documents for the
  binaryFile source.

Caveat shared with Spark's own file source: a file that lands with an
mtime *behind* the committed watermark (clock skew, `cp -p`) is skipped;
production landing zones should rename into place without preserving
source mtimes.
"""

from __future__ import annotations

import fnmatch
import os
import time
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterator, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    InputPartition,
    StringStartsWith,
)
from pyspark.sql.types import StructType

DEFAULT_GLOBS = ("*.png", "*.jpg", "*.jpeg")

# img_id is the filename stem — the natural key every downstream transform
# (with_ahash, ocr_with_cache, pivot_receipt_summary) joins on.
RECEIPTS_SCHEMA_DDL = (
    "img_id string, path string, modification_time timestamp_ntz, "
    "length bigint, content binary"
)


def _globs(options) -> tuple[str, ...]:
    raw = options.get("glob", ",".join(DEFAULT_GLOBS))
    return tuple(g.strip() for g in raw.split(",") if g.strip())


def _list_files(path: str, globs: Sequence[str]) -> list[tuple[str, str, int, int]]:
    """One driver-side listing pass: (img_id, abspath, mtime_ns, size),
    name-sorted for deterministic planning."""
    out = []
    with os.scandir(path) as entries:
        for e in entries:
            if not e.is_file():
                continue
            if not any(fnmatch.fnmatch(e.name, g) for g in globs):
                continue
            st = e.stat()
            img_id = os.path.splitext(e.name)[0]
            out.append((img_id, e.path, st.st_mtime_ns, st.st_size))
    out.sort(key=lambda f: f[1])
    return out


def _row(img_id: str, fpath: str, mtime_ns: int, size: int) -> Tuple:
    ts = datetime.fromtimestamp(mtime_ns / 1e9, tz=timezone.utc).replace(tzinfo=None)
    with open(fpath, "rb") as fh:
        content = fh.read()
    return (img_id, fpath, ts, size, content)


@dataclass
class FilesPartition(InputPartition):
    files: tuple  # of (img_id, path, mtime_ns, size)


def _lpt_bins(files: list, num_partitions: int) -> list[FilesPartition]:
    """Greedy longest-processing-time binning by file size: the biggest
    file goes to the currently-lightest bin, so one huge scan can't
    straggle a task while the other cores idle."""
    n = max(1, min(num_partitions, len(files)))
    bins: list[list] = [[] for _ in range(n)]
    loads = [0] * n
    for f in sorted(files, key=lambda f: (-f[3], f[1])):
        i = loads.index(min(loads))
        bins[i].append(f)
        loads[i] += f[3]
    return [FilesPartition(files=tuple(b)) for b in bins if b]


class ReceiptBatchReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("receipts source requires a path: .load(landing_dir)")
        self.globs = _globs(options)
        self.num_partitions = int(options.get("numPartitions", "8"))
        self.eq: dict[str, set] = {}
        self.prefix: dict[str, list] = {}

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        """Accept img_id/path equality and prefix filters; everything else
        stays with Spark. Accepted filters prune the driver-side listing."""
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1 and f.attribute[0] in (
                "img_id",
                "path",
            ):
                self.eq.setdefault(f.attribute[0], set()).add(f.value)
            elif isinstance(f, StringStartsWith) and len(f.attribute) == 1 and f.attribute[
                0
            ] in ("img_id", "path"):
                self.prefix.setdefault(f.attribute[0], []).append(f.value)
            else:
                yield f

    def _keep(self, img_id: str, fpath: str) -> bool:
        vals = {"img_id": img_id, "path": fpath}
        for col, allowed in self.eq.items():
            if vals[col] not in allowed:
                return False
        for col, prefixes in self.prefix.items():
            if not any(vals[col].startswith(p) for p in prefixes):
                return False
        return True

    def partitions(self) -> Sequence[InputPartition]:
        files = [f for f in _list_files(self.path, self.globs) if self._keep(f[0], f[1])]
        if not files:
            return [FilesPartition(files=())]
        return _lpt_bins(files, self.num_partitions)

    def read(self, partition: FilesPartition) -> Iterator[Tuple]:
        for img_id, fpath, mtime_ns, size in partition.files:
            yield _row(img_id, fpath, mtime_ns, size)


class ReceiptStreamReader(DataSourceStreamReader):
    """Directory watcher with O(1) watermark offsets and executor-side reads.

    Offset = ``{"mtime_ns": int, "names": [str, ...]}`` — the newest mtime
    seen plus the basenames of ALL files already ingested AT that boundary
    mtime. A micro-batch is every file strictly newer than the start
    watermark, plus files AT the start mtime whose name is not yet in the
    start set (bounded above by the end offset the same way). The boundary
    name-set is what makes coarse mtime granularity safe: on a 1 s / 1 ms
    filesystem many files routinely share the newest timestamp, and a file
    landing at the committed boundary mtime with a lexically smaller name
    must still be picked up — a plain (mtime, name) watermark would skip it
    forever (silent data loss, found by the round-4 advisor). The offset
    stays small: it carries names for ONE timestamp only, never the full
    history. Legacy ``{"mtime_ns", "name"}`` checkpoints are read as a
    single-name boundary set.

    POSIX ``rename`` preserves mtime, so under the write-then-rename
    landing contract a slow writer can land a file whose mtime is already
    STRICTLY BEHIND the committed watermark. ``maturityMs`` closes that
    window: ``latestOffset`` never claims files younger than
    ``now - maturityMs``, so as long as write→rename lag stays under the
    configured maturity, a late-renamed file always lands at-or-above the
    un-advanced watermark (the at-boundary case is then covered by the
    name-set). Default 0 keeps the original claim-immediately behavior for
    writers that touch mtime on completion.

    Files are immutable once renamed into the landing dir, so replaying
    (start, end] after a crash re-lists the same file set — deterministic
    exactly-once with the checkpoint. (Corollary: retention/cleanup jobs
    must only delete files already BEHIND the committed watermark, or the
    newest-listed offset could regress across a restart.) The full DataSourceStreamReader API
    (not the Simple variant) keeps the driver's work at offset arithmetic
    plus one listing; file BYTES are only ever read inside executor tasks,
    which is what lets a backlog drain at cluster width.
    """

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("receipts source requires a path: .load(landing_dir)")
        self.globs = _globs(options)
        self.num_partitions = int(options.get("numPartitions", "8"))
        self.maturity_ns = int(options.get("maturityMs", "0")) * 1_000_000
        self._hwm: dict | None = None  # intra-run monotonicity clamp

    def initialOffset(self) -> dict:  # noqa: N802
        return {"mtime_ns": -1, "names": []}

    @staticmethod
    def _boundary(off: dict) -> tuple[int, frozenset]:
        """(mtime_ns, ingested-names-at-that-mtime); accepts legacy
        single-name offsets from pre-round-5 checkpoints."""
        if "names" in off:
            return off["mtime_ns"], frozenset(off["names"])
        return off["mtime_ns"], (
            frozenset((off["name"],)) if off.get("name") else frozenset()
        )

    @staticmethod
    def _selected(mtime_ns: int, name: str, start: tuple, end: tuple) -> bool:
        s_mt, s_names = start
        e_mt, e_names = end
        after_start = mtime_ns > s_mt or (mtime_ns == s_mt and name not in s_names)
        at_or_before_end = mtime_ns < e_mt or (mtime_ns == e_mt and name in e_names)
        return after_start and at_or_before_end

    def latestOffset(self) -> dict:  # noqa: N802
        newest_mt, names = -1, []
        claim_ceiling = time.time_ns() - self.maturity_ns if self.maturity_ns else None
        for _img_id, fpath, mtime_ns, _size in _list_files(self.path, self.globs):
            if claim_ceiling is not None and mtime_ns > claim_ceiling:
                continue  # too young: may still have unrenamed siblings
            if mtime_ns > newest_mt:
                newest_mt, names = mtime_ns, [os.path.basename(fpath)]
            elif mtime_ns == newest_mt:
                names.append(os.path.basename(fpath))
        off = {"mtime_ns": newest_mt, "names": sorted(names)}
        # Never regress within a run (wall-clock stepping backwards under a
        # maturity ceiling would otherwise shrink the offset, and Spark
        # commits whatever latestOffset returns). Listings themselves are
        # monotone: landing files are immutable and retention must not
        # delete past the committed watermark (see class docstring).
        if self._hwm is not None and self._boundary(off) < self._boundary(self._hwm):
            return self._hwm
        self._hwm = off
        return off

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = self._boundary(start), self._boundary(end)
        files = [
            f
            for f in _list_files(self.path, self.globs)
            if self._selected(f[2], os.path.basename(f[1]), lo, hi)
        ]
        if not files:
            return [FilesPartition(files=())]
        return _lpt_bins(files, self.num_partitions)

    def read(self, partition: FilesPartition) -> Iterator[Tuple]:
        for img_id, fpath, mtime_ns, size in partition.files:
            yield _row(img_id, fpath, mtime_ns, size)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean: offsets are self-contained watermarks


class ReceiptDataSource(DataSource):
    """``spark.dataSource.register(ReceiptDataSource)`` then
    ``spark.read.format("receipts")`` / ``spark.readStream.format("receipts")``."""

    @classmethod
    def name(cls) -> str:
        return "receipts"

    def schema(self) -> str:
        return RECEIPTS_SCHEMA_DDL

    def reader(self, schema: StructType) -> ReceiptBatchReader:
        return ReceiptBatchReader(self.options)

    def streamReader(self, schema: StructType) -> ReceiptStreamReader:  # noqa: N802
        return ReceiptStreamReader(self.options)
