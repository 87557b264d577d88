"""SQL front door (VERDICT r4 task 5; writes + time travel r5 task 7):
``engine.sql("SELECT ...")`` — and the write verbs against snapshot
tables, so a user can create → insert → merge → time-travel-select a
table without leaving SQL:

    CREATE TABLE t [LOCATION '/p'] AS SELECT ...   → write_snapshot v0
    INSERT INTO t <SELECT ...|VALUES ...>          → append commit
    MERGE INTO t USING (<query>|view) ON (k, ...)  → merge_upsert (SCD1)
    DELETE FROM t WHERE <predicate>                → delete_where
    SELECT ... FROM t FOR VERSION AS OF 3          → time-travel view sugar
    SELECT ... FROM t FOR TIMESTAMP AS OF '<iso>'  → (or epoch seconds)

Every statement's SOURCE plan goes through the same scale-hazard audit
preflight as reads; write verbs execute eagerly (they commit a version)
and return a one-row DataFrame (table, version). MERGE here is the
engine's SCD1 upsert (matched rows replaced, unmatched inserted) — WHEN
clauses are not parsed.

The engine's typed query catalog (plans/REGISTRY) is the verified surface,
but an analytics engine's first-touch UX is ad-hoc SQL. ``EngineSession``
is a thin wrapper that

- registers the sf parquet tables (catalog.TABLES) as temp views — the
  same lazy scans the typed queries use, so predicate pushdown, column
  pruning, and the nanos-timestamp normalization all apply;
- registers any curated receipt tables found under a work dir
  (``receipt_summary``, ``receipt_line_item``, ``raw_zone``) the
  ``analyze --write`` path produced;
- runs EVERY submitted statement's physical plan through the scale-hazard
  audit (plans/audit.py — cartesian products, row-Python, unpartitioned
  windows, computation-feeding global sorts) as a PREFLIGHT, before any
  job runs. Policy: ``warn`` (default) prints findings to stderr and
  returns the DataFrame, ``error`` raises ``SqlHazardError``, ``ignore``
  skips the audit. The audit inspects the compiled plan only — no job is
  triggered by the preflight itself.

This is the interactive twin of the CLI's registry-wide ``audit``
subcommand: the registry queries are audited in bulk at test time; user
SQL is audited per-statement at submission time.
"""

from __future__ import annotations

import re
import sys

from pyspark.sql import DataFrame, SparkSession

from receiptanalyzerpipeline_spark.catalog import TABLES, table
from receiptanalyzerpipeline_spark.plans.audit import PlanFinding, audit_plan

CURATED_TABLES: tuple[str, ...] = ("receipt_summary", "receipt_line_item", "raw_zone")


class SqlHazardError(Exception):
    """Raised in on_hazard='error' mode; carries the audit findings."""

    def __init__(self, findings: list[PlanFinding]):
        self.findings = findings
        lines = "; ".join(f"{f.hazard} ({f.detail})" for f in findings)
        super().__init__(
            f"statement's physical plan has {len(findings)} scale hazard(s): {lines}"
        )


_CTAS_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(\w+)\s*(?:LOCATION\s+'([^']+)'\s*)?AS\s+(.+)$",
    re.I | re.S,
)
_INSERT_RE = re.compile(r"^\s*INSERT\s+INTO\s+(\w+)\s+(.+)$", re.I | re.S)
_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(\w+)\s+USING\s+(.+?)\s+ON\s+\(([\w\s,]+)\)\s*;?\s*$",
    re.I | re.S,
)
_DELETE_RE = re.compile(r"^\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+)$", re.I | re.S)
_ASOF_RE = re.compile(
    r"\b(\w+)\s+FOR\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+('[^']*'|[\d.]+)", re.I
)


class EngineSession:
    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        work_dir: str | None = None,
        on_hazard: str = "warn",
        snapshot_tables: dict[str, str] | None = None,
        table_root: str | None = None,
    ):
        if on_hazard not in ("warn", "error", "ignore"):
            raise ValueError("on_hazard must be warn|error|ignore")
        self.spark = spark
        self.on_hazard = on_hazard
        self.table_root = table_root
        self.snapshot_paths: dict[str, str] = dict(snapshot_tables or {})
        self.views: list[str] = []
        from receiptanalyzerpipeline_spark.functions.udtf import register_udtfs

        register_udtfs(spark)  # engine UDTFs available to ad-hoc SQL
        if sf_dir:
            for name in TABLES:
                table(spark, sf_dir, name).createOrReplaceTempView(name)
                self.views.append(name)
        if work_dir:
            for name in CURATED_TABLES:
                df = _try_parquet(spark, f"{work_dir}/{name}")
                if df is not None:
                    df.createOrReplaceTempView(name)
                    self.views.append(name)
        # Snapshot tables (sources/snapshots.py): the LATEST committed
        # version as a view — manifest-defined, so concurrent commits
        # never expose partial writes to a running query.
        for name, spath in (snapshot_tables or {}).items():
            from receiptanalyzerpipeline_spark.sources.snapshots import read_snapshot

            read_snapshot(spark, spath).createOrReplaceTempView(name)
            self.views.append(name)

    def snapshot(
        self,
        name: str,
        path: str,
        version: int | None = None,
        timestamp: float | None = None,
        changes_from: int | None = None,
    ) -> None:
        """Register a snapshot table for ad-hoc SQL: ``name`` is the
        table AS OF ``version`` or AS OF ``timestamp`` (default: latest —
        time travel is just registering an older state under its own
        name). With ``changes_from``, also registers ``{name}_changes`` —
        the row-level retraction feed (_op/_version columns) since that
        version, queryable like any table."""
        from receiptanalyzerpipeline_spark.sources.snapshots import (
            read_row_changes,
            read_snapshot,
        )

        read_snapshot(
            self.spark, path, version=version, timestamp=timestamp
        ).createOrReplaceTempView(name)
        self.views.append(name)
        self.snapshot_paths[name] = path
        if changes_from is not None:
            read_row_changes(self.spark, path, changes_from).createOrReplaceTempView(
                f"{name}_changes"
            )
            self.views.append(f"{name}_changes")

    def sql(self, statement: str, name: str = "<sql>") -> DataFrame:
        """Route the statement: snapshot-table write verbs execute
        eagerly (they commit a version) and return (table, version);
        everything else is parsed + planned, preflighted for scale
        hazards, and returned as a (still lazy) DataFrame. Time-travel
        clauses (``FOR VERSION|TIMESTAMP AS OF``) are rewritten into
        version-pinned temp views before planning."""
        for matcher, handler in (
            (_CTAS_RE, self._ctas),
            (_INSERT_RE, self._insert),
            (_MERGE_RE, self._merge),
            (_DELETE_RE, self._delete),
        ):
            mt = matcher.match(statement)
            if mt:
                return handler(mt, name)
        statement = self._rewrite_time_travel(statement)
        df = self.spark.sql(statement)
        self._preflight(df, name)
        return df

    def _preflight(self, df: DataFrame, name: str) -> None:
        if self.on_hazard == "ignore":
            return
        findings = audit_plan(df, name)
        if findings:
            if self.on_hazard == "error":
                raise SqlHazardError(findings)
            for f in findings:
                print(
                    f"# plan-audit WARNING [{f.query}]: {f.hazard} ({f.detail})",
                    file=sys.stderr,
                )

    # -- write verbs (snapshot tables) ----------------------------------

    def _table_path(self, tname: str) -> str:
        try:
            return self.snapshot_paths[tname]
        except KeyError:
            raise ValueError(
                f"{tname!r} is not a registered snapshot table; CREATE TABLE "
                "it first, or register it via snapshot()/snapshot_tables"
            ) from None

    def _commit_result(self, tname: str, version: int) -> DataFrame:
        # Re-register the view at the new head so follow-up SELECTs see it.
        from receiptanalyzerpipeline_spark.sources.snapshots import read_snapshot

        read_snapshot(self.spark, self.snapshot_paths[tname]).createOrReplaceTempView(
            tname
        )
        return self.spark.createDataFrame(
            [(tname, version)], "table string, version long"
        )

    def _ctas(self, mt: re.Match, name: str) -> DataFrame:
        from receiptanalyzerpipeline_spark.sources.snapshots import write_snapshot

        tname, location, query = mt.group(1), mt.group(2), mt.group(3)
        if tname in self.snapshot_paths:
            raise ValueError(f"snapshot table {tname!r} already exists")
        if location is None:
            if self.table_root is None:
                raise ValueError(
                    "CREATE TABLE needs LOCATION '<dir>' (no table_root configured)"
                )
            location = f"{self.table_root}/{tname}"
        src = self.spark.sql(self._rewrite_time_travel(query))
        self._preflight(src, name)  # hazards block the write, not just the read
        version = write_snapshot(src, location)
        self.snapshot_paths[tname] = location
        self.views.append(tname)
        return self._commit_result(tname, version)

    def _insert(self, mt: re.Match, name: str) -> DataFrame:
        from receiptanalyzerpipeline_spark.sources.snapshots import write_snapshot

        tname, query = mt.group(1), mt.group(2)
        path = self._table_path(tname)
        src = self.spark.sql(self._rewrite_time_travel(query))
        if re.match(r"^\s*VALUES\b", query, re.I):
            # A bare VALUES source plans with positional col1/col2/...
            # names; map it positionally onto the target schema so the
            # append schema check sees the table's own column names.
            from receiptanalyzerpipeline_spark.sources import snapshots as snap

            cols = snap.read_snapshot(self.spark, path).columns
            if len(src.columns) != len(cols):
                raise ValueError(
                    f"INSERT INTO {tname} VALUES arity {len(src.columns)} "
                    f"!= table arity {len(cols)}"
                )
            src = src.toDF(*cols)
        self._preflight(src, name)
        return self._commit_result(tname, write_snapshot(src, path, mode="append"))

    def _merge(self, mt: re.Match, name: str) -> DataFrame:
        from receiptanalyzerpipeline_spark.sources.snapshots import merge_upsert

        tname, using, keys = mt.group(1), mt.group(2).strip(), mt.group(3)
        path = self._table_path(tname)
        if using.startswith("(") and using.endswith(")"):
            using = using[1:-1]
        src = self.spark.sql(self._rewrite_time_travel(using))
        self._preflight(src, name)
        key_cols = [k.strip() for k in keys.split(",") if k.strip()]
        return self._commit_result(
            tname, merge_upsert(self.spark, src, path, key_cols)
        )

    def _delete(self, mt: re.Match, name: str) -> DataFrame:
        from receiptanalyzerpipeline_spark.sources.snapshots import delete_where

        tname, predicate = mt.group(1), mt.group(2).rstrip("; \n")
        path = self._table_path(tname)
        return self._commit_result(tname, delete_where(self.spark, path, predicate))

    # -- time travel sugar ----------------------------------------------

    def _rewrite_time_travel(self, statement: str) -> str:
        """``t FOR VERSION AS OF 3`` / ``t FOR TIMESTAMP AS OF '<iso>'``
        (or epoch seconds) → a temp view pinned to that state, substituted
        into the statement. Registering an old state as a view IS the
        engine's time-travel read (snapshots are manifest-defined), so
        the sugar adds syntax, not a second read path."""

        def _sub(mt: re.Match) -> str:
            from receiptanalyzerpipeline_spark.sources.snapshots import read_snapshot

            tname, kind, lit = mt.group(1), mt.group(2).upper(), mt.group(3)
            path = self._table_path(tname)
            if kind == "VERSION":
                version = int(float(lit))
                view = f"{tname}__v{version}"
                df = read_snapshot(self.spark, path, version=version)
            else:
                if lit.startswith("'"):
                    from datetime import datetime, timezone

                    dt = datetime.fromisoformat(lit.strip("'"))
                    if dt.tzinfo is None:
                        dt = dt.replace(tzinfo=timezone.utc)
                    ts = dt.timestamp()
                else:
                    ts = float(lit)
                df = read_snapshot(self.spark, path, timestamp=ts)
                view = f"{tname}__ts{str(ts).replace('.', '_').replace('-', 'm')}"
            df.createOrReplaceTempView(view)
            self.views.append(view)
            return view

        return _ASOF_RE.sub(_sub, statement)


def _try_parquet(spark: SparkSession, path: str) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
        df.schema  # force resolution so a missing path fails HERE
        return df
    except AnalysisException:
        return None
