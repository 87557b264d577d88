"""SQL front door (VERDICT r4 task 5): ``engine.sql("SELECT ...")``.

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


class EngineSession:
    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        work_dir: str | None = None,
        on_hazard: str = "warn",
        snapshot_tables: dict[str, str] | None = None,
    ):
        if on_hazard not in ("warn", "error", "ignore"):
            raise ValueError("on_hazard must be warn|error|ignore")
        self.spark = spark
        self.on_hazard = on_hazard
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
        if changes_from is not None:
            read_row_changes(self.spark, path, changes_from).createOrReplaceTempView(
                f"{name}_changes"
            )
            self.views.append(f"{name}_changes")

    def sql(self, statement: str, name: str = "<sql>") -> DataFrame:
        """Parse + plan the statement, preflight the physical plan for
        scale hazards, and return the (still lazy) DataFrame."""
        df = self.spark.sql(statement)
        if self.on_hazard == "ignore":
            return df
        findings = audit_plan(df, name)
        if findings:
            if self.on_hazard == "error":
                raise SqlHazardError(findings)
            for f in findings:
                print(
                    f"# plan-audit WARNING [{f.query}]: {f.hazard} ({f.detail})",
                    file=sys.stderr,
                )
        return df


def _try_parquet(spark: SparkSession, path: str) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
        df.schema  # force resolution so a missing path fails HERE
        return df
    except AnalysisException:
        return None
