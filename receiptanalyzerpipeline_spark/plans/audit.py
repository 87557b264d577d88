"""Physical-plan audit: the engine's scale invariants as a runnable tool.

SCALE.md states the 100 TB posture in prose; tests/test_plan_shapes.py
freezes it for a handful of marquee queries. This module makes it an
operator a USER can run over any DataFrame (or the whole registry) before
pointing a job at a cluster:

    from receiptanalyzerpipeline_spark.plans.audit import audit_plan
    findings = audit_plan(df, name="my_query")

The audit walks the physical-plan TREE (pre-AQE, so structure is stable
across runtime re-planning) rather than grepping plan text — hazards are
defined by node class plus CONTEXT (what consumes the node), which is what
separates a presentation `orderBy` from a sort that feeds a join:

- ``cartesian_product``     — CartesianProductExec: O(n·m) pair blow-up.
- ``broadcast_nested_loop`` — BroadcastNestedLoopJoinExec: per-row scan of
                              the broadcast side. Only sane when that side
                              is provably O(1) rows (k centroids, 1-row
                              totals) — callers allowlist those cases with
                              a written justification.
- ``python_row_udf``        — BatchEvalPythonExec: row-at-a-time Python
                              with pickle transfer. Arrow-batched
                              boundaries (ArrowEvalPython, MapInPandas,
                              FlatMapGroupsInPandas, MapInArrow) do not
                              trigger this.
- ``unpartitioned_window``  — a window function with an empty PARTITION BY:
                              every row flows through ONE task regardless
                              of cluster size. Exempt when a LIMIT sits
                              below it (the input is bounded by
                              construction, e.g. numbering k seed rows).
- ``computed_global_sort``  — a global (range-exchange) sort whose output
                              feeds further computation (join/aggregate/
                              window/generate). A final presentation sort —
                              consumed only by project/union/limit/root —
                              is NOT flagged: bounded result ordering is
                              how every query presents deterministically.

The audit reports; POLICY lives with the caller (tests allowlist specific
(query, hazard) pairs, so every exception is documented and new ones fail
loudly)."""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanFinding:
    query: str
    hazard: str
    detail: str

    def __str__(self) -> str:  # readable pytest diffs
        return f"{self.query}: {self.hazard} ({self.detail})"


@dataclass
class _Node:
    cls: str
    raw: dict
    children: list


def _physical_tree(df: DataFrame) -> _Node:
    """Physical plan as a tree (AQE wrapper unwrapped; build-only, the
    query never executes)."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.inputPlan()
    nodes = json.loads(plan.toJSON())

    def build(i: int) -> tuple[_Node, int]:
        raw = nodes[i]
        node = _Node(cls=raw["class"].rsplit(".", 1)[-1], raw=raw, children=[])
        j = i + 1
        for _ in range(int(raw.get("num-children", 0))):
            child, j = build(j)
            node.children.append(child)
        return node, j

    root, _ = build(0)
    return root


# Consumers that preserve "this is just presentation output" status.
_PRESENTATION = {
    "ProjectExec",
    "UnionExec",
    "SortExec",
    "CollectLimitExec",
    "GlobalLimitExec",
    "LocalLimitExec",
    "TakeOrderedAndProjectExec",
    "SerializeFromObjectExec",
    "DeserializeToObjectExec",
    "ColumnarToRowExec",
    "InputAdapter",
    "WholeStageCodegenExec",
}


def _is_global_sort(n: _Node) -> bool:
    return n.cls == "SortExec" and bool(n.raw.get("global"))


def _window_partition_spec(n: _Node):
    return n.raw.get("partitionSpec", [])


_BOUNDING_NODES = {"GlobalLimitExec", "CollectLimitExec", "TakeOrderedAndProjectExec"}

# Row-multiplying unary nodes: a limit BELOW one of these does not bound the
# rows arriving above it (explode fan-out is per-row unbounded).
_ROW_MULTIPLYING = {"GenerateExec", "ExpandExec"}


def _has_limit_below(n: _Node) -> bool:
    """True iff a limit node provably bounds ``n``'s input cardinality.

    ADVICE r4 fix: only traverse paths where the limit's bound survives to
    ``n`` — single-child nodes that don't multiply rows. Stop at joins,
    unions and cogroups (a limit on ONE side of a multi-child node says
    nothing about the node's output) and at Generate/Expand (per-row
    fan-out). Aggregates/filters/projects/exchanges are row-non-increasing
    or row-preserving, so the bound propagates through them.
    """
    stack = list(n.children)
    while stack:
        x = stack.pop()
        if x.cls in _BOUNDING_NODES:
            return True
        if len(x.children) > 1 or x.cls in _ROW_MULTIPLYING:
            continue
        stack.extend(x.children)
    return False


def audit_plan(df: DataFrame, name: str = "<df>") -> list[PlanFinding]:
    """Scan one DataFrame's physical plan for scale hazards."""
    findings: list[PlanFinding] = []
    root = _physical_tree(df)

    def walk(n: _Node, computed_above: bool) -> None:
        if n.cls == "CartesianProductExec":
            findings.append(PlanFinding(name, "cartesian_product", n.cls))
        elif n.cls == "BroadcastNestedLoopJoinExec":
            findings.append(PlanFinding(name, "broadcast_nested_loop", n.cls))
        elif n.cls == "BatchEvalPythonExec":
            findings.append(PlanFinding(name, "python_row_udf", n.cls))
        elif (
            n.cls in ("WindowExec", "WindowGroupLimitExec")
            and not _window_partition_spec(n)
            and not _has_limit_below(n)
        ):
            findings.append(PlanFinding(name, "unpartitioned_window", n.cls))
        elif _is_global_sort(n) and computed_above:
            findings.append(
                PlanFinding(name, "computed_global_sort", "global sort feeds computation")
            )
        below_is_computed = computed_above or n.cls not in _PRESENTATION
        for c in n.children:
            walk(c, below_is_computed)

    walk(root, computed_above=False)
    return findings


def plan_metrics(df: DataFrame) -> dict[str, int]:
    """Shuffle/boundary counts for quick plan diffing: total exchanges,
    hash exchanges, Python boundaries (from the executed plan TEXT, which
    includes EnsureRequirements' exchanges; codegen spans are an AQE
    runtime artifact and deliberately not counted pre-execution)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": plan.count("Exchange "),
        "hash_exchanges": plan.count("Exchange hashpartitioning"),
        "arrow_python_boundaries": (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
            + plan.count("MapInArrow")
        ),
        "python_row_boundaries": plan.count("BatchEvalPython"),
    }


def audit_registry(spark, sf_dir: str, names: list[str] | None = None) -> list[PlanFinding]:
    """Audit every registered query's plan (build-only, nothing executes).

    This is the preflight a reference user runs after adding a query:
    zero findings (or a consciously-allowlisted one) before it ships.

    Beyond the plan-tree hazards, this flags ``eager_builder``: a
    registry builder that runs Spark JOBS during plan CONSTRUCTION
    (VERDICT r9 task 7). A builder's contract is to declare a lazy plan;
    a driver action inside it (count(), first(), a materializing write)
    executes corpus-sized work before the user ever asks for a row, and
    re-executes it on every plan re-build. The one legitimate exception
    is a query whose SUBJECT is an execution (the streaming-equivalence
    probe replays a checkpointed topology — the run IS the result);
    callers allowlist those by (query, 'eager_builder') with a written
    justification, exactly like the plan-tree hazards."""
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    sc = spark.sparkContext
    # Pre-warm schema inference THROUGH the catalog's memoized scans: the
    # FIRST read of a parquet file in a session runs a 1-task footer job
    # (Spark's distributed schema inference), and catalog.table memoizes
    # per (session, sf_dir, name) — so whichever builder first touches a
    # table would otherwise absorb that one-time job and masquerade as
    # an eager_builder finding.
    from receiptanalyzerpipeline_spark.catalog import TABLES, table as _table

    for t in TABLES:
        try:
            _table(spark, sf_dir, t).schema
        except Exception:  # noqa: BLE001 — missing optional table in a partial sf_dir
            pass

    findings: list[PlanFinding] = []
    for qname in sorted(names or REGISTRY):
        group = f"plan-audit-build-{qname}"
        sc.setJobGroup(group, "registry builders must construct lazily")
        try:
            df = REGISTRY[qname].spark(spark, sf_dir)
        finally:
            sc.setJobGroup("", "")
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        if jobs:
            findings.append(
                PlanFinding(
                    qname,
                    "eager_builder",
                    f"{len(jobs)} Spark job(s) ran during plan construction",
                )
            )
        findings.extend(audit_plan(df, name=qname))
    return findings
