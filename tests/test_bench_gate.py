"""Mechanical bench gate (VERDICT r4 task 1; artifact form VERDICT r5
task 2). bench.py records its floor-check outcome in BENCH_GATE.json on
every default-sf run; the gate test here validates that record — always,
no skip, no second Spark JVM mid-suite (concurrent JVMs are the r03→r04
phantom-regression cause root-caused in BASELINE.md)."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_floors_file_matches_bench_set():
    with open(os.path.join(REPO, "BENCH_FLOORS.json")) as f:
        floors = json.load(f)
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    bench_names = {name for name, q in REGISTRY.items() if q.bench}
    assert set(floors["reference"]) == bench_names, (
        "BENCH_FLOORS.json must cover exactly the bench-flagged registry queries; "
        "re-measure on a quiet host after adding/removing a headline query"
    )


def test_check_floors_logic():
    with open(os.path.join(REPO, "BENCH_FLOORS.json")) as f:
        floors = json.load(f)
    ref = floors["reference"]
    # At exactly the reference: no violations.
    assert bench.check_floors(dict(ref)) == []
    # Within the absolute slack on a tiny query: no violation.
    name_small = min(ref, key=ref.get)
    ok = dict(ref)
    ok[name_small] = ref[name_small] + 0.049
    assert bench.check_floors(ok) == []
    # Past both the ratio and the slack: flagged.
    bad = dict(ref)
    name_big = max(ref, key=ref.get)
    bad[name_big] = ref[name_big] * 1.3 + 0.051
    out = bench.check_floors(bad)
    assert len(out) == 1 and name_big in out[0]
    # A query missing from the run (renamed/removed) is not a violation here;
    # test_floors_file_matches_bench_set catches set drift instead.
    partial = {k: v for k, v in ref.items() if k != name_big}
    assert bench.check_floors(partial) == []


def test_bench_gate_artifact_current_and_clean():
    """The per-round bench gate, enforced WITHOUT a mid-suite Spark
    subprocess (a second JVM under pytest is exactly the contention that
    produced the r03→r04 phantom regressions): every bench.py run at the
    default sf records its floor-check outcome in BENCH_GATE.json, and
    this test FAILS — never skips — when that record is missing, covers
    a different query set than the committed floors (stale: a headline
    query was added/removed without re-running the bench), or contains
    violations. The driver runs bench.py every round, so a green suite
    means the latest quiet-host bench genuinely met the floors."""
    gate_path = os.path.join(REPO, "BENCH_GATE.json")
    assert os.path.exists(gate_path), (
        "BENCH_GATE.json missing — run `python bench.py` on a quiet host "
        "(the per-round bench run records it)"
    )
    with open(gate_path) as f:
        gate = json.load(f)
    with open(os.path.join(REPO, "BENCH_FLOORS.json")) as f:
        floors = json.load(f)
    assert set(gate["queries"]) == set(floors["reference"]), (
        "BENCH_GATE.json is stale: its query set differs from "
        "BENCH_FLOORS.json — re-run `python bench.py` on a quiet host"
    )
    assert gate["floor_violations"] == [], gate["floor_violations"]
    # The recorded run must actually have been checked against the
    # CURRENT floors: re-derive violations from the recorded timings.
    assert bench.check_floors(gate["queries"]) == []
