"""Mechanical bench gate (VERDICT r4 task 1).

Full-bench enforcement runs only when SPARK_GRAFT_BENCH_GATE=1 because it
needs a quiet host (no concurrent Spark JVM — contention on sub-100 ms
measurements produces spurious failures, see the r03→r04 +27% noise episode
root-caused in BASELINE.md). The floor *logic* is always unit-tested.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

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


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_BENCH_GATE") != "1",
    reason="full bench gate needs a quiet host; set SPARK_GRAFT_BENCH_GATE=1",
)
def test_bench_meets_committed_floors():
    env = dict(os.environ, SPARK_GRAFT_BENCH_REPS="5")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out.get("floor_violations", []) == []
