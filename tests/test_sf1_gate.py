"""sf1 floor gate (VERDICT r8 task 7): the committed SF1_SWEEP.json must
satisfy the committed SF1_FLOORS.json slow-tail bounds, mirroring
tests/test_bench_gate.py. The round-8 sf1 regressions (count()-pruned
timings, the four duplication diseases) were only caught by a MANUAL
sweep read; this gate makes the catch mechanical: a rep-collapse
regression that turns a 10 s suite back into 90+ s fails the suite."""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "sf1_sweep", os.path.join(REPO, "scripts", "sf1_sweep.py")
)
_sweep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_sweep)


def _load(name):
    with open(os.path.join(REPO, name)) as f:
        return json.load(f)


def test_check_sf1_floors_logic(tmp_path, monkeypatch):
    floors = _load("SF1_FLOORS.json")
    ref = floors["reference"]
    mult, slack = floors["multiplier"], floors["absolute_slack_sec"]
    # At the reference: green. Past ratio AND slack: flagged.
    assert _sweep.check_sf1_floors(dict(ref)) == []
    name = max(ref, key=ref.get)
    bad = dict(ref)
    bad[name] = max(ref[name] * mult, ref[name] + slack) + 0.1
    out = _sweep.check_sf1_floors(bad)
    assert len(out) == 1 and name in out[0]
    # Missing suites are set-drift, caught below, not a violation here.
    assert _sweep.check_sf1_floors({}) == []


def test_sf1_sweep_meets_committed_floors():
    sweep = _load("SF1_SWEEP.json")
    floors = _load("SF1_FLOORS.json")
    rows = {r["name"]: r for r in sweep["results"]}
    # Every floor-referenced suite must be present and error-free.
    missing = sorted(set(floors["reference"]) - set(rows))
    assert missing == [], f"floored suites missing from the sweep: {missing}"
    erred = [n for n in floors["reference"] if "err" in rows[n]]
    assert erred == [], f"floored suites errored: {erred}"
    # Re-derive violations from the recorded walls against CURRENT floors.
    walls = {n: r["spark_s"] for n, r in rows.items() if "spark_s" in r}
    assert _sweep.check_sf1_floors(walls) == []


def test_sf1_sweep_health():
    """Sweep-wide invariants: zero engine errors, zero value mismatches,
    and every suite value-checked one way (pandas hash / setwise digest /
    part-wise digest) or recorded rows-only with the budget reason."""
    sweep = _load("SF1_SWEEP.json")
    s = sweep["summary"]
    assert s["errs"] == 0, [r for r in sweep["results"] if "err" in r]
    assert s["mismatches"] == 0, [
        r for r in sweep["results"]
        if str(r.get("oracle", "")).startswith("MISMATCH")
    ]
    # ADVICE r9: a part-level FAIL must never hide behind a 'rows-only'
    # or 'oracle_err' top-level field. The sweep now both propagates
    # FAILs into row['oracle'] (counted above) and records them raw in
    # summary['part_fails'] — assert on the raw count too so a future
    # propagation regression cannot blind this test.
    assert s.get(
        "part_fails",
        sum(
            1
            for r in sweep["results"]
            for v in (r.get("oracle_parts") or {}).values()
            if str(v).startswith("FAIL")
        ),
    ) == 0
    checked = (
        s["hash_checked"]
        + s["setwise_checked"]
        + s.get("partwise_checked", 0)
        + s.get("sampled_checked", 0)
        + s["rows_only"]
    )
    unexplained = [
        r["name"] for r in sweep["results"]
        if str(r.get("oracle", "")).startswith("oracle_err")
        and "oracle_parts" not in r
    ]
    assert checked + len(unexplained) >= s["n_queries"]
    # Part-wise fallback exists precisely so no suite stays opaque: an
    # oracle_err row must at least carry per-part outcomes.
    assert unexplained == [], f"suites with no value evidence: {unexplained}"
