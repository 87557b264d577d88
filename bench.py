"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Methodology (matches BASELINE.md: "measure warm, after one throwaway query"):
each query's DataFrame is built once (prepared plan), executed once untimed
(JVM/codegen/page-cache warm-up), then the SAME prepared plan is re-executed
REPS times and the per-query minimum is reported (best-of-N suppresses
scheduler noise from a shared host; set SPARK_GRAFT_BENCH_REPS to change).
This is prepared-statement steady state — the regime a production pipeline
runs in, where analysis/optimization amortize across executions; DuckDB's
baseline (re-executing a SQL string warm) is measured the same way. Cold,
build-inclusive timings are reported alongside on stderr for transparency.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from receiptanalyzerpipeline_spark.plans import REGISTRY
    from receiptanalyzerpipeline_spark.session import get_spark

    spark = get_spark(app_name="receiptanalyzerpipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_set = {name: q for name, q in sorted(REGISTRY.items()) if q.bench}

    # Prepare + warm: build each plan once, execute once untimed.
    prepared = {}
    build_times = {}
    for name, q in bench_set.items():
        t0 = time.perf_counter()
        df = q.spark(spark, sf_dir)
        df.toArrow()
        build_times[name] = round(time.perf_counter() - t0, 4)
        prepared[name] = df

    # Timed pass: re-execute the prepared plans, best-of-REPS.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name, df in prepared.items():
        best, n = float("inf"), 0
        for _ in range(reps):
            t0 = time.perf_counter()
            n = df.toArrow().num_rows
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(
            f"# {name}: {timings[name]:.3f}s warm best-of-{reps} ({n} rows; "
            f"cold incl. build {build_times[name]:.3f}s)",
            file=sys.stderr,
        )

    violations = check_floors(timings)
    retries: dict[str, int] = {}
    if violations:
        # VERDICT r6 task 1: a floor violation measured on a busy host
        # (the driver's end-of-round bench shares the machine with
        # whatever just ran) must not leave a red gate artifact for
        # noise. Re-measure ONLY the violating queries after a settle,
        # up to 3 rounds. ADVICE r7: the retry statistic is the MEDIAN
        # of its round's fresh runs, not a cumulative min — a cumulative
        # min over ~15 extra draws gives a genuinely-regressed query
        # near the bound ~15 lucky chances to dip under it once, while a
        # median-of-5 must be stably under the bound to flip the gate.
        # Scheduler jitter inflates individual draws (median immune);
        # a real regression shifts the whole distribution (median
        # catches it).
        import statistics

        retry_reps = max(reps, 5)
        for attempt in range(3):
            if not violations:
                break
            names = [v.split(":", 1)[0] for v in violations]
            print(
                f"# floor retry {attempt + 1}/3 after settle: {names}",
                file=sys.stderr,
            )
            time.sleep(2.0)
            for name in names:
                df = prepared[name]
                runs = []
                for _ in range(retry_reps):
                    t0 = time.perf_counter()
                    df.toArrow()
                    runs.append(time.perf_counter() - t0)
                med = round(statistics.median(runs), 4)
                # Keep the best MEDIAN seen across retry rounds (at most
                # 3 draws of a stable statistic, vs 15 of a raw min).
                if med < timings[name]:
                    timings[name] = med
                retries[name] = retries.get(name, 0) + retry_reps
            violations = check_floors(timings)

    out = {
        "metric": "headline query wall-clock (prepared plan, warm), Spark local",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if retries:
        out["floor_retries"] = retries
    if violations is not None:
        out["floor_violations"] = violations
        for v in violations:
            print(f"# FLOOR VIOLATION: {v}", file=sys.stderr)
        _record_gate_artifact(out)
    print(json.dumps(out))


def _record_gate_artifact(out: dict) -> None:
    """Persist the floor-check outcome as BENCH_GATE.json so the pytest
    gate (tests/test_bench_gate.py) can enforce it WITHOUT launching a
    second Spark JVM mid-suite (concurrent JVMs produce spurious sub-
    100 ms regressions — the root-caused r03→r04 noise episode). The
    driver's per-round bench run refreshes this; the gate test fails,
    rather than skips, when the artifact is missing or stale (query-set
    drift). Non-default scale factors don't overwrite the gate record."""
    if abs(out.get("sf", -1.0) - 0.1) > 1e-9:
        return
    artifact = {
        "recorded_at": time.time(),
        "sf": out["sf"],
        "queries": out["queries"],
        "floor_violations": out["floor_violations"],
    }
    if out.get("floor_retries"):
        artifact["floor_retries"] = out["floor_retries"]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_GATE.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(artifact, f, indent=1)
    os.replace(tmp, path)


def check_floors(timings: dict[str, float]) -> list[str] | None:
    """Compare warm timings against the committed quiet-host references.

    A query regresses when it exceeds max(ref * multiplier, ref + slack);
    the absolute slack absorbs scheduler jitter on sub-100 ms measurements.
    Returns None when no floors file exists (e.g. a fresh checkout).
    """
    floors_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FLOORS.json")
    if not os.path.exists(floors_path):
        return None
    with open(floors_path) as f:
        floors = json.load(f)
    mult = floors["multiplier"]
    slack = floors["absolute_slack_sec"]
    violations = []
    for name, ref in floors["reference"].items():
        got = timings.get(name)
        if got is None:
            continue
        bound = max(ref * mult, ref + slack)
        if got > bound:
            violations.append(f"{name}: {got:.4f}s > bound {bound:.4f}s (ref {ref:.4f}s)")
    return violations


if __name__ == "__main__":
    main()
