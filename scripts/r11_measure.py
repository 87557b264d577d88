"""Round-11 measurement harness (spark_optimization_guide §1).

For every DRIVER_REGISTRY query at $SPARK_GRAFT_SF_DIR:
  - build the plan (timed separately — plan-build cost is driver CPU),
  - one untimed noop-sink execution (warm-up: codegen, page cache),
  - N timed noop-sink executions of a FRESHLY BUILT plan each rep (AQE
    reuses materialized shuffle stages on a re-executed DataFrame object,
    which would time only the result stage), reporting the minimum,
  - `.explain("formatted")` captured to plans/r11/<name>_<tag>.txt,
  - plan-shape counters (Exchange / Python-eval / join strategies /
    PushedFilters presence) so before/after diffs are mechanical.

Usage:
    python scripts/r11_measure.py [--tag before|after] [--queries a,b,...]
        [--out R11_MEASURE_<tag>.json] [--reps 3]

The noop sink times the full computation of every column of every row
without the Arrow-collect cost bench.py's toArrow() methodology includes;
both numbers are recorded in OPTIMIZATION_r11.md (the bench's own
methodology stays unchanged).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "batch_eval_python": len(re.findall(r"BatchEvalPython", plan)),
        "arrow_eval_python": len(re.findall(r"ArrowEvalPython", plan)),
        "map_in_pandas": len(re.findall(r"MapInPandas|FlatMapGroupsInPandas|MapInArrow", plan)),
        "scans": len(re.findall(r"Scan parquet|BatchScan", plan)),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from receiptanalyzerpipeline_spark.plans import DRIVER_REGISTRY
    from receiptanalyzerpipeline_spark.session import get_spark

    spark = get_spark(app_name=f"r11-measure-{args.tag}")
    spark.sparkContext.setLogLevel("ERROR")

    names = (
        [n.strip() for n in args.queries.split(",") if n.strip()]
        if args.queries
        else sorted(DRIVER_REGISTRY)
    )
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        q = DRIVER_REGISTRY[name]
        sc = spark.sparkContext
        sc.setJobDescription(f"r11[{args.tag}] build {name}")
        t0 = time.perf_counter()
        try:
            df = q.spark(spark, sf_dir)
        except Exception as ex:  # keep the sweep alive; record the failure
            results[name] = {"err": f"build: {type(ex).__name__}: {ex}"}
            print(f"# {name}: BUILD ERROR {ex}", file=sys.stderr)
            continue
        build_s = time.perf_counter() - t0

        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if not args.no_plans:
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)

        sc.setJobDescription(f"r11[{args.tag}] warm {name}")
        try:
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            cold_s = time.perf_counter() - t0
        except Exception as ex:
            results[name] = {"err": f"exec: {type(ex).__name__}: {ex}", "build_s": round(build_s, 4)}
            print(f"# {name}: EXEC ERROR {ex}", file=sys.stderr)
            continue

        best = float("inf")
        for i in range(args.reps):
            # Fresh plan per rep: a re-executed DataFrame reuses its
            # materialized shuffle stages under AQE (bench.py measure_canary
            # has the same note) — rebuilding re-runs the real work.
            df_i = q.spark(spark, sf_dir)
            sc.setJobDescription(f"r11[{args.tag}] time {name} rep{i}")
            t0 = time.perf_counter()
            df_i.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)

        results[name] = {
            "noop_warm_s": round(best, 4),
            "noop_cold_s": round(cold_s, 4),
            "build_s": round(build_s, 4),
            **plan_stats(plan),
        }
        print(
            f"# {name}: warm {best:.3f}s (cold {cold_s:.3f}s, build {build_s:.3f}s) "
            f"ex={results[name]['exchanges']} smj={results[name]['smj']} "
            f"bhj={results[name]['bhj']} py={results[name]['batch_eval_python']+results[name]['arrow_eval_python']+results[name]['map_in_pandas']}",
            file=sys.stderr,
        )

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"R11_MEASURE_{args.tag}.json",
    )
    payload = {
        "sf_dir": sf_dir,
        "tag": args.tag,
        "reps": args.reps,
        "recorded_at": time.time(),
        "total_noop_warm_s": round(
            sum(r.get("noop_warm_s", 0.0) for r in results.values()), 4
        ),
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps({"out": out_path, "total": payload["total_noop_warm_s"]}))


if __name__ == "__main__":
    main()
