"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Timing is warm (one throwaway action first, per BASELINE.md) and covers the
full query: plan + execute + collect of the result.
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

    # Warm-up: JVM init, parquet reads into page cache, codegen caches.
    # Run the full set once untimed so the timed pass measures steady state
    # (BASELINE.md: "measure warm, after one throwaway query").
    for q in bench_set.values():
        q.spark(spark, sf_dir).toArrow()

    timings: dict[str, float] = {}
    for name, q in bench_set.items():
        t0 = time.perf_counter()
        df = q.spark(spark, sf_dir)
        n = df.toArrow().num_rows  # Arrow-batched result transfer (engine fast path)
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    out = {
        "metric": "headline query wall-clock (warm), Spark local",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
