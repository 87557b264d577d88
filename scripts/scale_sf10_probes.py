"""Follow-up probes for SCALE_SF10.json (run after scale_sf10.py's suite
loop; merges into the same artifact).

Why separate: the suite loop already materializes q_er2 at every scale
(the probe IS the suite query — its ``rows`` field is the exactness
evidence, re-counting would double the x100 cost), and q_d5's x100
density point is bounded by the same Θ(distinct²) wall that times the
q_d2 suite out — burning the full suite cap a second time on a known
outcome buys nothing, so the density probe gets a short cap and a
timeout there is recorded as the same named cause.

Run:  python scripts/scale_sf10_probes.py [--out SCALE_SF10.json]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/sf10_growth")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALE_SF10.json"))
    ap.add_argument("--density-timeout", type=float, default=600.0)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "scale_sf10", os.path.join(REPO, "scripts", "scale_sf10.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    with open(args.out) as f:
        out = json.load(f)

    scales = (1, 10, 100)
    dirs = {t: m.build_regime_dirs("/root/testdata/sf0.1", args.root, t) for t in scales}

    from pyspark.sql import SparkSession

    from receiptanalyzerpipeline_spark.plans import REGISTRY
    from receiptanalyzerpipeline_spark.session import prepare_session

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("scale-sf10-probes")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .getOrCreate()
    )
    prepare_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def flush():
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

    out.setdefault("exact_linear", {})
    # q_er2: the probe IS the suite query — reuse the suite loop's
    # materialized row counts instead of re-running the x100 join.
    er2 = out["ops"].get("q_er2_qgram_edit_join", {})
    counts = {
        k: er2[k]["rows"] for k in ("x1", "x10", "x100") if "rows" in er2.get(k, {})
    }
    if len(counts) == 3:
        out["exact_linear"]["q_er2_qgram_edit_join"] = {
            "counts": counts,
            "exactly_linear": counts["x10"] == 10 * counts["x1"]
            and counts["x100"] == 100 * counts["x1"],
            "source": "suite-loop row counts (same query)",
        }
        flush()

    # q_d2_ngram_jaccard: prefix-filtered shingle join — linear-ish in
    # docs, cheap to run standalone at every scale.
    counts = {}
    for t in scales:
        counts[f"x{t}"] = (
            REGISTRY["q_d2_ngram_jaccard"]
            .spark(spark, dirs[t]["q_d2_neardup_suite"])
            .count()
        )
        print(json.dumps({"q_d2_ngram_jaccard": counts}), flush=True)
    out["exact_linear"]["q_d2_ngram_jaccard"] = {
        "counts": counts,
        "exactly_linear": counts["x10"] == 10 * counts["x1"]
        and counts["x100"] == 100 * counts["x1"],
    }
    flush()

    # q_d5 density probe with a short cap (rationale in docstring).
    out.setdefault("density", {})
    rows = {}
    for t in scales:
        rows[f"x{t}"] = m.measure(
            spark,
            "q_d5_cosine_neardup",
            dirs[t]["q_d2_neardup_suite"],
            args.density_timeout,
        )
        print(json.dumps({"q_d5_cosine_neardup": rows}), flush=True)
    out["density"]["q_d5_cosine_neardup"] = rows
    flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
