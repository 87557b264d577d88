"""sf10 anchor for the slow tail (VERDICT r9 task 5).

Every committed growth exponent was measured 10x -> 100x on single
OPERATORS or light queries; the sweep itself tops out at sf1 (10x).
This runs the four heaviest SUITES — q_d2_neardup_suite,
q_x10_selection_suite, q_er2_qgram_edit_join, q_x25_model_scoring — on
a full 100x key-shifted replica (sf10) under the full-host session
(local[16]/8g, the SCALE_*_100X methodology: the quantity under test is
the exponent, not fit), and compares the actual x100 wall to the
exponent-predicted wall extrapolated from this run's own x10 wall:

    predicted_x100 = wall_x10 * 10^alpha_committed

alpha_committed comes from the nearest committed exponent family
(SCALE_FAMILY_100X / SCALE_DEDUP_100X); where none exists the linear
null hypothesis (alpha = 1.0) is used and NAMED as such. Because the
pair-producing suites' OUTPUT grows superlinearly in duplication by
construction (each cross-replica clone pair is a member pair), the
artifact also records rows-growth alpha and per-row throughput at both
scales — throughput holding flat while the wall grows quadratically is
healthy scaling (cost proportional to output), not a regression.

Run:  python scripts/scale_sf10.py [--out SCALE_SF10.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# suite -> (alpha_committed, source of the prior)
PRIORS = {
    "q_d2_neardup_suite": (None, "no committed suite exponent; linear null (alpha=1.0)"),
    "q_x10_selection_suite": (None, "no committed suite exponent; linear null (alpha=1.0)"),
    "q_er2_qgram_edit_join": (None, "no committed suite exponent; linear null (alpha=1.0)"),
    "q_x25_model_scoring": (1.04, "SCALE_FAMILY_100X.json q_x25_lm_perplexity"),
}


def measure(spark, name: str, sf_dir: str, timeout_s: float) -> dict:
    """xor-folded full materialization (the sweep's statistic) with a
    cancellation timer — a suite that blows the cap records 'timeout'
    instead of wedging the anchor run."""
    from pyspark.sql import functions as F

    from receiptanalyzerpipeline_spark.plans import REGISTRY

    sc = spark.sparkContext
    group = f"sf10-{name}-{os.path.basename(sf_dir)}"
    done = threading.Event()

    def _cancel():
        if not done.wait(timeout_s):
            sc.cancelJobGroup(group)

    t = threading.Thread(target=_cancel, daemon=True)
    t.start()
    sc.setJobGroup(group, "sf10 anchor", interruptOnCancel=True)
    t0 = time.time()
    try:
        df = REGISTRY[name].spark(spark, sf_dir)
        n, h = (
            df.select(F.xxhash64(*df.columns).alias("__h"))
            .agg(F.count(F.lit(1)), F.expr("bit_xor(__h)"))
            .first()
        )
        return {
            "wall_s": round(time.time() - t0, 1),
            "rows": int(n),
            "xor_hash": int(h) if h is not None else None,
        }
    except Exception as e:  # noqa: BLE001
        wall = round(time.time() - t0, 1)
        kind = "timeout" if wall >= timeout_s * 0.95 else "err"
        return {"wall_s": wall, kind: f"{type(e).__name__}: {str(e)[:200]}"}
    finally:
        done.set()
        sc.setJobGroup("", "")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--x10", default="/tmp/sf1")
    ap.add_argument("--x100", default="/tmp/sf10")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALE_SF10.json"))
    ap.add_argument("--timeout", type=float, default=3000.0)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sf1_sweep", os.path.join(REPO, "scripts", "sf1_sweep.py")
    )
    sweep_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep_mod)

    for path, times in ((args.x10, 10), (args.x100, 100)):
        if not os.path.isdir(path) or not os.listdir(path):
            print(f"# building x{times} replica at {path}", file=sys.stderr, flush=True)
            sweep_mod.build_sf1(args.src, path, times=times)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("scale-sf10")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"ops": {}, "recorded_at": time.time()}
    for name in PRIORS:
        row: dict = {}
        for tag, sf_dir in (("x10", args.x10), ("x100", args.x100)):
            print(f"# {name} {tag}", file=sys.stderr, flush=True)
            row[tag] = measure(spark, name, sf_dir, args.timeout)
            print(json.dumps({name: {tag: row[tag]}}), flush=True)
            with open(args.out, "w") as f:
                json.dump(out | {"ops": out["ops"] | {name: row}}, f, indent=1)
        a, b = row["x10"], row["x100"]
        if "rows" in a and "rows" in b:
            row["alpha_wall"] = round(math.log10(b["wall_s"] / a["wall_s"]), 2)
            if a["rows"] and b["rows"]:
                row["alpha_rows"] = round(math.log10(b["rows"] / a["rows"]), 2)
                row["rows_per_s"] = {
                    "x10": round(a["rows"] / a["wall_s"]),
                    "x100": round(b["rows"] / b["wall_s"]),
                }
            alpha_c, src = PRIORS[name]
            alpha_used = 1.0 if alpha_c is None else alpha_c
            pred = a["wall_s"] * (10 ** alpha_used)
            row["prediction"] = {
                "alpha": alpha_used,
                "source": src,
                "predicted_x100_wall_s": round(pred, 1),
                "actual_over_predicted": round(b["wall_s"] / pred, 2),
            }
        out["ops"][name] = row
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({n: r.get("prediction") for n, r in out["ops"].items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
