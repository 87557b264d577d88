"""Per-part wall dissection of q_d2_neardup_suite at an sf10-anchor
regime dir (default the x10 corpus-growth replica) — names which member
pays for the suite's wall so optimization lands where the money is.

Same statistic as the anchor (xor-folded full materialization).

Run:  python scripts/profile_d2_parts.py [--dir /tmp/sf10_growth/d2_x10]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PARTS = [
    "q_d2_ngram_jaccard",
    "q_d4_simhash",
    "q_d5_cosine_neardup",
    "q_d6_crossmodal_neardup",
    "q_d8_semantic_dedup",
    "q_d10_keep_best_canonical",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf10_growth/d2_x10")
    ap.add_argument("--timeout", type=float, default=3000.0)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "scale_sf10", os.path.join(REPO, "scripts", "scale_sf10.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from pyspark.sql import SparkSession

    from receiptanalyzerpipeline_spark.session import prepare_session

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("profile-d2")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .getOrCreate()
    )
    prepare_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    for p in PARTS:
        out[p] = m.measure(spark, p, args.dir, args.timeout)
        print(json.dumps({p: out[p]}), flush=True)
    print(json.dumps({"total": round(sum(r["wall_s"] for r in out.values()), 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
