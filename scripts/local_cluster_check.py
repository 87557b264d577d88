"""Run registry queries on a ``local-cluster[N,C,M]`` master and print
one JSON line per query: {"name", "rows", "xor_hash"}.

Why this exists (VERDICT r8 task 3): ``local[*]`` hides an entire bug
class — driver and executors share one filesystem, one JVM, and one
working directory, so a driver-local temp path silently works. A
local-cluster master launches REAL separate executor JVMs: any operator
that stashes iteration state somewhere only the driver can see (the
ADVICE r7 `_IterStore` bug class) fails loudly here. The iterative /
materialized suites (connected components, k-means/IVF/PQ, the neardup
suite) are the intended targets.

Usage:
    python scripts/local_cluster_check.py q_g1_graph_suite q_x22_portable_ml \
        [--sf-dir /root/testdata/sf0.001] [--master local-cluster[2,1,1024]]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--master", default="local-cluster[2,1,1024]")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    scratch = tempfile.mkdtemp(prefix="rap-lcc-")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = (
        SparkSession.builder.master(args.master)
        .appName("local-cluster-check")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        # Executor JVMs are separate processes: their Python workers
        # must find this repo on PYTHONPATH themselves.
        .config("spark.executorEnv.PYTHONPATH", repo)
        # The cluster-visible scratch root every executor can reach —
        # the contract _IterStore enforces on non-local masters.
        .config("spark.receiptanalyzerpipeline.iterStoreDir", scratch)
        .getOrCreate()
    )
    # nanos timestamps in events.parquet (see skills/verify): runtime conf.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        from pyspark.sql import functions as F

        from receiptanalyzerpipeline_spark.plans import REGISTRY

        for name in args.names:
            df = REGISTRY[name].spark(spark, args.sf_dir)
            n, h = (
                df.select(F.xxhash64(*df.columns).alias("__h"))
                .agg(F.count(F.lit(1)), F.expr("bit_xor(__h)"))
                .first()
            )
            print(json.dumps({
                "name": name,
                "rows": int(n),
                "xor_hash": int(h) if h is not None else None,
            }), flush=True)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
