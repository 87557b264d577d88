"""Full-registry local-cluster parity sweep (round 9).

``tests/test_local_cluster.py`` proves the driver/executor split for the
three iterative/materialized suites (q_g1, q_x22, q_d2); this widens the
evidence to the ENTIRE driver surface: every ``__spark_entry__.queries()``
entry runs once on a ``local-cluster[2,1,1024]`` master — real separate
executor JVMs, each with a 1 GB heap, the environment that local[*]
cannot emulate — and once on ``local[8]``, and the xor-folded xxhash64
digests must be bit-identical. Any operator that quietly assumes the
driver's filesystem, driver-side state, or single-JVM broadcast identity
fails loudly here (the ADVICE r7 ``_IterStore`` bug class, caught
mechanically instead of by review).

Run:  python scripts/cluster_parity.py [--out LOCAL_CLUSTER_PARITY.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_names(master: str, names: list[str], sf_dir: str) -> dict[str, dict]:
    from pyspark.sql import SparkSession

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = tempfile.mkdtemp(prefix="rap-parity-")
    spark = (
        SparkSession.builder.master(master)
        .appName(f"cluster-parity-{master.split('[')[0]}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.executorEnv.PYTHONPATH", repo)
        .config("spark.receiptanalyzerpipeline.iterStoreDir", scratch)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict[str, dict] = {}
    try:
        from pyspark.sql import functions as F

        from receiptanalyzerpipeline_spark.plans import REGISTRY

        for name in names:
            t0 = time.time()
            row: dict = {}
            try:
                df = REGISTRY[name].spark(spark, sf_dir)
                n, h = (
                    df.select(F.xxhash64(*df.columns).alias("__h"))
                    .agg(F.count(F.lit(1)), F.expr("bit_xor(__h)"))
                    .first()
                )
                row = {"rows": int(n),
                       "xor_hash": int(h) if h is not None else None}
            except Exception as e:  # noqa: BLE001
                row = {"err": f"{type(e).__name__}: {str(e)[:200]}"}
            row["wall_s"] = round(time.time() - t0, 2)
            out[name] = row
            print(json.dumps({"master": master, "name": name, **row}),
                  flush=True)
    finally:
        spark.stop()
        # A stopped cluster master leaves gateway singletons that would
        # poison the NEXT session build in this process (the sf1 sweep's
        # hard-rebuild lesson).
        from pyspark import SparkContext
        from pyspark.sql import SparkSession as S

        try:
            if SparkContext._gateway is not None:
                SparkContext._gateway.shutdown()
        except Exception:  # noqa: BLE001
            pass
        SparkContext._gateway = None
        SparkContext._jvm = None
        SparkContext._active_spark_context = None
        for attr in ("_instantiatedSession", "_activeSession"):
            try:
                setattr(S, attr, None)
            except Exception:  # noqa: BLE001
                pass
    return out


# VERDICT r9 task 6: the sf0.001 full-registry sweep proves
# serialization/scratch-visibility; these are the heaviest suites,
# re-proven AT DATA VOLUME (sf0.1) on a 2-executor/2-core/2 GB cluster —
# the regime where shuffle sizes, partial-aggregate merges, and
# broadcast thresholds actually bite.
VOLUME_NAMES = [
    "q_d2_neardup_suite",
    "q_x10_selection_suite",
    "q_g1_graph_suite",
    "q_er2_qgram_edit_join",
    "q_x25_model_scoring",
    "q_er3_linkage_scoring",
    "q_x20_mining_suite",
    "q_x17_substring_dedup",
    "q_d3_minhash_lsh",
    "q_x22_portable_ml",
]


def compare_runs(names, cluster, local):
    results = []
    for name in names:
        c, l = cluster[name], local[name]
        row = {"name": name, "cluster": c, "local": l}
        row["parity"] = (
            "match"
            if "err" not in c and "err" not in l
            and c["rows"] == l["rows"] and c["xor_hash"] == l["xor_hash"]
            else "MISMATCH" if "err" not in c and "err" not in l
            else "err"
        )
        results.append(row)
    return results


def summarize(results, sf_dir, cluster_master):
    return {
        "sf_dir": sf_dir,
        "cluster_master": cluster_master,
        "n_queries": len(results),
        "match": sum(1 for r in results if r["parity"] == "match"),
        "mismatch": sum(1 for r in results if r["parity"] == "MISMATCH"),
        "errs": sum(1 for r in results if r["parity"] == "err"),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="LOCAL_CLUSTER_PARITY.json")
    ap.add_argument("--cluster-master", default="local-cluster[2,1,1024]")
    ap.add_argument("--local-master", default="local[8]")
    ap.add_argument("--volume-only", action="store_true",
                    help="skip the full-registry sf0.001 sweep; run ONLY "
                         "the heavy-suite volume section at --volume-sf-dir "
                         "and merge it into the existing --out artifact")
    ap.add_argument("--volume-sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--volume-cluster-master", default="local-cluster[2,2,2048]")
    args = ap.parse_args()

    import __spark_entry__ as E

    artifact: dict = {}
    if args.volume_only and os.path.exists(args.out):
        with open(args.out) as f:
            artifact = json.load(f)

    if not args.volume_only:
        names = sorted(E.queries())
        cluster = run_names(args.cluster_master, names, args.sf_dir)
        local = run_names(args.local_master, names, args.sf_dir)
        results = compare_runs(names, cluster, local)
        artifact["summary"] = summarize(results, args.sf_dir, args.cluster_master)
        artifact["results"] = results

    vnames = [n for n in VOLUME_NAMES if n in E.queries()]
    vcluster = run_names(args.volume_cluster_master, vnames, args.volume_sf_dir)
    vlocal = run_names(args.local_master, vnames, args.volume_sf_dir)
    vresults = compare_runs(vnames, vcluster, vlocal)
    artifact["volume"] = {
        "summary": summarize(vresults, args.volume_sf_dir, args.volume_cluster_master),
        "results": vresults,
    }

    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["volume"]["summary"]), flush=True)
    bad = artifact["volume"]["summary"]["mismatch"] + artifact["volume"]["summary"]["errs"]
    if not args.volume_only:
        bad += artifact["summary"]["mismatch"] + artifact["summary"]["errs"]
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
