"""Manifest-tree scale experiment (VERDICT r5 task 1).

Round 5 measured the flat-manifest cliff: a 1000-key MERGE into a
k-clustered 6 401-file table spent 12.8 s, dominated by driver-side
manifest/zone-map JSON handling (SCALE.md). This script measures the
manifest TREE past that cliff: k-clustered tables at ~5k and ~50k files,
same 1000-key merge protocol, plus the per-commit append cost and a
narrow pruned read — the three operations whose metadata cost must stay
sub-linear in live-file count. For reference it also measures the 5k
table with the tree disabled (flat manifest), reproducing the cliff on
the same host.

Run:  python scripts/manifest_scale.py [--files 5000 50000] [--rows-per-file 100]
Emits one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from receiptanalyzerpipeline_spark.sources import snapshots as snap


def build_clustered_table(spark, path: str, n_files: int, rows_per_file: int) -> float:
    """One bulk append (k ascending, range-partitioned into n_files), then
    a clustered compaction so every file carries k zone maps — the same
    layout the round-5 merge experiment used."""
    t0 = time.time()
    n_rows = n_files * rows_per_file
    df = spark.range(n_rows).selectExpr("id AS k", "id % 97 AS v")
    snap.write_snapshot(df.repartitionByRange(n_files, "k"), path)
    files = snap._manifest_files(path, snap._read_manifest(path, 0))
    total = sum(os.path.getsize(f) for f in files)
    snap.compact_snapshot(
        spark, path, target_file_bytes=max(1, total // n_files), cluster_by=["k"]
    )
    return time.time() - t0


def measure(spark, path: str, rows_per_file: int) -> dict:
    cur = snap.current_version(path)
    m = snap._read_manifest(path, cur)
    n_files = snap.manifest_file_count(m)
    n_rows = snap.read_snapshot(spark, path).count()
    out = {
        "files": n_files,
        "groups": len(m.get("groups", [])),
        "layout": "tree" if m.get("groups") else "flat",
        "top_manifest_bytes": os.path.getsize(snap._manifest_path(path, cur)),
    }

    # (a) append commit at head: manifest cost of one more micro-batch.
    t0 = time.time()
    snap.write_snapshot(
        spark.range(n_rows, n_rows + rows_per_file).selectExpr(
            "id AS k", "id % 97 AS v"
        ).coalesce(1),
        path,
    )
    out["append_s"] = round(time.time() - t0, 2)

    # (b) the round-5 protocol: 1000-key update merge.
    lo = n_rows // 2
    src = spark.range(lo, lo + 1000).selectExpr("id AS k", "CAST(-1 AS LONG) AS v")
    t0 = time.time()
    v = snap.merge_upsert(spark, src, path, ["k"])
    out["merge_s"] = round(time.time() - t0, 2)
    out["rewrote_files"] = snap._read_manifest(path, v)["rewrote_files"]

    # (c) narrow pruned read: 3 keys out of the whole table.
    t0 = time.time()
    df = snap.scan_snapshot(spark, path, f"k BETWEEN {lo} AND {lo + 2}")
    n = df.count()
    out["pruned_read_s"] = round(time.time() - t0, 2)
    out["pruned_read_files"] = len(df.inputFiles())
    assert n == 3, n
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, nargs="*", default=[5000, 50000])
    ap.add_argument("--rows-per-file", type=int, default=100)
    ap.add_argument("--flat-reference", type=int, default=5000,
                    help="also measure this size with the tree disabled (0 = skip)")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("manifest-scale")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="manifest_scale_")
    try:
        configs = [(n, False) for n in args.files]
        if args.flat_reference:
            configs.append((args.flat_reference, True))
        for n_files, flat in configs:
            path = os.path.join(base, f"t{n_files}_{'flat' if flat else 'tree'}")
            old = snap.GROUP_THRESHOLD
            if flat:
                snap.GROUP_THRESHOLD = 10**9
            try:
                build_s = build_clustered_table(spark, path, n_files, args.rows_per_file)
                row = measure(spark, path, args.rows_per_file)
            finally:
                snap.GROUP_THRESHOLD = old
            row["build_s"] = round(build_s, 1)
            print(json.dumps(row), flush=True)
            shutil.rmtree(path, ignore_errors=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
