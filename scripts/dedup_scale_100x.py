"""Scaling exponents for the rep-collapsed dedup family at 10x / 100x.

Round 8 rewired incremental_dedup_status (q_d9) through _collapse_reps;
this measures how the family's wall-clock actually grows when the
corpus grows 10x -> 100x by exact cloning (the crawl-duplication
regime). Unlike the sf1 sweep this is NOT the 1 GB envelope probe: it
runs on a full-host session (local[16], 8g) because the quantity under
test is the scaling EXPONENT alpha = log10(w_100x / w_10x), not
fit-in-heap. alpha ~ 1 = linear in duplication (the design claim for
rep-collapsed ops); alpha ~ 2 = the un-collapsed disease.

All timings force end-to-end materialization by xor-folding
xxhash64(*columns) (a bare count() lets Catalyst prune computed
columns — the round-8 measurement lesson).

Run:  python scripts/dedup_scale_100x.py [--out SCALE_DEDUP_100X.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_docs_replica(src: str, dst: str, times: int) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    hi = con.execute(
        f"SELECT max(doc_id) FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()[0]
    stride = int(hi) + 1
    con.execute(
        f"COPY (SELECT t.* REPLACE (CAST(doc_id + g.r * {stride} AS BIGINT) AS doc_id) "
        f"FROM read_parquet('{src}/documents.parquet') t "
        f"CROSS JOIN (SELECT unnest(range({times})) AS r) g) "
        f"TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()


def materialize_s(df) -> tuple[float, int]:
    from pyspark.sql import functions as F

    t0 = time.time()
    n, _ = (
        df.select(F.xxhash64(*df.columns).alias("__h"))
        .agg(F.count(F.lit(1)), F.expr("bit_xor(__h)"))
        .first()
    )
    return round(time.time() - t0, 2), int(n)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="SCALE_DEDUP_100X.json")
    ap.add_argument("--scratch", default="/tmp/dedup_scale")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("dedup-scale-100x")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from receiptanalyzerpipeline_spark.operators import dedup as D

    def batch_of(docs):
        # The q_d9 batch shape: md5-sampled ~1/8 of docs, half mutated.
        h1 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 2, 1)
        return docs.where(h1.isin("0", "1")).select(
            (F.col("doc_id") + 20_000_000).alias("doc_id"),
            F.when(h2 < "6", F.concat(F.col("text"), F.lit(" incremental batch note")))
            .when(h2 < "b", F.col("text"))
            .otherwise(
                F.concat(
                    F.lit("completely fresh synthetic document number "),
                    F.col("doc_id").cast("string"),
                )
            )
            .alias("text"),
        )

    results: dict = {"ops": {}}
    for times in (10, 100):
        dst = f"{args.scratch}/x{times}"
        if not os.path.exists(f"{dst}/documents.parquet"):
            t0 = time.time()
            build_docs_replica(args.src, dst, times)
            print(f"# x{times} replica built {time.time()-t0:.0f}s", file=sys.stderr)
        docs = spark.read.parquet(f"{dst}/documents.parquet")

        ops = {
            "exact_dedup": lambda d=docs: D.exact_dedup(d, "text", "doc_id"),
            "incremental_dedup_status": lambda d=docs: D.incremental_dedup_status(
                batch_of(d), d, "doc_id", "text"
            ),
            "minhash_lsh_jaccard_pairs": lambda d=docs: D.minhash_lsh_jaccard_pairs(
                d, "doc_id", "text", k=3, threshold=0.5, n_hashes=32, rows_per_band=2
            ),
        }
        for name, fn in ops.items():
            materialize_s(fn())  # warm-up: codegen + page cache, untimed
            wall, rows = materialize_s(fn())
            results["ops"].setdefault(name, {})[f"x{times}"] = {
                "wall_s": wall,
                "rows": rows,
            }
            print(
                json.dumps({"op": name, "times": times, "wall_s": wall, "rows": rows}),
                flush=True,
            )

    import math

    for name, r in results["ops"].items():
        w10, w100 = r["x10"]["wall_s"], r["x100"]["wall_s"]
        r["exponent"] = round(math.log10(max(w100, 0.01) / max(w10, 0.01)), 2)
    results["note"] = (
        "alpha = log10(w_100x/w_10x); 1.0 = linear in duplication. "
        "Full-host session (local[16]/8g), NOT the 1 GB sweep envelope — "
        "this measures the growth exponent, the sweep measures fit."
    )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["ops"]), flush=True)


if __name__ == "__main__":
    main()
