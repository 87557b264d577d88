"""sf1 driver-suite sweep under a DEFAULT heap (VERDICT r5 task 3).

Round 4 caught the q_a5 multi-distinct OOM only because the verdict
demanded an sf0.1 sweep on a 1 GB heap; this generalizes the probe to
sf1: replicate the driver's sf0.1 tables 10× (consistent key shifting —
every PK and its referencing FKs move together, dims untouched), then
run EVERY driver-registry query against the replica under a
driver-default session (1 GB heap, local[8]) and record rows/wall/err.
Where the DuckDB oracle is itself scalable (its sf0.1 wall is under
--oracle-budget seconds), the oracle runs on the same replica and the
result is hash-compared exactly like CORRECTNESS_r*.json; exhaustive
oracles (the O(n²) q_er2 class) are recorded rows-only — at sf1 they
are hours of DuckDB, and their algorithms are already oracle-checked at
sf0.01/0.1.

Run:  python scripts/sf1_sweep.py [--out SF1_SWEEP.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES_SHIFT = {
    # table -> {column: keyspace} ; columns sharing a keyspace shift by
    # the same stride so FK relationships survive replication.
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "ord",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "ev", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
DIMS = ("region", "nation")


def build_sf1(spark, src: str, dst: str, times: int = 10) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    strides: dict[str, int] = {}
    frames = {}
    for t, cols in TABLES_SHIFT.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        frames[t] = df
        for c, space in cols.items():
            hi = df.agg(F.max(c)).first()[0] or 0
            strides[space] = max(strides.get(space, 0), int(hi) + 1)
    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    for t, cols in TABLES_SHIFT.items():
        df = frames[t]
        reps = []
        for r in range(times):
            rep = df
            for c, space in cols.items():
                rep = rep.withColumn(c, (F.col(c) + r * strides[space]).cast(df.schema[c].dataType))
            reps.append(rep)
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"# {t}: x{times}", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--out", default="SF1_SWEEP.json")
    ap.add_argument("--oracle-budget", type=float, default=2.0,
                    help="oracle runs at sf1 only if its sf0.1 wall is under this")
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # DRIVER-DEFAULT session: 1 GB heap, no engine tuning — the gate's shape.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("sf1-sweep")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not args.skip_build:
        t0 = time.time()
        build_sf1(spark, args.src, args.dst)
        print(f"# replica built in {time.time() - t0:.0f}s", file=sys.stderr)

    import __spark_entry__ as E

    from receiptanalyzerpipeline_spark import oracle as O

    queries = E.queries()
    oracles = E.oracle_sql()

    con_small = O.duckdb_connect(args.src)
    con_big = O.duckdb_connect(args.dst)
    results = []
    for name in sorted(queries):
        row: dict = {"name": name}
        t0 = time.time()
        try:
            df = queries[name](spark, args.dst)
            row["rows"] = int(len(df.toPandas()))
            row["spark_s"] = round(time.time() - t0, 2)
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {str(e)[:300]}"
            row["spark_s"] = round(time.time() - t0, 2)
            results.append(row)
            print(json.dumps(row), flush=True)
            continue
        sql = oracles.get(name)
        if sql is not None:
            t0 = time.time()
            try:
                con_small.execute(sql).fetchall()
                small_wall = time.time() - t0
            except Exception:
                small_wall = float("inf")
            if small_wall <= args.oracle_budget:
                t0 = time.time()
                try:
                    r = O.compare(name, df, sql, con_big)
                    row["oracle"] = "match" if r.ok else f"MISMATCH: {r.mismatches[:2]}"
                except Exception as e:  # noqa: BLE001
                    row["oracle"] = f"oracle_err: {type(e).__name__}: {str(e)[:200]}"
                row["oracle_s"] = round(time.time() - t0, 2)
            else:
                row["oracle"] = f"rows-only (sf0.1 oracle {small_wall:.1f}s > budget)"
        results.append(row)
        print(json.dumps(row), flush=True)

    errs = [r for r in results if "err" in r]
    mismatches = [r for r in results if str(r.get("oracle", "")).startswith("MISMATCH")]
    summary = {
        "sf": 1.0,
        "n_queries": len(results),
        "errs": len(errs),
        "hash_checked": sum(1 for r in results if r.get("oracle") == "match"),
        "mismatches": len(mismatches),
        "rows_only": sum(1 for r in results if str(r.get("oracle", "")).startswith("rows-only")),
        "total_spark_s": round(sum(r.get("spark_s", 0) for r in results), 1),
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
