"""10x/100x growth exponents BEYOND the dedup family (VERDICT r8 task 4):
windows (q_w1_ranking), event-time sessionization (q_t4_session_window),
the agg-before-join reconciliation (q_j2_reconciliation), and the bigram
LM scorer (q_x25_lm_perplexity).

Growth regime: key-shifted cloning — each replica row gets its id
columns shifted by r*stride so the corpus genuinely GROWS (more orders,
more users, more documents), unlike the dedup family's exact-clone
regime where ids collide and rep-collapse should flatten the curve.
FK pairs shift by a SHARED stride (o_orderkey and l_orderkey move
together), so per-entity join cardinality stays constant and the ideal
exponent is alpha = log10(w_100x/w_10x) = 1.0 (linear). alpha > 1 names
a superlinear cause to fix; the known candidates are per-partition sort
growth in q_w1 (c_mktsegment has only 5 partitions — they fatten 100x)
and the global orderBy each query ends with.

Same methodology as scripts/dedup_scale_100x.py: full-host session
(local[16]/8g — the quantity under test is the exponent, not fit),
xor-folded xxhash64 materialization (count() lets Catalyst prune the
computed columns), warm-up run untimed.

Run:  python scripts/family_scale_100x.py [--out SCALE_FAMILY_100X.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# query -> {table: {column: stride_group}}; columns in the same group
# shift by one shared stride so FK relationships survive cloning.
TARGETS: dict[str, dict[str, dict[str, str]]] = {
    "q_w1_ranking": {"customer": {"c_custkey": "custkey"}},
    "q_t4_session_window": {
        "events": {"event_id": "eventid", "user_id": "userid"}
    },
    "q_j2_reconciliation": {
        "orders": {"o_orderkey": "orderkey"},
        "lineitem": {"l_orderkey": "orderkey"},
    },
    "q_x25_lm_perplexity": {"documents": {"doc_id": "docid"}},
}


def build_replica(src: str, dst: str, times: int, tables: dict) -> None:
    """Key-shifted clone of ``tables`` into ``dst``; every other table is
    symlinked from ``src`` so registry queries see a complete sf dir."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    strides: dict[str, int] = {}
    for t, cols in tables.items():
        for c, grp in cols.items():
            hi = con.execute(
                f"SELECT max({c}) FROM read_parquet('{src}/{t}.parquet')"
            ).fetchone()[0]
            strides[grp] = max(strides.get(grp, 0), int(hi) + 1)
    for t, cols in tables.items():
        repl = ", ".join(
            f"CAST({c} + g.r * {strides[grp]} AS BIGINT) AS {c}"
            for c, grp in cols.items()
        )
        con.execute(
            f"COPY (SELECT t.* REPLACE ({repl}) "
            f"FROM read_parquet('{src}/{t}.parquet') t "
            f"CROSS JOIN (SELECT unnest(range({times})) AS r) g) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    for t in ALL_TABLES:
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)


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
    ap.add_argument("--out", default="SCALE_FAMILY_100X.json")
    ap.add_argument("--scratch", default="/tmp/family_scale")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("family-scale-100x")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from receiptanalyzerpipeline_spark.plans import REGISTRY

    results: dict = {"ops": {}}
    for times in (10, 100):
        for qname, tables in TARGETS.items():
            dst = f"{args.scratch}/{qname}/x{times}"
            if not os.path.exists(dst):
                t0 = time.time()
                build_replica(args.src, dst, times, tables)
                print(
                    f"# {qname} x{times} replica built {time.time()-t0:.0f}s",
                    file=sys.stderr,
                )
            fn = REGISTRY[qname].spark
            materialize_s(fn(spark, dst))  # warm-up, untimed
            wall, rows = materialize_s(fn(spark, dst))
            results["ops"].setdefault(qname, {})[f"x{times}"] = {
                "wall_s": wall,
                "rows": rows,
            }
            print(
                json.dumps(
                    {"op": qname, "times": times, "wall_s": wall, "rows": rows}
                ),
                flush=True,
            )

    import math

    for name, r in results["ops"].items():
        w10, w100 = r["x10"]["wall_s"], r["x100"]["wall_s"]
        r["exponent"] = round(math.log10(max(w100, 0.01) / max(w10, 0.01)), 2)
    results["note"] = (
        "alpha = log10(w_100x/w_10x) under key-shifted 10x/100x cloning "
        "(FK groups share a stride); 1.0 = linear growth. Full-host "
        "session (local[16]/8g), same methodology as SCALE_DEDUP_100X."
    )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["ops"]), flush=True)


if __name__ == "__main__":
    sys.exit(main())
