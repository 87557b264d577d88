"""Close the sf1 value-evidence gaps (VERDICT r9 tasks 3-4).

Four sf1 outcomes were rows-only/skipped in SF1_SWEEP.json because their
DuckDB oracles are super-linear in clone density, not because the engine
is unverifiable:

1. ``q_er2_qgram_edit_join`` — oracle is the deliberately-exhaustive
   O(n^2) self-join (hours at sf1). Closed here by SAMPLED SLICES:
   restrict BOTH sides to one deterministic md5 bucket of ``p_name``
   (16 buckets; same 16-bit-md5 family as operators/sampling.py
   hash_bucket), where the O((n/16)^2) per-slice oracle is affordable,
   and digest-compare the engine's full sf1 output filtered to
   same-bucket pairs against the slice oracle — for ``--er2-slices`` of
   the 16 buckets. Any edit-distance pair whose two names share a
   bucket is covered; the prefix filter's losslessness is evidenced on
   real sf1 data, not extrapolated from sf0.1.
2. ``q_g1_graph_suite`` / ``pagerank`` part — the fused oracle
   (clone-quadratic shingle self-join + 3 unrolled PageRank iterations
   in ONE query) exceeded the sf0.1 budget. Closed at FULL sf1 by
   STAGED CTAS: each pipeline stage materializes to a temp table so
   DuckDB releases memory between stages (the components part already
   proved the expensive pair join itself fits), then the digest runs on
   the final table.
3. ``q_d2_neardup_suite`` / ``keepbest`` and ``q_x10_selection_suite``
   / ``split`` — both oracles carry a RECURSIVE transitive-closure CTE
   over clone-dense pairs. Closed at an intermediate ANCHOR (default
   3x = sf0.3 replica, same key-shifted construction as the sweep's
   10x) where DuckDB fits, recorded as ``match (sf0.3 anchor)``.

Writes SF1_CLOSE.json with the raw evidence, and with ``--merge``
patches the corresponding SF1_SWEEP.json rows (labels name the
protocol; summary recomputed via sf1_sweep.compute_summary).

Run:  python scripts/sf1_close_parts.py [--merge]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ER2_K = 16
ER2_SALT = "er2slice"


def duck_bucket(expr: str) -> str:
    """DuckDB replay of operators/sampling.py hash_bucket (16-bit md5),
    reduced mod ER2_K — the _fs_md5_sql precedent (plans/curation.py)."""
    return (
        f"(CAST(('0x' || substr(md5('{ER2_SALT}:' || {expr}), 1, 4)) AS BIGINT) "
        f"% {ER2_K})"
    )


def spark_bucket(col):
    from pyspark.sql import functions as F

    hx = F.substring(
        F.md5(F.concat(F.lit(ER2_SALT + ":"), F.col(col).cast("string"))), 1, 4
    )
    return F.conv(hx, 16, 10).cast("long") % ER2_K


def er2_slice_sql(i: int) -> str:
    """Exhaustive edit-join oracle restricted to md5 slice ``i`` on BOTH
    sides — the q_er2 oracle SQL (plans/curation.py) verbatim, over the
    slice-filtered part table, plus the slice tag for the part-wise
    digest machinery."""
    return f"""
        WITH p AS (SELECT * FROM part WHERE {duck_bucket('p_name')} = {i})
        SELECT CAST('{i}' AS VARCHAR) AS part,
               a.p_partkey AS key_a, b.p_partkey AS key_b,
               a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
        FROM p a JOIN p b ON a.p_partkey < b.p_partkey
        WHERE abs(len(a.p_name) - len(b.p_name)) <= 2
          AND levenshtein(a.p_name, b.p_name) <= 2
    """


def close_er2(spark, dst: str, work_dir: str, slices: list[int], timeout: float):
    """Engine side: ONE pass over the full sf1 q_er2 result keeps only
    same-bucket pairs in the chosen slices (~1/16th of 552 M rows) and
    writes them parquet-partitioned by slice tag; oracle side: one
    exhaustive slice join per bucket, digest-compared."""
    from pyspark.sql import functions as F

    from receiptanalyzerpipeline_spark import oracle as O
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    df = REGISTRY["q_er2_qgram_edit_join"].spark(spark, dst)
    sliced = (
        df.withColumn("__ba", spark_bucket("name_a"))
        .withColumn("__bb", spark_bucket("name_b"))
        .where(
            (F.col("__ba") == F.col("__bb")) & F.col("__ba").isin([int(s) for s in slices])
        )
        .withColumn("part", F.col("__ba").cast("string"))
        .drop("__ba", "__bb")
    )
    pq = os.path.join(work_dir, "q_er2.slices.parquet")
    t0 = time.time()
    sliced.write.mode("overwrite").option(
        "parquet.block.size", 16 * 1024 * 1024
    ).parquet(pq)
    spark_s = round(time.time() - t0, 1)

    con = O.duckdb_connect(dst)
    psqls = {str(i): er2_slice_sql(i) for i in slices}
    t0 = time.time()
    pres = O.compare_setwise_parts(
        "q_er2_slices", pq, psqls, con, work_dir, oracle_timeout_s=timeout
    )
    con.close()
    out = {
        "protocol": (
            f"engine sf1 output filtered to same-bucket pairs, md5('{ER2_SALT}:'||name) "
            f"16-bit prefix mod {ER2_K}; exhaustive O((n/{ER2_K})^2) oracle per slice"
        ),
        "slices": {
            t: {
                "ok": r.ok,
                "rows": r.spark_rows,
                "oracle_rows": r.oracle_rows,
                "mismatches": r.mismatches,
            }
            for t, r in pres.items()
        },
        "spark_write_s": spark_s,
        "oracle_s": round(time.time() - t0, 1),
    }
    out["all_match"] = all(r.ok for r in pres.values())
    return out


_PAGERANK_STAGES = """
CREATE OR REPLACE TEMP TABLE t_e AS
    WITH {shingles} SELECT * FROM e;
CREATE OR REPLACE TEMP TABLE t_sizes AS
    SELECT doc_id, COUNT(*) AS n FROM t_e GROUP BY doc_id;
CREATE OR REPLACE TEMP TABLE t_pairs AS
    SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        FROM t_e a JOIN t_e b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ) inter
    JOIN t_sizes sa ON sa.doc_id = id_a
    JOIN t_sizes sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5;
DROP TABLE t_e;
CREATE OR REPLACE TEMP TABLE t_edges AS
    SELECT id_a AS s, id_b AS d FROM t_pairs
    UNION ALL SELECT id_b, id_a FROM t_pairs;
CREATE OR REPLACE TEMP TABLE t_deg AS
    SELECT s, COUNT(*) AS outdeg FROM t_edges GROUP BY s;
CREATE OR REPLACE TEMP TABLE t_nodes AS
    SELECT DISTINCT s AS node FROM t_edges;
CREATE OR REPLACE TEMP TABLE t_pr0 AS
    SELECT node, CAST(1.0 AS DOUBLE) / (SELECT COUNT(*) FROM t_nodes) AS pr
    FROM t_nodes;
"""

_PAGERANK_ITER = """
CREATE OR REPLACE TEMP TABLE t_pr{k} AS
    WITH s AS (
        SELECT e.d, CAST(SUM(CAST(FLOOR((p.pr / dg.outdeg) * 1e12) AS BIGINT)) AS BIGINT) AS sc
        FROM t_edges e JOIN t_pr{prev} p ON p.node = e.s JOIN t_deg dg ON dg.s = e.s
        GROUP BY e.d
    )
    SELECT n.node,
           CAST(0.15 AS DOUBLE) / (SELECT COUNT(*) FROM t_nodes)
           + CAST(0.85 AS DOUBLE) * (CAST(COALESCE(s.sc, 0) AS DOUBLE) / 1e12) AS pr
    FROM t_nodes n LEFT JOIN s ON s.d = n.node;
DROP TABLE t_pr{prev};
"""


def close_pagerank(spark, dst: str, work_dir: str, timeout: float):
    """Full-sf1 pagerank oracle as sequential CTAS rounds — the staged
    replay of plans/llmops.py _pagerank_oracle (same quantized-integer
    contributions, same unrolled 3 iterations), with each stage's
    intermediate dropped as soon as consumed so the peak is one stage,
    not the fused query that blew the sweep's oracle budget."""
    from receiptanalyzerpipeline_spark import oracle as O
    from receiptanalyzerpipeline_spark.plans import REGISTRY
    from receiptanalyzerpipeline_spark.plans.llmops import _SHINGLES_CTE

    df = REGISTRY["q_g1_graph_suite"].spark(spark, dst)
    pq = os.path.join(work_dir, "q_g1.spark.parquet")
    t0 = time.time()
    df.write.mode("overwrite").option(
        "parquet.block.size", 16 * 1024 * 1024
    ).parquet(pq)
    spark_s = round(time.time() - t0, 1)

    con = O.duckdb_connect(dst)
    con.execute(f"SET temp_directory='{work_dir}/duck_spill'")
    con.execute("SET memory_limit='16GB'")
    con.execute("SET max_temp_directory_size='48GB'")
    t0 = time.time()
    stage_walls = {}
    for stmt in _PAGERANK_STAGES.format(shingles=_SHINGLES_CTE).split(";"):
        if not stmt.strip():
            continue
        s0 = time.time()
        con.execute(stmt)
        tag = stmt.strip().split("\n")[0][:60]
        stage_walls[tag] = round(time.time() - s0, 1)
    prev = "0"
    for k in ("1", "2", "3"):
        for stmt in _PAGERANK_ITER.format(k=k, prev=prev).split(";"):
            if stmt.strip():
                con.execute(stmt)
        prev = k
    oracle_rel = (
        "(SELECT CAST('pagerank' AS VARCHAR) AS part, "
        "CAST(node AS BIGINT) AS doc_id, CAST(pr AS DOUBLE) AS v "
        "FROM t_pr3) AS _o"
    )
    spark_rel = (
        f"(SELECT * FROM read_parquet('{pq}/*.parquet') "
        "WHERE part = 'pagerank') AS _s"
    )
    cols = '"doc_id", "part", "v"'  # sorted col names, compare_setwise_parts form

    def digest(rel):
        return con.execute(
            f"SELECT count(*), bit_xor(__h), sum(__h::HUGEINT) "
            f"FROM (SELECT hash({cols}) AS __h FROM {rel})"
        ).fetchone()

    s_n, s_xor, s_sum = digest(spark_rel)
    o_n, o_xor, o_sum = digest(oracle_rel)
    con.close()
    ok = (int(s_n), s_xor, s_sum) == (int(o_n), o_xor, o_sum)
    return {
        "protocol": "staged-CTAS replay of the unrolled 3-iteration quantized oracle at full sf1",
        "ok": ok,
        "rows": int(s_n),
        "oracle_rows": int(o_n),
        "digests": {"spark": [int(s_n), str(s_xor), str(s_sum)], "oracle": [int(o_n), str(o_xor), str(o_sum)]},
        "stage_walls_s": stage_walls,
        "spark_write_s": spark_s,
        "oracle_s": round(time.time() - t0, 1),
    }


def close_anchor(spark, anchor_dir: str, work_dir: str, timeout: float, times: int):
    """q_d2/keepbest and q_x10/split value-checked end-to-end at the
    intermediate anchor scale via the member queries' OWN oracles
    (compare_setwise digest — no pandas collect)."""
    from receiptanalyzerpipeline_spark import oracle as O
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    out = {}
    con = O.duckdb_connect(anchor_dir)
    for member in ("q_d10_keep_best_canonical", "q_x7_leakage_safe_split"):
        t0 = time.time()
        try:
            df = REGISTRY[member].spark(spark, anchor_dir)
            r = O.compare_setwise(
                member, df, REGISTRY[member].oracle, con, work_dir,
                oracle_timeout_s=timeout,
            )
            out[member] = {
                "ok": r.ok,
                "rows": r.spark_rows,
                "oracle_rows": r.oracle_rows,
                "mismatches": r.mismatches,
                "wall_s": round(time.time() - t0, 1),
            }
        except Exception as e:  # noqa: BLE001
            out[member] = {
                "ok": False,
                "err": f"{type(e).__name__}: {str(e)[:300]}",
                "wall_s": round(time.time() - t0, 1),
            }
    con.close()
    out["times"] = times
    return out


def merge_into_sweep(close: dict, sweep_path: str, times: int) -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sf1_sweep", os.path.join(REPO, "scripts", "sf1_sweep.py")
    )
    sweep_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep_mod)

    with open(sweep_path) as f:
        sweep = json.load(f)
    rows = {r["name"]: r for r in sweep["results"]}
    anchor_label = f"match (sf0.{times} anchor)"

    er2 = close.get("er2")
    if er2 and er2["all_match"]:
        n = len(er2["slices"])
        rows["q_er2_qgram_edit_join"]["oracle"] = (
            f"match (sampled {n}/{ER2_K} md5-slices, exhaustive oracle per slice)"
        )
        rows["q_er2_qgram_edit_join"]["oracle_evidence"] = "SF1_CLOSE.json"
    pr = close.get("pagerank")
    if pr and pr["ok"]:
        g1 = rows["q_g1_graph_suite"]
        g1.setdefault("oracle_parts", {})["pagerank"] = "match (sf1 staged-ctas)"
        g1["oracle_parts_skipped"] = [
            s for s in g1.get("oracle_parts_skipped", []) if s != "pagerank"
        ] or None
        if g1["oracle_parts_skipped"] is None:
            g1.pop("oracle_parts_skipped", None)
        n_match = sum(1 for v in g1["oracle_parts"].values() if str(v).startswith("match"))
        g1["oracle"] = f"match (partwise {n_match}/{n_match})" if n_match else g1["oracle"]
        if n_match == len(g1["oracle_parts"]):
            g1["oracle"] = "match (partwise)"
        g1["oracle_evidence"] = "SF1_CLOSE.json"
    anch = close.get("anchors", {})
    for member, suite, tag in (
        ("q_d10_keep_best_canonical", "q_d2_neardup_suite", "keepbest"),
        ("q_x7_leakage_safe_split", "q_x10_selection_suite", "split"),
    ):
        a = anch.get(member)
        if a and a.get("ok"):
            srow = rows[suite]
            srow.setdefault("oracle_parts", {})[tag] = anchor_label
            skipped = [s for s in srow.get("oracle_parts_skipped", []) if s != tag]
            if skipped:
                srow["oracle_parts_skipped"] = skipped
            else:
                srow.pop("oracle_parts_skipped", None)
            n_match = sum(
                1 for v in srow["oracle_parts"].values() if str(v).startswith("match")
            )
            srow["oracle"] = (
                "match (partwise)"
                if n_match == len(srow["oracle_parts"])
                else f"match (partwise {n_match}/{len(srow['oracle_parts'])})"
            )
            srow["oracle_evidence"] = "SF1_CLOSE.json"

    results = [rows[n] for n in sorted(rows)]
    summary = sweep_mod.compute_summary(results)
    if "floor_violations" in sweep.get("summary", {}):
        summary["floor_violations"] = sweep["summary"]["floor_violations"]
    with open(sweep_path, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1)
    print(json.dumps(summary))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--anchor-dst", default="/tmp/sf03")
    ap.add_argument("--anchor-times", type=int, default=3)
    ap.add_argument("--work-dir", default="/tmp/sf1_close_work")
    ap.add_argument("--out", default=os.path.join(REPO, "SF1_CLOSE.json"))
    ap.add_argument("--sweep", default=os.path.join(REPO, "SF1_SWEEP.json"))
    ap.add_argument("--oracle-timeout", type=float, default=1800.0)
    ap.add_argument("--er2-slices", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["er2", "pagerank", "anchors"])
    ap.add_argument("--merge", action="store_true",
                    help="patch SF1_SWEEP.json rows with the close outcomes")
    args = ap.parse_args()

    os.makedirs(args.work_dir, exist_ok=True)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("sf1-close-parts")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sf1_sweep", os.path.join(REPO, "scripts", "sf1_sweep.py")
    )
    sweep_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep_mod)

    if not os.path.isdir(args.dst) or not os.listdir(args.dst):
        print("# building sf1 replica", file=sys.stderr, flush=True)
        sweep_mod.build_sf1(args.src, args.dst)
    if "anchors" not in args.skip and (
        not os.path.isdir(args.anchor_dst) or not os.listdir(args.anchor_dst)
    ):
        print(f"# building x{args.anchor_times} anchor replica", file=sys.stderr, flush=True)
        sweep_mod.build_sf1(args.src, args.anchor_dst, times=args.anchor_times)

    close: dict = {"recorded_at": time.time()}
    if "er2" not in args.skip:
        print("# er2 sampled slices", file=sys.stderr, flush=True)
        close["er2"] = close_er2(
            spark, args.dst, args.work_dir,
            list(range(args.er2_slices)), args.oracle_timeout,
        )
        print(json.dumps(close["er2"]), flush=True)
        _dump(args.out, close)
    if "pagerank" not in args.skip:
        print("# pagerank staged ctas", file=sys.stderr, flush=True)
        close["pagerank"] = close_pagerank(
            spark, args.dst, args.work_dir, args.oracle_timeout
        )
        print(json.dumps(close["pagerank"]), flush=True)
        _dump(args.out, close)
    if "anchors" not in args.skip:
        print("# sf0.3 anchors", file=sys.stderr, flush=True)
        close["anchors"] = close_anchor(
            spark, args.anchor_dst, args.work_dir, args.oracle_timeout,
            args.anchor_times,
        )
        print(json.dumps(close["anchors"]), flush=True)
        _dump(args.out, close)

    if args.merge:
        merge_into_sweep(close, args.sweep, args.anchor_times)


def _dump(path: str, close: dict) -> None:
    with open(path, "w") as f:
        json.dump(close, f, indent=1)


if __name__ == "__main__":
    main()
