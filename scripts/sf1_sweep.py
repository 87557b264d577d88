"""sf1 driver-suite sweep under a DEFAULT heap (VERDICT r5 task 3).

Round 4 caught the q_a5 multi-distinct OOM only because the verdict
demanded an sf0.1 sweep on a 1 GB heap; this generalizes the probe to
sf1: replicate the driver's sf0.1 tables 10× (consistent key shifting —
every PK and its referencing FKs move together, dims untouched), then
run EVERY driver-registry query against the replica under a
driver-default session (1 GB heap, local[8]) and record rows/wall/err.
Where the DuckDB oracle is itself scalable (its sf0.1 wall is under
--oracle-budget seconds), the oracle runs on the same replica and the
result is hash-compared exactly like CORRECTNESS_r*.json; outputs too
large to collect through pandas get an exact out-of-core multiset
compare instead (oracle.compare_setwise: Spark writes parquet, DuckDB
takes the symmetric EXCEPT ALL diff with disk spill). Only exhaustive
oracles (the O(n²) q_er2 class) stay rows-only — at sf1 they are hours
of DuckDB, and their algorithms are already oracle-checked at
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


def build_sf1(src: str, dst: str, times: int = 10) -> None:
    """Replicate in DuckDB so every table keeps its exact physical
    parquet types (TIMESTAMP(NANOS) on events, DECIMALs on the TPC-H
    money columns) — both engines then see the replica exactly as they
    see the driver's own testdata."""
    import shutil

    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    strides: dict[str, int] = {}
    types: dict[tuple[str, str], str] = {}
    for t, cols in TABLES_SHIFT.items():
        for c, space in cols.items():
            hi, ty = con.execute(
                f"SELECT max({c}), any_value(typeof({c})) FROM read_parquet('{src}/{t}.parquet')"
            ).fetchone()
            strides[space] = max(strides.get(space, 0), int(hi) + 1)
            types[(t, c)] = ty
    for t, cols in TABLES_SHIFT.items():
        repl = ", ".join(
            f"CAST({c} + g.r * {strides[s]} AS {types[(t, c)]}) AS {c}"
            for c, s in cols.items()
        )
        con.execute(
            f"COPY (SELECT t.* REPLACE ({repl}) "
            f"FROM read_parquet('{src}/{t}.parquet') t "
            f"CROSS JOIN (SELECT unnest(range({times})) AS r) g) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"# {t}: x{times}", file=sys.stderr)
    con.close()


def _apply_parts(row: dict, outcome: dict, n_total: int) -> None:
    """Fold a part-wise outcome dict into the row's TOP-LEVEL 'oracle'
    field. A part FAIL must surface as a MISMATCH string there —
    summary['mismatches'] and the sf1 gate test only look at
    row['oracle'] (ADVICE r9: a real part-level value mismatch
    previously left the row 'rows-only'/'oracle_err' and the gate
    green)."""
    row["oracle_parts"] = outcome
    fails = sorted(t for t, v in outcome.items() if str(v).startswith("FAIL"))
    n_match = sum(1 for v in outcome.values() if v == "match")
    if fails:
        row["oracle"] = f"MISMATCH (partwise): {fails}"
    elif n_match:
        row["oracle"] = (
            "match (partwise)"
            if n_match == n_total
            else f"match (partwise {n_match}/{n_total})"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--out", default="SF1_SWEEP.json")
    ap.add_argument("--oracle-budget", type=float, default=10.0,
                    help="oracle runs at sf1 only if its sf0.1 wall is under this")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--work-dir", default="/tmp/sf1_sweep_work",
                    help="scratch for the setwise compare (spark result "
                         "parquet + DuckDB spill)")
    ap.add_argument("--oracle-timeout", type=float, default=900.0,
                    help="hard cap per sf1 oracle execution: the sf0.1 "
                         "budget can admit an oracle whose sf1 cost is "
                         "super-linear (q_g1's recursive CTE ate the "
                         "whole 2 h sweep window in round 8); past the "
                         "cap the DuckDB query is interrupted and the "
                         "row records the timeout")
    ap.add_argument("--cpus", type=int, default=8,
                    help="local[N]; fewer cores = more heap per concurrent task "
                         "(the 1 GB heap is fixed — this is the memory-bounded knob)")
    ap.add_argument("--start-after", default=None,
                    help="resume: skip query names up to and including this")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--merge", action="store_true",
                    help="merge this run's rows into an existing --out by "
                         "query name (fresh rows win) and recompute the "
                         "summary — for targeted re-runs after a fix "
                         "instead of hand-splicing the artifact")
    ap.add_argument("--restart-every", type=int, default=10,
                    help="recycle the Spark session every N queries: pinned "
                         "localCheckpoint blocks and broadcast refs from "
                         "earlier queries otherwise accumulate driver state, "
                         "and the envelope is per-QUERY (a fresh driver-"
                         "default session), not per-marathon")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # DRIVER-DEFAULT session: 1 GB heap, no engine tuning — the gate's
    # shape. One deliberate exception: the replica stores each table as a
    # SINGLE parquet file (the driver's own testdata layout), so the
    # default 128 MB split would serialize every heavy map-side stage
    # onto 1-2 tasks — an artifact of the replica layout, not of any
    # plan. 16 MB splits restore scan parallelism without touching the
    # 1 GB heap constraint the sweep exists to test.
    def fresh_session(hard: bool = False):
        # A query that kills the JVM (OOM → context shutdown) must not
        # poison every later row with ConnectionRefused (the round-6
        # sweep artifact problem): rebuild a clean driver-default session
        # after any unhealthy run. hard=True additionally tears down the
        # py4j gateway singletons — a heap-death takes the whole JVM
        # with it, and builder.getOrCreate() would otherwise keep
        # handing back proxies into the dead gateway (the round-8
        # cascade: 36 IllegalStateException rows after one q_er2 OOM).
        if hard:
            from pyspark import SparkContext

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
                    setattr(SparkSession, attr, None)
                except Exception:  # noqa: BLE001
                    pass
        else:
            try:
                active = SparkSession.getActiveSession()
                if active is not None:
                    active.stop()
            except Exception:  # noqa: BLE001
                pass
        s = (
            SparkSession.builder.master(f"local[{args.cpus}]")
            .appName("sf1-sweep")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.files.maxPartitionBytes", "16m")
            .getOrCreate()
        )
        s.sparkContext.setLogLevel("ERROR")
        return s

    spark = fresh_session()

    if not args.skip_build:
        t0 = time.time()
        build_sf1(args.src, args.dst)
        print(f"# replica built in {time.time() - t0:.0f}s", file=sys.stderr)

    import __spark_entry__ as E

    from receiptanalyzerpipeline_spark import oracle as O

    queries = E.queries()
    oracles = E.oracle_sql()

    os.makedirs(args.work_dir, exist_ok=True)
    con_small = O.duckdb_connect(args.src)
    con_big = O.duckdb_connect(args.dst)

    import threading

    def timed_oracle(fn):
        """Run an sf1 oracle under the --oracle-timeout interrupt.

        The interrupt only fires while the wrapped call is still running
        (lock-guarded flag — ADVICE r8): a timer that outraces cancel()
        would otherwise land on the idle shared connection and cancel
        the NEXT suite's oracle."""
        lock = threading.Lock()
        running = True

        def _interrupt():
            with lock:
                if running:
                    con_big.interrupt()

        timer = threading.Timer(args.oracle_timeout, _interrupt)
        timer.start()
        try:
            return fn()
        finally:
            with lock:
                running = False
            timer.cancel()
    def ensure_alive(s):
        """Health-probe the session; hard-rebuild if the JVM is gone.

        The per-query except path already resurrects after a failed
        MATERIALIZATION, but a JVM death inside the oracle section (the
        part-wise parquet write is a real Spark job) would otherwise
        poison every later row — exactly the round-6 cascade, one
        stage later."""
        try:
            s.range(1).count()
            return s
        except Exception:  # noqa: BLE001
            print("# session dead — hard rebuild", file=sys.stderr, flush=True)
            return fresh_session(hard=True)

    results = []
    started = args.start_after is None
    ran = 0
    for name in sorted(queries):
        if args.only is not None and name not in args.only:
            continue
        if not started:
            if name == args.start_after:
                started = True
            continue
        if args.restart_every and ran and ran % args.restart_every == 0:
            print("# recycling session", file=sys.stderr, flush=True)
            spark = fresh_session()
        ran += 1
        print(f"# running {name}", file=sys.stderr, flush=True)
        row: dict = {"name": name}
        t0 = time.time()
        try:
            df = queries[name](spark, args.dst)
            # Full materialization, not df.count(): under a bare count
            # Catalyst column-prunes computed columns, so an expensive
            # projection (q_d9's status subtree: 110 s of real work)
            # times as free. Hashing EVERY column into one xor-folded
            # checksum forces end-to-end execution while returning a
            # single row — nothing is collected into the 1 GB driver
            # (a clone-dense replica makes some pair outputs ×100).
            from pyspark.sql import functions as F

            n_rows, checksum = (
                df.select(F.xxhash64(*df.columns).alias("__h"))
                .agg(F.count(F.lit(1)), F.expr("bit_xor(__h)"))
                .first()
            )
            row["rows"] = int(n_rows)
            row["xor_hash"] = int(checksum) if checksum is not None else None
            row["spark_s"] = round(time.time() - t0, 2)
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {str(e)[:300]}"
            row["spark_s"] = round(time.time() - t0, 2)
            results.append(row)
            print(json.dumps(row), flush=True)
            with open(args.out + ".partial", "w") as f:
                json.dump({"results": results}, f, indent=1)
            try:  # health probe; rebuild the session if the JVM died
                spark.range(1).count()
            except Exception:  # noqa: BLE001
                print("# session dead — hard rebuild", file=sys.stderr, flush=True)
                spark = fresh_session(hard=True)
            continue
        sql = oracles.get(name)

        def _suite_part_sqls(qname):
            try:
                from receiptanalyzerpipeline_spark.plans.suites import (
                    part_oracle_sqls,
                )

                return part_oracle_sqls(qname)
            except KeyError:
                return None

        def _partwise(qname, frame, psqls, write_parquet):
            """Digest each part independently (oracle.compare_setwise_parts,
            all DuckDB-side); returns (per-part outcome dict, all_ok)."""
            nonlocal con_big
            pq_dir = os.path.join(args.work_dir, f"{qname}.spark.parquet")
            if write_parquet:
                # 16 MB row groups: a write task buffers a whole row
                # group, and 8 tasks x the 128 MB parquet default is the
                # exact heap-death this sweep's 1 GB envelope exists to
                # catch (q_d2's 51.6 M-row write, round 9).
                frame.write.mode("overwrite").option(
                    "parquet.block.size", 16 * 1024 * 1024
                ).parquet(pq_dir)
            if not os.path.isdir(pq_dir):
                return None, False
            # Close the previous connection before reconnecting — a
            # 50-suite sweep otherwise leaks one DuckDB connection (and
            # its file handles / spill dirs) per part-wise fallback
            # (ADVICE r9).
            try:
                con_big.close()
            except Exception:  # noqa: BLE001
                pass
            con_big = O.duckdb_connect(args.dst)
            pres = O.compare_setwise_parts(
                qname, pq_dir, psqls, con_big, args.work_dir,
                oracle_timeout_s=args.oracle_timeout,
            )
            outcome = {}
            all_ok = True
            for t, r in pres.items():
                if r.ok:
                    outcome[t] = "match"
                    continue
                msg = "; ".join(r.mismatches[:1])
                # Soft-skip requires the exception to come from the
                # ORACLE digest specifically (compare_setwise_parts tags
                # the side — ADVICE r9): the Spark-parquet digest runs
                # under the same 16 GB memory_limit and can itself OOM,
                # and that is an UNVERIFIED Spark result, not oracle
                # capacity.
                if "(oracle digest)" in msg and (
                    "InterruptException" in msg or "OutOfMemoryException" in msg
                ):
                    # Oracle capacity, not evidence of mismatch: the
                    # part's DuckDB side hit the interrupt cap or the
                    # spill cap (q_x10's split part is a clone-quadratic
                    # shingle self-join + recursive CTE — the q_er2
                    # exhaustive-oracle class). Recorded visibly, never
                    # folded into FAIL.
                    outcome[t] = (
                        "skipped (oracle timeout)"
                        if "InterruptException" in msg
                        else "skipped (oracle OOM)"
                    )
                else:
                    outcome[t] = f"FAIL: {r.mismatches[:1]}"
                    all_ok = False
            return outcome, all_ok

        if sql is not None:
            t0 = time.time()
            try:
                con_small.execute(sql).fetchall()
                small_wall = time.time() - t0
            except Exception:
                small_wall = float("inf")
            if small_wall > args.oracle_budget:
                row["oracle"] = f"rows-only (sf0.1 oracle {small_wall:.1f}s > budget)"
                # A fused suite oracle over budget doesn't mean every
                # PART is: budget-check each part's sf0.1 oracle alone
                # and value-check the affordable ones at sf1 (VERDICT r8
                # task 2 — no suite stays rows-only just because one
                # member's oracle is clone-quadratic).
                psqls = _suite_part_sqls(name)
                if psqls:
                    afford = {}
                    for tag, psql in psqls.items():
                        t1 = time.time()
                        try:
                            con_small.execute(psql).fetchall()
                            pw = time.time() - t1
                        except Exception:
                            pw = float("inf")
                        if pw <= args.oracle_budget:
                            afford[tag] = psql
                    if afford:
                        try:
                            outcome, all_ok = _partwise(name, df, afford, True)
                        except Exception as e:  # noqa: BLE001
                            # The write is a real Spark job and can take
                            # the JVM with it; resurrect, re-derive the
                            # frame on the fresh session, and retry once
                            # (the lean-row-group write makes the retry
                            # meaningfully different, not a coin flip).
                            row["oracle_parts_retry"] = (
                                f"{type(e).__name__}: {str(e)[:160]}"
                            )
                            spark = ensure_alive(spark)
                            try:
                                df = queries[name](spark, args.dst)
                                outcome, all_ok = _partwise(
                                    name, df, afford, True
                                )
                            except Exception as e2:  # noqa: BLE001
                                row["oracle_parts_err"] = (
                                    f"{type(e2).__name__}: {str(e2)[:200]}"
                                )
                                spark = ensure_alive(spark)
                                outcome, all_ok = None, False
                        if outcome is not None:
                            skipped = sorted(set(psqls) - set(afford))
                            if skipped:
                                row["oracle_parts_skipped"] = skipped
                            _apply_parts(row, outcome, len(psqls))
                row["oracle_s"] = round(time.time() - t0, 2)
            elif n_rows > 3_000_000:
                # Too large to collect through pandas — exact out-of-core
                # multiset compare instead (Spark writes parquet, DuckDB
                # takes the symmetric EXCEPT ALL diff with disk spill).
                t0 = time.time()
                try:
                    r = timed_oracle(
                        lambda: O.compare_setwise(
                            name, df, sql, con_big, args.work_dir,
                            oracle_timeout_s=args.oracle_timeout,
                        )
                    )
                    row["oracle"] = (
                        "match (setwise)" if r.ok else f"MISMATCH: {r.mismatches[:2]}"
                    )
                except Exception as e:  # noqa: BLE001
                    row["oracle"] = f"oracle_err: {type(e).__name__}: {str(e)[:200]}"
                    # Part-wise fallback (VERDICT r8 task 2): the FUSED
                    # suite oracle can exceed DuckDB's spill cap while
                    # each member's SQL runs fine alone. The Spark side
                    # is the parquet compare_setwise already wrote — no
                    # Spark re-run; a fresh connection isolates any
                    # post-OOM connection state.
                    psqls = _suite_part_sqls(name)
                    if psqls:
                        try:
                            outcome, all_ok = _partwise(name, df, psqls, False)
                        except Exception as e2:  # noqa: BLE001
                            row["oracle_parts_err"] = (
                                f"{type(e2).__name__}: {str(e2)[:200]}"
                            )
                            spark = ensure_alive(spark)
                            outcome, all_ok = None, False
                        if outcome is not None:
                            _apply_parts(row, outcome, len(outcome))
                row["oracle_s"] = round(time.time() - t0, 2)
            else:
                t0 = time.time()
                try:
                    r = timed_oracle(lambda: O.compare(name, df, sql, con_big))
                    row["oracle"] = "match" if r.ok else f"MISMATCH: {r.mismatches[:2]}"
                except Exception as e:  # noqa: BLE001
                    row["oracle"] = f"oracle_err: {type(e).__name__}: {str(e)[:200]}"
                    # Same part-wise fallback as the setwise branch: a
                    # fused suite oracle can blow DuckDB's spill cap or
                    # the interrupt ceiling even when its OUTPUT is small
                    # enough for the pandas compare (q_x10's 162 k rows
                    # hide a 7-member union whose sf1 oracle runs 900 s+).
                    # No parquet exists yet on this path — write it.
                    psqls = _suite_part_sqls(name)
                    if psqls:
                        try:
                            outcome, all_ok = _partwise(name, df, psqls, True)
                        except Exception as e2:  # noqa: BLE001
                            row["oracle_parts_err"] = (
                                f"{type(e2).__name__}: {str(e2)[:200]}"
                            )
                            spark = ensure_alive(spark)
                            outcome, all_ok = None, False
                        if outcome is not None:
                            _apply_parts(row, outcome, len(outcome))
                row["oracle_s"] = round(time.time() - t0, 2)
        # The suite's result is fully materialized (xor-hash + oracle
        # parquet write) — safe to reclaim any scratch its detached
        # _IterStores left behind (ADVICE r8: atexit can't delete
        # shared roots, and a 50-suite sweep would accumulate them).
        from receiptanalyzerpipeline_spark.operators.components import (
            vacuum_detached_scratch,
        )

        spark = ensure_alive(spark)
        vacuum_detached_scratch(spark)
        results.append(row)
        print(json.dumps(row), flush=True)
        # Durable progress: a killed sweep (host timeout, OOM of the
        # harness) keeps every completed row (round-8 lesson: a 2 h run
        # died at the window edge with all rows buffered in a pipe).
        with open(args.out + ".partial", "w") as f:
            json.dump({"results": results}, f, indent=1)

    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f).get("results", [])
        by = {r["name"]: r for r in prev}
        for r in results:
            by[r["name"]] = r
        results = [by[n] for n in sorted(by)]

    summary = compute_summary(results)
    walls = {r["name"]: r["spark_s"] for r in results if "spark_s" in r}
    # Host-speed canary (VERDICT r9 task 1, sf1 side): measured on the
    # PINNED sf0.1 lineitem (host speed, not replica size) under this
    # sweep's own session, recorded in the artifact, and used to scale
    # the floor bounds exactly like bench.py's gate.
    hi = 1.0
    try:
        import bench

        canary = bench.measure_canary(spark, args.src)
        hi = sf1_host_index(canary)
        summary["canary"] = canary
        summary["host_index"] = hi
    except Exception as e:  # noqa: BLE001 — a dead session must not void the sweep
        summary["canary_err"] = f"{type(e).__name__}: {str(e)[:120]}"
    fv = check_sf1_floors(walls, hi)
    if fv is not None:
        summary["floor_violations"] = fv
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1)
    print(json.dumps(summary), flush=True)


def compute_summary(results: list[dict]) -> dict:
    """Sweep-wide counters (shared with scripts/sf1_close_parts.py's
    merge step so a re-merged artifact recomputes the SAME summary)."""
    errs = [r for r in results if "err" in r]
    mismatches = [r for r in results if str(r.get("oracle", "")).startswith("MISMATCH")]
    return {
        "sf": 1.0,
        "n_queries": len(results),
        "errs": len(errs),
        "hash_checked": sum(1 for r in results if r.get("oracle") == "match"),
        "setwise_checked": sum(
            1 for r in results if r.get("oracle") == "match (setwise)"
        ),
        "partwise_checked": sum(
            1 for r in results
            if str(r.get("oracle", "")).startswith("match (partwise")
        ),
        # VERDICT r9 task 3: q_er2's sf1 value evidence is sampled-slice
        # (deterministic md5 buckets, exhaustive oracle per slice).
        "sampled_checked": sum(
            1 for r in results
            if str(r.get("oracle", "")).startswith("match (sampled")
        ),
        "mismatches": len(mismatches),
        # Belt-and-braces (ADVICE r9): count part-level FAILs directly
        # so a future regression in the propagation above can't hide a
        # value mismatch from the gate test.
        "part_fails": sum(
            1
            for r in results
            for v in (r.get("oracle_parts") or {}).values()
            if str(v).startswith("FAIL")
        ),
        "rows_only": sum(1 for r in results if str(r.get("oracle", "")).startswith("rows-only")),
        "total_spark_s": round(sum(r.get("spark_s", 0) for r in results), 1),
    }


def sf1_host_index(canary: dict[str, float] | None) -> float:
    """host_index against SF1_FLOORS.json's canary_reference (measured
    under the sweep session shape); 1.0 when no reference is committed."""
    import bench

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SF1_FLOORS.json",
    )
    if not os.path.exists(path):
        return 1.0
    with open(path) as f:
        return bench.host_index(canary, json.load(f))


def check_sf1_floors(walls: dict[str, float], hi: float = 1.0) -> list[str] | None:
    """sf1 mirror of bench.check_floors (VERDICT r8 task 7): compare the
    sweep's engine walls against committed slow-tail references. The sf1
    envelope (1 GB heap, local[8], shared host) is far noisier than the
    sf0.1 bench, so the bounds are looser — the gate exists to catch the
    round-8 disease class (a rep-collapse regression turning 10 s back
    into 90+ s), not 20% jitter. Returns None when no floors file exists."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SF1_FLOORS.json",
    )
    if not os.path.exists(path):
        return None
    with open(path) as f:
        floors = json.load(f)
    mult = floors["multiplier"]
    slack = floors["absolute_slack_sec"]
    out = []
    for name, ref in floors["reference"].items():
        got = walls.get(name)
        if got is None:
            continue
        bound = max(ref * mult, ref + slack) * hi
        if got > bound:
            out.append(
                f"{name}: {got:.1f}s > bound {bound:.1f}s "
                f"(ref {ref:.1f}s, host_index {hi})"
            )
    return out


if __name__ == "__main__":
    main()
