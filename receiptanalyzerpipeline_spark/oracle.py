"""DuckDB oracle harness — a local replica of the driver's correctness gate.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB (tables pre-registered as views), then
compares row-count + schema + value-hash with columns sorted by name.

Round-1 lesson (VERDICT.md): the driver fetches results through the
*pandas* path, where engine-level representation differences survive even
when the Python values are ``==``:

- DuckDB DECIMAL  → float64 (``17.0``)   vs Spark DECIMAL → object ``Decimal('17.00')``
- DuckDB HUGEINT (``SUM(BIGINT)``) → float64 (``5.0``) vs Spark BIGINT → int64 (``5``)
- DuckDB DATE → datetime64 (``1995-01-01 00:00:00``) vs Spark DATE → object ``date`` (``1995-01-01``)
- NULL in a numeric column → NaN (float64) vs None (object)

So this comparator is deliberately *stricter* than round 1's: it fetches
both sides as pandas, requires dtype compatibility per column, and
compares every cell as ``(type_name, str(value))`` with rows sorted —
no value canonicalization that could hide representation skew. The
repo-wide output-type contract that makes queries pass this gate:

    final projections contain ONLY BIGINT, DOUBLE, STRING, BOOLEAN,
    TIMESTAMP (naive micros) and arrays/structs thereof — never DECIMAL,
    DATE, or (DuckDB-side) HUGEINT. Aggregate in DECIMAL for exactness,
    then cast the final column to DOUBLE on BOTH engines.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from receiptanalyzerpipeline_spark.catalog import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with every testdata table registered as a view."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_dtype(dt: object) -> str:
    """Dtype name with datetime64 units collapsed (ns-vs-us carries no value
    skew once both engines emit micro-aligned timestamps; str() comparison
    below still catches any sub-microsecond difference)."""
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime64"
    return s


def canon_cell(v: object) -> tuple[str, str]:
    """Strict cell form: exact runtime type name + str(value).

    float NaN is normalized to one spelling so NaN==NaN, but float-vs-int,
    float-vs-Decimal, None-vs-NaN, date-vs-Timestamp all stay DISTINCT —
    that distinction is precisely what the driver's hash sees.
    """
    if isinstance(v, float) and math.isnan(v):
        return ("float", "nan")
    if v is pd.NaT:
        return ("NaT", "NaT")
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("array", str([canon_cell(x) for x in v]))
    if isinstance(v, dict):
        return ("map", str(sorted((str(k), canon_cell(x)) for k, x in v.items())))
    # numpy scalar boxing is a FETCH-PATH artifact, not a value property:
    # Spark returns array<double> elements as np.float64 with Arrow on but
    # as Python float with Arrow off (the driver's default session), and
    # DuckDB list fetches always box np.float64. Unify to the Python
    # spelling; a genuine width difference (float32) still surfaces
    # because float(np.float32(x)) changes the repr.
    tname = type(v).__name__
    if tname == "float64":
        return ("float", str(float(v)))
    if tname in ("int64", "int32", "uint64", "uint32"):
        return ("int", str(int(v)))
    if tname == "bool_":
        return ("bool", str(bool(v)))
    return (tname, str(v))


def canon_frame(df: pd.DataFrame) -> tuple[list[tuple[str, str]], list[tuple]]:
    """(sorted (col, dtype) pairs, row tuples of canon cells sorted)."""
    cols = sorted(df.columns)
    dtypes = [(c, _canon_dtype(df[c].dtype)) for c in cols]
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return dtypes, rows


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for m in self.mismatches[:6]:
            msg += f"\n    {m}"
        return msg


def compare(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: duckdb.DuckDBPyConnection,
) -> CompareResult:
    """Run both engines through the pandas fetch path and compare strictly."""
    sp = spark_df.toPandas()
    op = con.execute(oracle_sql).df()

    res = CompareResult(name, True, len(sp), len(op))

    if sorted(sp.columns) != sorted(op.columns):
        res.ok = False
        res.mismatches.append(
            f"columns differ: spark={sorted(sp.columns)} oracle={sorted(op.columns)}"
        )
        return res
    if len(sp) != len(op):
        res.ok = False
        res.mismatches.append("row counts differ")

    s_dtypes, s_rows = canon_frame(sp)
    o_dtypes, o_rows = canon_frame(op)

    for (c, sd), (_, od) in zip(s_dtypes, o_dtypes):
        if sd != od:
            res.ok = False
            res.mismatches.append(f"dtype[{c}]: spark={sd} oracle={od}")

    if s_rows != o_rows:
        res.ok = False
        shown = 0
        for i, (a, b) in enumerate(zip(s_rows, o_rows)):
            if a != b:
                res.mismatches.append(f"row {i}: spark={a!r} oracle={b!r}")
                shown += 1
                if shown >= 3:
                    break
        if len(s_rows) != len(o_rows):
            res.mismatches.append(f"len(spark)={len(s_rows)} len(oracle)={len(o_rows)}")
    return res


def compare_setwise(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: duckdb.DuckDBPyConnection,
    work_dir: str,
    memory_limit: str = "16GB",
    temp_cap: str = "48GB",
    oracle_timeout_s: float = 900.0,
) -> CompareResult:
    """Out-of-core exact multiset compare for outputs too large for the
    pandas fetch path (the sf1 sweep's 50M-row pair lists).

    Spark writes its result to parquet (distributed, never collected);
    DuckDB then streams BOTH sides — the parquet and the oracle query —
    through the same order-independent digest: ``(count(*),
    bit_xor(hash(cols)), sum(hash(cols)))``. One O(1)-memory aggregate
    pass per side; no temp-table copy and no EXCEPT hash tables (a
    first-cut EXCEPT ALL implementation spilled 67 GB on a 51M-row
    suite — the digest replaces that with two streaming scans). Both
    sides hash through DuckDB's own ``hash()`` on identically-typed
    values, so equality means bitwise-equal multisets up to digest
    collision; bit_xor and sum fail independently (xor catches a
    flipped value, sum catches pair-cancelling duplicates), and the
    pandas comparator remains the primary gate at sf0.01. The oracle's
    own intermediates run under ``max_temp_directory_size`` so a
    blow-up errors cleanly instead of filling the disk.
    """
    import os as _os

    out = _os.path.join(work_dir, f"{name}.spark.parquet")
    # 16 MB row groups instead of parquet's 128 MB default: each write
    # task buffers a full row group, so 8 concurrent tasks under the
    # sweep's 1 GB driver-default heap sit one flush away from an OOM
    # at the default size (q_d2's 51.6 M-row write died exactly there
    # in round 9). The compare only ever streams this file back through
    # DuckDB, which is indifferent to row-group granularity.
    spark_df.write.mode("overwrite").option(
        "parquet.block.size", 16 * 1024 * 1024
    ).parquet(out)
    try:
        con.execute(f"SET temp_directory='{work_dir}/duck_spill'")
    except duckdb.NotImplementedException:
        # DuckDB refuses to switch temp_directory once the current one
        # has been used (even to the same path); the first call's
        # setting stays in force for the connection.
        pass
    con.execute(f"SET memory_limit='{memory_limit}'")
    con.execute(f"SET max_temp_directory_size='{temp_cap}'")
    src = f"read_parquet('{out}/*.parquet')"
    sdesc = con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
    odesc = con.execute(f"DESCRIBE SELECT * FROM ({oracle_sql}) AS _o").fetchall()
    stypes = {r[0]: r[1] for r in sdesc}
    otypes = {r[0]: r[1] for r in odesc}

    res = CompareResult(name, True, -1, -1)
    if sorted(stypes) != sorted(otypes):
        res.ok = False
        res.mismatches.append(
            f"columns differ: spark={sorted(stypes)} oracle={sorted(otypes)}"
        )
        return res
    for c in sorted(stypes):
        if stypes[c] != otypes[c]:
            res.ok = False
            res.mismatches.append(f"dtype[{c}]: spark={stypes[c]} oracle={otypes[c]}")
    if not res.ok:
        return res

    cols = ", ".join(f'"{c}"' for c in sorted(stypes))

    def digest(rel: str, timeout_s: float | None = None) -> tuple:
        # A clone-quadratic oracle can take hours at sf1; interrupt it
        # at the cap so the sweep records a clean error and moves on.
        # ADVICE r8: the interrupt is guarded by a lock-held flag —
        # without it, a timer firing between fetchone() returning and
        # timer.cancel() lands the interrupt on an idle shared
        # connection and spuriously cancels the NEXT oracle query.
        import threading

        lock = threading.Lock()
        running = True
        fired = False

        def _interrupt() -> None:
            nonlocal fired
            with lock:
                if running:
                    fired = True
                    con.interrupt()

        timer = None
        if timeout_s:
            timer = threading.Timer(timeout_s, _interrupt)
            timer.start()
        try:
            row = con.execute(
                f"SELECT count(*), bit_xor(__h), sum(__h::HUGEINT) "
                f"FROM (SELECT hash({cols}) AS __h FROM {rel})"
            ).fetchone()
        finally:
            with lock:
                running = False
            if timer is not None:
                timer.cancel()
        if fired:
            # Interrupt landed while the query was finishing but the
            # result still arrived: absorb any pending interrupt flag so
            # it cannot cancel the connection's next statement.
            try:
                con.execute("SELECT 1").fetchone()
            except duckdb.InterruptException:
                pass
        return row

    s_n, s_xor, s_sum = digest(src)
    o_n, o_xor, o_sum = digest(f"({oracle_sql}) AS _o", timeout_s=oracle_timeout_s)
    res.spark_rows, res.oracle_rows = int(s_n), int(o_n)
    if s_n != o_n:
        res.ok = False
        res.mismatches.append("row counts differ")
    if s_xor != o_xor or s_sum != o_sum:
        res.ok = False
        res.mismatches.append(
            f"multiset digest differs: xor {s_xor} vs {o_xor}, "
            f"sum {s_sum} vs {o_sum}"
        )
    return res


def compare_setwise_parts(
    name: str,
    parquet_dir: str,
    part_sqls: dict[str, str],
    con: duckdb.DuckDBPyConnection,
    work_dir: str | None = None,
    memory_limit: str = "16GB",
    temp_cap: str = "48GB",
    oracle_timeout_s: float = 900.0,
) -> dict[str, CompareResult]:
    """Part-wise fallback for suite oracles that OOM as ONE fused query
    (VERDICT r8 task 2: q_d2/q_g1/q_x10's sf1 oracles exceeded DuckDB's
    spill cap computing the whole union, while each member's SQL runs
    fine alone). Entirely DuckDB-side: the Spark side is the parquet
    ``compare_setwise`` already wrote (filtered per part tag), so no
    Spark job re-runs; each part's oracle digests independently under
    the same memory/temp caps and timeout. Returns tag -> CompareResult
    with the same multiset-digest semantics as ``compare_setwise``."""
    import threading

    if work_dir:
        try:
            con.execute(f"SET temp_directory='{work_dir}/duck_spill'")
        except duckdb.NotImplementedException:
            pass  # already in force for this connection (see compare_setwise)
    con.execute(f"SET memory_limit='{memory_limit}'")
    con.execute(f"SET max_temp_directory_size='{temp_cap}'")
    src = f"read_parquet('{parquet_dir}/*.parquet')"
    sdesc = con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
    cols = ", ".join(f'"{c}"' for c in sorted(r[0] for r in sdesc))

    def digest(rel: str, timeout_s: float | None = None) -> tuple:
        lock = threading.Lock()
        running = True
        fired = False

        def _interrupt() -> None:
            nonlocal fired
            with lock:
                if running:
                    fired = True
                    con.interrupt()

        timer = None
        if timeout_s:
            timer = threading.Timer(timeout_s, _interrupt)
            timer.start()
        try:
            row = con.execute(
                f"SELECT count(*), bit_xor(__h), sum(__h::HUGEINT) "
                f"FROM (SELECT hash({cols}) AS __h FROM {rel})"
            ).fetchone()
        finally:
            with lock:
                running = False
            if timer is not None:
                timer.cancel()
        if fired:
            try:
                con.execute("SELECT 1").fetchone()
            except duckdb.InterruptException:
                pass
        return row

    out: dict[str, CompareResult] = {}
    for tag, psql in part_sqls.items():
        res = CompareResult(f"{name}.{tag}", True, -1, -1)
        # Tag which SIDE a digest exception came from (ADVICE r9): the
        # Spark-parquet digest runs under the same memory_limit and can
        # itself OOM; callers must not classify that as "oracle
        # capacity" — it would leave an UNVERIFIED Spark result looking
        # like a benign oracle skip.
        side = "spark-parquet"
        try:
            s_n, s_xor, s_sum = digest(
                f"(SELECT * FROM {src} WHERE part = '{tag}') AS _s"
            )
            side = "oracle"
            o_n, o_xor, o_sum = digest(
                f"({psql}) AS _o", timeout_s=oracle_timeout_s
            )
            res.spark_rows, res.oracle_rows = int(s_n), int(o_n)
            if s_n != o_n:
                res.ok = False
                res.mismatches.append("row counts differ")
            if s_xor != o_xor or s_sum != o_sum:
                res.ok = False
                res.mismatches.append(
                    f"multiset digest differs: xor {s_xor} vs {o_xor}, "
                    f"sum {s_sum} vs {o_sum}"
                )
        except Exception as ex:  # per-part isolation: one OOM ≠ suite opaque
            res.ok = False
            res.mismatches.append(
                f"exception ({side} digest): {type(ex).__name__}: {str(ex)[:200]}"
            )
        out[tag] = res
    return out


def run_all(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
) -> list[CompareResult]:
    """Compare every registered query with an oracle against DuckDB."""
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    con = duckdb_connect(sf_dir)
    results = []
    for qname, q in sorted(REGISTRY.items()):
        if names and qname not in names:
            continue
        if q.oracle is None:
            continue
        try:
            results.append(compare(qname, q.spark(spark, sf_dir), q.oracle, con))
        except Exception as ex:  # surface per-query failures without aborting the sweep
            r = CompareResult(qname, False, -1, -1)
            r.mismatches.append(f"exception: {type(ex).__name__}: {ex}")
            results.append(r)
    return results
