"""DuckDB oracle harness — a local replica of the driver's correctness gate.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB (tables pre-registered as views), then
compares row-count + schema + order-insensitive value-hash with columns
sorted by name. This module reproduces that comparison so every query can
be verified locally before it's claimed as done.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import DataFrame, SparkSession

from receiptanalyzerpipeline_spark.catalog import TABLES

Canon = tuple


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with every testdata table registered as a view."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def canon_value(v: object) -> object:
    """Engine-neutral canonical form for one cell."""
    if v is None:
        return ("0null",)  # tuple-shaped so mixed null/non-null columns sort stably
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, decimal.Decimal):
        return ("num", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", repr(v))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, _dt.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, _dt.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(canon_value(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((str(k), canon_value(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v).hex())
    return ("str", str(v))


def canon_rows(columns: list[str], rows: list[tuple]) -> list[Canon]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_value(row[i]) for i in order) for row in rows]
    out.sort()
    return out


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
        for m in self.mismatches[:5]:
            msg += f"\n    {m}"
        return msg


def compare(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: duckdb.DuckDBPyConnection,
) -> CompareResult:
    """Run both engines and compare canonicalized results."""
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    cur = con.execute(oracle_sql)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()

    res = CompareResult(name, True, len(spark_rows), len(oracle_rows))

    if sorted(spark_cols) != sorted(oracle_cols):
        res.ok = False
        res.mismatches.append(f"columns differ: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
        return res
    if len(spark_rows) != len(oracle_rows):
        res.ok = False
        res.mismatches.append("row counts differ")

    s = canon_rows(spark_cols, spark_rows)
    o = canon_rows(oracle_cols, oracle_rows)
    if s != o:
        res.ok = False
        shown = 0
        for i, (a, b) in enumerate(zip(s, o)):
            if a != b:
                res.mismatches.append(f"row {i}: spark={a!r} oracle={b!r}")
                shown += 1
                if shown >= 3:
                    break
        if len(s) != len(o):
            res.mismatches.append(f"len(spark)={len(s)} len(oracle)={len(o)}")
    return res


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
