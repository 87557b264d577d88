"""SQL front door (sqlfront.EngineSession + `anarcpt-spark sql`).

The parity tests submit ONE ANSI-SQL string to BOTH engines — Spark via
EngineSession.sql (temp views over the sf tables) and DuckDB via the
oracle connection — and hash-compare results with the same canonicalizer
the driver gate uses. The hazard tests pin the preflight policies.
"""

from __future__ import annotations

import pytest

from receiptanalyzerpipeline_spark.oracle import compare
from receiptanalyzerpipeline_spark.sqlfront import EngineSession, SqlHazardError

# §2.12-class queries, written once in cross-engine ANSI SQL (output
# contract: BIGINT/DOUBLE/STRING only — see verify skill notes).
PARITY_SQL = {
    # Q-A3 family: TPC-H Q1-shaped grouped aggregate with arithmetic.
    "sql_a3": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE) AS sum_disc_price,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    # Q-J1 family: FK multi-join revenue by nation.
    "sql_j1": """
        SELECT n.n_name,
               CAST(SUM(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
    # §2.5 family: ranking window (top order per customer by price).
    "sql_w1": """
        SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn
        FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        ) t
        WHERE rn <= 2
        ORDER BY o_custkey, rn
    """,
}


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return EngineSession(spark, sf_dir=sf_dir)


@pytest.mark.parametrize("qname", sorted(PARITY_SQL))
def test_sql_front_door_matches_duckdb(engine, oracle_con, qname):
    sql = PARITY_SQL[qname]
    r = compare(qname, engine.sql(sql, name=qname), sql, oracle_con)
    assert r.ok, str(r)


def test_hazard_error_policy_rejects_unpartitioned_window(spark, sf_dir):
    eng = EngineSession(spark, sf_dir=sf_dir, on_hazard="error")
    with pytest.raises(SqlHazardError) as ei:
        eng.sql("SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_totalprice) FROM orders")
    assert any(f.hazard == "unpartitioned_window" for f in ei.value.findings)
    # The same session still accepts clean statements afterwards.
    assert eng.sql("SELECT COUNT(*) AS n FROM orders").collect()[0]["n"] > 0


def test_hazard_warn_policy_returns_df_and_prints(spark, sf_dir, capsys):
    eng = EngineSession(spark, sf_dir=sf_dir, on_hazard="warn")
    df = eng.sql(
        "SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rn FROM orders",
        name="risky",
    )
    err = capsys.readouterr().err
    assert "plan-audit WARNING [risky]: unpartitioned_window" in err
    assert df.limit(1).count() == 1  # still executable


def test_curated_views_from_work_dir(spark, sf_dir, tmp_path):
    # Build a tiny curated work dir through the analyze CLI path.
    from receiptanalyzerpipeline_spark.cli import main
    from receiptanalyzerpipeline_spark.multimodal.images import STUB_MAGIC

    imgs = tmp_path / "in"
    imgs.mkdir()
    (imgs / "a.png").write_bytes(STUB_MAGIC + bytes([10] * 32 + [200] * 32))
    work = tmp_path / "work"
    assert main(["analyze", "--image-file", str(imgs), "--work-dir", str(work), "--write"]) == 0

    eng = EngineSession(spark, sf_dir=sf_dir, work_dir=str(work))
    assert "receipt_summary" in eng.views
    rows = eng.sql("SELECT img_id, vendor_name FROM receipt_summary").collect()
    assert len(rows) == 1 and rows[0]["img_id"]


def test_engine_udtfs_available_in_sql(engine):
    rows = engine.sql(
        "SELECT s.sentence FROM split_sentences('One. Two. Three.') AS s"
    ).collect()
    assert len(rows) == 3


def test_cli_sql_subcommand(capsys):
    from receiptanalyzerpipeline_spark.cli import main

    rc = main([
        "sql", "-e",
        "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM region",
        "--sf-dir", "/root/testdata/sf0.001", "--format", "json",
    ])
    assert rc == 0
    assert '"n":5' in capsys.readouterr().out.replace(" ", "")

    # error policy: hazardous statement exits 1 before running any job
    rc2 = main([
        "sql", "-e",
        "SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_totalprice) FROM orders",
        "--sf-dir", "/root/testdata/sf0.001", "--on-hazard", "error",
    ])
    assert rc2 == 1
    assert "REJECTED" in capsys.readouterr().err


def test_snapshot_tables_as_sql_views(spark, sf_dir, tmp_path):
    from receiptanalyzerpipeline_spark.sources.snapshots import write_snapshot

    path = str(tmp_path / "corpus")
    write_snapshot(spark.range(25).toDF("id"), path)
    eng = EngineSession(spark, sf_dir=sf_dir, snapshot_tables={"corpus": path})
    assert "corpus" in eng.views
    n = eng.sql("SELECT CAST(COUNT(*) AS BIGINT) AS n FROM corpus").first()["n"]
    assert n == 25


def test_snapshot_time_travel_and_changes_in_sql(spark, sf_dir, tmp_path):
    """engine.snapshot registers AS OF views (time travel) and the
    retraction change feed as plain SQL tables."""
    from receiptanalyzerpipeline_spark.sources.snapshots import (
        delete_where,
        merge_upsert,
        write_snapshot,
    )

    path = str(tmp_path / "tbl")
    v0 = write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), path
    )
    merge_upsert(
        spark, spark.createDataFrame([(2, "B!"), (3, "c")], "k long, v string"),
        path, ["k"],
    )
    delete_where(spark, path, "k = 1")

    eng = EngineSession(spark, sf_dir=sf_dir)
    eng.snapshot("tbl", path)                      # latest
    eng.snapshot("tbl_v0", path, version=v0)       # time travel
    from receiptanalyzerpipeline_spark.sources.snapshots import _read_manifest

    ts0 = _read_manifest(path, v0)["committed_at"]
    eng.snapshot("tbl_t0", path, timestamp=ts0)    # AS OF TIMESTAMP
    eng.snapshot("tbl_live", path, changes_from=v0)  # + change feed

    latest = {tuple(r) for r in eng.sql("SELECT k, v FROM tbl ORDER BY k").collect()}
    assert latest == {(2, "B!"), (3, "c")}
    asof = {tuple(r) for r in eng.sql("SELECT k, v FROM tbl_v0 ORDER BY k").collect()}
    assert asof == {(1, "a"), (2, "b")}
    t0 = {tuple(r) for r in eng.sql("SELECT k, v FROM tbl_t0 ORDER BY k").collect()}
    assert t0 == asof
    # Net change per key from the retraction feed, in plain SQL.
    net = eng.sql(
        "SELECT k, CAST(SUM(CASE WHEN _op = 'insert' THEN 1 ELSE -1 END) AS BIGINT) AS d "
        "FROM tbl_live_changes GROUP BY k ORDER BY k"
    ).collect()
    assert {(r["k"], r["d"]) for r in net} == {(1, -1), (2, 0), (3, 1)}


def test_sql_write_verbs_full_lifecycle(spark, tmp_path):
    """VERDICT r5 task 7: create → insert → merge → delete →
    time-travel select, purely via engine.sql()."""
    eng = EngineSession(spark, table_root=str(tmp_path / "tables"))

    r = eng.sql(
        "CREATE TABLE t AS SELECT id AS k, CAST(id * 10 AS LONG) AS v "
        "FROM range(5)"
    ).collect()
    assert [(row["table"], row["version"]) for row in r] == [("t", 0)]

    r = eng.sql("INSERT INTO t SELECT id AS k, CAST(0 AS LONG) AS v FROM range(5, 8)").collect()
    assert r[0]["version"] == 1
    assert eng.sql("SELECT COUNT(*) AS n FROM t").first()["n"] == 8

    r = eng.sql(
        "MERGE INTO t USING (SELECT id AS k, CAST(-1 AS LONG) AS v FROM range(2, 4)) ON (k)"
    ).collect()
    assert r[0]["version"] == 2
    got = {(row["k"], row["v"]) for row in eng.sql("SELECT k, v FROM t WHERE k < 4").collect()}
    assert got == {(0, 0), (1, 10), (2, -1), (3, -1)}

    r = eng.sql("DELETE FROM t WHERE k >= 6").collect()
    assert r[0]["version"] == 3
    assert eng.sql("SELECT COUNT(*) AS n FROM t").first()["n"] == 6

    # Time travel: the FOR ... AS OF sugar, pre-merge and pre-delete.
    v1 = {
        (row["k"], row["v"])
        for row in eng.sql("SELECT k, v FROM t FOR VERSION AS OF 1 WHERE k < 4").collect()
    }
    assert v1 == {(0, 0), (1, 10), (2, 20), (3, 30)}
    from receiptanalyzerpipeline_spark.sources.snapshots import _read_manifest

    ts2 = _read_manifest(eng.snapshot_paths["t"], 2)["committed_at"]
    n2 = eng.sql(f"SELECT COUNT(*) AS n FROM t FOR TIMESTAMP AS OF {ts2}").first()["n"]
    assert n2 == 8
    # A joined time-travel read parses too (sugar composes with plain SQL).
    drift = eng.sql(
        "SELECT cur.k FROM t cur JOIN t FOR VERSION AS OF 0 old ON cur.k = old.k "
        "WHERE cur.v <> old.v ORDER BY cur.k"
    ).collect()
    assert [row["k"] for row in drift] == [2, 3]


def test_sql_write_verbs_preflight_blocks_hazardous_source(spark, tmp_path):
    """A CTAS whose SOURCE plan trips the audit must not write anything."""
    eng = EngineSession(
        spark, table_root=str(tmp_path / "tables"), on_hazard="error"
    )
    with pytest.raises(SqlHazardError):
        eng.sql(
            "CREATE TABLE bad AS SELECT a.id, SUM(b.id) OVER () AS s "
            "FROM range(10) a CROSS JOIN range(10) b"
        )
    assert "bad" not in eng.snapshot_paths
    import os

    assert not os.path.exists(str(tmp_path / "tables" / "bad"))


def test_sql_insert_values_positional(spark, tmp_path):
    """ADVICE r6 (low): INSERT INTO t VALUES ... — a bare VALUES source
    plans with col1/col2 column names; the front door maps it
    positionally onto the target schema before the append schema check."""
    import pytest

    eng = EngineSession(spark, table_root=str(tmp_path / "tables"))
    eng.sql("CREATE TABLE t AS SELECT id AS k, CAST(id * 10 AS LONG) AS v FROM range(3)")
    r = eng.sql(
        "INSERT INTO t VALUES (CAST(100 AS LONG), CAST(7 AS LONG)), "
        "(CAST(101 AS LONG), CAST(8 AS LONG))"
    ).collect()
    assert r[0]["version"] == 1
    got = {
        (row["k"], row["v"])
        for row in eng.sql("SELECT k, v FROM t WHERE k >= 100").collect()
    }
    assert got == {(100, 7), (101, 8)}
    with pytest.raises(ValueError, match="arity"):
        eng.sql("INSERT INTO t VALUES (CAST(1 AS LONG))")
