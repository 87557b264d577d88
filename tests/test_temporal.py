"""Unit tests for operators/temporal.py: as-of join and time-range join.

The oracle gate (test_oracle_queries) proves the registered queries match
DuckDB at sf0.001/0.01; these tests pin the operator edge cases directly —
equal-timestamp inclusivity, tolerance gating, unmatched left rows — and
assert the 100 TB-relevant plan property: the range join compiles to an
equi-join (SortMergeJoin/ShuffledHashJoin), never BroadcastNestedLoopJoin.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.operators.temporal import asof_join, time_range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:05"), 100),
            ("A", _ts("2024-01-01 10:00:10"), 101),
            ("B", _ts("2024-01-01 10:00:03"), 200),
            ("C", _ts("2024-01-01 10:00:01"), 300),  # no quotes for C
        ],
        "sym string, tts timestamp_ntz, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 1.0),
            ("A", _ts("2024-01-01 10:00:10"), 2.0),  # equal-ts: inclusive match
            ("B", _ts("2024-01-01 10:00:04"), 3.0),  # after the only B trade
        ],
        "sym string, qts timestamp_ntz, px double",
    )
    return trades, quotes


def test_asof_basic_and_equal_ts_inclusive(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts")
    got = {r["trade_id"]: r["px_matched"] for r in out.collect()}
    assert got == {100: 1.0, 101: 2.0, 200: None, 300: None}


def test_asof_tolerance_nulls_stale_matches(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts", tolerance_seconds=4
    )
    got = {r["trade_id"]: r["px_matched"] for r in out.collect()}
    # trade 100 is 5 s after the 10:00:00 quote -> beyond the 4 s tolerance.
    assert got == {100: None, 101: 2.0, 200: None, 300: None}


def test_asof_preserves_left_rowcount(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts")
    assert out.count() == trades.count()


def test_range_join_inner_and_left(spark):
    purchases = spark.createDataFrame(
        [("u1", _ts("2024-01-01 12:00:00"), 1), ("u2", _ts("2024-01-01 12:00:00"), 2)],
        "user string, pts timestamp_ntz, pid int",
    )
    views = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 11:00:00"), 10),  # exactly window edge: included
            ("u1", _ts("2024-01-01 10:59:59"), 11),  # 1 s too old: excluded
            ("u1", _ts("2024-01-01 12:00:00"), 12),  # same instant: included
            ("u1", _ts("2024-01-01 12:00:01"), 13),  # future: excluded
        ],
        "user string, vts timestamp_ntz, vid int",
    )
    inner = time_range_join(
        purchases, views, on=["user"], left_ts="pts", right_ts="vts", window_seconds=3600
    )
    assert sorted(r["vid"] for r in inner.collect()) == [10, 12]
    left = time_range_join(
        purchases, views, on=["user"], left_ts="pts", right_ts="vts",
        window_seconds=3600, how="left",
    )
    rows = left.collect()
    assert len(rows) == 3  # u1×2 matches + u2 unmatched once
    assert [r["vid"] for r in rows if r["pid"] == 2] == [None]


def test_range_join_plan_is_equi_join(spark):
    big_l = spark.range(1000).select(
        (F.col("id") % 50).alias("k"),
        F.expr(
            "timestampadd(SECOND, CAST(id AS INT), TIMESTAMP_NTZ '2024-01-01 00:00:00')"
        ).alias("lts"),
    )
    big_r = big_l.select("k", F.col("lts").alias("rts"))
    plan = time_range_join(
        big_l, big_r, on=["k"], left_ts="lts", right_ts="rts", window_seconds=60
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cogrouped_asof_matches_native(spark, sf_dir):
    """Cogrouped applyInPandas (the one Python-boundary kind not exercised
    elsewhere): per-key pandas merge_asof over two cogrouped tables must
    reproduce operators/temporal.asof_join exactly. Arrow ships each key's
    two groups to one Python worker — the escape hatch for per-key
    two-table logic Spark can't express natively (here it CAN, which is
    what makes the parity checkable)."""
    import pandas as pd

    from receiptanalyzerpipeline_spark.catalog import table

    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("user_id") < 30)
        .select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
                "event_id", "event_type")
    )
    views = ev.where(F.col("event_type") == "view").drop("event_type")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["user_id", "ts", "event_id", "purchase_id", "ts_matched"]
            )
        left = left.sort_values(["ts", "event_id"])
        right = right.sort_values("ts").rename(columns={"ts": "ts_matched"})
        out = pd.merge_asof(
            left, right.drop(columns=["user_id"], errors="ignore"),
            left_on="ts", right_on="ts_matched", direction="backward",
        )
        return out[["user_id", "ts", "event_id", "purchase_id", "ts_matched"]]

    cogrouped = (
        views.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            merge,
            "user_id long, ts timestamp_ntz, event_id long, "
            "purchase_id long, ts_matched timestamp_ntz",
        )
    )
    native = asof_join(
        views, purchases.withColumnRenamed("ts", "pts"),
        on=["user_id"], left_ts="ts", right_ts="pts",
    ).select(
        "user_id", "ts", "event_id",
        F.col("purchase_id_matched").alias("purchase_id"),
        F.col("pts_matched").alias("ts_matched"),
    )

    key = lambda r: (r["user_id"], r["ts"], r["event_id"])
    got = {key(r): (r["purchase_id"], r["ts_matched"]) for r in cogrouped.collect()}
    want = {key(r): (r["purchase_id"], r["ts_matched"]) for r in native.collect()}
    assert len(want) > 50
    assert got == want
