"""Unit tests for scalar functions — pinned edge cases from the reference's
bugs (SURVEY §5.2.3): comma-grouped money, unparseable quantity, missing
labels, lenient dates."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.functions.dates import parse_receipt_date
from receiptanalyzerpipeline_spark.functions.money import money_amount, money_currency_name
from receiptanalyzerpipeline_spark.functions.text import path_stem, strip_field_tags

MONEY_CASES = [
    ("16.76", Decimal("16.76"), "US Dollars"),
    ("$44.77", Decimal("44.77"), "US Dollars"),
    ("£17.00", Decimal("17.00"), "Pound Sterling"),
    ("€ 5.50", Decimal("5.50"), "Euro"),
    ("$1,234.56", Decimal("1234.56"), "US Dollars"),  # reference crashes on this (F1)
    ("1,234,567.89", Decimal("1234567.89"), "US Dollars"),
    ("  8.29  ", Decimal("8.29"), "US Dollars"),
    ("FREE", None, "US Dollars"),
    ("", None, "US Dollars"),
    ("12", Decimal("12.00"), "US Dollars"),
    ("0.55", Decimal("0.55"), "US Dollars"),
]

DATE_CASES = [
    ("FEB 19,2022 16:48", "2022-02-19 16:48:00"),  # the reference's fixture format
    ("MAR 5,2023 14:07", "2023-03-05 14:07:00"),
    ("2023-11-02", "2023-11-02 00:00:00"),
    ("March 5, 2023", "2023-03-05 00:00:00"),
    ("3/5/2023", "2023-03-05 00:00:00"),
    ("not a date", None),
    ("", None),
]


def test_money_parse(spark):
    df = spark.createDataFrame([(s,) for s, _, _ in MONEY_CASES], ["s"]).select(
        "s", money_amount("s").alias("amt"), money_currency_name("s").alias("cur")
    )
    got = {r["s"]: (r["amt"], r["cur"]) for r in df.collect()}
    for s, amt, cur in MONEY_CASES:
        assert got[s] == (amt, cur), f"{s!r}: {got[s]} != {(amt, cur)}"


def test_date_parse(spark):
    df = spark.createDataFrame([(s,) for s, _ in DATE_CASES], ["s"]).select(
        "s", parse_receipt_date("s").alias("ts")
    )
    got = {r["s"]: r["ts"] for r in df.collect()}
    for s, expect in DATE_CASES:
        actual = got[s].strftime("%Y-%m-%d %H:%M:%S") if got[s] else None
        assert actual == expect, f"{s!r}: {actual} != {expect}"


def test_strip_field_tags_and_stem(spark):
    df = spark.createDataFrame(
        [("CVS H/C PATCH XL (ITEM)", "/data/in/Scan_0042.png")], ["item", "path"]
    ).select(strip_field_tags("item").alias("i"), path_stem("path").alias("p"))
    row = df.collect()[0]
    assert row["i"] == "CVS H/C PATCH XL"
    assert row["p"] == "Scan_0042"


def test_pivot_preserves_receipt_count(spark):
    """Property (SURVEY §5.2.4): pivot output has one row per distinct img_id."""
    from receiptanalyzerpipeline_spark.plans.receipts import fixture_df
    from receiptanalyzerpipeline_spark.sources.textract import (
        flatten_summary_fields,
        pivot_receipt_summary,
    )

    kv = flatten_summary_fields(fixture_df(spark))
    n_ids = kv.select("img_id").distinct().count()
    assert pivot_receipt_summary(kv).count() == n_ids


def test_pivot_last_wins(spark):
    """Two TOTAL candidates in one doc: the later one (by document order) wins."""
    from receiptanalyzerpipeline_spark.plans.receipts import fixture_df
    from receiptanalyzerpipeline_spark.sources.textract import (
        flatten_summary_fields,
        pivot_receipt_summary,
    )

    rows = pivot_receipt_summary(flatten_summary_fields(fixture_df(spark))).collect()
    acme = {r["img_id"]: r for r in rows}["a1b2c3d4e5f60718"]
    assert acme["total"] == Decimal("25.00")  # not the earlier 24.99
    assert acme["other_data"]["CHANGE"] == "0.56"  # duplicate label, last wins
    assert "REWARDS" not in acme["other_data"]  # empty value dropped
    # Reference dispatches TypeText and LabelText pairs independently
    # (anarcptlib.py:48-49): an OTHER row labeled 'Total' BOTH sets total
    # and folds into other_data.
    assert acme["other_data"]["Total"] == "$25.00"


def test_approx_quartiles_near_exact(spark, sf_dir):
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    exact = {
        r["l_returnflag"]: (r["q25"], r["q50"], r["q75"])
        for r in REGISTRY["q_a8_quartiles"].spark(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: (r["q25"], r["q50"], r["q75"])
        for r in REGISTRY["q_a9_approx_quartiles"].spark(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for flag, (e25, e50, e75) in exact.items():
        a25, a50, a75 = approx[flag]
        # GK sketch at accuracy 10000 over ~integer quantities: within 1 unit.
        for e, a in [(e25, a25), (e50, a50), (e75, a75)]:
            assert abs(e - a) <= 1.0, (flag, e, a)
