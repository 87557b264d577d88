"""Text cleanup expressions (reference F4/F6: anarcpt/anarcptlib.py:89,120,127)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def strip_field_tags(c: str | Column) -> Column:
    """Remove ``(ITEM)``-style uppercase tag suffixes and trim.

    ``"COFFEE BEANS (ITEM)"`` → ``"COFFEE BEANS"`` (reference F4).
    """
    return F.trim(F.regexp_replace(_as_col(c), r"\([A-Z]+\)", ""))


def parse_line_item_csv(c: str | Column) -> Column:
    """F5: one CSV line ``item,price,quantity`` → typed struct with the
    reference's defaults (anarcpt/anarcptlib.py:81-108): tag-stripped item
    ('Unknown' when empty), money-parsed price (0 when empty/unparseable),
    int quantity (1 when missing/unparseable — the ``"F 1"`` case).

    The engine derives line items natively from LineItemGroups
    (sources/textract.py); this parser exists for CSV-shaped inputs and
    parity with the reference's disabled path."""
    from receiptanalyzerpipeline_spark.functions.money import money_amount

    parsed = F.from_csv(
        _as_col(c), F.lit("item_name STRING, price STRING, quantity STRING")
    )
    item = strip_field_tags(F.trim(parsed["item_name"]))
    return F.struct(
        F.coalesce(F.when(item != "", item), F.lit("Unknown")).alias("item_name"),
        F.coalesce(money_amount(F.trim(parsed["price"])), F.lit(0))
        .cast("decimal(18,2)")
        .alias("price"),
        F.coalesce(F.trim(parsed["quantity"]).try_cast("int"), F.lit(1)).alias("quantity"),
    )


def path_stem(c: str | Column) -> Column:
    """Filename stem from a path column — the reference's img_id derivation
    (``image_file.stem`` / ``s3document.split(".")[0]``, F6)."""
    base = F.element_at(F.split(_as_col(c), "/"), -1)
    return F.regexp_replace(base, r"\.[^.]*$", "")
