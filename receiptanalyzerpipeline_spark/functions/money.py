"""Money parsing (reference F1/F2: anarcpt/anarcptlib.py:26,35-41,51).

The reference regex ``(?P<currency>[£$€])?(?P<amount>[,\\d]+.?\\d*)`` keeps
grouping commas in the matched amount, which makes ``Decimal`` raise on
values like ``"1,234.56"``. Deliberate divergence (SURVEY §7.4): commas are
stripped before the cast; an unparseable amount yields NULL (caller decides
the default), and the currency symbol maps to a real currency name instead
of always "US Dollars".

Pure Column expressions — regexp_extract/regexp_replace/cast run inside
whole-stage codegen; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_AMOUNT_RE = r"^\s*([£$€])?\s*([0-9][0-9,]*\.?[0-9]*)\s*$"

CURRENCY_NAMES = {"$": "US Dollars", "£": "Pound Sterling", "€": "Euro"}


def _as_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def money_amount(c: str | Column) -> Column:
    """Parse a money string to DECIMAL(18,2); NULL when unparseable.

    ``"$1,234.56"`` → 1234.56 · ``"16.76"`` → 16.76 · ``"free"`` → NULL.
    """
    col = _as_col(c)
    amount = F.regexp_extract(col, _AMOUNT_RE, 2)
    cleaned = F.regexp_replace(amount, ",", "")
    return F.when(cleaned != "", cleaned.cast("decimal(18,2)")).otherwise(F.lit(None))


def money_currency(c: str | Column) -> Column:
    """Currency symbol (``$ £ €``) or NULL."""
    col = _as_col(c)
    sym = F.regexp_extract(col, _AMOUNT_RE, 1)
    return F.when(sym != "", sym).otherwise(F.lit(None))


def money_currency_name(c: str | Column, default: str = "US Dollars") -> Column:
    """Currency display name per the reference's vocabulary; default USD
    (models.py:16)."""
    sym = money_currency(c)
    expr = F.when(sym == "$", CURRENCY_NAMES["$"])
    expr = expr.when(sym == "£", CURRENCY_NAMES["£"])
    expr = expr.when(sym == "€", CURRENCY_NAMES["€"])
    return expr.otherwise(F.lit(default))
