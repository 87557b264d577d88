"""Lenient receipt-date parsing (reference F3: dateutil.parser.parse at
anarcpt/anarcptlib.py:61).

dateutil's grammar is open-ended; the engine declares a fixed format list
(SURVEY §7.3.3) that covers the formats appearing on receipts, e.g.
``"FEB 19,2022 16:48"``. Implemented as a try_to_timestamp coalesce chain —
JVM-side, ANSI-safe (no exception on mismatch), extensible by appending
formats. Unparseable → NULL (deliberate divergence from the reference's
import-time ``datetime.today()`` default, SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: most-specific first so e.g. a trailing time is not silently dropped.
RECEIPT_DATE_FORMATS: tuple[str, ...] = (
    "MMM d,yyyy HH:mm:ss",
    "MMM d,yyyy HH:mm",
    "MMM d, yyyy HH:mm",
    "MMM d,yyyy",
    "MMM d, yyyy",
    "MMMM d, yyyy",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd",
    "M/d/yyyy HH:mm",
    "M/d/yyyy",
    "M/d/yy",
    "d MMM yyyy",
)


def parse_receipt_date(c: str | Column) -> Column:
    """Timestamp from a lenient receipt-date string, NULL when unparseable.

    Month names are normalized to title case first (Java patterns are
    case-sensitive: ``FEB`` fails ``MMM``).
    """
    col = F.col(c) if isinstance(c, str) else c
    normalized = F.initcap(F.trim(col))
    candidates = [
        F.try_to_timestamp(normalized, F.lit(fmt)) for fmt in RECEIPT_DATE_FORMATS
    ]
    # NTZ: a receipt date is a wall-clock fact with no zone; try_to_timestamp
    # yields LTZ, which would shift under a non-UTC session timezone. The
    # cast round-trips through the same session zone, restoring the parsed
    # wall-clock independent of the session setting.
    return F.coalesce(*candidates).cast("timestamp_ntz")
