"""Scalar column-expression library (SURVEY.md §2.8).

All functions return JVM-side Column expressions (whole-stage codegen,
no Python UDFs) unless explicitly noted.
"""

from receiptanalyzerpipeline_spark.functions.money import (  # noqa: F401
    money_amount,
    money_currency,
    money_currency_name,
)
from receiptanalyzerpipeline_spark.functions.dates import parse_receipt_date  # noqa: F401
from receiptanalyzerpipeline_spark.functions.text import strip_field_tags  # noqa: F401
