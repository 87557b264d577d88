"""Declared query inventory (SURVEY.md §2.12) as a typed registry.

Importing this package registers every query module.
"""

from receiptanalyzerpipeline_spark.plans.registry import REGISTRY, Query, register  # noqa: F401

# Import for registration side effects.
from receiptanalyzerpipeline_spark.plans import relational  # noqa: E402,F401
from receiptanalyzerpipeline_spark.plans import events  # noqa: E402,F401
from receiptanalyzerpipeline_spark.plans import llmops  # noqa: E402,F401
from receiptanalyzerpipeline_spark.plans import receipts  # noqa: E402,F401
from receiptanalyzerpipeline_spark.plans import multimodal_queries  # noqa: E402,F401
from receiptanalyzerpipeline_spark.plans import temporal  # noqa: E402,F401
from receiptanalyzerpipeline_spark.plans import olap  # noqa: E402,F401
from receiptanalyzerpipeline_spark.plans import curation  # noqa: E402,F401

# Suites must import last: they compose the entries registered above.
from receiptanalyzerpipeline_spark.plans import suites  # noqa: E402,F401
from receiptanalyzerpipeline_spark.plans.suites import (  # noqa: E402,F401
    DRIVER_NAMES,
    SUITE_MEMBERS,
    driver_registry,
)

#: What __spark_entry__ exposes to the driver's 50-entry correctness window.
DRIVER_REGISTRY = driver_registry()
