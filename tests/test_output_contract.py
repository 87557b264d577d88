"""Output-type contract guard (plans/registry.py): the driver's hash runs
through the pandas fetch path, where DECIMAL/DATE/HUGEINT representations
diverge between engines. Freeze the rule so no future query reintroduces
the round-1 skew: every registered query's output schema contains only
BIGINT / DOUBLE / STRING / BOOLEAN / TIMESTAMP (+ arrays thereof), and the
ints are 64-bit (Spark int32 meets DuckDB int64 otherwise)."""

from __future__ import annotations

import pytest

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

SF_DIR = "/root/testdata/sf0.001"

ALLOWED = (LongType, DoubleType, StringType, BooleanType, TimestampType, TimestampNTZType)


def _ok(dt: DataType) -> bool:
    if isinstance(dt, ArrayType):
        return _ok(dt.elementType)
    return isinstance(dt, ALLOWED)


@pytest.mark.slow
def test_all_oracle_checked_outputs_use_portable_types(spark):
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    offenders = []
    for name, q in sorted(REGISTRY.items()):
        if q.oracle is None:
            continue  # rows-only checks may carry approx/internal types
        schema = q.spark(spark, SF_DIR).schema
        for field in schema.fields:
            if not _ok(field.dataType):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, (
        "pandas-path-unsafe output types (see plans/registry.py contract):\n"
        + "\n".join(offenders)
    )


def test_canon_cell_unifies_numpy_boxing():
    """Fetch-path artifact (Arrow on/off, DuckDB list fetch) must not
    change a cell's canonical form; genuine type differences must."""
    import numpy as np

    from receiptanalyzerpipeline_spark.oracle import canon_cell

    assert canon_cell(np.float64(0.25)) == canon_cell(0.25)
    assert canon_cell(np.int64(7)) == canon_cell(7)
    assert canon_cell(np.bool_(True)) == canon_cell(True)
    assert canon_cell([np.float64(1.5), 2.0]) == canon_cell([1.5, 2.0])
    # float32 is a REAL width difference and must still surface.
    assert canon_cell(np.float32(0.1)) != canon_cell(0.1)
    # int-vs-float stays distinct (the driver's hash sees it).
    assert canon_cell(1) != canon_cell(1.0)
