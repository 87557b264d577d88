"""VariantType raw zone (Spark 4): schema-evolution-proof Textract ingest.

Parity bar: the variant path must produce byte-identical flattened rows to
the typed-struct path (sources/textract.py TEXTRACT_SCHEMA) on the fixture
corpus, and must keep ingesting when the response format grows fields or a
line is corrupt — the two failure modes that force migrations on a fixed
schema."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from receiptanalyzerpipeline_spark.sources.fixtures import ALL_RECEIPTS
from receiptanalyzerpipeline_spark.sources.textract import (
    flatten_summary_fields,
    flatten_summary_fields_variant,
    pivot_receipt_summary,
    read_textract_json,
    read_textract_variant,
)


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("textract_raw")
    with open(d / "responses.jsonl", "w") as fh:
        for doc in ALL_RECEIPTS:
            fh.write(json.dumps(doc) + "\n")
    return str(d)


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(map(repr, df.select(*cols).collect()))


def test_variant_flatten_matches_struct_flatten(spark, raw_dir):
    struct_rows = _sorted_rows(flatten_summary_fields(read_textract_json(spark, raw_dir)))
    variant_rows = _sorted_rows(
        flatten_summary_fields_variant(read_textract_variant(spark, raw_dir))
    )
    assert variant_rows == struct_rows
    assert len(variant_rows) > 0


def test_variant_pivot_matches_struct_pivot(spark, raw_dir):
    struct_sum = pivot_receipt_summary(
        flatten_summary_fields(read_textract_json(spark, raw_dir))
    )
    variant_sum = pivot_receipt_summary(
        flatten_summary_fields_variant(read_textract_variant(spark, raw_dir))
    )
    assert _sorted_rows(variant_sum) == _sorted_rows(struct_sum)


def test_variant_survives_schema_growth_and_corruption(spark, tmp_path: Path):
    """New response fields and corrupt lines: the struct path would need a
    schema change / drops the document; the variant path ingests both."""
    grown = json.loads(json.dumps(ALL_RECEIPTS[0]))
    grown["NewTextractSection"] = {"Blocks": [{"Id": "b1", "Score": 0.5}]}
    grown["ExpenseDocuments"][0]["SummaryFields"][0]["FutureField"] = ["x", "y"]

    with open(tmp_path / "mixed.jsonl", "w") as fh:
        fh.write(json.dumps(grown) + "\n")
        fh.write("{not json at all\n")

    raw = read_textract_variant(spark, str(tmp_path))
    assert raw.count() == 2  # corrupt line lands as a NULL variant row
    assert raw.filter("doc IS NULL").count() == 1

    flat = flatten_summary_fields_variant(raw)
    # All of the grown doc's summary fields flatten; the corrupt row adds none.
    n_fields = len(ALL_RECEIPTS[0]["ExpenseDocuments"][0]["SummaryFields"])
    assert flat.count() == n_fields
    # And the new sections are still queryable without any schema:
    from pyspark.sql import functions as F

    score = raw.select(
        F.try_variant_get("doc", "$.NewTextractSection.Blocks[0].Score", "double").alias("s")
    ).collect()
    assert any(r.s == 0.5 for r in score)
