"""Offline record-replay contract for TextractBackend (SURVEY S6).

No AWS exists in this environment, so the backend's transport is faked at
two seams and the tests pin BOTH directions of the contract:

- request shape: exactly ``analyze_expense(Document={"Bytes": ...})`` per
  image, the reference's call (/root/reference/anarcpt/anarcptlib.py:121),
  carrying the image's raw bytes — asserted driver-side against a
  monkeypatched boto3 (lazy client init + region included), and again
  through the real mapInPandas path via a disk-recording fake client
  (Python UDF workers are separate processes, so recordings go through
  the filesystem);
- response handling: a canned AnalyzeExpense-shaped response (synthetic
  fixtures, same schema as the reference's golden output.json) flows
  through ocr_expense → parse_ocr_documents → flatten → pivot and
  produces rows IDENTICAL to the StubBackend path — swapping the backend
  cannot change curated output.
"""

from __future__ import annotations

import pytest

import hashlib
import json
from pathlib import Path

from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.multimodal.images import with_ahash
from receiptanalyzerpipeline_spark.multimodal.ocr import (
    StubBackend,
    TextractBackend,
    ocr_expense,
    parse_ocr_documents,
)
from receiptanalyzerpipeline_spark.plans.multimodal_queries import FIXTURE_IMAGES, images_df
from receiptanalyzerpipeline_spark.plans.receipts import other_repr
from receiptanalyzerpipeline_spark.sources.fixtures import RECEIPT_ACME, RECEIPT_CAFE
from receiptanalyzerpipeline_spark.sources.textract import (
    flatten_summary_fields,
    pivot_receipt_summary,
)

# ahash of each fixture image (multimodal_queries goldens)
AHASH = {
    "scan_a": "00000000ffffffff",
    "scan_b": "80000000ffffffff",
}

# canned AnalyzeExpense responses as the SERVICE would return them —
# no img_id field; the backend stamps it from the ahash
CANNED = {
    "00000000ffffffff": {k: v for k, v in RECEIPT_ACME.items() if k != "img_id"},
    "80000000ffffffff": {k: v for k, v in RECEIPT_CAFE.items() if k != "img_id"},
}


def _md5(b: bytes) -> str:
    return hashlib.md5(b).hexdigest()


def make_recording_client(record_dir: str, by_md5: dict, fail_md5: str | None = None):
    """A stand-in for boto3's textract client for UDF worker processes:
    every call's shape is journaled to ``record_dir`` (workers are separate
    processes — recordings must cross a process boundary), and canned
    responses are replayed keyed by the request bytes' md5. The class is
    defined LOCALLY so cloudpickle ships it by value — pytest test modules
    are not importable from Spark's Python workers."""

    class RecordingTextractClient:
        def __init__(self):
            self.record_dir = record_dir
            self.by_md5 = by_md5
            self.fail_md5 = fail_md5

        def analyze_expense(self, **kwargs):
            content = bytes(kwargs["Document"]["Bytes"])
            rec = {
                "method": "analyze_expense",
                "kwargs_keys": sorted(kwargs),
                "document_keys": sorted(kwargs["Document"]),
                "bytes_md5": hashlib.md5(content).hexdigest(),
            }
            Path(self.record_dir, f"call-{rec['bytes_md5']}.json").write_text(
                json.dumps(rec)
            )
            if self.fail_md5 == rec["bytes_md5"]:
                raise RuntimeError("ThrottlingException: Rate exceeded")
            return dict(self.by_md5[rec["bytes_md5"]])

    return RecordingTextractClient()


def _backend_with(client) -> TextractBackend:
    b = TextractBackend(region_name="us-east-2")
    b._client = client  # transport seam: the backend's own analyze() runs
    return b


def _curate(spark, raw):
    docs = parse_ocr_documents(raw)
    summary = pivot_receipt_summary(flatten_summary_fields(docs))
    return summary.select(
        "img_id",
        "vendor_name",
        "receiver_address",
        "receipt_date",
        F.col("total").cast("double").alias("total"),
        F.col("sub_total").cast("double").alias("sub_total"),
        F.col("tax_amount").cast("double").alias("tax_amount"),
        "currency",
        other_repr(F.col("other_data")).alias("other_repr"),
    ).orderBy("img_id")


def _two_images(spark):
    return with_ahash(
        images_df(spark).where(F.col("path").isin("scan_a", "scan_b"))
    ).coalesce(1)


def _by_md5():
    return {
        _md5(FIXTURE_IMAGES["scan_a"]): CANNED[AHASH["scan_a"]],
        _md5(FIXTURE_IMAGES["scan_b"]): CANNED[AHASH["scan_b"]],
    }


def test_textract_backend_boto3_seam_driver_side(monkeypatch):
    """Driver-side (no Spark): the backend lazily builds ONE boto3 textract
    client for the reference's region and issues the reference's exact
    call; the response is stamped with img_id = ahash."""
    import sys
    import types

    calls = []
    clients = []

    class FakeClient:
        def analyze_expense(self, **kwargs):
            calls.append(kwargs)
            return dict(CANNED[AHASH["scan_a"]])

    fake_boto3 = types.ModuleType("boto3")

    def fake_client_factory(service, region_name=None):
        assert service == "textract"
        clients.append(region_name)
        return FakeClient()

    fake_boto3.client = fake_client_factory
    monkeypatch.setitem(sys.modules, "boto3", fake_boto3)

    backend = TextractBackend(region_name="us-east-2")
    doc1 = backend.analyze(FIXTURE_IMAGES["scan_a"], AHASH["scan_a"])
    doc2 = backend.analyze(FIXTURE_IMAGES["scan_a"], AHASH["scan_a"])

    assert clients == ["us-east-2"], "one lazily-built client, reference region"
    assert len(calls) == 2
    for kwargs in calls:
        assert set(kwargs) == {"Document"}, "exact reference call shape"
        assert set(kwargs["Document"]) == {"Bytes"}
        assert bytes(kwargs["Document"]["Bytes"]) == FIXTURE_IMAGES["scan_a"]
    assert doc1["img_id"] == AHASH["scan_a"] == doc2["img_id"]
    assert doc1["ExpenseDocuments"] == CANNED[AHASH["scan_a"]]["ExpenseDocuments"]


@pytest.mark.slow
def test_textract_request_shape_and_swap_parity_through_spark(spark, tmp_path):
    rec_dir = tmp_path / "calls"
    rec_dir.mkdir()
    backend = _backend_with(make_recording_client(str(rec_dir), _by_md5()))

    imgs = _two_images(spark)
    rows_textract = [tuple(r) for r in _curate(spark, ocr_expense(imgs, backend)).collect()]

    # --- request contract (journaled by the worker process) ---------------
    recs = [json.loads(p.read_text()) for p in sorted(rec_dir.glob("call-*.json"))]
    assert len(recs) == 2
    for r in recs:
        assert r["method"] == "analyze_expense"
        assert r["kwargs_keys"] == ["Document"], "exact reference call shape"
        assert r["document_keys"] == ["Bytes"]
    sent = {r["bytes_md5"] for r in recs}
    assert sent == set(_by_md5()), "each image's raw bytes sent exactly once"

    # --- backend-swap parity ---------------------------------------------
    stub = StubBackend({h: {**doc, "img_id": h} for h, doc in CANNED.items()})
    rows_stub = [tuple(r) for r in _curate(spark, ocr_expense(imgs, stub)).collect()]

    assert rows_textract == rows_stub
    assert len(rows_textract) == 2
    assert {r[1] for r in rows_textract} == {"ACME MART #42", "CORNER CAFE"}


def test_textract_backend_error_isolated_per_row(spark, tmp_path):
    """A call the service rejects must quarantine THAT row (T5) while the
    rest of the batch parses — through the real TextractBackend path."""
    rec_dir = tmp_path / "calls"
    rec_dir.mkdir()
    client = make_recording_client(
        str(rec_dir), _by_md5(), fail_md5=_md5(FIXTURE_IMAGES["scan_b"])
    )
    raw = ocr_expense(_two_images(spark), _backend_with(client)).collect()
    by_hash = {r["ahash"]: r for r in raw}
    assert by_hash[AHASH["scan_a"]]["ocr_error"] is None
    assert by_hash[AHASH["scan_a"]]["doc_json"] is not None
    assert "ThrottlingException" in by_hash[AHASH["scan_b"]]["ocr_error"]
    assert by_hash[AHASH["scan_b"]]["doc_json"] is None
