"""Synthetic AnalyzeExpense fixture documents (FIXTURES.md A1 shape).

Original synthetic receipts written for this engine's tests — same schema
as the reference's golden files (output.json:1) but different content, so
goldens are hand-derivable and exercise every parse rule: last-wins pivot,
label-only TOTAL match, currency symbols (£/$), unparseable money and
quantity, duplicate other_data labels, empty values, missing sections.
"""

from __future__ import annotations


def _sf(type_text, value_text, label_text=None, conf=99.0):
    """One SummaryField struct (geometry omitted — nullable in schema)."""
    return {
        "PageNumber": 1,
        "Type": {"Text": type_text, "Confidence": conf},
        "LabelDetection": (
            {"Text": label_text, "Confidence": conf, "Geometry": None}
            if label_text is not None
            else None
        ),
        "ValueDetection": {"Text": value_text, "Confidence": conf, "Geometry": None},
    }


def _li_field(type_text, value_text):
    return {
        "PageNumber": 1,
        "Type": {"Text": type_text, "Confidence": 98.0},
        "ValueDetection": {"Text": value_text, "Confidence": 98.0, "Geometry": None},
    }


RECEIPT_ACME = {
    "img_id": "a1b2c3d4e5f60718",
    "DocumentMetadata": {"Pages": 1},
    "ExpenseDocuments": [
        {
            "ExpenseIndex": 1,
            "SummaryFields": [
                _sf("VENDOR_NAME", "ACME MART #42"),
                _sf("INVOICE_RECEIPT_DATE", "MAR 5,2023 14:07", "Date"),
                _sf("SUBTOTAL", "23.45", "Subtotal"),
                _sf("TAX", "1.55", "Tax"),
                _sf("TOTAL", "24.99"),  # superseded: last match wins
                _sf("OTHER", "$25.00", "Total"),  # label-only TOTAL match
                _sf("OTHER", "0.55", "CHANGE"),
                _sf("OTHER", "$26.00", "CASH"),
                _sf("OTHER", "", "REWARDS"),  # empty value → dropped
                _sf("OTHER", "0.56", "CHANGE"),  # duplicate label, last wins
            ],
            "LineItemGroups": [
                {
                    "LineItemGroupIndex": 1,
                    "LineItems": [
                        {
                            "LineItemExpenseFields": [
                                _li_field("ITEM", "COFFEE BEANS (ITEM)"),
                                _li_field("PRICE", "12.99"),
                                _li_field("QUANTITY", "1"),
                            ]
                        },
                        {
                            "LineItemExpenseFields": [
                                _li_field("ITEM", "OAT MILK"),
                                _li_field("PRICE", "$3.49"),
                                _li_field("QUANTITY", "F 2"),  # unparseable → 1
                            ]
                        },
                    ],
                }
            ],
        }
    ],
}

RECEIPT_CAFE = {
    "img_id": "0f1e2d3c4b5a6978",
    "DocumentMetadata": {"Pages": 1},
    "ExpenseDocuments": [
        {
            "ExpenseIndex": 1,
            "SummaryFields": [
                _sf("VENDOR_NAME", "CORNER CAFE"),
                _sf("RECEIVER_ADDRESS", "12 High Street, London"),
                _sf("INVOICE_RECEIPT_DATE", "2023-11-02"),
                _sf("SUBTOTAL", "£17.00"),
                _sf("TAX", "1.20"),
                _sf("TOTAL", "£18.20"),  # £ → Pound Sterling
                _sf("OTHER", "7", "TABLE"),
            ],
            "LineItemGroups": [],
        }
    ],
}

RECEIPT_DEGENERATE = {
    "img_id": "deadbeef00000000",
    "DocumentMetadata": {"Pages": 1},
    "ExpenseDocuments": [
        {
            "ExpenseIndex": 1,
            "SummaryFields": [
                _sf("TOTAL", "FREE"),  # unparseable money → default 0
                _sf("OTHER", "", "NOTE"),  # empty → dropped
            ],
            "LineItemGroups": [],
        }
    ],
}

ALL_RECEIPTS = [RECEIPT_ACME, RECEIPT_CAFE, RECEIPT_DEGENERATE]
