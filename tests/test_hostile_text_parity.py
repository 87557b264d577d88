"""Token-based oracles must hold for IRREGULAR text, not just the
single-spaced synthetic corpus.

Round-2 advisor finding: tokens() (trim + whitespace-run split, empties
dropped) used to diverge from oracles written with
``string_split(text, ' ')`` on any document containing double/leading/
trailing spaces, tabs, or newlines — invisible on the synthetic corpus,
which has none. Both sides now share one whitespace definition
(textanalysis.WS_RE / DUCK_TOKENS); this test runs every documents-only
token query over a deliberately hostile corpus and requires the full
strict compare to pass.
"""

from __future__ import annotations

import duckdb
import pytest

from receiptanalyzerpipeline_spark.oracle import compare
from receiptanalyzerpipeline_spark.plans import REGISTRY

# Queries that read ONLY the documents table and tokenize it.
TOKEN_QUERIES = [
    "q_n1b_top_tokens",
    "q_x9_repetition_filter",
    "q_x16_heuristic_quality",
    "q_x17_substring_dedup",
    "q_x18_dsir_importance",
    "q_x23_span_removal",
    "q_x25_lm_perplexity",
    "q_x28_bm25_retrieval",
    "q_x31_bpe_train",
]

HOSTILE_DOCS = [
    # (doc_id, text, lang, source)
    (0, "plain single spaced words here repeated words here", "en", "src0"),
    (1, "double  spaced   and  trailing spaces   ", "en", "src1"),
    (2, "  leading spaces and\ttabs\tbetween\ttokens", "en", "src2"),
    (3, "newlines\nbetween\nlines\nand  mixed \t whitespace\n", "en", "src3"),
    (4, "\t\n  ", "en", "src4"),  # whitespace-only document
    (5, "", "en", "src5"),  # empty document
    (6, "single", "en", "src0"),
    (7, "a b a b a b a b a b a b a b a b", "en", "src1"),  # repetition
    (8, "shared window tokens one two three four five six seven eight nine", "en", "src2"),
    (9, "shared window tokens one two three four five six seven eight ten", "en", "src3"),
    (10, "carriage\r\nreturns\rand\x0bvertical\x0ctabs", "en", "src4"),
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hostile")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?, ?, ?)", HOSTILE_DOCS)
    con.execute(
        f"COPY (SELECT doc_id, text, lang, source, len(text) AS n_chars FROM docs) "
        f"TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    return str(d)


@pytest.fixture(scope="module")
def hostile_con(hostile_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{hostile_dir}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize("name", TOKEN_QUERIES)
def test_token_query_matches_oracle_on_hostile_text(spark, hostile_dir, hostile_con, name):
    q = REGISTRY[name]
    res = compare(name, q.spark(spark, hostile_dir), q.oracle, hostile_con)
    assert res.ok, str(res)
