"""Python UDTF + GROUPED_AGG pandas UDF — the remaining §2.10 UDF kinds."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F


def test_split_sentences_udtf(spark):
    from receiptanalyzerpipeline_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        """
        SELECT d.doc_id, s.sentence_no, s.sentence, s.n_chars
        FROM VALUES (1, 'One. Two! Three? '), (2, ''), (3, 'No end')
             AS d(doc_id, text),
             LATERAL split_sentences(d.text) s
        ORDER BY doc_id, sentence_no
        """
    ).collect()
    got = [(r["doc_id"], r["sentence_no"], r["sentence"]) for r in rows]
    assert got == [(1, 0, "One."), (1, 1, "Two!"), (1, 2, "Three?"), (3, 0, "No end")]
    assert all(r["n_chars"] == len(r["sentence"]) for r in rows)


def test_grouped_agg_pandas_udf_geomean(spark, sf_dir):
    """GROUPED_AGG pandas UDF (holistic aggregate with no built-in):
    geometric mean of (1 + n_chars) per language, checked against the
    exact driver-side computation."""
    from receiptanalyzerpipeline_spark.catalog import table

    @F.pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log1p(v.astype("float64")).mean()))

    docs = table(spark, sf_dir, "documents")
    got = {
        r["lang"]: r["gm"]
        for r in docs.groupBy("lang").agg(geomean("n_chars").alias("gm")).collect()
    }

    rows = docs.select("lang", "n_chars").collect()
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    for lang, vals in by_lang.items():
        want = math.exp(sum(math.log1p(v) for v in vals) / len(vals))
        assert math.isclose(got[lang], want, rel_tol=1e-9), (lang, got[lang], want)
