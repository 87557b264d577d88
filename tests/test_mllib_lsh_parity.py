"""Parity check: Spark MLlib's built-in MinHashLSH.approxSimilarityJoin
finds the same near-dup pairs as our deterministic MinHash+LSH operator
(SURVEY N3 names the built-in as the idiomatic alternative; we keep the
custom operator for cross-run determinism — MLlib seeds its hash family,
so it's reproducible per seed but not engine-portable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_mllib_minhash_lsh_finds_same_pairs(spark, sf_dir):
    pytest.importorskip("pyspark.ml.feature")
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from receiptanalyzerpipeline_spark.catalog import table
    from receiptanalyzerpipeline_spark.operators import dedup as D

    docs = table(spark, sf_dir, "documents")
    ours = {
        (r["id_a"], r["id_b"])
        for r in D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5).collect()
    }
    assert ours, "fixture should contain engineered near-dup pairs"

    shingled = docs.select(
        "doc_id",
        F.filter(
            D.word_shingles(F.col("text"), 3), lambda x: x.isNotNull()
        ).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    cv = CountVectorizer(inputCol="shingles", outputCol="features", binary=True)
    model = cv.fit(shingled)
    feats = model.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    lsh_model = lsh.fit(feats)
    joined = lsh_model.approxSimilarityJoin(feats, feats, 0.5, distCol="jd")
    mllib = {
        (int(r["datasetA"]["doc_id"]), int(r["datasetB"]["doc_id"]))
        for r in joined.filter(
            F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
        ).collect()
    }
    # approxSimilarityJoin(threshold=0.5) keeps Jaccard distance <= 0.5,
    # i.e. similarity >= 0.5 — our exact pair set must be contained in it
    # (MLlib may add borderline pairs its sampled distance admits).
    assert ours <= mllib, f"MLlib missed exact pairs: {ours - mllib}"
