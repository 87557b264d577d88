"""Count-min sketch operator (operators/cms.py): exact-arithmetic
guarantees and mergeability. The cross-engine replay is pinned by
q_a5_sketch_accuracy's oracle; these tests pin the operator contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.operators.cms import cms_build, cms_point_query


def _freqs(spark, items: dict[str, int]):
    return spark.createDataFrame(list(items.items()), ["k", "n"])


def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    wf = _freqs(spark, {"alpha": 100, "beta": 40, "gamma": 7, "delta": 1})
    sketch = cms_build(wf, "k", "n", d=3, w=64)
    est = {r["k"]: r["est"] for r in cms_point_query(sketch, wf, "k", d=3, w=64).collect()}
    exact = {"alpha": 100, "beta": 40, "gamma": 7, "delta": 1}
    for k, e in exact.items():
        assert est[k] >= e  # CMS guarantee: never underestimates
    # 4 keys in 3x64 cells: with independent rows a collision in ALL 3
    # rows is overwhelmingly unlikely -> estimates exact here
    assert est == exact


def test_cms_merges_cellwise(spark):
    a = _freqs(spark, {"x": 5, "y": 2})
    b = _freqs(spark, {"x": 3, "z": 9})
    merged_sketch = (
        cms_build(a, "k", "n").unionByName(cms_build(b, "k", "n"))
        .groupBy("j", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(_freqs(spark, {"x": 8, "y": 2, "z": 9}), "k", "n")
    assert sorted(map(tuple, merged_sketch.collect())) == sorted(map(tuple, whole.collect()))
