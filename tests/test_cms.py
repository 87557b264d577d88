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


def test_streaming_cms_merge_equals_batch_sketch(spark, tmp_path):
    """Streaming heavy-hitters: per-micro-batch CMS sketches merged into
    accumulated state (union + groupBy(j,b).sum — the documented merge)
    must equal the one-shot batch sketch, so point-query estimates are
    identical however the data arrived. The streaming face of the
    mergeable-sketch story (SCALE.md: 'mergeable = the 100 TB answer')."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from receiptanalyzerpipeline_spark.operators.cms import (
        cms_build,
        cms_point_query,
    )

    d, w = 3, 64
    rows = [(f"tok_{i % 17}", 1) for i in range(600)]
    landing = tmp_path / "in"
    landing.mkdir()
    chunk = len(rows) // 3
    for b in range(3):
        part = rows[b * chunk : (b + 1) * chunk if b < 2 else len(rows)]
        with open(landing / f"b{b}.json", "w") as f:
            for k, n in part:
                f.write(_json.dumps({"k": k, "n": n}) + "\n")
        os.utime(landing / f"b{b}.json", (1_700_000_000 + b,) * 2)

    state_dir = tmp_path / "cms_state"

    def merge_batch(batch_df, batch_id):
        import shutil

        batch_sketch = cms_build(batch_df, "k", "n", d=d, w=w)
        prev_path = str(state_dir / "current")
        if os.path.exists(prev_path):
            prev = batch_df.sparkSession.read.parquet(prev_path)
            merged = (
                prev.unionByName(batch_sketch)
                .groupBy("j", "b")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = batch_sketch
        # Write the merged sketch to a per-batch dir, then swap it in
        # (write-then-replace; production would use the snapshot layer).
        tmp = str(state_dir / f"v{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(prev_path):
            shutil.rmtree(prev_path)
        shutil.copytree(tmp, prev_path)

    stream = spark.readStream.schema("k string, n long").option(
        "maxFilesPerTrigger", 1
    ).json(str(landing))
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)

    streamed_sketch = spark.read.parquet(str(state_dir / "current"))
    batch_df = spark.createDataFrame(rows, "k string, n long")
    batch_sketch = cms_build(batch_df, "k", "n", d=d, w=w)
    assert {(r["j"], r["b"], r["cnt"]) for r in streamed_sketch.collect()} == {
        (r["j"], r["b"], r["cnt"]) for r in batch_sketch.collect()
    }

    probes = batch_df.select("k").distinct()
    est_stream = {
        r["k"]: r["est"]
        for r in cms_point_query(streamed_sketch, probes, "k", d=d, w=w).collect()
    }
    exact = {
        r["k"]: r["n"]
        for r in batch_df.groupBy("k").agg(F.sum("n").alias("n")).collect()
    }
    for k, n in exact.items():
        assert est_stream[k] >= n  # CMS guarantee survives the merge
