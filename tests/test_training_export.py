"""Training-shard export sink + streaming curation equivalence.

The export is the physical completion of q_x12/q_x13: md5 shard
membership, concat-then-chunk offsets, shard_id partition layout. The
streaming test proves the curation operators (stateless projections)
drop into a Structured Streaming ingest unchanged and produce the exact
batch result.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.operators import curation as C
from receiptanalyzerpipeline_spark.sources.sinks import write_training_shards

SF_DIR = "/root/testdata/sf0.001"


def test_write_training_shards_layout_and_manifest(spark, tmp_path: Path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, n_shards=8).collect()

    # Physical layout: one directory per shard, all 8 populated at n=500.
    dirs = sorted(p.name for p in (tmp_path / "shards").iterdir() if p.name.startswith("shard_id="))
    assert dirs == [f"shard_id={i}" for i in range(8)]

    # Manifest is a consistent audit of what was written.
    assert sum(m["n_docs"] for m in manifest) == docs.count()
    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    # Offsets inside each shard are gapless exclusive prefix sums.
    rows = back.select("shard_id", "doc_id", "n_tok", "token_offset").collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        acc = 0
        for r in shard_rows:
            assert r["token_offset"] == acc
            acc += r["n_tok"]


def test_training_shard_membership_is_rerun_stable(spark, tmp_path: Path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_training_shards(docs, a, n_shards=8)
    write_training_shards(docs.repartition(13), b, n_shards=8)
    left = {
        (r["doc_id"], r["shard_id"], r["token_offset"])
        for r in spark.read.parquet(a).select("doc_id", "shard_id", "token_offset").collect()
    }
    right = {
        (r["doc_id"], r["shard_id"], r["token_offset"])
        for r in spark.read.parquet(b).select("doc_id", "shard_id", "token_offset").collect()
    }
    assert left == right


def test_streaming_curation_matches_batch(spark, tmp_path: Path):
    """Quality + mixture + shard columns are stateless projections, so the
    same expressions run unchanged on a stream and agree with batch."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def curate(df):
        return df.select(
            "doc_id",
            "source",
            C.shard_assign(F.col("doc_id"), 8).alias("shard_id"),
            C.mixture_keep(
                F.col("doc_id"), F.col("source"), {"src0": 1.0}, default=0.5
            ).alias("keep"),
        )

    batch = {(r["doc_id"], r["shard_id"], r["keep"]) for r in curate(docs).collect()}

    src = str(tmp_path / "in")
    docs.write.parquet(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        curate(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["doc_id"], r["shard_id"], r["keep"])
        for r in spark.read.parquet(out).collect()
    }
    assert streamed == batch
