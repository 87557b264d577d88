"""Watermarked stream-stream join (Structured Streaming): a view stream
enriched against a purchase stream with event-time bounds must converge
to the equivalent batch join on replay.

Spark requires (a) watermarks on both sides and (b) an event-time range
condition in the join for state cleanup — the same bounded-state
discipline every 100 TB streaming topology needs.
"""

from __future__ import annotations

import pytest

import json
from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

pytestmark = pytest.mark.slow  # excluded from the default run (VERDICT r10 task 2)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_chunks(rows, landing: Path, n_chunks: int = 3):
    landing.mkdir()
    chunk = max(1, len(rows) // n_chunks)
    for i in range(n_chunks):
        part = rows[i * chunk : (i + 1) * chunk if i < n_chunks - 1 else len(rows)]
        with open(landing / f"chunk_{i}.json", "w") as f:
            for r in part:
                f.write(
                    json.dumps(
                        {
                            "event_id": r["event_id"],
                            "user_id": r["user_id"],
                            "ts": r["ts"].isoformat(),
                            "event_type": r["event_type"],
                            "value": r["value"],
                        }
                    )
                    + "\n"
                )


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path: Path):
    from receiptanalyzerpipeline_spark.catalog import table

    events = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
                "event_type", "value")
        .orderBy("ts")
    )
    rows = events.collect()
    _write_chunks([r for r in rows if r["event_type"] == "view"], tmp_path / "views")
    _write_chunks([r for r in rows if r["event_type"] == "purchase"], tmp_path / "purchases")

    views = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "views"))
        .select(F.col("event_id").alias("view_id"), "user_id",
                F.col("ts").alias("vts"))
        .withWatermark("vts", "1 hour")
    )
    purchases = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "purchases"))
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user_id"), F.col("ts").alias("pts"))
        .withWatermark("pts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("pts") >= F.col("vts"))
        & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select("view_id", "purchase_id")

    q = (
        joined.writeStream.format("memory").queryName("vw_purch")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(timeout=300)
    got = {
        (r["view_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM vw_purch").collect()
    }

    want = set()
    purch = [r for r in rows if r["event_type"] == "purchase"]
    for v in rows:
        if v["event_type"] != "view":
            continue
        for p in purch:
            if p["user_id"] == v["user_id"]:
                delta = (p["ts"] - v["ts"]).total_seconds()
                if 0 <= delta <= 1800:
                    want.add((v["event_id"], p["event_id"]))
    assert want, "slice should contain view→purchase pairs"
    assert got == want


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path: Path):
    """Stream-static join (SURVEY T-topology): a micro-batched event stream
    enriched against a static broadcast dimension — stateless (no watermark
    needed), each micro-batch plans the same broadcast hash join a batch
    query would. The 100 TB form: dimension snapshot broadcast to every
    executor once per trigger, stream side never shuffles."""
    from receiptanalyzerpipeline_spark.catalog import table

    events = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
                "event_type", "value")
        .orderBy("ts")
    )
    rows = events.collect()
    _write_chunks(rows, tmp_path / "landing")

    dim = spark.createDataFrame(
        [(uid, f"tier_{uid % 3}") for uid in range(20)], ["user_id", "tier"]
    )

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "landing"))
        .join(F.broadcast(dim), "user_id")
        .select("event_id", "tier")
    )
    q = (
        stream.writeStream.format("memory").queryName("enriched")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(timeout=300)
    got = {
        (r["event_id"], r["tier"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    want = {(r["event_id"], f"tier_{r['user_id'] % 3}") for r in rows}
    assert want and got == want
