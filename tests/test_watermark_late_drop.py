"""Watermark semantics: events later than watermark-delay behind the
stream's max event time must be DROPPED from windowed aggregation state —
the bounded-state contract that keeps streaming aggregations finite at
100 TB (state size ∝ active windows, not stream length).

The two runs share a checkpoint, so run 2 resumes run 1's watermark
(11:50) instead of replaying from zero — exactly how a production
restart behaves."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, TimestampType

SCHEMA = StructType(
    [StructField("event_id", LongType()), StructField("ts", TimestampType())]
)


def _write(landing: Path, name: str, rows):
    with open(landing / name, "w") as f:
        for eid, ts in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts}) + "\n")


def test_late_events_dropped_from_closed_windows(spark, tmp_path: Path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")

    out = str(tmp_path / "out")

    def run() -> None:
        counts = (
            spark.readStream.schema(SCHEMA)
            .json(str(landing))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("start"), "n")
        )
        q = (
            counts.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)

    # Run 1: events in the 10:00 window plus one at 12:00 → final
    # watermark 11:50, far past the 10:00 window → it closes with n=2.
    _write(
        landing,
        "b1.json",
        [(1, "2024-01-01T10:00:30"), (2, "2024-01-01T10:03:00"), (3, "2024-01-01T12:00:00")],
    )
    run()

    # Run 2 (resumes watermark 11:50): a late straggler for the closed
    # 10:00 window + a 13:00 event that flushes the 12:00 window.
    _write(landing, "b2.json", [(4, "2024-01-01T10:01:00"), (5, "2024-01-01T13:00:00")])
    run()

    rows = spark.read.parquet(out).collect()
    by_window: dict[str, list[int]] = {}
    for r in rows:
        by_window.setdefault(str(r["start"]), []).append(r["n"])
    # The 10:00 window closed once with 2 events; the late event_id=4 was
    # dropped — no re-emission, no extra row.
    assert by_window["2024-01-01 10:00:00"] == [2], by_window
    # The 12:00 window flushed in run 2 and the straggler isn't in it.
    assert by_window["2024-01-01 12:00:00"] == [1], by_window
