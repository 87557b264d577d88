"""Streaming progress observability (streaming/observability.py): every
micro-batch lands one JSON line with its row counts and offsets, and the
log reads back as a queryable DataFrame."""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.streaming.observability import (
    attach_progress_logger,
    read_progress,
)


def test_progress_logger_records_every_batch(spark, tmp_path: Path):
    landing = tmp_path / "in"
    landing.mkdir()
    for b in range(3):
        with open(landing / f"b{b}.json", "w") as f:
            for j in range(7):
                f.write(json.dumps({"k": b * 7 + j}) + "\n")
        os.utime(landing / f"b{b}.json", (1_700_000_000 + b,) * 2)

    log_path = str(tmp_path / "metrics" / "progress.jsonl")
    logger = attach_progress_logger(spark, log_path)
    try:
        q = (
            spark.readStream.schema("k long")
            .option("maxFilesPerTrigger", 1)
            .json(str(landing))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)
        # The listener bus is async; wait for the lines to land.
        import time

        for _ in range(60):
            if (
                os.path.exists(log_path)
                and sum(1 for line in open(log_path) if '"num_input_rows": 7' in line) >= 3
            ):
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(logger)

    prog = read_progress(spark, log_path).where(F.col("num_input_rows") > 0)
    rows = prog.select("batch_id", "num_input_rows", "sources").collect()
    assert len(rows) >= 3
    assert all(r["num_input_rows"] == 7 for r in rows[:3])
    assert sorted(r["batch_id"] for r in rows)[:3] == [0, 1, 2]
    # Offsets recorded per source, queryable.
    src = json.loads(rows[0]["sources"])[0]
    assert src["numInputRows"] == 7 and "endOffset" in src
    # Aggregate ops question: total rows ingested.
    total = prog.agg(F.sum("num_input_rows").alias("t")).first()["t"]
    assert total >= 21
