"""Streaming observability: a StreamingQueryListener that appends each
micro-batch's progress (rows, duration, watermark, per-source offsets) as
JSON lines — the ops surface the reference lacks entirely (its watcher
loop has no metrics at all; you learn it stalled when the queue fills,
ref anarcpt/watcher.py's silent busy-wait).

Design: progress events arrive on the driver's listener bus; the sink is
an append-only JSONL file (one line per batch) so dashboards/alerts can
tail it, and the engine can re-read it as a table
(``read_progress(spark, path)``) to answer "rows/sec over the last hour"
or "is watermark lag growing" with ordinary DataFrame queries. State is
O(1) per batch; nothing touches the executors.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_id string, run_id string, batch_id long, timestamp string, "
    "num_input_rows long, input_rows_per_second double, "
    "process_rows_per_second double, batch_duration_ms long, "
    "watermark string, sources string, sink string"
)


class ProgressLogger(StreamingQueryListener):
    """Append one JSON line per micro-batch progress event."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    # Listener contract: all four hooks must exist.
    def onQueryStarted(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        p = event.progress
        row = {
            "query_id": str(p.id),
            "run_id": str(p.runId),
            "batch_id": p.batchId,
            "timestamp": p.timestamp,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "process_rows_per_second": p.processedRowsPerSecond,
            "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
            "watermark": (p.eventTime or {}).get("watermark"),
            "sources": json.dumps(
                [
                    {
                        "description": s.description,
                        "numInputRows": s.numInputRows,
                        "startOffset": str(s.startOffset),
                        "endOffset": str(s.endOffset),
                    }
                    for s in (p.sources or [])
                ]
            ),
            "sink": p.sink.description if p.sink else None,
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")


def attach_progress_logger(spark: SparkSession, path: str) -> ProgressLogger:
    """Attach (and return) a ProgressLogger; detach with
    ``spark.streams.removeListener(logger)``."""
    logger = ProgressLogger(path)
    spark.streams.addListener(logger)
    return logger


def read_progress(spark: SparkSession, path: str) -> DataFrame:
    """The progress log as a queryable DataFrame."""
    return spark.read.schema(PROGRESS_SCHEMA).json(path)
