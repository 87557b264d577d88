"""Streaming receipt ingest: the reference's two-stage watcher topology
(anarcpt/main.py:108-132, watcher.py) as ONE structured stream.

Reference → engine mapping (SURVEY §3.2, §2.9):

    watchdog observers on dirs      → readStream.format("binaryFile")
    openability/size-stability poll → atomic write-then-rename ingestion
                                       contract (file source lists
                                       complete files only)          (T2)
    hash → rename → move            → with_ahash column; no rename — the
                                       hash IS a column              (K6)
    bounded queue + sentinel flush  → micro-batches; maxFilesPerTrigger
                                       for backpressure           (T3/T4)
    per-event try/except            → OCR error column + quarantine  (T5)
    at-most-once lossy queue        → checkpointed exactly-once
                                       foreachBatch + idempotent
                                       anti-join merge on img_id     (T7)

The batch transforms are the SAME DataFrame functions proven against the
DuckDB oracle (flatten/pivot) — Spark's batch/streaming unification means
the streaming path inherits their correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from receiptanalyzerpipeline_spark.multimodal.images import with_ahash
from receiptanalyzerpipeline_spark.multimodal.ocr import (
    OcrBackend,
    ocr_with_cache,
    parse_ocr_documents,
)
from receiptanalyzerpipeline_spark.sources.textract import (
    extract_line_items,
    flatten_summary_fields,
    pivot_receipt_summary,
)

BINARY_FILE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("modificationTime", TimestampType()),
        StructField("length", LongType()),
        StructField("content", BinaryType()),
    ]
)


def read_image_stream(
    spark: SparkSession,
    landing_dir: str,
    glob: str = "*.{png,jpg,jpeg}",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the landing directory (S3/local alike)."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(landing_dir)


def read_receipt_stream(
    spark: SparkSession,
    landing_dir: str,
    glob: str = "*.png,*.jpg,*.jpeg",
    num_partitions: int | None = None,
) -> DataFrame:
    """Same landing-dir watcher through the native `receipts` Python
    DataSource (sources/receipt_datasource.py): O(1) watermark offsets
    instead of the binaryFile source's seen-files log, LPT-balanced
    partitions, executor-side byte reads. Column-compatible with
    read_image_stream (modificationTime alias) so the downstream OCR
    pipeline is shared verbatim."""
    from receiptanalyzerpipeline_spark.sources.receipt_datasource import ReceiptDataSource

    spark.dataSource.register(ReceiptDataSource)
    reader = spark.readStream.format("receipts").option("glob", glob)
    if num_partitions:
        reader = reader.option("numPartitions", str(num_partitions))
    # Drop the source's filename-stem img_id: in the OCR pipeline img_id is
    # the content ahash (multimodal/ocr.py), and keeping both would shadow it.
    return (
        reader.load(landing_dir)
        .withColumnRenamed("modification_time", "modificationTime")
        .drop("img_id")
    )


def _merge_append_new(batch: DataFrame, target_path: str, key: str) -> None:
    """Idempotent merge: append only keys absent from the target.

    Parquet stand-in for MERGE INTO (no Delta in this environment): the
    anti-join on the natural key makes replays no-ops, which together with
    the checkpoint gives exactly-once *effects* (SURVEY §7.3.6)."""
    spark = batch.sparkSession
    try:
        existing = spark.read.parquet(target_path).select(key)
    except Exception:
        existing = None
    fresh = batch if existing is None else batch.join(existing, key, "left_anti")
    fresh.write.mode("append").parquet(target_path)


def process_receipt_batch(
    images: DataFrame,
    raw_zone: str,
    curated_summary: str,
    curated_items: str,
    backend: OcrBackend,
) -> None:
    """One micro-batch: hash → memoized OCR → flatten/pivot → merge."""
    spark = images.sparkSession
    hashed = with_ahash(images)
    ocr = ocr_with_cache(spark, hashed, raw_zone, backend)
    docs = parse_ocr_documents(ocr)
    summary = pivot_receipt_summary(flatten_summary_fields(docs))
    items = extract_line_items(docs)
    _merge_append_new(summary, curated_summary, "img_id")
    _merge_append_new(
        items.withColumn("item_key", F.concat_ws("#", "img_id", "line_no")),
        curated_items,
        "item_key",
    )


def run_ingest(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    raw_zone: str,
    curated_summary: str,
    curated_items: str,
    backend: OcrBackend,
    available_now: bool = True,
    source: str = "binaryFile",
) -> None:
    """Drain the landing dir through the pipeline. availableNow=True
    processes the backlog and stops (test/replay mode); False runs
    continuously with default micro-batch triggers. ``source`` picks the
    watcher implementation: Spark's binaryFile file source or the native
    `receipts` Python DataSource — the downstream stages are identical."""
    if source == "receipts":
        stream = read_receipt_stream(spark, landing_dir)
    else:
        stream = read_image_stream(spark, landing_dir)

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        process_receipt_batch(batch, raw_zone, curated_summary, curated_items, backend)

    writer = stream.writeStream.foreachBatch(handle).option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:  # pragma: no cover - continuous mode not exercised in tests
        writer.start()
