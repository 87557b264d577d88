"""Streaming curation end-to-end (VERDICT r4 task 8): the q_x24 batch
pipeline — quality → exact-content dedup → [decontamination] → sampling →
shard export — as ONE checkpointed Structured Streaming topology.

Shape: a document file stream drives ``foreachBatch``; each micro-batch

1. applies the SAME stateless quality rules as the ``curate`` CLI
   (operators/curation.heuristic_quality + the rules expression),
2. dedups exactly: within the batch (first id per content fingerprint)
   AND against the accumulated corpus via an anti-join on the snapshot
   table's fingerprints — the "stateful" half, whose state is the
   snapshot table itself, not an in-memory store, so state survives any
   restart and is queryable/AS-OF-readable like any table
   (sources/snapshots.py),
3. merges survivors into the snapshot (version = micro-batch id), and
4. exports the survivors' shard rows under ``shards/data/snap-<batch>``.

Exactly-once: the snapshot manifest is the COMMIT RECORD. Shard files are
written (overwrite, into a per-batch directory — idempotent) BEFORE the
snapshot commit; a replayed batch whose manifest already exists skips
both writes wholesale (sources/snapshots.snapshot_sink contract). So a
crash at any point re-delivers the batch and the redelivery either
re-does both writes identically or no-ops.

Batch-parity: shard membership (doc_id → shard_id) is md5-derived
(operators/curation.shard_assign), so membership is IDENTICAL to the
batch ``curate`` CLI on the same corpus — chunk offsets are the one
deliberate difference (batch packs offsets over the whole shard at write
time; streaming packs per delivery). Dedup keeps the FIRST-ARRIVED copy
of each content fingerprint (ties within a batch: smallest id), which
equals the batch pipeline's smallest-id-wins whenever arrival order is
id order; under other arrival orders the SET of surviving fingerprints is
identical and only the representative id may differ (documented
divergence, same class as SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.operators import curation as C
from receiptanalyzerpipeline_spark.sources import snapshots as snap

DEFAULT_RULES = (
    "n_tokens BETWEEN 5 AND 10000 AND mean_tok_len BETWEEN 2 AND 12 "
    "AND alpha_frac >= 0.7 AND symbol_frac <= 0.1"
)


def _curate_batch(
    batch_df: DataFrame,
    prior_fps: DataFrame | None,
    id_col: str,
    text_col: str,
    rules: str,
    eval_docs: DataFrame | None,
    sample_rate: float,
) -> DataFrame:
    """One micro-batch through the q_x24 stages; returns surviving rows
    with their content fingerprint attached."""
    metrics = C.heuristic_quality(batch_df, id_col, text_col)
    quality = batch_df.join(
        metrics.where(F.expr(rules)).select(F.col("doc_id").alias(id_col)), id_col
    )
    with_fp = quality.withColumn(
        "fp", F.md5(F.lower(F.trim(F.col(text_col))))
    )
    in_batch = (
        with_fp.withColumn(
            "rn", F.row_number().over(Window.partitionBy("fp").orderBy(id_col))
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    fresh = (
        in_batch.join(prior_fps, "fp", "left_anti")
        if prior_fps is not None
        else in_batch
    )
    if eval_docs is not None:
        hits = C.contaminated_ids(fresh, eval_docs, id_col, text_col, k=5)
        fresh = fresh.join(hits, id_col, "left_anti")
    if sample_rate < 1.0:
        from receiptanalyzerpipeline_spark.operators.sampling import hash_bucket

        bound = int(sample_rate * (1 << 16))
        fresh = fresh.where(hash_bucket(F.col(id_col), salt="mix") < bound)
    return fresh


def curation_sink(
    snapshot_path: str,
    shards_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    rules: str = DEFAULT_RULES,
    eval_docs: DataFrame | None = None,
    sample_rate: float = 1.0,
    n_shards: int = 16,
):
    """``foreachBatch`` commit function for the streaming curation loop."""
    import os
    from pathlib import Path

    snapshot_commit = snap.snapshot_sink(snapshot_path)

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if snap.batch_committed(snapshot_path, batch_id):
            # Replay of a committed batch: shards were written before the
            # manifest, so both exist — no-op (pointer repair only).
            snapshot_commit(batch_df.limit(0), batch_id)
            return
        prior = None
        if snap.versions(snapshot_path):
            prior = snap.read_snapshot(batch_df.sparkSession, snapshot_path).select("fp")
        fresh = _curate_batch(
            batch_df, prior, id_col, text_col, rules, eval_docs, sample_rate
        ).persist()
        try:
            shard_rows = fresh.select(
                id_col,
                text_col,
                C.shard_assign(F.col(id_col), n_shards).alias("shard_id"),
            )
            data_dir = Path(shards_path) / "data" / f"snap-{batch_id}"
            os.makedirs(data_dir.parent, exist_ok=True)
            shard_rows.write.mode("overwrite").parquet(str(data_dir))
            # Commit point: snapshot manifest (id + fingerprint only — the
            # dedup state later batches anti-join against).
            snapshot_commit(fresh.select(id_col, "fp"), batch_id)
        finally:
            fresh.unpersist(blocking=False)

    return commit


def run_streaming_curation(
    spark: SparkSession,
    input_dir: str,
    snapshot_path: str,
    shards_path: str,
    checkpoint: str,
    schema,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    **sink_kwargs,
):
    """Wire the full topology; returns the started StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(
            curation_sink(snapshot_path, shards_path, **sink_kwargs)
        ).option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_shard_membership(spark: SparkSession, shards_path: str) -> DataFrame:
    """(id, shard_id) over every committed batch export."""
    return spark.read.parquet(f"{shards_path}/data/snap-*")
