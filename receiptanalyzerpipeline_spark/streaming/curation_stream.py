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


def _fpb(col, n_buckets: int):
    """Deterministic fingerprint bucket: the state-table cluster key."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _bb(n_buckets: int):
    """Band-bucket cluster key for the LSH state table (over band+vals)."""
    return F.pmod(F.xxhash64("band", "vals"), F.lit(n_buckets)).cast("int")


def _stamped_bucket_fps(path: str) -> int | None:
    """The bucket modulus this state table was written under, or None if
    the table doesn't exist / predates stamping. Newest stamp wins (all
    commits carry the same value once a sink is constructed)."""
    for v in reversed(snap.versions(path)):
        n = snap._read_manifest(path, v).get("bucket_fps")
        if n is not None:
            return int(n)
    return None


def _curate_batch(
    batch_df: DataFrame,
    prior_fps_fn,
    id_col: str,
    text_col: str,
    rules: str,
    eval_docs: DataFrame | None,
    sample_rate: float,
) -> DataFrame:
    """One micro-batch through the q_x24 stages; returns surviving rows
    with their content fingerprint attached. ``prior_fps_fn`` maps the
    in-batch deduped frame to the corpus fingerprints to anti-join
    against (None = no prior state) — a function, not a frame, so the
    bucketed layout can prune the state read by the BATCH's buckets."""
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
    prior_fps = prior_fps_fn(in_batch)
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
    near_dedup: bool = False,
    nd_threshold: float = 0.5,
    nd_k: int = 3,
    nd_n_hashes: int = 32,
    nd_rows_per_band: int = 2,
    bucket_fps: int | None = None,
    bucket_files: int = 8,
):
    """``foreachBatch`` commit function for the streaming curation loop.

    ``near_dedup`` adds MinHash-LSH near-dup filtering (the streaming
    counterpart of ``curate --near-dedup``): in-batch clusters keep their
    smallest id; vs-corpus candidates come from a persisted band-bucket
    table and are verified TEXT-FREE against persisted signatures with
    the unbiased MinHash estimator (fraction of equal components) — the
    curation state keeps no document text. Policy note: streaming keeps
    the FIRST-ARRIVED member of each near-dup cluster (causal — future
    docs are unknown); the batch CLI keeps the longest (q_d10). The LSH
    state lives in two snapshot tables beside the fingerprint snapshot
    (``<snapshot>_lshb`` buckets, ``<snapshot>_lshs`` signatures), each
    exactly-once by batch id and committed BEFORE the authoritative
    fingerprint manifest.

    ``bucket_fps`` (VERDICT r5 task 4) turns on the BUCKETED state
    layout: the fingerprint snapshot carries a ``_fpb`` cluster column
    (xxhash64(fp) mod N) with zone maps from the first commit on, each
    batch's state files are range-partitioned on it (``bucket_files``
    files per batch, tight per-file ranges), and the per-batch anti-join
    reads ONLY the state files whose range overlaps the BATCH's own
    bucket set (``read_snapshot_in``) — so the corpus side of the dedup
    join scans O(|batch buckets| / N) of the table instead of all of it.
    The same layout applies to the near-dup band-bucket table (cluster
    key ``_bb`` over (band, vals))."""
    import os
    from pathlib import Path

    buckets_path, sigs_path = f"{snapshot_path}_lshb", f"{snapshot_path}_lshs"
    # Fail fast on a bucket-modulus change (ADVICE r6): file zone maps
    # were written under the stamped N — probing them with bucket ids
    # computed under a different modulus silently prunes files that hold
    # matching fingerprints (duplicates readmitted, near-dups missed).
    for p in (snapshot_path, buckets_path):
        stamped = _stamped_bucket_fps(p)
        if stamped is not None and stamped != (bucket_fps or 0):
            raise ValueError(
                f"bucket_fps={bucket_fps or 0} does not match the modulus "
                f"{stamped} stamped into {p}'s manifests; restarting the "
                "stream with a different N would mis-prune the bucketed "
                "state probe. Rebuild the state tables or reuse the "
                "stamped value."
            )
    if near_dedup:
        # Fail fast on a MinHash hash-family mismatch with persisted LSH
        # state (ADVICE r10) — see neardup_stream.check_minhash_family.
        from receiptanalyzerpipeline_spark.streaming.neardup_stream import (
            check_minhash_family,
        )

        check_minhash_family(buckets_path, sigs_path)
    snapshot_commit = snap.snapshot_sink(
        snapshot_path,
        cluster_by=["_fpb"] if bucket_fps else None,
        manifest_extra={"bucket_fps": bucket_fps or 0},
    )

    def _bucketed(df: DataFrame, col: str) -> DataFrame:
        """Range-partition + sort a state batch by its bucket column so
        every output file carries a tight [min, max] zone range."""
        n = min(bucket_files, max(1, bucket_fps))
        return df.repartitionByRange(n, col).sortWithinPartitions(col)

    def _prior_fps_fn(in_batch: DataFrame):
        if not snap.versions(snapshot_path):
            return None
        spark = in_batch.sparkSession
        if not bucket_fps:
            return snap.read_snapshot(spark, snapshot_path).select("fp")
        # The batch's own bucket set (bounded by batch size) prunes the
        # state read before the anti-join ever shuffles anything.
        touched = {
            r["b"]
            for r in in_batch.select(
                _fpb(F.col("fp"), bucket_fps).alias("b")
            ).distinct().collect()
        }
        return snap.read_snapshot_in(
            spark, snapshot_path, "_fpb", touched
        ).select("fp")

    def _committed_state_version(state_path: str) -> int | None:
        """Newest version of an LSH state table whose batch is ALSO
        committed in the authoritative fingerprint table.

        LSH state commits strictly BEFORE the fingerprint manifest, so a
        crash in that window leaves the state table one version ahead,
        containing the batch's own docs. A replay that probed that
        orphaned version would self-match every doc (MinHash estimate
        1.0) and silently drop the whole batch. Only versions the
        fingerprint ledger acknowledges are probe-safe; versions without
        a batch_id (maintenance commits like compaction) are always
        derived from acknowledged data and count as committed."""
        for v in reversed(snap.versions(state_path)):
            bid = snap._read_manifest(state_path, v).get("batch_id")
            if bid is None or snap.batch_committed(snapshot_path, bid):
                return v
        return None

    def _neardup_filter(fresh: DataFrame) -> DataFrame:
        from receiptanalyzerpipeline_spark.operators.dedup import minhash_signatures
        from receiptanalyzerpipeline_spark.streaming.neardup_stream import (
            _band_buckets,
            dedup_in_batch_neardup,
            minhash_estimate,
        )

        spark = fresh.sparkSession
        batch = fresh.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        batch = dedup_in_batch_neardup(
            batch, nd_k, nd_threshold, nd_n_hashes, nd_rows_per_band
        )
        sigs = minhash_signatures(batch, "doc_id", "text", k=nd_k, n_hashes=nd_n_hashes)
        v_b = _committed_state_version(buckets_path)
        v_s = _committed_state_version(sigs_path)
        if v_b is not None and v_s is not None:
            bb = _band_buckets(sigs, nd_n_hashes, nd_rows_per_band)
            if bucket_fps:
                touched = {
                    r["b"]
                    for r in bb.select(_bb(bucket_fps).alias("b"))
                    .distinct()
                    .collect()
                }
                state_b = snap.read_snapshot_in(
                    spark, buckets_path, "_bb", touched, version=v_b
                )
            else:
                state_b = snap.read_snapshot(spark, buckets_path, version=v_b)
            cands = (
                bb.alias("n")
                .join(
                    state_b.alias("o"),
                    (F.col("n.band") == F.col("o.band"))
                    & (F.col("n.vals") == F.col("o.vals")),
                )
                .select(
                    F.col("n.doc_id").alias("new_id"),
                    F.col("o.doc_id").alias("old_id"),
                )
                .distinct()
            )
            state_s = snap.read_snapshot(spark, sigs_path, version=v_s).select(
                F.col("doc_id").alias("old_id"), F.col("sig").alias("sig_old")
            )
            est = minhash_estimate(F.col("sig"), F.col("sig_old"), nd_n_hashes)
            dupes = (
                cands.join(sigs.withColumnRenamed("doc_id", "new_id"), "new_id")
                .join(state_s, "old_id")
                .where(est >= nd_threshold)
                .select(F.col("new_id").alias("doc_id"))
                .distinct()
            )
            batch = batch.join(dupes, "doc_id", "left_anti")
        return fresh.join(
            batch.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
        )

    def _commit_lsh_state(fresh: DataFrame, batch_id: int) -> None:
        from receiptanalyzerpipeline_spark.operators.dedup import minhash_signatures
        from receiptanalyzerpipeline_spark.streaming.neardup_stream import _band_buckets

        sigs = minhash_signatures(
            fresh.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
            "doc_id", "text", k=nd_k, n_hashes=nd_n_hashes,
        )
        from receiptanalyzerpipeline_spark.operators.dedup import MINHASH_FAMILY

        if not snap.batch_committed(buckets_path, batch_id):
            state_b = _band_buckets(sigs, nd_n_hashes, nd_rows_per_band)
            extra: dict = {
                "batch_id": batch_id,
                "bucket_fps": bucket_fps or 0,
                "minhash_family": MINHASH_FAMILY,
            }
            kw: dict = {}
            if bucket_fps:
                state_b = _bucketed(
                    state_b.withColumn("_bb", _bb(bucket_fps)), "_bb"
                )
                if snap.current_version(buckets_path) is None:
                    # Bootstrap: declare the cluster key with the first
                    # commit; later appends propagate stats themselves.
                    extra["cluster_by"] = ["_bb"]
                    kw["stats_cols"] = ["_bb"]
            snap.write_snapshot(
                state_b, buckets_path, mode="append", manifest_extra=extra, **kw,
            )
        if not snap.batch_committed(sigs_path, batch_id):
            snap.write_snapshot(
                sigs, sigs_path, mode="append",
                manifest_extra={
                    "batch_id": batch_id,
                    "minhash_family": MINHASH_FAMILY,
                },
            )

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if snap.batch_committed(snapshot_path, batch_id):
            # Replay of a committed batch: shards were written before the
            # manifest, so both exist — no-op (pointer repair only).
            snapshot_commit(batch_df.limit(0), batch_id)
            return
        fresh = _curate_batch(
            batch_df, _prior_fps_fn, id_col, text_col, rules, eval_docs, sample_rate
        )
        if near_dedup:
            fresh = _neardup_filter(fresh)
        fresh = fresh.persist()
        try:
            shard_rows = fresh.select(
                id_col,
                text_col,
                C.shard_assign(F.col(id_col), n_shards).alias("shard_id"),
            )
            data_dir = Path(shards_path) / "data" / f"snap-{batch_id}"
            os.makedirs(data_dir.parent, exist_ok=True)
            shard_rows.write.mode("overwrite").parquet(str(data_dir))
            if near_dedup:
                # LSH state commits FIRST (each idempotent by batch id):
                # a crash between them and the fingerprint manifest
                # replays into skip-state + commit-fingerprints, and the
                # replay's probe reads state AS OF the last fingerprint-
                # acknowledged version (_committed_state_version) so the
                # orphaned attempt's own docs can't self-match.
                _commit_lsh_state(fresh, batch_id)
            # Commit point: snapshot manifest (id + fingerprint only — the
            # dedup state later batches anti-join against; bucketed
            # layout adds the _fpb cluster key, range-partitioned so
            # every state file carries a tight bucket range).
            fps = fresh.select(id_col, "fp")
            if bucket_fps:
                fps = _bucketed(
                    fps.withColumn("_fpb", _fpb(F.col("fp"), bucket_fps)), "_fpb"
                )
            snapshot_commit(fps, batch_id)
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
