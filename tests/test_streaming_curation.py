"""Full streaming curation topology (streaming/curation_stream.py,
VERDICT r4 task 8): file stream → quality → snapshot-backed stateful
dedup → shard export, with exactly-once replay and batch-CLI parity.
"""

from __future__ import annotations

import pytest

import os
from pathlib import Path

from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.sources import snapshots as snap
from receiptanalyzerpipeline_spark.streaming.curation_stream import (
    curation_sink,
    read_shard_membership,
    run_streaming_curation,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _chunked_input(spark, tmp_path: Path, n_chunks: int = 3):
    """sf documents split into id-ordered chunks with pinned mtimes so the
    file stream replays them deterministically chunk_0..chunk_{n-1}."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    bounds = [ids[i * len(ids) // n_chunks] for i in range(n_chunks)] + [ids[-1] + 1]
    src = tmp_path / "in"
    src.mkdir()
    for i in range(n_chunks):
        part = docs.where(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        )
        _write_single_parquet(part, src / f"chunk_{i}.parquet", 1_700_000_000 + i * 10)
    return docs, str(src)


def _write_single_parquet(df, dest: Path, mtime: int) -> None:
    """The streaming file source lists FILES, not Spark's output dirs:
    write to a temp dir, hoist the single part file to ``dest``."""
    import shutil

    tmp = dest.parent / (dest.name + ".tmpdir")
    df.coalesce(1).write.parquet(str(tmp))
    (part_file,) = [p for p in tmp.glob("part-*.parquet")]
    shutil.move(str(part_file), str(dest))
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


def _run(spark, src, base: Path, tag: str = "run"):
    q = run_streaming_curation(
        spark,
        src,
        snapshot_path=str(base / "snapshot"),
        shards_path=str(base / "shards"),
        checkpoint=str(base / "ckpt"),
        schema=spark.read.parquet(f"{SF_DIR}/documents.parquet").schema,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)


@pytest.mark.slow
def test_streaming_matches_batch_curate_cli(spark, tmp_path: Path):
    """Identical shard MEMBERSHIP (doc_id → shard_id) to the batch
    `curate` CLI on the same corpus (arrival order = id order here, so
    even the dedup representatives agree)."""
    from receiptanalyzerpipeline_spark.cli import main

    docs, src = _chunked_input(spark, tmp_path)
    base = tmp_path / "stream"
    base.mkdir()
    _run(spark, src, base)

    batch_out = str(tmp_path / "batch_shards")
    batch_in = str(tmp_path / "batch_in.parquet")
    docs.write.parquet(batch_in)
    assert main(["curate", "--input", batch_in, "--output", batch_out]) == 0

    streamed = {
        (r["doc_id"], r["shard_id"])
        for r in read_shard_membership(spark, str(base / "shards")).collect()
    }
    batch = {
        (r["doc_id"], r["shard_id"])
        for r in spark.read.parquet(batch_out)
        .select("doc_id", "shard_id")
        .collect()
    }
    assert streamed == batch and len(streamed) > 0
    # Snapshot state equals the surviving corpus (one version per batch).
    snap_ids = {r["doc_id"] for r in snap.read_snapshot(spark, str(base / "snapshot")).collect()}
    assert snap_ids == {d for d, _ in streamed}
    assert len(snap.versions(str(base / "snapshot"))) == 3


def test_availablenow_restart_is_exactly_once(spark, tmp_path: Path):
    docs, src = _chunked_input(spark, tmp_path)
    base = tmp_path / "stream"
    base.mkdir()
    _run(spark, src, base)
    before = sorted(
        (r["doc_id"], r["shard_id"])
        for r in read_shard_membership(spark, str(base / "shards")).collect()
    )
    versions_before = snap.versions(str(base / "snapshot"))

    # Restart with no new files: nothing replays, nothing duplicates.
    _run(spark, src, base)
    after = sorted(
        (r["doc_id"], r["shard_id"])
        for r in read_shard_membership(spark, str(base / "shards")).collect()
    )
    assert after == before
    assert snap.versions(str(base / "snapshot")) == versions_before


def test_replayed_batch_commit_is_idempotent(spark, tmp_path: Path):
    """The crash-window contract, unit-level: delivering the same
    micro-batch twice (checkpoint lost before commit) writes once."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = tmp_path / "s"
    commit = curation_sink(str(base / "snapshot"), str(base / "shards"))
    commit(docs, 0)
    files_once = sorted(str(p) for p in (base / "shards").rglob("*.parquet"))
    rows_once = sorted(
        (r["doc_id"], r["shard_id"])
        for r in read_shard_membership(spark, str(base / "shards")).collect()
    )
    commit(docs, 0)  # replay
    assert sorted(str(p) for p in (base / "shards").rglob("*.parquet")) == files_once
    assert (
        sorted(
            (r["doc_id"], r["shard_id"])
            for r in read_shard_membership(spark, str(base / "shards")).collect()
        )
        == rows_once
    )
    assert snap.versions(str(base / "snapshot")) == [0]


def test_curate_stream_cli(spark, tmp_path: Path):
    """The user-facing `curate-stream` subcommand drives the same topology."""
    from receiptanalyzerpipeline_spark.cli import main

    docs, src = _chunked_input(spark, tmp_path)
    base = tmp_path / "cli"
    base.mkdir()
    rc = main([
        "curate-stream",
        "--input", src,
        "--output", str(base / "shards"),
        "--snapshot", str(base / "snapshot"),
        "--checkpoint", str(base / "ckpt"),
    ])
    assert rc == 0
    got = read_shard_membership(spark, str(base / "shards")).count()
    assert got > 0
    assert len(snap.versions(str(base / "snapshot"))) == 3


def test_cross_batch_dedup_via_snapshot(spark, tmp_path: Path):
    """A later delivery containing exact-content duplicates of already-
    curated docs (different ids) exports only the genuinely new docs."""
    docs, src = _chunked_input(spark, tmp_path)
    base = tmp_path / "stream"
    base.mkdir()
    _run(spark, src, base)
    first = {r["doc_id"] for r in read_shard_membership(spark, str(base / "shards")).collect()}

    max_id = max(r["doc_id"] for r in docs.select("doc_id").collect())
    survivors = snap.read_snapshot(spark, str(base / "snapshot")).select("doc_id")
    dupes = (
        docs.join(survivors, "doc_id")
        .limit(5)
        .select((F.col("doc_id") + max_id + 1).alias("doc_id"), "text")
    )
    fresh_text = (
        "the quick brown fox jumps over the lazy dog and keeps on running today"
    )
    fresh = spark.createDataFrame([(max_id + 1000, fresh_text)], ["doc_id", "text"])
    extra = dupes.unionByName(fresh).select(*docs.columns) if set(docs.columns) == {"doc_id", "text"} else None
    if extra is None:
        # documents may carry extra columns (source, ...): align by filling
        # from a template row.
        cols = docs.columns
        template = docs.limit(1)
        fill = {c: template.select(c).first()[0] for c in cols if c not in ("doc_id", "text")}
        extra = dupes.unionByName(fresh)
        for c, v in fill.items():
            extra = extra.withColumn(c, F.lit(v))
        extra = extra.select(*cols)
    _write_single_parquet(extra, Path(src) / "chunk_99.parquet", 1_700_000_100)

    _run(spark, src, base)
    now = {r["doc_id"] for r in read_shard_membership(spark, str(base / "shards")).collect()}
    added = now - first
    assert max_id + 1000 in added  # the new doc made it
    assert not any(i > max_id and i != max_id + 1000 for i in added)  # dupes blocked


@pytest.mark.slow
def test_bucketed_state_layout_matches_and_prunes(spark, tmp_path: Path):
    """VERDICT r5 task 4: with bucket_fps, (a) results are identical to
    the unbucketed layout, (b) the state table carries _fpb zone maps
    from the first commit, and (c) a batch's anti-join state read scans
    only the files its own buckets touch — never the whole corpus side."""
    docs, src = _chunked_input(spark, tmp_path)

    def run(base: Path, **kw):
        base.mkdir()
        q = run_streaming_curation(
            spark,
            src,
            snapshot_path=str(base / "snapshot"),
            shards_path=str(base / "shards"),
            checkpoint=str(base / "ckpt"),
            schema=docs.schema,
            max_files_per_trigger=1,
            **kw,
        )
        q.awaitTermination(300)
        return {
            (r["doc_id"], r["shard_id"])
            for r in read_shard_membership(spark, str(base / "shards")).collect()
        }

    plain = run(tmp_path / "plain")
    bucketed = run(tmp_path / "bucketed", bucket_fps=64)
    assert bucketed == plain and len(bucketed) > 0

    state = str(tmp_path / "bucketed" / "snapshot")
    cur = snap.current_version(state)
    m = snap._read_manifest(state, cur)
    assert m.get("cluster_by") == ["_fpb"]
    stats = snap.file_stats(state, cur)
    total = snap.manifest_file_count(m)
    assert len(stats) == total and all("_fpb" in s for s in stats.values())

    # A one-bucket probe must scan strictly fewer files than the table.
    one = snap.read_snapshot_in(spark, state, "_fpb", {3})
    assert len(one.inputFiles()) < total
    # And the probe is exact-superset-correct: every fp in bucket 3 is
    # present in the pruned read.
    from pyspark.sql import functions as F

    full = snap.read_snapshot(spark, state)
    want = {r["fp"] for r in full.where(F.col("_fpb") == 3).collect()}
    got = {r["fp"] for r in one.where(F.col("_fpb") == 3).collect()}
    assert got == want


@pytest.mark.slow
def test_bucketed_near_dedup_state_prunes(spark, tmp_path: Path):
    """The LSH band-bucket table gets the same layout (_bb cluster key):
    membership parity with the unbucketed near-dedup run, zone maps
    present, scattered-set probe scans a strict subset."""
    docs, src = _chunked_input(spark, tmp_path)

    def run(base: Path, **kw):
        base.mkdir()
        q = run_streaming_curation(
            spark,
            src,
            snapshot_path=str(base / "snapshot"),
            shards_path=str(base / "shards"),
            checkpoint=str(base / "ckpt"),
            schema=docs.schema,
            max_files_per_trigger=1,
            near_dedup=True,
            **kw,
        )
        q.awaitTermination(300)
        return {
            (r["doc_id"], r["shard_id"])
            for r in read_shard_membership(spark, str(base / "shards")).collect()
        }

    plain = run(tmp_path / "plain")
    bucketed = run(tmp_path / "bucketed", bucket_fps=64)
    assert bucketed == plain and len(bucketed) > 0

    lshb = str(tmp_path / "bucketed" / "snapshot") + "_lshb"
    cur = snap.current_version(lshb)
    m = snap._read_manifest(lshb, cur)
    assert m.get("cluster_by") == ["_bb"]
    total = snap.manifest_file_count(m)
    pruned = snap.read_snapshot_in(spark, lshb, "_bb", {0, 1})
    assert len(pruned.inputFiles()) < total


def test_bucket_fps_modulus_change_fails_fast(spark, tmp_path: Path):
    """ADVICE r6: the bucket modulus is stamped into the state tables'
    manifests; constructing a sink with a different N (whose probes
    would compute bucket ids the file zone maps weren't written under)
    must raise at construction, not silently mis-prune."""
    import pytest

    snapshot = str(tmp_path / "state")
    shards = str(tmp_path / "shards")
    sink = curation_sink(snapshot, shards, near_dedup=True, bucket_fps=64)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    sink(df, 0)
    m = snap._read_manifest(snapshot, snap.current_version(snapshot))
    assert m.get("bucket_fps") == 64

    with pytest.raises(ValueError, match="bucket_fps"):
        curation_sink(snapshot, shards, near_dedup=True, bucket_fps=32)
    with pytest.raises(ValueError, match="bucket_fps"):
        curation_sink(snapshot, shards, near_dedup=True)  # N → unbucketed
    # Same N reconstructs fine and keeps committing.
    sink2 = curation_sink(snapshot, shards, near_dedup=True, bucket_fps=64)
    sink2(
        spark.createDataFrame([(3, "iota kappa lambda mu")], "doc_id long, text string"),
        1,
    )
    assert snap.batch_committed(snapshot, 1)
