"""Continuous-mode streaming soak (VERDICT r9 task 8).

The curation stream's exactly-once story was proven for availableNow
replays and the foreachBatch crash matrix; this drives the OTHER
regime: a processingTime-triggered continuous run over ~50 micro-batch
files with CONCURRENT snapshot compaction, plus one injected hard JVM
kill (SIGKILL of the whole driver process — no graceful stop, no
finally blocks) mid-stream, then a cold restart from the checkpoint.
Final shard membership must equal the batch `curate` CLI on the same
corpus — the same parity contract test_streaming_curation.py proves
for availableNow.

The soak driver runs in a SUBPROCESS with its own JVM so the kill
cannot poison the session-scoped fixture the rest of the suite shares.
"""

from __future__ import annotations

import pytest

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.slow  # excluded from the default run (VERDICT r10 task 2)

N_CHUNKS = 50

# The soak driver: continuous-mode stream + a concurrent compaction
# thread. argv: src base expected_count. expected_count == -1 means
# "run until killed" (phase 1); otherwise poll membership and exit 0
# once the count converges (phase 2, post-restart).
_DRIVER = """
import os, sys, threading, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from receiptanalyzerpipeline_spark.sources import snapshots as snap
from receiptanalyzerpipeline_spark.streaming.curation_stream import (
    read_shard_membership, run_streaming_curation,
)

src, base, expected = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = (SparkSession.builder.master("local[4]").appName("curation-soak")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
schema = spark.read.parquet({sf_docs!r}).schema

q = run_streaming_curation(
    spark, src,
    snapshot_path=os.path.join(base, "snapshot"),
    shards_path=os.path.join(base, "shards"),
    checkpoint=os.path.join(base, "ckpt"),
    schema=schema,
    max_files_per_trigger=1,
    available_now=False,  # continuous micro-batches (processingTime)
)

stop = threading.Event()

def compactor():
    # Nightly-OPTIMIZE analogue racing the live sink: contention on the
    # optimistic version chain is expected and retried, never fatal.
    while not stop.is_set():
        time.sleep(1.5)
        try:
            snap.compact_snapshot(spark, os.path.join(base, "snapshot"))
        except Exception:
            pass

t = threading.Thread(target=compactor, daemon=True)
t.start()

deadline = time.time() + 480
while time.time() < deadline:
    time.sleep(0.5)
    if expected < 0:
        continue  # phase 1: run until the parent SIGKILLs us
    try:
        n = read_shard_membership(spark, os.path.join(base, "shards")).count()
    except Exception:
        n = -1
    if n == expected:
        # Drain: one more poll interval so a mid-flight batch commits,
        # then verify the count is STABLE at expected (no overshoot =
        # no replayed duplicates).
        time.sleep(2.0)
        n2 = read_shard_membership(spark, os.path.join(base, "shards")).count()
        stop.set()
        q.stop()
        sys.exit(0 if n2 == expected else 3)
sys.exit(4)  # timed out before converging
"""


def _chunked_input(spark, tmp_path: Path):
    import shutil

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    per = len(ids) // N_CHUNKS
    src = tmp_path / "in"
    src.mkdir()
    for i in range(N_CHUNKS):
        lo = ids[i * per]
        hi = ids[(i + 1) * per] if i < N_CHUNKS - 1 else ids[-1] + 1
        part = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        tmp = src / f"chunk_{i:03d}.parquet.tmpdir"
        part.coalesce(1).write.parquet(str(tmp))
        (pf,) = [p for p in tmp.glob("part-*.parquet")]
        dest = src / f"chunk_{i:03d}.parquet"
        shutil.move(str(pf), str(dest))
        shutil.rmtree(tmp)
        mtime = 1_700_000_000 + i * 10
        os.utime(dest, (mtime, mtime))
    return docs, str(src)


def _spawn(script_path: str, src: str, base: str, expected: int):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.Popen(
        [sys.executable, script_path, src, base, str(expected)],
        cwd=REPO,
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,
    )


def test_continuous_soak_with_compaction_and_jvm_kill(spark, tmp_path: Path):
    docs, src = _chunked_input(spark, tmp_path)

    # Reference: the batch curate CLI over the full corpus (the parity
    # contract the availableNow test uses).
    from receiptanalyzerpipeline_spark.cli import main

    batch_in = str(tmp_path / "batch_in.parquet")
    batch_out = str(tmp_path / "batch_shards")
    docs.write.parquet(batch_in)
    assert main(["curate", "--input", batch_in, "--output", batch_out]) == 0
    batch = {
        (r["doc_id"], r["shard_id"])
        for r in spark.read.parquet(batch_out).select("doc_id", "shard_id").collect()
    }
    assert batch

    script = tmp_path / "soak_driver.py"
    script.write_text(
        _DRIVER.format(repo=REPO, sf_docs=f"{SF_DIR}/documents.parquet")
    )
    base = tmp_path / "stream"
    base.mkdir()

    # Phase 1: run until ~a third of the exports exist, then SIGKILL the
    # whole driver process group — a hard JVM death mid-continuous-run.
    p1 = _spawn(str(script), src, str(base), -1)
    shards_glob = base / "shards" / "data"
    deadline = time.time() + 300
    try:
        while time.time() < deadline:
            time.sleep(0.3)
            n_exports = (
                len(list(shards_glob.glob("snap-*"))) if shards_glob.exists() else 0
            )
            if n_exports >= N_CHUNKS // 3:
                break
            assert p1.poll() is None, "phase-1 soak driver died on its own"
        else:
            raise AssertionError("phase 1 never produced exports to kill under")
    finally:
        if p1.poll() is None:
            os.killpg(os.getpgid(p1.pid), signal.SIGKILL)
        p1.wait(timeout=60)

    # Phase 2: cold restart from the same checkpoint; must converge to
    # exactly the batch membership count and hold it (no duplicates).
    p2 = _spawn(str(script), src, str(base), len(batch))
    rc = p2.wait(timeout=540)
    assert rc == 0, f"post-kill soak driver exited {rc} (3=overshoot, 4=no converge)"

    from receiptanalyzerpipeline_spark.sources import snapshots as snap
    from receiptanalyzerpipeline_spark.streaming.curation_stream import (
        read_shard_membership,
    )

    streamed = {
        (r["doc_id"], r["shard_id"])
        for r in read_shard_membership(spark, str(base / "shards")).collect()
    }
    assert streamed == batch

    # The concurrently-compacted snapshot still holds exactly the
    # surviving corpus, and at least one compaction version landed
    # while the stream was live.
    snap_ids = {
        r["doc_id"]
        for r in snap.read_snapshot(spark, str(base / "snapshot")).collect()
    }
    assert snap_ids == {d for d, _ in streamed}
    versions = snap.versions(str(base / "snapshot"))
    compactions = [
        v for v in versions
        if "compaction_of" in snap._read_manifest(str(base / "snapshot"), v)
    ]
    assert compactions, "no compaction committed during the soak"
