"""Round-9 regression tests for the ADVICE r8 findings: lazy (no-job)
routing estimates in the prefix edit join, the static manifest reserved-key
set, the guarded oracle interrupt, detached-scratch vacuuming, and the
restored distinct contract of contaminated_ids."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F


def test_prefix_edit_join_plan_construction_runs_no_job(spark, tmp_path):
    """ADVICE r8: the shuffle_only routing used to run an eager
    df.count() DURING plan construction — a full upstream scan, repeated
    again by the real join. The estimate must now come from footer /
    plan statistics only: zero Spark jobs until an action runs."""
    from receiptanalyzerpipeline_spark.operators.blocking import (
        prefix_filter_edit_join,
    )

    p = str(tmp_path / "names.parquet")
    spark.createDataFrame(
        [(i, f"name{i:03d}") for i in range(50)], ["key", "name"]
    ).write.parquet(p)
    df = spark.read.parquet(p)

    sc = spark.sparkContext
    sc.setJobGroup("advice-r8-plan-build", "plan construction must be lazy")
    try:
        plan = prefix_filter_edit_join(df, "key", "name", q=3, d=2)
        jobs = sc.statusTracker().getJobIdsForGroup("advice-r8-plan-build")
        assert list(jobs) == [], f"plan construction ran Spark jobs: {jobs}"
    finally:
        sc.setJobGroup("", "")
    # The plan still executes correctly after lazy construction.
    assert plan.where(F.col("edit_dist") <= 2).count() > 0


def test_estimated_rows_exact_from_parquet_footers(spark, tmp_path):
    """Footer metadata gives EXACT counts — Catalyst sizeInBytes is the
    compressed size, and clone-dense data dictionary-encodes to ~9 B/row,
    so a byte-derived estimate under-counts 3-4x and would re-route the
    sf1 corpus back to the broadcast heap death (round-8's OOM)."""
    from receiptanalyzerpipeline_spark.operators.blocking import _estimated_rows

    p = str(tmp_path / "dup.parquet")
    # Highly duplicated content: pathological compression ratio.
    spark.range(10_000).select(F.lit("same-name-everywhere").alias("name")).write.parquet(p)
    df = spark.read.parquet(p)
    assert _estimated_rows(df) == 10_000

    # In-memory relations (LogicalRDD, no files, no CBO stats) report
    # Long.MaxValue sizeInBytes — the estimate goes huge, routing
    # conservatively to SMJ. Correct at every scale (the invariant test
    # below proves routing never changes results); real plan callers
    # read parquet, where footers give exact counts.
    tiny = spark.createDataFrame([(1, "a"), (2, "b")], ["key", "name"])
    assert _estimated_rows(tiny) > 100_000


def test_prefix_edit_join_result_invariant_under_routing(spark, monkeypatch):
    """Routing (broadcast vs merge-hint SMJ) may never change results:
    force the shuffle_only path via a tiny threshold and compare against
    the explicit broadcast-allowed path."""
    from receiptanalyzerpipeline_spark.operators import blocking as B

    rows = [(i, n) for i, n in enumerate(
        ["acme corp", "acme corp", "acme corq", "zenith ltd", "zenith ltd.", "other"]
    )]
    df = spark.createDataFrame(rows, ["key", "name"])

    fast = {
        (r["key_a"], r["key_b"], r["edit_dist"])
        for r in B.prefix_filter_edit_join(df, "key", "name", shuffle_only=False).collect()
    }
    monkeypatch.setattr(B, "SHUFFLE_ONLY_ROWS", 1)
    slow = {
        (r["key_a"], r["key_b"], r["edit_dist"])
        for r in B.prefix_filter_edit_join(df, "key", "name").collect()
    }
    assert fast == slow and len(fast) > 0


def test_manifest_extra_static_reserved_set(spark, tmp_path):
    """ADVICE r8: the clash guard must check a STATIC reserved set, not
    the keys present at the call site — tree mode pops 'files' into
    group manifests before the guard, and append manifests never carry
    'groups', so both used to slip through and corrupt the file list."""
    from receiptanalyzerpipeline_spark.sources import snapshots as snap

    p = str(tmp_path / "tbl")
    df = spark.range(3).select(F.col("id").alias("k"))
    # 'groups' is never present in a files-mode append manifest — the
    # old dynamic check let it through.
    with pytest.raises(ValueError, match="collide"):
        snap.write_snapshot(df, p, mode="append", manifest_extra={"groups": []})
    # 'stats' only appears when stats_cols is set — statically reserved.
    with pytest.raises(ValueError, match="collide"):
        snap.write_snapshot(df, p, mode="append", manifest_extra={"stats": {}})
    # Namespaced app metadata still travels.
    assert snap.write_snapshot(df, p, mode="append", manifest_extra={"app_x": 1}) == 0


def test_oracle_interrupt_leaves_connection_usable(spark, tmp_path):
    """ADVICE r8: the digest timeout interrupt is lock-guarded so a
    late-firing timer can't cancel the NEXT query on the shared
    connection. An interrupted oracle raises cleanly AND the connection
    immediately serves the following query."""
    from receiptanalyzerpipeline_spark.oracle import compare_setwise

    con = duckdb.connect()
    df = spark.createDataFrame([(1,)], ["k"])
    # DESCRIBE is instant; execution of the 1e10-row cross join is not.
    slow_sql = (
        "SELECT CAST(a.range + b.range AS BIGINT) AS k "
        "FROM range(100000) a, range(100000) b"
    )
    with pytest.raises(duckdb.Error):
        compare_setwise(
            "t_slow", df, slow_sql, con, str(tmp_path), oracle_timeout_s=0.3
        )
    # The regression: a racy interrupt would cancel this next statement.
    assert con.execute("SELECT 42").fetchone() == (42,)
    con.close()


def test_vacuum_detached_scratch_reclaims_shared_roots(spark, tmp_path):
    """ADVICE r8: atexit deletes shared roots through the Spark JVM
    gateway, which is already stopped at interpreter exit — the hook
    silently no-ops and scratch leaks. The explicit vacuum reclaims
    recorded roots through a LIVE session once results are consumed."""
    from receiptanalyzerpipeline_spark.operators.components import (
        ITER_STORE_DIR_CONF,
        _IterStore,
        vacuum_detached_scratch,
    )

    spark.conf.set(ITER_STORE_DIR_CONF, str(tmp_path / "scratch"))
    try:
        vacuum_detached_scratch(spark)  # drain entries from other tests
        store = _IterStore(spark, "rap-vac-test-")
        assert store._shared
        out = store.detach(store.put(spark.range(7)))
        store.close()  # builder's finally — no-op after detach
        assert out.count() == 7
        assert os.path.isdir(store.root)
        assert vacuum_detached_scratch(spark) == 1
        assert not os.path.exists(store.root)
    finally:
        spark.conf.unset(ITER_STORE_DIR_CONF)


def test_contaminated_ids_distinct_under_duplicate_doc_ids(spark):
    """ADVICE r8: the rep-collapsed path carries one member row per
    INPUT row, so a duplicated (id, text) train row used to emit its id
    twice; the pre-collapse contract was distinct ids."""
    from receiptanalyzerpipeline_spark.operators import curation as C

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog"),  # dup id+text
            (2, "completely unrelated content words here now"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    hits = [r["doc_id"] for r in C.contaminated_ids(train, ev, "doc_id", "text", k=5).collect()]
    assert hits == [1]
