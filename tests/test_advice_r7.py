"""Round-8 regression tests for the ADVICE r7 findings: _IterStore's
cluster-visible scratch root, manifest_extra reserved-key guarding, and
NULL-group exclusion in the collapsed prefix edit join."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_iterstore_uses_configured_shared_root(spark, tmp_path):
    from receiptanalyzerpipeline_spark.operators.components import (
        ITER_STORE_DIR_CONF,
        _IterStore,
    )

    root = str(tmp_path / "shared-scratch")
    spark.conf.set(ITER_STORE_DIR_CONF, root)
    try:
        store = _IterStore(spark, "t-")
        # Round tables land under the configured (cluster-visible) root,
        # never a driver-local mkdtemp.
        assert store._shared
        assert store.root.startswith(root)
        a = store.put(spark.range(5))
        assert a.count() == 5
        assert os.path.isdir(store.root)
        b = store.put(a.withColumn("x", F.col("id") * 2))
        store.drop(a)  # superseded round's files deleted via Hadoop FS
        remaining = [d for d in os.listdir(store.root)]
        assert remaining == ["t1"]
        out = store.finish(b)
        assert out.count() == 5
        assert not os.path.exists(store.root)  # finish vacuums the store
    finally:
        spark.conf.unset(ITER_STORE_DIR_CONF)


def test_iterstore_prefers_checkpoint_dir_over_tempdir(spark, tmp_path):
    from receiptanalyzerpipeline_spark.operators.components import _IterStore

    sc = spark.sparkContext
    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        store = _IterStore(spark, "t-")
        assert store._shared
        # Spark normalizes the checkpoint dir to a file: URI; compare suffix.
        assert f"/ckpt/" in store.root or store.root.startswith(ckpt)
        df = store.put(spark.range(3))
        assert df.count() == 3
        store.close()
    finally:
        # Leave no checkpoint dir configured for other tests (Scala
        # setter via py4j; there is no public unsetCheckpointDir).
        scala_none = sc._jvm.scala.Option.empty()
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(scala_none)
        assert sc.getCheckpointDir() is None


def test_iterstore_components_end_to_end_with_shared_root(spark, tmp_path):
    from receiptanalyzerpipeline_spark.operators.components import (
        ITER_STORE_DIR_CONF,
        connected_components,
    )

    spark.conf.set(ITER_STORE_DIR_CONF, str(tmp_path / "cc"))
    try:
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
        )
        labels = {
            r["id"]: r["component"] for r in connected_components(edges).collect()
        }
        assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
        # Everything the iteration wrote under the shared root is gone.
        leftovers = [
            p for p in (tmp_path / "cc").glob("rap-cc-*")
        ]
        assert leftovers == []
    finally:
        spark.conf.unset(ITER_STORE_DIR_CONF)


def test_iterstore_detach_keeps_files_until_exit(spark):
    """Round 8: materialized suites return plans that read the store's
    part tables directly; close() must become a no-op after detach so
    the builder's ``finally`` can't delete files the returned plan
    still reads (cleanup moves to interpreter exit)."""
    from receiptanalyzerpipeline_spark.operators.components import _IterStore

    store = _IterStore(spark, "rap-detach-test-")
    df = store.put(spark.range(10))
    out = store.detach(df)
    store.close()  # builder's finally fires — must be a no-op now
    assert os.path.isdir(store.root)
    assert out.count() == 10  # plan still reads the detached files
    # Manual cleanup (atexit would otherwise handle it at exit).
    store._detached = False
    store.close()
    assert not os.path.exists(store.root)


def test_manifest_extra_reserved_key_collision_raises(spark, tmp_path):
    from receiptanalyzerpipeline_spark.sources import snapshots as snap

    p = str(tmp_path / "tbl")
    df = spark.range(3).select(F.col("id").alias("k"))
    # Benign, namespaced metadata still travels with the commit.
    v = snap.write_snapshot(df, p, mode="append", manifest_extra={"app_tag": "ok"})
    assert v == 0
    with pytest.raises(ValueError, match="collide"):
        snap.write_snapshot(df, p, mode="append", manifest_extra={"files": []})
    # The refused commit published nothing.
    assert snap.current_version(p) == 0


def test_merge_upsert_manifest_extra_guarded(spark, tmp_path):
    from receiptanalyzerpipeline_spark.sources import snapshots as snap

    p = str(tmp_path / "tbl")
    snap.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), p, mode="append"
    )
    src = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    with pytest.raises(ValueError, match="collide"):
        snap.merge_upsert(spark, src, p, ["k"], manifest_extra={"merge_of": 99})
    assert snap.current_version(p) == 0
    v = snap.merge_upsert(spark, src, p, ["k"], manifest_extra={"app_tag": "x"})
    assert v == 1
    rows = {
        (r["k"], r["v"])
        for r in snap.read_snapshot(spark, p).collect()
    }
    assert rows == {(1, "a"), (2, "B"), (3, "c")}


def test_compare_setwise_digest(spark, tmp_path):
    """The sf1 sweep's out-of-core compare: streaming multiset digest
    over the Spark parquet and the oracle query. Green on equal bags,
    red on a single flipped value and on a pair-cancelling duplicate
    (the xor blind spot the sum component covers)."""
    from receiptanalyzerpipeline_spark.oracle import compare_setwise, duckdb_connect

    con = duckdb_connect("/root/testdata/sf0.001")
    df = spark.createDataFrame(
        [(1, 1.5, "a"), (2, 2.5, "b"), (3, float("nan"), None)],
        ["k", "v", "s"],
    )
    sql = """
        SELECT * FROM (VALUES (CAST(1 AS BIGINT), 1.5, 'a'),
                              (CAST(2 AS BIGINT), 2.5, 'b'),
                              (CAST(3 AS BIGINT), CAST('nan' AS DOUBLE), NULL))
        AS t(k, v, s)
    """
    r = compare_setwise("t_green", df, sql, con, str(tmp_path))
    assert r.ok, str(r)

    flipped = df.withColumn(
        "v", F.when(F.col("k") == 2, 2.5000001).otherwise(F.col("v"))
    )
    r2 = compare_setwise("t_flip", flipped, sql, con, str(tmp_path))
    assert not r2.ok and "digest" in r2.mismatches[-1]

    # Same row twice vs two distinct rows: xor cancels, sum must catch.
    dup = spark.createDataFrame([(1, 1.0, "x"), (1, 1.0, "x")], ["k", "v", "s"])
    sql_dup = """
        SELECT * FROM (VALUES (CAST(1 AS BIGINT), 1.0, 'x'),
                              (CAST(2 AS BIGINT), 2.0, 'y')) AS t(k, v, s)
    """
    r3 = compare_setwise("t_dup", dup, sql_dup, con, str(tmp_path))
    assert not r3.ok


def test_prefix_edit_join_null_groups_emit_no_pairs(spark):
    """Window.partitionBy groups NULLs together; without the guard two
    NULL-name rows formed a rep group and emitted an unverified
    edit_dist=0 pair — diverging from the direct verify path, where
    levenshtein(NULL, .) is NULL and equi-joins drop NULL keys."""
    from receiptanalyzerpipeline_spark.operators.blocking import (
        prefix_filter_edit_join,
    )

    df = spark.createDataFrame(
        [
            (1, None, "x"),
            (2, None, "x"),  # NULL-name pile: must produce nothing
            (3, "acme", "x"),
            (4, "acme", None),  # NULL block key: must produce nothing
            (5, "acme", "x"),
        ],
        ["key", "name", "brand"],
    )
    out = prefix_filter_edit_join(
        df, "key", "name", q=3, d=2, block_keys=("brand",)
    ).collect()
    assert {(r["key_a"], r["key_b"], r["edit_dist"]) for r in out} == {(3, 5, 0)}
