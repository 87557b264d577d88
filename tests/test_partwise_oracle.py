"""Part-wise suite oracle fallback (VERDICT r8 task 2): when DuckDB
OOMs on a FUSED suite union at sf1, each Part's oracle still runs alone
and value-checks the suite against the already-written Spark parquet —
entirely DuckDB-side, no Spark re-run."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def suite_parquet(spark, sf_dir, tmp_path_factory):
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    wd = tmp_path_factory.mktemp("partwise")
    name = "q_x12_packing_suite"
    df = REGISTRY[name].spark(spark, sf_dir)
    out = str(wd / f"{name}.spark.parquet")
    df.write.mode("overwrite").parquet(out)
    return name, out, str(wd)


def test_part_oracle_sqls_covers_every_part(suite_parquet):
    from receiptanalyzerpipeline_spark.plans.suites import (
        _SUITE_SPECS,
        part_oracle_sqls,
    )

    name, _, _ = suite_parquet
    sqls = part_oracle_sqls(name)
    assert set(sqls) == {p.tag for p in _SUITE_SPECS[name].parts}
    # Non-suite queries raise KeyError (the sweep's detection contract).
    with pytest.raises(KeyError):
        part_oracle_sqls("q_a3_tpch_q1")


def test_compare_setwise_parts_green_on_matching_suite(suite_parquet, sf_dir):
    from receiptanalyzerpipeline_spark import oracle as O
    from receiptanalyzerpipeline_spark.plans.suites import part_oracle_sqls

    name, pq, wd = suite_parquet
    con = O.duckdb_connect(sf_dir)
    res = O.compare_setwise_parts(name, pq, part_oracle_sqls(name), con, wd)
    assert all(r.ok for r in res.values()), {
        t: r.mismatches for t, r in res.items() if not r.ok
    }
    assert all(r.spark_rows == r.oracle_rows >= 1 for r in res.values())
    con.close()


def test_compare_setwise_parts_isolates_a_failing_part(suite_parquet, sf_dir):
    """One corrupted part's digest goes red; the others stay green — the
    per-part isolation is the whole point of the fallback."""
    from receiptanalyzerpipeline_spark import oracle as O
    from receiptanalyzerpipeline_spark.plans.suites import part_oracle_sqls

    name, pq, wd = suite_parquet
    sqls = dict(part_oracle_sqls(name))
    # Corrupt ONE part's oracle: shift every doc_id by 1.
    sqls["sequences"] = (
        f"SELECT part, shard_id, doc_id + 1 AS doc_id, n1, n2, n3 "
        f"FROM ({sqls['sequences']}) AS _x"
    )
    con = O.duckdb_connect(sf_dir)
    res = O.compare_setwise_parts(name, pq, sqls, con, wd)
    assert not res["sequences"].ok
    assert res["shards"].ok and res["stream_membership"].ok
    con.close()


def test_streaming_membership_cleans_its_scratch(spark, sf_dir):
    """q_x36 runs an eager streaming topology inside a registry builder:
    its tmp dirs (input chunks, checkpoint, snapshot state, shards) must
    be gone once the pinned membership is returned."""
    import glob

    from receiptanalyzerpipeline_spark.plans import REGISTRY

    before = set(glob.glob("/tmp/rap-streammem-*"))
    df = REGISTRY["q_x36_streaming_membership"].spark(spark, sf_dir)
    assert df.count() > 0  # pinned result survives scratch deletion
    after = set(glob.glob("/tmp/rap-streammem-*"))
    assert after <= before
