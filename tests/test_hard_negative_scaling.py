"""Linear-candidate-growth guards for hard-negative mining (round-3
verdict: fixed 4-plane buckets made duplicate-dense corpora quadratic —
23× time at 10× data). Two mechanisms under test
(operators/similarity.py):

- auto_n_planes: plane count grows with log2(n), holding expected bucket
  occupancy ~constant;
- bucket_cap: within each (table, bucket) at most ``cap`` vectors serve
  as negative candidates, in deterministic md5 order — the backstop for
  exact-duplicate piles no plane count can split.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from receiptanalyzerpipeline_spark.operators.similarity import (
    BUCKET_CAP,
    auto_n_planes,
    hard_negative_pairs,
    lsh_table_buckets,
)

pytestmark = pytest.mark.slow  # excluded from the default run (VERDICT r10 task 2)

N_TABLES = 4


def test_auto_n_planes_formula():
    assert auto_n_planes(0) == 4
    assert auto_n_planes(32) == 4
    assert auto_n_planes(500) == 4  # ceil(log2(500/32)) = 4 — sf0.01 unchanged
    assert auto_n_planes(2_000) == 6
    assert auto_n_planes(20_000) == 10
    assert auto_n_planes(10_000_000) == 16  # clamped
    # monotone non-decreasing
    vals = [auto_n_planes(n) for n in (1, 10, 100, 1_000, 10_000, 100_000)]
    assert vals == sorted(vals)


@pytest.fixture(scope="module")
def dup_dense(spark, sf_dir):
    """20 distinct embeddings × 250 exact copies = 5000 rows — each
    distinct vector's 250 copies land in ONE bucket per table at ANY
    plane count, so occupancy piles exceed the cap no matter how many
    planes auto-scaling picks (the adversarial case for pair mining)."""
    from receiptanalyzerpipeline_spark.catalog import table

    base = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .where(F.col("vec_id") < 20)
    )
    copies = spark.range(250).select(F.col("id").alias("copy"))
    return (
        base.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"),
            "label",
            "embedding",
        )
    )


def _candidate_count(sig, capped: bool) -> int:
    """Different-label candidate pairs from the (table,bucket) join —
    the same construction hard_negative_pairs uses internally."""
    a = sig.select(F.col("vid").alias("aid"), F.col("lbl").alias("albl"), "tb")
    b = sig
    if capped:
        w = Window.partitionBy("tb").orderBy(F.md5(F.col("vid").cast("string")), F.col("vid"))
        b = b.withColumn("occ", F.row_number().over(w)).where(F.col("occ") <= BUCKET_CAP)
    b = b.select(F.col("vid").alias("nid"), F.col("lbl").alias("nlbl"), "tb")
    return (
        a.join(b, "tb")
        .where(F.col("albl") != F.col("nlbl"))
        .select("aid", "nid")
        .distinct()
        .count()
    )


def test_bucket_cap_bounds_duplicate_dense_candidates(spark, dup_dense):
    n = dup_dense.count()
    np_ = auto_n_planes(n)
    assert np_ == 8  # 5000 / 32 → 2^8 buckets
    sig = dup_dense.select(
        F.col("vec_id").alias("vid"),
        F.col("label").alias("lbl"),
        F.explode(lsh_table_buckets(F.col("embedding"), n_planes=np_)).alias("tb"),
    )
    capped = _candidate_count(sig, capped=True)
    uncapped = _candidate_count(sig, capped=False)
    # hard linear bound: each anchor meets ≤ cap negatives per table
    assert capped <= n * N_TABLES * BUCKET_CAP
    # and the cap must actually bite on this corpus (piles > cap exist)
    assert capped * 3 <= uncapped, (capped, uncapped)


def test_hard_negative_pairs_completes_and_is_deterministic(spark, dup_dense):
    out1 = hard_negative_pairs(dup_dense, k=2).orderBy("anchor_id", "rank")
    out2 = hard_negative_pairs(dup_dense, k=2).orderBy("anchor_id", "rank")
    r1 = [tuple(r) for r in out1.collect()]
    r2 = [tuple(r) for r in out2.collect()]
    assert r1 == r2
    assert len(r1) > 0
    # every anchor's negatives carry a different label (join invariant)
    labels = {r["vec_id"]: r["label"] for r in dup_dense.select("vec_id", "label").collect()}
    for anchor_id, neg_id, _sim, _rank in r1[:200]:
        assert labels[anchor_id] != labels[neg_id]
