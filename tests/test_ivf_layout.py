"""The ANN production layout claim, executable (SCALE.md: "the cell
column is the write-time partition key in production so probes prune at
the scan"): write embeddings PARTITIONED BY their IVF cell, then prove a
probe's nprobe-cell read plans partition filters (directory pruning —
the scan never lists the other cells' files) and returns exactly the
cells' rows, and that search over the pruned layout equals ivf_topk over
the unpartitioned corpus."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.catalog import table
from receiptanalyzerpipeline_spark.operators.ivf import (
    _cell_udf,
    assign_cells,
    fit_centroids,
    ivf_topk,
)

N_CELLS, NPROBE = 8, 3


def _layout(spark, sf_dir, tmp_path):
    emb = table(spark, sf_dir, "embeddings")
    C = fit_centroids(emb, N_CELLS)
    path = str(tmp_path / "emb_by_cell")
    assign_cells(emb, C).write.partitionBy("cell").parquet(path)
    return emb, C, path


def test_cell_partitioned_scan_prunes(spark, sf_dir, tmp_path):
    emb, C, path = _layout(spark, sf_dir, tmp_path)
    probe = emb.where(F.col("vec_id") == 3).select(
        F.col("embedding").alias("q_emb")
    )
    (cells_row,) = probe.select(
        _cell_udf(C, NPROBE)(F.col("q_emb")).alias("cells")
    ).collect()
    cells = list(cells_row["cells"])
    assert len(cells) == NPROBE

    tbl = spark.read.parquet(path)
    pruned = tbl.where(F.col("cell").isin(cells))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # The pruned read returns exactly the selected cells' rows.
    got_ids = {r["vec_id"] for r in pruned.select("vec_id").collect()}
    want_ids = {
        r["vec_id"]
        for r in assign_cells(emb, C).where(F.col("cell").isin(cells)).collect()
    }
    assert got_ids == want_ids and 0 < len(got_ids) < emb.count()


def test_search_over_pruned_layout_matches_ivf_topk(spark, sf_dir, tmp_path):
    emb, C, path = _layout(spark, sf_dir, tmp_path)
    probes = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    baseline = {
        (r["q_id"], r["vec_id"], r["rank"])
        for r in ivf_topk(emb, probes, C, k=3, nprobe=NPROBE).collect()
    }

    # Same search against the cell-partitioned table: the cell column now
    # comes FROM the layout (no re-assignment UDF on the corpus side), so
    # the candidate join reads only the probed cells' directories.
    from pyspark.sql import Window

    from receiptanalyzerpipeline_spark.operators.similarity import cosine

    tbl = spark.read.parquet(path)
    probed = probes.select(
        "q_id",
        "q_emb",
        F.explode(_cell_udf(C, NPROBE)(F.col("q_emb"))).alias("q_cell"),
    )
    cands = tbl.join(
        F.broadcast(probed),
        (F.col("q_cell") == F.col("cell")) & (F.col("q_id") != F.col("vec_id")),
    ).select("q_id", "vec_id", cosine(F.col("q_emb"), F.col("embedding")).alias("sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    layout_hits = {
        (r["q_id"], r["vec_id"], r["rank"])
        for r in cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .collect()
    }
    assert layout_hits == baseline
