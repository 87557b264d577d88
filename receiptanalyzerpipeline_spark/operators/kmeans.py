"""Engine-portable k-means (Lloyd) — the exact-arithmetic clustering
primitive behind q_x22 and the hash-checkable IVF search (q_x27).

Every step is exact integer math or a fixed IEEE expression (the same
toolkit as PageRank's pico-quantization): md5-rank seeding, left-fold
L2 distances with (dist2, cid) tie-breaks, centroid updates from
floor(x*1e6) BIGINT micro-sums. A DuckDB oracle can therefore replay
the clustering bit-for-bit — see plans/llmops.py's unrolled CTEs.

Distributed shape per iteration: assignment is one k-row broadcast
against the corpus (map-side); the centroid update is a (cid, dim)-
keyed aggregate producing k × dims rows regardless of corpus size. The
driver never holds a vector. MLlib KMeans remains the high-k path;
this is the deterministic, cross-engine-checkable sibling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def portable_kmeans(
    emb: DataFrame, k: int, iters: int, seed_salt: str = "km:"
) -> tuple[DataFrame, DataFrame]:
    """``emb`` has (vec_id, v: array<double>). Returns (centroids, assignment):
    centroids = (cid, c: array<double>), assignment = (vec_id, cid, dist2).

    ``seed_salt`` namespaces the md5 seed ranking so independent codebooks
    (e.g. product-quantization blocks) draw distinct seed sets from the
    same ids."""
    # Seeds = the k smallest md5 keys. orderBy+limit plans as a per-partition
    # top-k merged on the driver (k·P rows), NOT a global window over every
    # vector on one task; the unpartitioned row_number that assigns cids then
    # runs over the k surviving rows only (bounded by construction).
    seed_key = F.md5(F.concat(F.lit(seed_salt), F.col("vec_id").cast("string")))
    seeds = (
        emb.select(F.col("vec_id"), F.col("v"), seed_key.alias("_sk"))
        .orderBy("_sk", "vec_id")
        .limit(k)
    )
    seed_w = Window.orderBy("_sk", "vec_id")
    cent = seeds.withColumn("cid", F.row_number().over(seed_w) - 1).select(
        "cid", F.col("v").alias("c")
    )
    asg = None
    for _ in range(iters):
        d = emb.crossJoin(F.broadcast(cent)).select(
            "vec_id",
            "cid",
            F.aggregate(
                F.zip_with(F.col("v"), F.col("c"), lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist2"),
        )
        w = Window.partitionBy("vec_id").orderBy("dist2", "cid")
        asg = (
            d.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cid", "dist2")
        )
        q = (
            asg.join(emb, "vec_id")
            .select("cid", F.posexplode(F.col("v")).alias("pos", "x"))
            .select(
                "cid",
                (F.col("pos") + 1).alias("dim"),
                F.floor(F.col("x") * F.lit(1e6)).alias("qv"),
            )
        )
        n = asg.groupBy("cid").agg(F.count("*").alias("n"))
        cent = (
            q.groupBy("cid", "dim")
            .agg(F.sum("qv").alias("s"))
            .join(n, "cid")
            .select(
                "cid",
                "dim",
                ((F.col("s").cast("double") / F.lit(1e6)) / F.col("n")).alias("cd"),
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("dim", "cd"))),
                    lambda s: s["cd"],
                ).alias("c")
            )
        )
    return cent, asg
