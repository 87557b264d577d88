"""Portable count-min sketch (Cormode & Muthukrishnan 2005) — the
mergeable frequency sketch next to the HLL (distinct) and GK (quantile)
sketches in the engine's approximate family.

Engine-portable by construction: bucket hashes are md5-derived
(`dedup.md5_hash60` with per-row seeds), so a DuckDB oracle replays the
ENTIRE sketch — build, point queries, and both CMS guarantees — as
computed data (see plans/olap.py q_a5_sketch_accuracy's cms part).

Distributed shape: the build is one aggregate from a (vocabulary-sized
or raw) keyed table down to d×w BIGINT counters — mergeable across
shards/streams by cell-wise addition, the classic streaming-frequency
state. Point queries join the probe keys' d cells against the counter
table and take MIN per key. Guarantees (for exact integer counts):
estimate ≥ true count always; estimate ≤ true count + ε·N with
probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.operators.dedup import md5_hash60

__all__ = ["cms_buckets", "cms_build", "cms_point_query"]


def cms_buckets(key: Column, d: int, w: int) -> Column:
    """Array of d (j, b) structs: the sketch cells a key hashes to."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (md5_hash60(key, seed=f"cms{j}") % w).alias("b"),
            )
            for j in range(d)
        ]
    )


def cms_build(
    weighted: DataFrame,
    key_col: str,
    weight_col: str,
    d: int = 3,
    w: int = 64,
) -> DataFrame:
    """(j, b, cnt): the d×w counter table from a (key, weight) table.
    Feed it a pre-aggregated frequency table (vocabulary-sized) when one
    exists; raw rows with weight 1 work identically. Merge two sketches
    with a union + groupBy(j, b).sum(cnt)."""
    return (
        weighted.select(
            F.explode(cms_buckets(F.col(key_col), d, w)).alias("k"),
            F.col(weight_col).alias("_wt"),
        )
        .groupBy("k.j", "k.b")
        .agg(F.sum("_wt").alias("cnt"))
    )


def cms_point_query(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = 3,
    w: int = 64,
) -> DataFrame:
    """probes + an ``est`` column: MIN over the key's d cells. The probe
    side is small (heavy-hitter candidates); the sketch is d×w rows, so
    the join broadcasts."""
    exploded = probes.withColumn(
        "_cms_cell", F.explode(cms_buckets(F.col(key_col), d, w))
    ).select(
        *probes.columns,
        F.col("_cms_cell.j").alias("j"),
        F.col("_cms_cell.b").alias("b"),
    )
    return (
        exploded.join(F.broadcast(sketch), ["j", "b"])
        .groupBy(*probes.columns)
        .agg(F.min("cnt").alias("est"))
    )
