"""OLAP grouping extensions: CUBE, GROUPING SETS, exact percentiles.

Completes the aggregation family (SURVEY §2.4; q_a4 covers ROLLUP):
multi-level aggregates are Catalyst ``Expand``-based — one extra
projection per grouping set feeding a single hash aggregate, so the
plan stays one shuffle regardless of how many sets are requested
(that's the property that matters at 100 TB; N separate groupBys would
be N shuffles and N scans).

Percentile determinism: ``percentile`` (Spark) and ``quantile_cont``
(DuckDB) both linearly interpolate at index q·(n−1). With dyadic
quantiles (.25/.5/.75) and integer-valued inputs (l_quantity), the
interpolation is exact in IEEE double in both engines — bit-identical,
safe to hash. Non-dyadic quantiles over arbitrary doubles would NOT be
(registry docstring rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.catalog import table
from receiptanalyzerpipeline_spark.plans.registry import register


@register(
    "q_a6_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc=(
        "CUBE over (returnflag, linestatus): all 4 grouping sets in one "
        "Expand + single hash aggregate (one shuffle total)."
    ),
    tags=("agg", "cube", "olap"),
)
def q_a6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


@register(
    "q_a7_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc=(
        "Explicit GROUPING SETS ((returnflag),(linestatus)) — disjoint "
        "single-column sets, NOT derivable from cube/rollup shorthand."
    ),
    tags=("agg", "grouping-sets", "olap"),
)
def q_a7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets([["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


@register(
    "q_a8_quartiles",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS q25,
               quantile_cont(l_quantity, 0.5)  AS q50,
               quantile_cont(l_quantity, 0.75) AS q75,
               MAX(l_quantity) AS q_max
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc=(
        "Exact continuous quartiles of l_quantity per returnflag — dyadic "
        "quantiles over integer values interpolate bit-identically in both "
        "engines. (approx_percentile is the sketch sibling, q_a5-style.)"
    ),
    tags=("agg", "percentile", "olap"),
)
def q_a8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.5).alias("q50"),
        F.percentile("l_quantity", 0.75).alias("q75"),
        F.max("l_quantity").alias("q_max"),
    )


@register(
    "q_a10_regression_profile",
    oracle="""
        SELECT l_returnflag, n,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
                   AS intercept,
               (n * sxy - sx * sy)
                   / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r
        FROM (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
                   CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
                   CAST(CAST(SUM(x * y) AS VARCHAR) AS DOUBLE) AS sxy,
                   CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
                   CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy
            FROM (
                SELECT l_returnflag,
                       CAST(l_quantity AS DECIMAL(18,2)) AS x,
                       CAST(l_extendedprice AS DECIMAL(18,2)) AS y
                FROM lineitem
            )
            GROUP BY l_returnflag
        )
        ORDER BY l_returnflag
    """,
    doc=(
        "Statistical profile per returnflag: OLS slope/intercept and "
        "Pearson r of extendedprice vs quantity (SURVEY A6 statistical "
        "aggregates). Built-in corr/regr_* accumulate float moments whose "
        "low-order bits are partition-order-dependent, so instead the five "
        "moments are summed EXACTLY in DECIMAL (x·y at scale 4 fits "
        "DECIMAL(38,4) by orders of magnitude), cast once to DOUBLE, and "
        "the closed-form formulas are evaluated with the identical IEEE "
        "expression tree on both engines — deterministic at any partition "
        "count. One shuffle (partial+final agg); the moment tuple is "
        "mergeable, so the same query works as a streaming snapshot."
    ),
    tags=("agg", "statistics", "olap"),
)
def q_a10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        ((n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).alias("r"),
    ).orderBy("l_returnflag")


@register(
    "q_p3_above_brand_avg",
    oracle="""
        SELECT p_partkey, p_brand,
               CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM part p
        WHERE CAST(p_retailprice AS DECIMAL(18,2)) > (
            SELECT CAST(CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) AS DECIMAL(18,4))
            FROM part p2 WHERE p2.p_brand = p.p_brand
        )
        ORDER BY p_partkey
    """,
    doc=(
        "Correlated-scalar-subquery semantics (parts above their brand's "
        "average price), expressed scalably as one aggregate + broadcast "
        "join back — the de-correlated plan Catalyst itself would target; "
        "oracle keeps the textbook correlated form. Brand avg follows the "
        "registry decimal-sum/double-divide determinism rule."
    ),
    tags=("subquery", "agg", "join"),
)
def q_p3(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").withColumn(
        "price", F.col("p_retailprice").cast("decimal(18,2)")
    )
    brand_avg = p.groupBy(F.col("p_brand").alias("b_brand")).agg(
        (F.sum("price").cast("double") / F.count("*"))
        .cast("decimal(18,4)")
        .alias("avg_price")
    )
    return (
        p.join(F.broadcast(brand_avg), p["p_brand"] == F.col("b_brand"))
        .where(F.col("price") > F.col("avg_price"))
        .select("p_partkey", "p_brand", F.col("price").cast("double").alias("price"))
        .orderBy("p_partkey")
    )


@register(
    "q_a9_approx_quartiles",
    oracle=None,  # sketch output; accuracy pinned in tests vs exact q_a8
    doc=(
        "approx_percentile (GK sketch) quartiles of l_quantity per "
        "returnflag — the single-pass mergeable-sketch sibling of exact "
        "q_a8 for 100 TB percentile queries (exact percentile buffers the "
        "group; the sketch is bounded memory). Rows-only driver check; "
        "tests bound the error against the exact answer."
    ),
    tags=("agg", "percentile", "sketch", "olap"),
)
def q_a9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    acc = F.lit(10000)
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_quantity", F.lit(0.25), acc).alias("q25"),
        F.approx_percentile("l_quantity", F.lit(0.5), acc).alias("q50"),
        F.approx_percentile("l_quantity", F.lit(0.75), acc).alias("q75"),
    )


@register(
    "q_a11_mergeable_hll",
    oracle=None,  # sketch estimates are engine-specific; tolerance pinned in tests
    doc=(
        "Mergeable-sketch distinct counting (Apache DataSketches HLL): "
        "per-priority sketches via hll_sketch_agg, then ONE union-merge "
        "(hll_union_agg) yields the global estimate without rescanning — "
        "the 100 TB pattern where per-partition/per-day sketches are "
        "persisted and any rollup is a cheap sketch merge instead of a "
        "recount. Rows-only driver check; tests bound the estimates "
        "against exact COUNT(DISTINCT) (<2% at this cardinality). "
        "approx_count_distinct (q_a5) is the one-shot sibling; this one "
        "materializes the REUSABLE sketch."
    ),
    tags=("agg", "distinct", "sketch", "mergeable"),
)
def q_a11(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    est = per_group.select(
        "o_orderpriority",
        F.hll_sketch_estimate("sk").cast("long").alias("distinct_custkeys"),
    )
    union = per_group.agg(
        F.lit("_ALL_").alias("o_orderpriority"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("distinct_custkeys"),
    ).select("o_orderpriority", "distinct_custkeys")
    return est.unionByName(union).orderBy("o_orderpriority")
