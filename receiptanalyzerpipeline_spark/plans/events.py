"""Event-stream queries (SURVEY.md §2.12 Q-F3, Q-T1..Q-T3).

Batch-mode equivalents of the streaming operators (§2.9): tumbling
windows, keyed dedup, sessionization. The same transforms are reused by
``streaming/`` over ``readStream`` inputs — in Spark the batch and
streaming plans share the DataFrame expressions, so proving them here
against the oracle also pins the streaming semantics.

Time arithmetic is done in exact epoch microseconds (unix_micros /
epoch_us) on both engines — no float seconds, no truncation ambiguity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from receiptanalyzerpipeline_spark.catalog import table
from receiptanalyzerpipeline_spark.plans.registry import register

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, in microseconds


@register(
    "q_f3_json_map",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
               MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
               MAX(CAST(props->>'k' AS BIGINT)) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc=(
        "JSON property extraction + aggregation — the other_data JSON column pattern "
        "(models.py:17, SURVEY F7/F12/Q-F3)."
    ),
    tags=("json", "agg"),
)
def q_f3(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q_t1_tumbling_window",
    oracle="""
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2, 3
        ORDER BY window_start, event_type
    """,
    doc=(
        "1-hour tumbling event-time window, batch-equivalent of "
        "window(ts, '1 hour') (SURVEY T6/Q-T1)."
    ),
    tags=("window-time", "agg", "streaming-equivalent"),
    bench=True,
)
def q_t1(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour")
    return (
        e.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q_t5_sliding_window",
    oracle="""
        WITH assigned AS (
            SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) AS window_start,
                   event_type, value
            FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) - INTERVAL 30 MINUTE,
                   event_type, value
            FROM events
        )
        SELECT window_start,
               window_start + INTERVAL 1 HOUR AS window_end,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM assigned
        GROUP BY 1, 2, 3
        ORDER BY window_start, event_type
    """,
    doc=(
        "Sliding event-time window (1 h window, 30 min slide): each event in "
        "two overlapping windows — window(ts, '1 hour', '30 minutes') "
        "(SURVEY T6). Oracle assigns the two bucket starts explicitly."
    ),
    tags=("window-time", "agg", "streaming-equivalent"),
)
def q_t5(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour", "30 minutes")
    return (
        e.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q_t2_dedup",
    oracle="""
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        FROM (
            SELECT event_id, ts, user_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id) AS rn
            FROM events
        ) t
        WHERE rn = 1
        ORDER BY event_id
    """,
    doc=(
        "Keyed dedup with a deterministic survivor (first by ts) — the engine form of "
        "dropDuplicates / rename-to-hash collision (anarcptlib.py:155-159, SURVEY T7/Q-T2)."
    ),
    tags=("dedup", "streaming-equivalent"),
)
def q_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_id").orderBy("ts", "user_id")
    return (
        e.select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
        .orderBy("event_id")
    )


@register(
    "q_t4_session_window",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL THEN 1
                        WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM sessions
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
    doc=(
        "Native session windows: session_window(ts, '30 minutes') — Spark's "
        "built-in stateful sessionization operator, identical in batch and "
        "Structured Streaming (SURVEY T6). Window end = last event + gap. "
        "Testdata has no exact-30min gaps, so the >=-gap oracle is exact."
    ),
    tags=("window-time", "sessionization", "streaming-equivalent"),
)
def q_t4(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window(F.col("ts"), "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "q_t3_sessionization",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                            OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            > {SESSION_GAP_US}
                        THEN 1
                        WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                        THEN 1
                        ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts, event_id,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end
        FROM sessions
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    doc="Gap-based sessionization (30-min gaps) via lag + cumulative sum (SURVEY Q-T3).",
    tags=("window", "sessionization", "streaming-equivalent"),
    bench=True,
)
def q_t3(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Exact epoch micros from the NTZ wall-clock — zone-independent, unlike
    # unix_micros() which would interpret via the session timezone.
    micros = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    prev = F.lag(micros).over(w)
    new_session = F.when(prev.isNull() | ((micros - prev) > SESSION_GAP_US), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.select("user_id", "ts", "event_id")
        .withColumn("session_id", F.sum(new_session).over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )
