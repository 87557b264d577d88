"""salted_join must be result-equivalent to a plain equi-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.operators.skew import salted_join


def _rows(df):
    return sorted(map(str, df.collect()))


def test_salted_join_equals_plain_join(spark):
    # 90% of probe rows hit one hot key.
    probe = spark.range(2000).select(
        F.col("id").alias("pid"),
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
    )
    build = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("payload")
    )
    plain = probe.join(build, "k").select("k", "pid", "payload")
    salted = salted_join(probe, build, ["k"], n_salts=8, salt_from="pid").select(
        "k", "pid", "payload"
    )
    assert _rows(salted) == _rows(plain)


def test_salted_join_hot_keys_path(spark):
    probe = spark.range(500).select(
        F.col("id").alias("pid"), (F.col("id") % 20).alias("k")
    )
    build = spark.range(20).select(F.col("id").alias("k"), F.col("id").alias("v"))
    hot = spark.createDataFrame([(3,), (7,)], "k long")
    plain = probe.join(build, "k").select("k", "pid", "v")
    mixed = salted_join(
        probe, build, ["k"], n_salts=4, salt_from="pid", hot_keys=hot
    ).select("k", "pid", "v")
    assert _rows(mixed) == _rows(plain)


def test_salted_join_deterministic_salt(spark):
    # rand()-based salting breaks under task retry; ours must be stable
    # across independent executions.
    probe = spark.range(300).select(F.col("id").alias("pid"), (F.col("id") % 5).alias("k"))
    build = spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v"))
    a = salted_join(probe, build, ["k"], n_salts=4, salt_from="pid")
    b = salted_join(probe, build, ["k"], n_salts=4, salt_from="pid")
    assert _rows(a) == _rows(b)
