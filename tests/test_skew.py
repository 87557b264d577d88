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


def test_detect_hot_keys_finds_the_heavy_key(spark):
    from receiptanalyzerpipeline_spark.operators.skew import detect_hot_keys

    # key 0: 5000 rows; keys 1..49: ~100 each.
    df = spark.range(10_000).select(
        F.when(F.col("id") < 5000, 0).otherwise(F.col("id") % 49 + 1).alias("k")
    )
    hot, n_salts = detect_hot_keys(df, ["k"], task_capacity_rows=1000)
    assert [r["k"] for r in hot.collect()] == [0]
    assert n_salts == 5  # ceil(5000/1000)

    uniform = spark.range(10_000).select((F.col("id") % 50).alias("k"))
    hot2, n2 = detect_hot_keys(uniform, ["k"], task_capacity_rows=1000)
    assert hot2.count() == 0 and n2 == 1


def test_auto_salted_join_equals_plain_join(spark):
    from receiptanalyzerpipeline_spark.operators.skew import auto_salted_join

    probe = spark.range(8_000).select(
        F.when(F.col("id") < 6000, 7).otherwise(F.col("id") % 20).alias("k"),
        F.col("id").alias("pid"),
    )
    build = spark.range(20).select(F.col("id").alias("k"), (F.col("id") * 10).alias("bv"))
    expected = sorted(
        (r["k"], r["pid"], r["bv"]) for r in probe.join(build, "k").collect()
    )
    got = sorted(
        (r["k"], r["pid"], r["bv"])
        for r in auto_salted_join(
            probe, build, ["k"], task_capacity_rows=500, salt_from="pid"
        ).collect()
    )
    assert got == expected

    # No skew: identical result through the plain path.
    probe2 = spark.range(1000).select((F.col("id") % 20).alias("k"), F.col("id").alias("pid"))
    got2 = sorted(
        (r["k"], r["pid"], r["bv"])
        for r in auto_salted_join(probe2, build, ["k"], task_capacity_rows=500).collect()
    )
    exp2 = sorted((r["k"], r["pid"], r["bv"]) for r in probe2.join(build, "k").collect())
    assert got2 == exp2
