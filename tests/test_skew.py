"""Explicit skew salting: row-identical results with the hot key spread
across n_salts reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from ta2_minmod_kg_spark.functions.skew import salted_agg, salted_join, with_salt


def _skewed(spark, n=20_000):
    # 90% of rows share one hot key
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_row_identical(spark):
    left = _skewed(spark)
    right = spark.range(200).select(
        F.when(F.col("id") == 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        (F.col("id") * 10).alias("w"),
    )
    plain = left.join(right, ["k"]).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    salted = salted_join(left, right, ["k"], n_salts=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b and len(a) > 0


def test_salt_actually_spreads_hot_key(spark):
    left = with_salt(_skewed(spark), 8)
    spread = (
        left.filter(F.col("k") == "HOT").select("_salt").distinct().count()
    )
    assert spread == 8  # the hot key occupies every salt bucket


def test_salt_is_deterministic(spark):
    a = with_salt(_skewed(spark), 8).collect()
    b = with_salt(_skewed(spark), 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    salted = salted_agg(
        df,
        ["k"],
        [
            (F.count(F.lit(1)).alias("n"), lambda: F.sum("n").alias("n")),
            (F.sum("v").alias("sv"), lambda: F.sum("sv").alias("sv")),
        ],
        n_salts=8,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
