"""Salted-join equivalence: salting changes the partitioning, never the
result."""

from __future__ import annotations

from pyspark.sql import functions as F

from severless_data_pipeline_aws_spark.io import Tables
from severless_data_pipeline_aws_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark, sf_dir):
    t = Tables(spark, sf_dir)
    # simulate skew: collapse most lineitem keys onto one hot key
    li = t.lineitem.withColumn(
        "jkey", F.when(F.col("l_orderkey") % 4 != 0, F.lit(1)).otherwise(F.col("l_orderkey"))
    ).select("jkey", "l_extendedprice")
    o = t.orders.withColumn(
        "jkey", F.when(F.col("o_orderkey") % 4 != 0, F.lit(1)).otherwise(F.col("o_orderkey"))
    ).select("jkey", "o_totalprice").limit(200)

    plain = li.join(o, "jkey").groupBy("jkey").count()
    salted = salted_join(li, o, "jkey").groupBy("jkey").count()

    p = {r["jkey"]: r["count"] for r in plain.collect()}
    s = {r["jkey"]: r["count"] for r in salted.collect()}
    assert p == s and sum(p.values()) > 0


def test_salted_join_left_outer_keeps_unmatched(spark, sf_dir):
    t = Tables(spark, sf_dir)
    li = t.lineitem.select(F.col("l_orderkey").alias("jkey"), "l_extendedprice")
    o = t.orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("jkey"), "o_totalprice"
    )
    plain = li.join(o, "jkey", "left")
    salted = salted_join(li, o, "jkey", how="left")
    assert salted.count() == plain.count()
    assert (
        salted.filter(F.col("o_totalprice").isNull()).count()
        == plain.filter(F.col("o_totalprice").isNull()).count()
    )
