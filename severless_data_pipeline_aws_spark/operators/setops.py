"""Set operations (SURVEY §2.7).

The reference's closest construct is list concatenation
(``items.extend`` iot_dashboard.py:64; ``all_data.extend``
iot-data-stream.py:387) == UNION ALL / streaming append. The engine
exposes the full family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..registry import register


def _cust_nations(t):
    return t.customer.select(F.col("c_nationkey").alias("nationkey"))


def _supp_nations(t):
    return t.supplier.select(F.col("s_nationkey").alias("nationkey"))


@register(
    "setop_union_all",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION ALL (batch append; iot-data-stream.py:387).",
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return _cust_nations(t).unionAll(_supp_nations(t))


@register(
    "setop_union_distinct",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION (distinct).",
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return _cust_nations(t).union(_supp_nations(t)).distinct()


@register(
    "setop_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT: nations having both customers and suppliers.",
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return _cust_nations(t).intersect(_supp_nations(t))


@register(
    "setop_except",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal < 0
    """,
    doc=(
        "EXCEPT: nations with customers but no distressed (negative-"
        "balance) supplier — set difference with the right side "
        "predicated so the result is non-empty at EVERY test scale "
        "(the earlier >8000 predicate went vacuous at sf0.1, where "
        "every nation has a high-balance supplier)."
    ),
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL EXCEPT is set difference: subtract() == EXCEPT DISTINCT.
    # (exceptAll().distinct() would be multiset difference, which keeps a
    # key whenever the left multiplicity exceeds the right one.)
    t = Tables(spark, sf_dir)
    distressed = t.supplier.filter(F.col("s_acctbal") < 0).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return _cust_nations(t).subtract(distressed)


@register(
    "setop_except_all",
    oracle="""
        SELECT o_orderstatus AS status FROM orders WHERE o_totalprice > 100000
        EXCEPT ALL
        SELECT o_orderstatus AS status FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="EXCEPT ALL: multiset difference (keeps surplus multiplicity).",
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_totalprice") > 100000).select(F.col("o_orderstatus").alias("status"))
    b = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderstatus").alias("status")
    )
    return a.exceptAll(b)


@register(
    "setop_union_by_name",
    oracle="""
        SELECT o_orderkey AS id, 'order' AS kind FROM orders WHERE o_totalprice > 400000
        UNION ALL
        SELECT event_id AS id, 'event' AS kind FROM events WHERE event_type = 'error'
    """,
    doc="unionByName: schema-aligned append of heterogeneous sources.",
    tags=("setop",),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("id"), F.lit("order").alias("kind")
    )
    b = t.events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("id"), F.lit("event").alias("kind")
    )
    return a.unionByName(b)


@register(
    "setop_intersect_all",
    oracle="""
        SELECT o_orderstatus AS status FROM orders WHERE o_totalprice > 100000
        INTERSECT ALL
        SELECT o_orderstatus AS status FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc=(
        "INTERSECT ALL: multiset intersection (keeps min multiplicity "
        "per value) — completes the set-op matrix alongside UNION [ALL] "
        "/ EXCEPT [ALL] / INTERSECT / unionByName."
    ),
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_orderstatus").alias("status")
    )
    b = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderstatus").alias("status")
    )
    return a.intersectAll(b)
