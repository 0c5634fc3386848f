"""Classic TPC-H analytic shapes (Q3, Q6, Q10, Q18) over the driver's
slimmed star schema.

Reference parity notes: the reference's dashboard is one fixed
filter+agg pipeline (iot_dashboard.py:94-150); these queries
generalize that surface to the canonical decision-support shapes a
user of a real analytics engine runs daily. Q5 lives in
operators/subqueries.py; this module adds:

  Q3  shipping-priority top-k: 3-way join, group, top-10 by revenue
  Q6  forecast revenue delta: pure scan+filter+single-row agg
  Q10 returned-item report: 4-way join, group, top-20 customers
  Q18 large-volume orders: semi-join against a HAVING subquery

Columns absent from the slimmed schema (o_shippriority, c_address,
c_phone, c_comment, l_commitdate) are dropped from the classic
SELECT lists; predicates and shapes are otherwise canonical.

Scale notes: Q6 is map-only (predicates push to the parquet scan,
single-row partial agg — the cheapest possible 100 TB query). Q3/Q10
broadcast the dim side after its selective filter and end in
TakeOrderedAndProject (no global sort). Q18's HAVING subquery is a
shuffle-agg over lineitem reused as a broadcastable key list at this
selectivity (~1% of orders); at 100 TB AQE decides broadcast vs
shuffle join on the runtime size of the qualifying key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..registry import register
from ._helpers import dsum_double, dsum_double_sql

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               {dsum_double_sql(_REV)} AS revenue,
               o_orderdate
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    doc=(
        "TPC-H Q3 shape: segment-filtered customer broadcast into "
        "orders, fact-fact join to lineitem, per-order revenue, "
        "top-10 via TakeOrderedAndProject."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cutoff = F.lit("1997-03-15").cast("timestamp")
    return (
        t.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_double(_REV).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
        SELECT {dsum_double_sql("l_extendedprice * l_discount")} AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6 shape: pure scan + conjunctive filter + single-row "
        "aggregate. All predicates push to the parquet scan; map-side "
        "partial agg makes this the cheapest 100 TB query shape."
    ),
    tags=("agg", "tpch", "scan"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            dsum_double("l_extendedprice * l_discount").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name,
               {dsum_double_sql(_REV)} AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc=(
        "TPC-H Q10 shape: quarter of returned lineitems attributed "
        "back to customers (4-way join, nation broadcast), top-20 "
        "lost-revenue customers via TakeOrderedAndProject."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t.lineitem.filter(F.col("l_returnflag") == "R"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum_double(_REV).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q18_large_volume_orders",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               SUM(l_quantity) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    doc=(
        "TPC-H Q18 shape: large-volume orders via IN over a HAVING "
        "aggregate subquery (plans as a semi-join on the qualifying "
        "key set), regrouped with customer attribution, top-100 by "
        "order value. l_quantity is integral-valued, so the double "
        "SUM is exact on both engines."
    ),
    tags=("join", "agg", "subquery", "tpch"),
)
def tpch_q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t.orders.join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )
