"""Join family (SURVEY §2.3).

The reference's only join is the generator denormalizing a 5-row
location dimension into every record (iot-data-stream.py:101-107,230,
196-204) — semantically a broadcast equi-join of a fact stream against
a tiny dimension (J1). The engine exposes the full family over the
star schema; Catalyst picks broadcast-hash vs sort-merge, and AQE can
re-plan at runtime.

Scale notes (100 TB):
* dimension joins (region/nation/supplier/customer at bounded
  cardinality) are explicitly ``F.broadcast`` — zero shuffle of the
  fact side.
* fact-fact joins (lineitem x orders) shuffle on the join key; both
  sides hash-partition on the key so the shuffle is minimal and AQE
  handles skew. At 100 TB these tables should be bucketed by orderkey
  at write time, which removes the shuffle entirely (see
  sources/sinks.py bucketed writer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..registry import register
from ._helpers import dsum


@register(
    "join_broadcast_dim_enrichment",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    """,
    doc="J1: fact->dim broadcast enrichment (reference location embed).",
    tags=("join", "broadcast"),
)
def join_broadcast_dim_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


@register(
    "join_inner_fact_fact",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus, o.o_totalprice,
               l.l_extendedprice
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT' AND l.l_quantity >= 45
    """,
    doc="Inner fact-fact equi-join; shuffles both sides on the key.",
    tags=("join",),
)
def join_inner_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_quantity") >= 45)
        .join(t.orders.filter(F.col("o_orderpriority") == "1-URGENT"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_orderstatus", "o_totalprice", "l_extendedprice")
    )


@register(
    "join_left_outer",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
        WHERE c.c_acctbal < 0
    """,
    doc="Left outer join with join-side predicate (null-extending).",
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    o = t.orders
    c = t.customer.filter(F.col("c_acctbal") < 0)
    return c.join(
        o,
        (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderstatus") == "F"),
        "left",
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    doc="Left-semi join (EXISTS): customers with a >300k order.",
    tags=("join", "semi"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 300000)
    return t.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders.",
    tags=("join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_full_outer",
    oracle="""
        WITH cn AS (SELECT n_nationkey, COUNT(*) AS n_cust
                    FROM customer JOIN nation ON c_nationkey = n_nationkey
                    GROUP BY n_nationkey),
             sn AS (SELECT n_nationkey, COUNT(*) AS n_supp
                    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    GROUP BY n_nationkey)
        SELECT COALESCE(cn.n_nationkey, sn.n_nationkey) AS nationkey,
               cn.n_cust, sn.n_supp
        FROM cn FULL OUTER JOIN sn ON cn.n_nationkey = sn.n_nationkey
    """,
    doc="Full outer join of two aggregates (nations by customer vs supplier presence).",
    tags=("join", "outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    n = t.nation
    cn = (
        t.customer.join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        t.supplier.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, cn["n_nationkey"] == sn["n_nationkey"], "full_outer").select(
        F.coalesce(cn["n_nationkey"], sn["n_nationkey"]).alias("nationkey"),
        "n_cust",
        "n_supp",
    )


@register(
    "join_cross_bounded",
    oracle="""
        SELECT r1.r_name AS from_region, r2.r_name AS to_region
        FROM region r1 CROSS JOIN region r2
        WHERE r1.r_regionkey <> r2.r_regionkey
    """,
    doc="Cross join (bounded to the 5-row region dim: 20 pairs).",
    tags=("join", "cross"),
)
def join_cross_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    r1 = t.region.select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region"))
    r2 = t.region.select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region"))
    return r1.crossJoin(r2).filter(F.col("k1") != F.col("k2")).select("from_region", "to_region")


@register(
    "join_range_theta",
    oracle="""
        SELECT o.o_orderkey, o.o_orderdate, l.l_linenumber, l.l_shipdate
        FROM orders o JOIN lineitem l
          ON o.o_orderkey = l.l_orderkey
         AND l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY
    """,
    doc="Theta/range join: equi-key + range residual (ship >80d after order).",
    tags=("join", "range"),
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.join(
            t.lineitem,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS")),
        )
    ).select("o_orderkey", "o_orderdate", "l_linenumber", "l_shipdate")


@register(
    "join_asof_last_event_before_order",
    oracle="""
        WITH pairs AS (
            SELECT o.o_orderkey, o.o_orderdate, e.ts, e.event_id,
                   row_number() OVER (PARTITION BY o.o_orderkey ORDER BY e.ts DESC, e.event_id DESC) AS rn
            FROM orders o JOIN events e
              ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
            WHERE o.o_custkey <= 50
        )
        SELECT o_orderkey, o_orderdate, ts AS last_event_ts, event_id AS last_event_id
        FROM pairs WHERE rn = 1
    """,
    doc=(
        "As-of join (backward): latest event per user at or before each "
        "order date. Non-native in Spark: equi-join on user + range filter "
        "+ per-order top-1 window. At 100 TB, replace with a bucketized "
        "range join (bucket ts to days, join on (user, day-range))."
    ),
    tags=("join", "asof"),
)
def join_asof_last_event_before_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_custkey") <= 50)
    pairs = o.join(
        t.events,
        (F.col("user_id") == F.col("o_custkey")) & (F.col("ts") <= F.col("o_orderdate")),
    )
    w = W.partitionBy("o_orderkey").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.col("ts").alias("last_event_ts"),
            F.col("event_id").alias("last_event_id"),
        )
    )
