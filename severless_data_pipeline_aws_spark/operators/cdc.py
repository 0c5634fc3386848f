"""CDC / upsert operators: MERGE-INTO semantics over plain parquet.

Without a table format (Delta/Iceberg), an upsert is a full-outer join
of the base snapshot against the change batch with per-column
``coalesce(update, base)`` — exactly how Spark executes MERGE under
the hood. The change batch here is derived deterministically from the
base table (updates for ``o_orderkey % 97 = 0``, inserts above the
key space), so the result is oracle-verifiable.

Scale shape: the join shuffles on the natural key; with the bucketed
layout (sources/sinks.write_bucketed) the base side pre-partitions and
only the (small) change batch moves. The post-merge summary keeps the
driver result bounded regardless of snapshot size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..registry import register
from ._helpers import dsum_double, dsum_double_sql


@register(
    "cdc_upsert_orders_snapshot",
    oracle=f"""
        WITH updates AS (
            SELECT o_orderkey, 'X' AS o_orderstatus,
                   o_totalprice + 1000.0 AS o_totalprice
            FROM orders WHERE o_orderkey % 97 = 0
            UNION ALL
            SELECT -o_orderkey, 'N', 50000.0
            FROM orders WHERE o_orderkey % 499 = 0
        ),
        merged AS (
            SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
                   COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
                   COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice
            FROM orders b FULL OUTER JOIN updates u USING (o_orderkey)
        )
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               {dsum_double_sql("o_totalprice")} AS total_price
        FROM merged
        GROUP BY o_orderstatus
    """,
    doc=(
        "MERGE INTO emulation (update + insert in one batch): "
        "full-outer join on the key, per-column coalesce(update, base), "
        "post-merge per-status summary. The change batch is derived "
        "deterministically so both engines merge the identical delta."
    ),
    tags=("cdc", "join", "agg"),
)
def cdc_upsert_orders_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    updates = (
        base.filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.lit("X").alias("u_status"),
            (F.col("o_totalprice") + 1000.0).alias("u_price"),
        )
        .unionByName(
            base.filter(F.col("o_orderkey") % 499 == 0).select(
                # negated keys are disjoint from the (positive) base key
                # space at EVERY scale — an additive offset would collide
                # once the snapshot's max key outgrows it
                (-F.col("o_orderkey")).alias("o_orderkey"),
                F.lit("N").alias("u_status"),
                F.lit(50000.0).alias("u_price"),
            )
        )
    )
    merged = base.join(updates, ["o_orderkey"], "full_outer").select(
        F.coalesce("u_status", "o_orderstatus").alias("o_orderstatus"),
        F.coalesce("u_price", "o_totalprice").alias("o_totalprice"),
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum_double("o_totalprice").alias("total_price"),
    )
