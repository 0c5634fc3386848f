"""Null-semantics battery: COALESCE / NVL2 / NANVL, null-safe equality,
NULLS FIRST|LAST ordering, skip-null aggregation, and null group keys.

Reference parity notes (file:line cite the reference):
  P4/P5 null-drop + all-null guard   iot_dashboard.py:157,166,176,185
  (the dashboard's only defense against missing readings is dropna;
  this battery covers the full SQL null algebra a user would reach for
  instead of dropping rows)

The test tables carry no physical NULLs, so each query synthesizes
them deterministically (NULLIF / CASE) identically on both engines —
the null *semantics* (three-valued logic, skip-null aggregates, null
sort position, null group keys) are what is under test.

Scale notes: every query here is a narrow projection + single scan
(or one shuffle for the grouped variant); null handling is all
JVM-side expression work inside WholeStageCodegen — nothing changes
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..registry import register
from ._helpers import dsum_double, dsum_double_sql

_NAN_EXPR = "CASE WHEN l_discount > 0.05 THEN CAST('NaN' AS DOUBLE) ELSE l_tax END"


@register(
    "null_scalar_battery",
    oracle=f"""
        SELECT l_orderkey, l_linenumber,
               COALESCE(NULLIF(l_discount, 0.0), 0.0) AS disc_or_zero,
               CASE WHEN NULLIF(l_discount, 0.0) IS NOT NULL
                    THEN 'disc' ELSE 'none' END AS disc_flag,
               (NULLIF(l_discount, 0.0) IS NOT DISTINCT FROM NULLIF(l_tax, 0.0))
                   AS same_rate,
               CASE WHEN isnan({_NAN_EXPR}) THEN -1.0 ELSE {_NAN_EXPR} END
                   AS nan_fixed
        FROM lineitem WHERE l_orderkey <= 2500
    """,
    doc=(
        "Null scalar battery: COALESCE, NVL2 (oracle: CASE), null-safe "
        "equality <=> (oracle: IS NOT DISTINCT FROM), NANVL (oracle: "
        "isnan CASE) over deterministically synthesized NULL/NaN."
    ),
    tags=("nulls", "scalar"),
)
def null_scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.filter(F.col("l_orderkey") <= 2500).select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.expr("NULLIF(l_discount, 0.0)"), F.lit(0.0)).alias("disc_or_zero"),
        F.expr("nvl2(NULLIF(l_discount, 0.0), 'disc', 'none')").alias("disc_flag"),
        F.expr("NULLIF(l_discount, 0.0)")
        .eqNullSafe(F.expr("NULLIF(l_tax, 0.0)"))
        .alias("same_rate"),
        F.nanvl(F.expr(_NAN_EXPR), F.lit(-1.0)).alias("nan_fixed"),
    )


@register(
    "null_ordering_first_last",
    oracle="""
        SELECT o_orderkey,
               NULLIF(o_orderpriority, '1-URGENT') AS prio_nn,
               o_totalprice
        FROM orders WHERE o_orderkey <= 600
        ORDER BY prio_nn ASC NULLS FIRST, o_orderkey
        LIMIT 50
    """,
    doc=(
        "Explicit null sort position: ASC NULLS FIRST with a unique "
        "tiebreak under LIMIT (Spark's ASC default is NULLS FIRST, "
        "DuckDB's is NULLS LAST — both sides are explicit)."
    ),
    tags=("nulls", "sort"),
)
def null_ordering_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.filter(F.col("o_orderkey") <= 600)
        .select(
            "o_orderkey",
            F.expr("NULLIF(o_orderpriority, '1-URGENT')").alias("prio_nn"),
            "o_totalprice",
        )
        .orderBy(F.col("prio_nn").asc_nulls_first(), F.col("o_orderkey").asc())
        .limit(50)
    )


@register(
    "null_profile_counts",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               COUNT(*) - COUNT(NULLIF(event_type, 'click')) AS n_click,
               COUNT(*) - COUNT(CASE WHEN value < 0 THEN NULL ELSE value END)
                   AS n_neg_value,
               COUNT(DISTINCT event_type) AS n_types
        FROM events
    """,
    doc=(
        "Column null-profile: COUNT(*) vs skip-null COUNT(expr) per "
        "column in one scan — the distributed analog of a pandas "
        "isna().sum() profile (map-side partial counts, single-row "
        "reduce; no shuffle of data rows)."
    ),
    tags=("nulls", "agg", "profile"),
)
def null_profile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count(F.expr("NULLIF(event_type, 'click')"))).alias(
            "n_click"
        ),
        (
            F.count(F.lit(1))
            - F.count(F.expr("CASE WHEN value < 0 THEN NULL ELSE value END"))
        ).alias("n_neg_value"),
        F.countDistinct("event_type").alias("n_types"),
    )


_NULLABLE_PRICE = "CASE WHEN o_totalprice > 200000 THEN NULL ELSE o_totalprice END"


@register(
    "null_group_key_semantics",
    oracle=f"""
        SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS prio_group,
               COUNT(*) AS n_all,
               COUNT({_NULLABLE_PRICE}) AS n_kept,
               {dsum_double_sql(_NULLABLE_PRICE)} AS sum_kept,
               MAX({_NULLABLE_PRICE}) AS max_kept
        FROM orders
        GROUP BY NULLIF(o_orderpriority, '3-MEDIUM')
    """,
    doc=(
        "NULL as a first-class group key (SQL GROUP BY collects NULLs "
        "into one group on both engines) + skip-null COUNT/SUM/MAX "
        "aggregates over a synthesized nullable measure."
    ),
    tags=("nulls", "agg"),
)
def null_group_key_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.groupBy(
            F.expr("NULLIF(o_orderpriority, '3-MEDIUM')").alias("prio_group")
        )
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.count(F.expr(_NULLABLE_PRICE)).alias("n_kept"),
            dsum_double(_NULLABLE_PRICE).alias("sum_kept"),
            F.max(F.expr(_NULLABLE_PRICE)).alias("max_kept"),
        )
    )
