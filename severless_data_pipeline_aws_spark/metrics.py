"""Semantic metrics layer: define a metric ONCE, query it at any grain.

The thin slice of a dbt-metrics / LookML-style semantic layer that an
analytics engine needs natively: a metric registry (leaf aggregates
with exactness discipline baked in + derived ratios), a dimension
registry (projections or broadcast-join paths through the star schema),
and a resolver that compiles any (metrics, dimensions) request into ONE
scan -> dim joins -> single groupBy -> derived projections.

Why this belongs in the engine: every dashboard team re-derives
"revenue" slightly differently (decimal vs float sums, null handling,
join paths) until numbers stop agreeing. Centralizing the expression
makes every grain of the same metric provably consistent — the
roll-up-consistency pytest asserts sum-over-groups == ungrouped total
EXACTLY, which only holds because leaf aggregates accumulate in
DECIMAL.

Scale shape: resolution never changes the plan class — one fact scan,
broadcast dimension joins, one map-side-combined aggregation; derived
metrics are post-aggregation projections (zero extra passes).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import Tables


@dataclass(frozen=True)
class Metric:
    name: str
    agg_sql: str | None = None  # leaf: SQL aggregate over the fact table
    ratio_of: tuple[str, str] | None = None  # derived: (numerator, denominator)


@dataclass(frozen=True)
class Dimension:
    name: str
    expr_sql: str  # projection over the joined star
    join: str | None = None  # None = fact column; else a named join path


#: leaf aggregates follow the repo's exactness discipline: DECIMAL
#: accumulation, DOUBLE only on the final emit
METRICS: dict[str, Metric] = {
    m.name: m
    for m in (
        Metric(
            "revenue",
            agg_sql="CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE)",
        ),
        Metric("n_orders", agg_sql="COUNT(1)"),
        Metric("n_customers", agg_sql="COUNT(DISTINCT o_custkey)"),
        Metric("aov", ratio_of=("revenue", "n_orders")),
        Metric("orders_per_customer", ratio_of=("n_orders", "n_customers")),
    )
}

DIMENSIONS: dict[str, Dimension] = {
    d.name: d
    for d in (
        Dimension("priority", "o_orderpriority"),
        Dimension("order_year", "year(o_orderdate)"),
        Dimension("segment", "c_mktsegment", join="customer"),
        Dimension("nation", "n_name", join="nation"),
    )
}


def resolve(
    spark: SparkSession, sf_dir: str, metrics: list[str], dimensions: list[str]
) -> DataFrame:
    """Compile a (metrics, dimensions) request against the orders fact.

    Joins are added only for the dimensions that need them (and each
    path once); derived metrics resolve their leaf dependencies
    automatically, so ``["aov"]`` alone still aggregates revenue and
    n_orders underneath.
    """
    t = Tables(spark, sf_dir)
    df = t.orders
    joined: set[str] = set()
    need = [DIMENSIONS[d] for d in dimensions]
    for dim in need:
        if dim.join in (None, *joined):
            continue
        if dim.join in ("customer", "nation"):
            if "customer" not in joined:
                df = df.join(
                    F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey")
                )
                joined.add("customer")
            if dim.join == "nation" and "nation" not in joined:
                df = df.join(
                    F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
                )
                joined.add("nation")
        else:
            raise KeyError(f"unknown join path {dim.join!r}")

    leaves: list[str] = []
    for m in metrics:
        spec = METRICS[m]
        for leaf in spec.ratio_of or (m,):
            if leaf not in leaves:
                leaves.append(leaf)
    for leaf in leaves:
        if METRICS[leaf].agg_sql is None:
            raise ValueError(f"{leaf!r} is derived; derived-of-derived unsupported")

    dim_cols = [F.expr(DIMENSIONS[d].expr_sql).alias(d) for d in dimensions]
    aggs = [F.expr(METRICS[leaf].agg_sql).alias(leaf) for leaf in leaves]
    out = df.groupBy(*dim_cols).agg(*aggs) if dim_cols else df.agg(*aggs)
    for m in metrics:
        spec = METRICS[m]
        if spec.ratio_of:
            num, den = spec.ratio_of
            out = out.withColumn(
                m, F.expr(f"CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)")
            )
    return out.select(*dimensions, *metrics)
