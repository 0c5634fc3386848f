"""Distributed statistics from exact sums.

Built-in ``corr``/``covar_samp`` stream co-moments in accumulation
order, so their double outputs are not reproducible across engines or
even across partitionings. The scalable-and-exact alternative: reduce
each group to its DECIMAL power sums (order-independent, mergeable —
one map-side-combined shuffle), convert the handful of finals to
DOUBLE, and evaluate the closed forms driver-free in one projection.
The same six sums yield correlation AND the least-squares line, which
is why pretraining-data audits compute them together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..registry import register
from ._helpers import dsum_double, dsum_double_sql

_CALC = """
        SELECT {key}, n, corr_xy,
               cov_num / var_x AS slope,
               (sy - (cov_num / var_x) * sx) / nd AS intercept
        FROM (
            SELECT {key}, n, nd, sx, sy,
                   cov_num / (sqrt(var_x) * sqrt(var_y)) AS corr_xy,
                   cov_num, var_x
            FROM (
                SELECT {key}, n, nd, sx, sy,
                       nd * sxy - sx * sy AS cov_num,
                       nd * sxx - sx * sx AS var_x,
                       nd * syy - sy * sy AS var_y
                FROM sums
            )
        )
"""


@register(
    "stats_corr_regression_exact",
    oracle=f"""
        WITH sums AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(COUNT(*) AS DOUBLE) AS nd,
                   {dsum_double_sql("l_quantity")} AS sx,
                   {dsum_double_sql("l_extendedprice")} AS sy,
                   {dsum_double_sql("l_quantity * l_quantity")} AS sxx,
                   {dsum_double_sql("l_extendedprice * l_extendedprice")} AS syy,
                   {dsum_double_sql("l_quantity * l_extendedprice")} AS sxy
            FROM lineitem
            GROUP BY l_returnflag
        )
        {_CALC.format(key="l_returnflag")}
    """,
    doc=(
        "Exact distributed correlation + least-squares fit of "
        "extendedprice on quantity per returnflag: DECIMAL power sums "
        "(order-independent, one shuffle) -> DOUBLE closed forms. "
        "Reproducible where built-in corr()/covar() are accumulation-"
        "order-dependent."
    ),
    tags=("stats", "agg"),
)
def stats_corr_regression_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    sums = t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        dsum_double("l_quantity").alias("sx"),
        dsum_double("l_extendedprice").alias("sy"),
        dsum_double("l_quantity * l_quantity").alias("sxx"),
        dsum_double("l_extendedprice * l_extendedprice").alias("syy"),
        dsum_double("l_quantity * l_extendedprice").alias("sxy"),
    )
    moments = sums.select(
        "l_returnflag",
        "n",
        "nd",
        "sx",
        "sy",
        F.expr("nd * sxy - sx * sy").alias("cov_num"),
        F.expr("nd * sxx - sx * sx").alias("var_x"),
        F.expr("nd * syy - sy * sy").alias("var_y"),
    )
    return moments.select(
        "l_returnflag",
        "n",
        F.expr("cov_num / (sqrt(var_x) * sqrt(var_y))").alias("corr_xy"),
        F.expr("cov_num / var_x").alias("slope"),
        F.expr("(sy - (cov_num / var_x) * sx) / nd").alias("intercept"),
    )


@register(
    "stats_winsorize_clip",
    oracle="""
        WITH ranked AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        cuts AS (
            SELECT event_type,
                   MAX(CASE WHEN rn = CAST(ceil(0.01 * n) AS BIGINT)
                            THEN value END) AS p01,
                   MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                            THEN value END) AS p99,
                   MAX(n) AS n_rows
            FROM ranked GROUP BY event_type
        )
        SELECT r.event_type, c.p01, c.p99,
               CAST(c.n_rows AS BIGINT) AS n_rows,
               COUNT(CASE WHEN r.value < c.p01 THEN 1 END) AS n_clipped_low,
               COUNT(CASE WHEN r.value > c.p99 THEN 1 END) AS n_clipped_high
        FROM ranked r JOIN cuts c USING (event_type)
        GROUP BY r.event_type, c.p01, c.p99, c.n_rows
    """,
    doc=(
        "Winsorization cuts per group via exact rank-based percentiles "
        "(percentile_disc computed manually: the value at row_number = "
        "ceil(q*n) in value order) — no float interpolation, so the "
        "cuts are actual data values and bit-identical across engines. "
        "The per-type cut table is group-cardinality-sized and "
        "broadcast back onto the fact for the clip counts; both the "
        "rank window and the count agg shuffle on the same key. The "
        "standard outlier-clipping prep for numeric features at scale "
        "(interpolating percentiles cannot be hash-verified across "
        "engines; disc percentiles can)."
    ),
    tags=("stats", "window", "quality"),
)
def stats_winsorize_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    e = t.events.select("event_id", "event_type", "value")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("value", "event_id"))
        .alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("event_type"))
        .alias("n"),
    )
    cuts = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.01 * F.col("n")).cast("bigint"), F.col("value"))
        ).alias("p01"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.99 * F.col("n")).cast("bigint"), F.col("value"))
        ).alias("p99"),
        F.max("n").cast("bigint").alias("n_rows"),
    )
    return (
        ranked.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type", "p01", "p99", "n_rows")
        .agg(
            F.count(F.when(F.col("value") < F.col("p01"), 1)).alias("n_clipped_low"),
            F.count(F.when(F.col("value") > F.col("p99"), 1)).alias("n_clipped_high"),
        )
    )


# chi-square pieces shared verbatim by both engines: expected count and
# the squared-deviation contribution are each ONE double expression over
# exact integer totals, so the values are bit-identical
_CHI_EXP = "(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))"
_CHI_CONTRIB = (
    f"((CAST(obs AS DOUBLE) - {_CHI_EXP}) * (CAST(obs AS DOUBLE) - {_CHI_EXP}))"
    f" / {_CHI_EXP}"
)


@register(
    "stats_chi_square_independence",
    oracle=f"""
        WITH cells AS (
            SELECT event_type,
                   CAST(dayofweek(CAST(date_trunc('day', ts) AS DATE)) AS INTEGER)
                       AS dow,
                   COUNT(*) AS obs
            FROM events
            GROUP BY event_type, dow
        ),
        tot AS (
            SELECT event_type, dow, obs,
                   SUM(obs) OVER (PARTITION BY event_type) AS rt,
                   SUM(obs) OVER (PARTITION BY dow) AS ct,
                   SUM(obs) OVER () AS n
            FROM cells
        )
        SELECT event_type, dow, CAST(obs AS BIGINT) AS obs,
               {_CHI_EXP} AS expected,
               {_CHI_CONTRIB} AS chi2_contrib
        FROM tot
    """,
    doc=(
        "Independence diagnostic for the event stream: the event_type x "
        "day-of-week contingency table with each cell's expected count "
        "and chi-square contribution — the standard drift/seasonality "
        "check before trusting a traffic mix. Marginals come from three "
        "frameless windows OVER the 35-row cell table (metadata-scale "
        "after the one fact aggregation — the windows never see raw "
        "rows), and the double arithmetic is a shared expression over "
        "exact integer counts, so the output is bit-reproducible. The "
        "final chi-square statistic is the SUM of a 35-row column — "
        "left to the caller because a float fold's value depends on "
        "add order; the cells themselves are exact."
    ),
    tags=("stats", "agg", "window"),
)
def stats_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    cells = t.events.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("obs"))
    tot = cells.select(
        "event_type",
        "dow",
        "obs",
        F.sum("obs").over(W.partitionBy("event_type")).alias("rt"),
        F.sum("obs").over(W.partitionBy("dow")).alias("ct"),
        F.sum("obs").over(W.partitionBy()).alias("n"),
    )
    return tot.select(
        "event_type",
        "dow",
        F.col("obs").cast("bigint").alias("obs"),
        F.expr(_CHI_EXP).alias("expected"),
        F.expr(_CHI_CONTRIB).alias("chi2_contrib"),
    )


@register(
    "stats_gini_coefficient",
    oracle="""
        WITH ranked AS (
            SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
                   row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS i,
                   COUNT(*) OVER () AS n
            FROM orders
        ),
        sums AS (
            SELECT MAX(n) AS n,
                   SUM(CAST(cents AS DECIMAL(38,0))) AS s,
                   SUM(CAST(i AS DECIMAL(38,0)) * cents) AS si
            FROM ranked
        )
        SELECT CAST(n AS BIGINT) AS n_orders,
               CAST((2.0 * CAST(CAST(si AS VARCHAR) AS DOUBLE)
                     - (CAST(n AS DOUBLE) + 1.0) * CAST(CAST(s AS VARCHAR) AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(CAST(s AS VARCHAR) AS DOUBLE))
                    AS DOUBLE) AS gini
        FROM sums
    """,
    doc=(
        "Exact Gini inequality coefficient of order values: "
        "G = (2*Σ i·x_(i) − (n+1)·Σ x_(i)) / (n·Σ x_(i)) over the "
        "ascending sort — the single-number companion to the Lorenz "
        "deciles (funnel_pareto_revenue_concentration). Everything "
        "before the final expression is integer-exact: values become "
        "cents, the rank-weighted and plain sums accumulate in "
        "DECIMAL(38,0) (order-independent, map-side-combinable), and "
        "ONE shared double expression finishes — hash-exact. The "
        "global row_number is the only total-order step; at 100 TB it "
        "becomes a two-pass range-partitioned rank (sort by value, "
        "per-partition counts, prefix offsets) with identical sums."
    ),
    tags=("stats", "window", "agg"),
)
def stats_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    ranked = t.orders.select(
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.row_number().over(W.orderBy("o_totalprice", "o_orderkey")).alias("i"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    sums = ranked.agg(
        F.max("n").alias("n"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0))")).alias("s"),
        F.sum(F.expr("CAST(i AS DECIMAL(38,0)) * cents")).alias("si"),
    )
    return sums.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.expr(
            "CAST((2.0 * CAST(si AS DOUBLE)"
            " - (CAST(n AS DOUBLE) + 1.0) * CAST(s AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) AS DOUBLE)"
        ).alias("gini"),
    )


@register(
    "stats_simpson_diversity",
    oracle="""
        WITH c AS (
            SELECT user_id, event_type, COUNT(*) AS k
            FROM events GROUP BY user_id, event_type
        ),
        per_user AS (
            SELECT user_id,
                   SUM(k) AS n,
                   SUM(k * k) AS sum_k2,
                   COUNT(*) AS n_types
            FROM c GROUP BY user_id
        )
        SELECT user_id,
               CAST(n AS BIGINT) AS n_events,
               CAST(n_types AS BIGINT) AS n_types,
               1.0 - CAST(sum_k2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                   AS simpson_diversity
        FROM per_user
    """,
    doc=(
        "Gini–Simpson behavioral diversity per user: 1 − Σp_i² — the "
        "probability two random actions differ in type. The "
        "log-free diversity index: Shannon entropy needs ln() (never "
        "bit-reproducible across engines), while Simpson is a pure "
        "rational of integer counts — one shared double expression, "
        "hash-exact. Low diversity at high volume flags single-action "
        "bots; the two-level aggregate (user×type counts, then user "
        "rollup) is map-side combined on both levels."
    ),
    tags=("stats", "agg", "quality"),
)
def stats_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    c = t.events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("k"))
    per_user = c.groupBy("user_id").agg(
        F.sum("k").alias("n"),
        F.sum(F.col("k") * F.col("k")).alias("sum_k2"),
        F.count(F.lit(1)).alias("n_types"),
    )
    return per_user.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.expr(
            "1.0 - CAST(sum_k2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
        ).alias("simpson_diversity"),
    )
