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
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    """,
    doc=(
        "Left-anti join (NOT EXISTS): customers with no order above 250k. "
        "(Predicated so the result is non-empty at every sf — every "
        "customer has *some* order in the test data.)"
    ),
    tags=("join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 250000)
    return t.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_right_outer",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM orders o RIGHT JOIN customer c
          ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        WHERE c.c_acctbal < -500
    """,
    doc="Right outer join: all (filtered) customers, null-extended order side.",
    tags=("join", "outer"),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_totalprice") > 400000)
    c = t.customer.filter(F.col("c_acctbal") < -500)
    return o.join(c, F.col("o_custkey") == F.col("c_custkey"), "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
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
    # Alias the aggregate keys apart: both branches scan the same nation
    # table, so keeping `n_nationkey` on both sides would be an ambiguous
    # self-join at the full-outer step.
    t = Tables(spark, sf_dir)
    cn = (
        t.customer.join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        t.supplier.join(t.nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, F.col("c_nk") == F.col("s_nk"), "full_outer").select(
        F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nationkey"),
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
    "join_asof_last_click_before_purchase",
    oracle="""
        WITH tagged AS (
            SELECT user_id, ts, event_id,
                   CAST(NULL AS BIGINT) AS c_id, CAST(NULL AS TIMESTAMP) AS c_ts,
                   1 AS is_right
            FROM events WHERE user_id <= 30 AND event_type = 'purchase'
            UNION ALL
            SELECT user_id, ts, event_id, event_id, ts, 0
            FROM events WHERE user_id <= 30 AND event_type = 'click'
        ),
        carried AS (
            SELECT user_id, ts, event_id, is_right,
                   last_value(c_id IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_right, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id,
                   last_value(c_ts IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_right, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
            FROM tagged
        )
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
               last_click_id, last_click_ts
        FROM carried WHERE is_right = 1
    """,
    doc=(
        "As-of join (backward): for each purchase, the user's latest click "
        "at or before it. Implemented with the SCALABLE union + "
        "last(ignorenulls) carry-forward pattern — one shuffle on the key, "
        "no pairwise explosion (a naive equi-join + range filter pairs "
        "every purchase with ALL prior clicks of its user before pruning, "
        "which blows up on skewed keys at 100 TB)."
    ),
    tags=("join", "asof"),
)
def join_asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("user_id") <= 30)
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("bigint").alias("c_id"),
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.lit(1).alias("is_right"),
    )
    left = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"),
        F.lit(0).alias("is_right"),
    )
    # clicks sort before purchases at equal ts (is_right asc) so "at or
    # before" includes same-instant clicks, matching the oracle.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_right", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        right.unionByName(left)
        .select(
            "user_id",
            "ts",
            "event_id",
            "is_right",
            F.last("c_id", ignorenulls=True).over(w).alias("last_click_id"),
            F.last("c_ts", ignorenulls=True).over(w).alias("last_click_ts"),
        )
        .filter(F.col("is_right") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_click_id",
            "last_click_ts",
        )
    )


@register(
    "join_interval_month_buckets",
    oracle="""
        WITH o AS (
            SELECT o_orderkey, o_totalprice,
                   CAST(o_orderdate AS DATE) AS s,
                   CAST(o_orderdate AS DATE) + CAST(o_orderkey % 60 AS INTEGER) AS e
            FROM orders
        ),
        grid AS (
            SELECT CAST(unnest(generate_series(
                       (SELECT date_trunc('month', MIN(s)) FROM o),
                       (SELECT date_trunc('month', MAX(e)) FROM o),
                       INTERVAL 1 MONTH)) AS DATE) AS month
        )
        SELECT g.month,
               COUNT(*) AS n_open_orders,
               CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,8))) AS VARCHAR)
                    AS DOUBLE) AS open_value
        FROM grid g
        JOIN o ON o.s < g.month + INTERVAL 1 MONTH AND o.e >= g.month
        GROUP BY g.month
    """,
    doc=(
        "Interval-overlap join via bucket explosion — the standard way "
        "to run a range/interval join on Spark without a theta-join "
        "cross product. Each order's open interval [orderdate, "
        "orderdate + (key %% 60) days] is exploded to the calendar "
        "months it overlaps (sequence of month-truncated dates, <=3 "
        "rows per order), turning the non-equi overlap predicate into "
        "a plain hash aggregate on the month bucket. Cost is O(rows x "
        "avg_months_spanned); the oracle runs the naive non-equi range "
        "join against a month grid, verifying the bucketization exactly "
        "— including the decimal-exact open-value sum."
    ),
    tags=("join", "range", "interval"),
)
def join_interval_month_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    o = t.orders.select(
        "o_orderkey",
        "o_totalprice",
        F.to_date("o_orderdate").alias("s"),
        F.date_add(F.to_date("o_orderdate"), (F.col("o_orderkey") % 60).cast("int")).alias("e"),
    )
    fanned = o.select(
        "o_totalprice",
        F.explode(
            F.sequence(F.trunc("s", "MM"), F.trunc("e", "MM"), F.expr("INTERVAL 1 MONTH"))
        ).alias("month"),
    )
    return fanned.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_open_orders"),
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE)"
        ).alias("open_value"),
    )


@register(
    "join_salted_skew_segments",
    oracle="""
        SELECT c.c_mktsegment AS segment,
               COUNT(*) AS n_events,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    doc=(
        "Skew-mitigated fact join as a first-class query: events join "
        "their user dimension through operators/skew.py::salted_join "
        "(uniform salt on the skewed side, dimension replicated per "
        "salt), so one hot user can never pin a single shuffle "
        "partition — the manual backstop for skew beyond what AQE's "
        "runtime splitting handles. The salt is internal: the oracle is "
        "the PLAIN join, proving salting changes the execution shape "
        "and not the semantics. Post-join rollup by market segment."
    ),
    tags=("join", "skew"),
)
def join_salted_skew_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .skew import salted_join

    t = Tables(spark, sf_dir)
    ev = t.events.select(F.col("user_id").alias("k"), "user_id")
    dim = t.customer.select(F.col("c_custkey").alias("k"), "c_mktsegment")
    joined = salted_join(ev, dim, "k", n_salts=8)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


_NEAR_TOL_S = 86400  # tolerance: nearest neighbor within +/- 24 hours

# chooser over the carried backward/forward candidates — shared verbatim
# by both engines. Backward wins ties; a candidate outside tolerance
# never blocks the other side.
_NEAR_PICK = (
    f"CASE WHEN back_delta IS NOT NULL AND back_delta <= {_NEAR_TOL_S}"
    f"          AND (fwd_delta IS NULL OR fwd_delta > {_NEAR_TOL_S}"
    f"               OR back_delta <= fwd_delta) THEN {{back}}"
    f"     WHEN fwd_delta IS NOT NULL AND fwd_delta <= {_NEAR_TOL_S} THEN {{fwd}}"
    f"     ELSE NULL END"
)


@register(
    "join_asof_nearest_tolerance",
    oracle=f"""
        WITH tagged AS (
            SELECT user_id, ts, event_id,
                   CAST(NULL AS BIGINT) AS c_id, CAST(NULL AS TIMESTAMP) AS c_ts,
                   1 AS is_right
            FROM events WHERE user_id <= 30 AND event_type = 'purchase'
            UNION ALL
            SELECT user_id, ts, event_id, event_id, ts, 0
            FROM events WHERE user_id <= 30 AND event_type = 'click'
        ),
        carried AS (
            SELECT user_id, ts, event_id, is_right,
                   last_value(c_id IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_right, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_id,
                   last_value(c_ts IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_right, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_ts,
                   first_value(c_id IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_right, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_id,
                   first_value(c_ts IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_right, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_ts
            FROM tagged
        ),
        deltas AS (
            SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
                   back_id, fwd_id,
                   CAST(date_diff('second', back_ts, ts) AS BIGINT) AS back_delta,
                   CAST(date_diff('second', ts, fwd_ts) AS BIGINT) AS fwd_delta
            FROM carried WHERE is_right = 1
        )
        SELECT user_id, purchase_id, purchase_ts,
               {_NEAR_PICK.format(back="back_id", fwd="fwd_id")} AS nearest_click_id,
               {_NEAR_PICK.format(back="back_delta", fwd="fwd_delta")} AS nearest_delta_s,
               {_NEAR_PICK.format(back="'backward'", fwd="'forward'")} AS direction
        FROM deltas
    """,
    doc=(
        "Bidirectional as-of join with tolerance: each purchase matched "
        "to the user's NEAREST click within +/-24 h, whichever side "
        "is closer (backward wins ties; an out-of-tolerance candidate "
        "never blocks the other side) — the temporal feature join of ML "
        "feature stores, e.g. nearest sensor reading to each label "
        "event. Same union + ignorenulls-carry shape as the backward "
        "as-of: ONE shuffle on the key, both directions carried by two "
        "mirrored window frames over one sort, no pairwise explosion. "
        "Same-instant clicks sort before the purchase, so they are "
        "backward candidates (delta 0) — consistent in both engines."
    ),
    tags=("join", "asof"),
)
def join_asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("user_id") <= 30)
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("bigint").alias("c_id"),
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.lit(1).alias("is_right"),
    )
    left = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"),
        F.lit(0).alias("is_right"),
    )
    order = ["ts", "is_right", "event_id"]
    w_back = (
        W.partitionBy("user_id").orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("user_id").orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = right.unionByName(left).select(
        "user_id",
        "ts",
        "event_id",
        "is_right",
        F.last("c_id", ignorenulls=True).over(w_back).alias("back_id"),
        F.last("c_ts", ignorenulls=True).over(w_back).alias("back_ts"),
        F.first("c_id", ignorenulls=True).over(w_fwd).alias("fwd_id"),
        F.first("c_ts", ignorenulls=True).over(w_fwd).alias("fwd_ts"),
    )
    deltas = carried.filter(F.col("is_right") == 1).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "back_id",
        "fwd_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("back_ts")).alias("back_delta"),
        (F.unix_timestamp("fwd_ts") - F.unix_timestamp("ts")).alias("fwd_delta"),
    )
    return deltas.select(
        "user_id",
        "purchase_id",
        "purchase_ts",
        F.expr(_NEAR_PICK.format(back="back_id", fwd="fwd_id")).alias("nearest_click_id"),
        F.expr(_NEAR_PICK.format(back="back_delta", fwd="fwd_delta")).alias("nearest_delta_s"),
        F.expr(_NEAR_PICK.format(back="'backward'", fwd="'forward'")).alias("direction"),
    )


def _merge_asof_group(pdf):
    """Per-user backward as-of via pandas.merge_asof (Arrow-batched).

    Same tie policy as the window twin: among equal-ts clicks the
    highest event_id wins (merge_asof takes the LAST right row in sort
    order), and a same-instant click matches (allow_exact_matches)."""
    import pandas as pd

    p = (
        pdf[pdf["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
        .sort_values(["ts", "event_id"])
        .rename(columns={"event_id": "purchase_id", "ts": "purchase_ts"})
    )
    c = (
        pdf[pdf["event_type"] == "click"][["event_id", "ts"]]
        .sort_values(["ts", "event_id"])
        .rename(columns={"event_id": "last_click_id", "ts": "last_click_ts"})
    )
    if len(p) == 0:
        return p.assign(last_click_id=pd.Series(dtype="Int64"),
                        last_click_ts=pd.Series(dtype="datetime64[us]"))
    merged = pd.merge_asof(
        p,
        c,
        left_on="purchase_ts",
        right_on="last_click_ts",
        direction="backward",
        allow_exact_matches=True,
    )
    merged["last_click_id"] = merged["last_click_id"].astype("Int64")
    return merged


@register(
    "join_asof_merge_asof_twin",
    oracle="""
        WITH tagged AS (
            SELECT user_id, ts, event_id,
                   CAST(NULL AS BIGINT) AS c_id, CAST(NULL AS TIMESTAMP) AS c_ts,
                   1 AS is_right
            FROM events WHERE user_id <= 30 AND event_type = 'purchase'
            UNION ALL
            SELECT user_id, ts, event_id, event_id, ts, 0
            FROM events WHERE user_id <= 30 AND event_type = 'click'
        ),
        carried AS (
            SELECT user_id, ts, event_id, is_right,
                   last_value(c_id IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_right, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id,
                   last_value(c_ts IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_right, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
            FROM tagged
        )
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
               last_click_id, last_click_ts
        FROM carried WHERE is_right = 1
    """,
    doc=(
        "The SECOND physical strategy for the backward as-of join: "
        "applyInPandas + pandas.merge_asof per user group (the "
        "guide-book alternative when the union+ignorenulls rewrite "
        "can't express the semantics, e.g. tolerance-+ -nearest with "
        "custom tie rules). Same oracle as "
        "join_asof_last_click_before_purchase, so the two strategies "
        "are proven value-identical. Scale shape: one shuffle on "
        "user_id, per-group work is O(n log n) local sort — but Arrow "
        "transfer + Python make it the fallback, not the default; the "
        "window form stays JVM-side."
    ),
    tags=("join", "asof", "udf"),
)
def join_asof_merge_asof_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.filter(
        (F.col("user_id") <= 30) & F.col("event_type").isin("purchase", "click")
    ).select("user_id", "event_type", "event_id", "ts")
    out_schema = (
        "purchase_id bigint, user_id bigint, purchase_ts timestamp, "
        "last_click_id bigint, last_click_ts timestamp"
    )
    return ev.groupBy("user_id").applyInPandas(_merge_asof_group, schema=out_schema)


@register(
    "join_null_safe_eq",
    oracle="""
        WITH c AS (
            SELECT CASE WHEN c_acctbal < 0 THEN NULL
                        ELSE CAST(c_nationkey AS BIGINT) END AS seg_key,
                   COUNT(*) AS n_cust
            FROM customer GROUP BY seg_key
        ),
        s AS (
            SELECT CASE WHEN s_acctbal < 0 THEN NULL
                        ELSE CAST(s_nationkey AS BIGINT) END AS seg_key,
                   COUNT(*) AS n_supp
            FROM supplier GROUP BY seg_key
        )
        SELECT c.seg_key,
               CAST(c.n_cust AS BIGINT) AS n_cust,
               CAST(s.n_supp AS BIGINT) AS n_supp
        FROM c JOIN s ON c.seg_key IS NOT DISTINCT FROM s.seg_key
    """,
    doc=(
        "Null-safe equi join (<=> / IS NOT DISTINCT FROM): both sides "
        "derive a nullable segment key (negative-balance accounts fall "
        "into the NULL segment) and the join matches NULL with NULL — "
        "the semantic a plain equi join silently drops. Spark plans "
        "<=> as a regular hash join on a null-coalesced key, so the "
        "NULL segment shuffles like any other key rather than falling "
        "back to nested-loop. Aggregation happens BEFORE the join on "
        "both sides (segment-cardinality inputs), the shape that keeps "
        "this metadata-scale at any corpus size."
    ),
    tags=("join", "nulls"),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cust = (
        t.customer.select(
            F.when(F.col("c_acctbal") < 0, F.lit(None))
            .otherwise(F.col("c_nationkey"))
            .cast("bigint")
            .alias("seg_key")
        )
        .groupBy("seg_key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cust"))
    )
    supp = (
        t.supplier.select(
            F.when(F.col("s_acctbal") < 0, F.lit(None))
            .otherwise(F.col("s_nationkey"))
            .cast("bigint")
            .alias("seg_key")
        )
        .groupBy("seg_key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_supp"))
    )
    return cust.join(supp, cust["seg_key"].eqNullSafe(supp["seg_key"])).select(
        cust["seg_key"], "n_cust", "n_supp"
    )


_BLOOM_BITS = 2048        # m: filter width (32 x 64-bit words)
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_K = 3              # hash functions per key
_BLOOM_BAL = 9000.0       # dim selectivity: high-balance customers


@register(
    "join_bloom_prefilter_semireduction",
    oracle=f"""
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_acctbal
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_acctbal > {_BLOOM_BAL}
    """,
    doc=(
        "Runtime bloom-filter semi-join reduction — the join-"
        "optimization pattern behind Spark's own runtime row-group "
        "filters, built explicitly so the plan is inspectable: the "
        f"selective dim side (customers with acctbal > {_BLOOM_BAL}) "
        f"is folded into a {_BLOOM_BITS}-bit Bloom bitmap "
        f"({_BLOOM_K} xxhash64 probes per key, 32 bit_or word "
        "aggregates -> ONE row), broadcast to the fact scan, and "
        "orders failing any probe are dropped BEFORE the shuffle — "
        "at 100 TB this is the difference between shuffling the "
        "whole fact table and shuffling ~selectivity of it. False "
        "positives pass the pre-filter and are removed by the real "
        "equi-join that follows, so the result is EXACTLY the plain "
        "join (the oracle) — the bloom stage is a pure bandwidth "
        "optimization, invisible in the output, visible in the plan "
        "(plan test pins the probe expressions on the fact side of "
        "the join). The one-row bitmap broadcast is a whitelisted "
        "BNLJ; memory is 256 bytes regardless of dim size at this "
        "width, and m scales as ~10 bits/key for 1% FP."
    ),
    tags=("join", "scale", "bloom"),
)
def join_bloom_prefilter_semireduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    dim = t.customer.filter(F.col("c_acctbal") > _BLOOM_BAL).select(
        "c_custkey", "c_acctbal"
    )

    def positions(key: str) -> list[str]:
        # k independent probes: xxhash64 over (key, seed-literal); the
        # double-pmod keeps negative hashes in [0, m)
        return [
            f"pmod(pmod(xxhash64({key}, {s}), {_BLOOM_BITS}) + {_BLOOM_BITS},"
            f" {_BLOOM_BITS})"
            for s in range(_BLOOM_K)
        ]

    probe_rows = dim.selectExpr(
        f"explode(array({', '.join(positions('c_custkey'))})) AS pos"
    )
    word_aggs = [
        F.expr(
            f"coalesce(bit_or(CASE WHEN pos DIV 64 = {w} THEN"
            f" shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) END),"
            " CAST(0 AS BIGINT))"
        ).alias(f"w{w}")
        for w in range(_BLOOM_WORDS)
    ]
    bloom = probe_rows.agg(*word_aggs).selectExpr(
        "array(" + ", ".join(f"w{w}" for w in range(_BLOOM_WORDS)) + ") AS bw"
    )

    member = " AND ".join(
        f"((bw[CAST(({p}) DIV 64 AS INT)] >> CAST(({p}) % 64 AS INT))"
        " & CAST(1 AS BIGINT)) = CAST(1 AS BIGINT)"
        for p in positions("o_custkey")
    )
    prefiltered = (
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .crossJoin(F.broadcast(bloom))
        .filter(F.expr(member))
        .drop("bw")
    )
    return prefiltered.join(
        F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "o_custkey", "o_totalprice", "c_acctbal")


#: maintenance blackout windows (UTC, half-open [start, end)): a pinned
#: 3-row parameter table — non-overlapping by construction, so the
#: left range-join below matches each event at most once
_BLACKOUTS = [
    ("2024-01-05 00:00:00", "2024-01-06 00:00:00"),
    ("2024-01-13 12:00:00", "2024-01-14 00:00:00"),
    ("2024-01-26 06:00:00", "2024-01-27 06:00:00"),
]


def _blackout_values_sql() -> str:
    return ", ".join(
        f"(TIMESTAMP '{s}', TIMESTAMP '{e}')" for s, e in _BLACKOUTS
    )


@register(
    "join_interval_blackout_anti",
    oracle=f"""
        WITH bl(bstart, bend) AS (VALUES {_blackout_values_sql()})
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN b.bstart IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outside,
               CAST(SUM(CASE WHEN b.bstart IS NULL THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_blackout,
               CAST(SUM(CASE WHEN b.bstart IS NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS outside_share
        FROM events e
        LEFT JOIN bl b ON e.ts >= b.bstart AND e.ts < b.bend
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc=(
        "J7: interval ANTI-join — classify every event against a "
        "pinned table of maintenance blackout windows and report, per "
        "event type, how much traffic falls OUTSIDE any window (the "
        "'exclude known incidents before analyzing' step of every "
        "ops pipeline; the anti twin of join_interval_month_buckets). "
        "The 3-row non-overlapping window table broadcasts (a "
        "documented-bounded BNLJ — each event matches at most one "
        "window, so the left join is duplication-free) and one "
        "conditional aggregate emits inside/outside counts and the "
        "outside share. Exact integers, one shared division."
    ),
    tags=("join", "interval", "dq"),
)
def join_interval_blackout_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bl = spark.createDataFrame(
        [(s, e) for s, e in _BLACKOUTS], "bstart string, bend string"
    ).select(
        F.col("bstart").cast("timestamp").alias("bstart"),
        F.col("bend").cast("timestamp").alias("bend"),
    )
    joined = t.events.join(
        F.broadcast(bl),
        (F.col("ts") >= F.col("bstart")) & (F.col("ts") < F.col("bend")),
        "left",
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("bstart").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outside"),
            F.sum(F.when(F.col("bstart").isNull(), 0).otherwise(1))
            .cast("bigint")
            .alias("n_blackout"),
        )
        .select(
            "event_type",
            "n_total",
            "n_outside",
            "n_blackout",
            F.expr("CAST(n_outside AS DOUBLE) / CAST(n_total AS DOUBLE)").alias(
                "outside_share"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "join_asof_forward_next_error",
    oracle="""
        WITH tagged AS (
            SELECT user_id, ts, event_id,
                   CAST(NULL AS BIGINT) AS e_id, CAST(NULL AS TIMESTAMP) AS e_ts,
                   0 AS tag
            FROM events WHERE user_id <= 30 AND event_type = 'purchase'
            UNION ALL
            SELECT user_id, ts, event_id, event_id, ts, 1
            FROM events WHERE user_id <= 30 AND event_type = 'error'
        ),
        carried AS (
            SELECT user_id, ts, event_id, tag,
                   first_value(e_id IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, tag, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS next_error_id,
                   first_value(e_ts IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, tag, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS next_error_ts
            FROM tagged
        )
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
               next_error_id, next_error_ts,
               CAST(datediff('second', ts, next_error_ts) AS BIGINT)
                   AS gap_s,
               COALESCE(datediff('second', ts, next_error_ts) <= 172800, FALSE)
                   AS error_within_48h
        FROM carried WHERE tag = 0
    """,
    doc=(
        "As-of join (FORWARD): for each purchase, the user's first "
        "error at-or-after it — the direction the backward op cannot "
        "express, and the shape of every 'time-to-next-incident' / "
        "SLA-breach query (pandas merge_asof direction='forward'). "
        "Same SCALABLE union + carry pattern as the backward op, "
        "mirrored: first_value(IGNORE NULLS) over CURRENT ROW .. "
        "UNBOUNDED FOLLOWING — one shuffle on the key, no pairwise "
        "explosion on skewed users. Purchases sort before equal-"
        "timestamp errors (tag asc), so a same-instant error counts "
        "as 'after', mirroring the backward op's inclusive boundary. "
        "Gap seconds via the unix_timestamp/datediff('second') floor "
        "pairing (the repo's pinned cross-engine second-diff "
        "convention); the 48-hour SLA verdict is an exact integer "
        "comparison, FALSE when no error ever follows."
    ),
    tags=("join", "asof"),
)
def join_asof_forward_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("user_id") <= 30)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("bigint").alias("e_id"),
        F.lit(None).cast("timestamp").alias("e_ts"),
        F.lit(0).alias("tag"),
    )
    right = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_id").alias("e_id"),
        F.col("ts").alias("e_ts"),
        F.lit(1).alias("tag"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    return (
        left.unionByName(right)
        .select(
            "user_id",
            "ts",
            "event_id",
            "tag",
            F.first("e_id", ignorenulls=True).over(w).alias("next_error_id"),
            F.first("e_ts", ignorenulls=True).over(w).alias("next_error_ts"),
        )
        .filter(F.col("tag") == 0)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "next_error_id",
            "next_error_ts",
            F.expr(
                "CAST(unix_timestamp(next_error_ts) - unix_timestamp(ts)"
                " AS BIGINT)"
            ).alias("gap_s"),
            F.expr(
                "COALESCE(unix_timestamp(next_error_ts) - unix_timestamp(ts)"
                " <= 172800, FALSE)"
            ).alias("error_within_48h"),
        )
    )


@register(
    "join_interval_overlap_pairs",
    oracle="""
        WITH iv AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   MIN(ts) AS s, MAX(ts) AS e
            FROM events WHERE user_id <= 50
            GROUP BY user_id, CAST(ts AS DATE)
        ),
        pairs AS (
            SELECT a.day,
                   CAST(datediff('second',
                        CASE WHEN a.s > b.s THEN a.s ELSE b.s END,
                        CASE WHEN a.e < b.e THEN a.e ELSE b.e END)
                        AS BIGINT) AS ov_s
            FROM iv a JOIN iv b
              ON a.day = b.day AND a.user_id < b.user_id
             AND a.s <= b.e AND b.s <= a.e
        )
        SELECT iv.day,
               CAST(COUNT(DISTINCT iv.user_id) AS BIGINT) AS n_intervals,
               CAST((SELECT COUNT(*) FROM pairs p WHERE p.day = iv.day)
                    AS BIGINT) AS n_overlapping_pairs,
               CAST(COALESCE((SELECT SUM(ov_s) FROM pairs p
                              WHERE p.day = iv.day), 0) AS BIGINT)
                   AS total_overlap_seconds
        FROM iv
        GROUP BY iv.day
        ORDER BY iv.day
    """,
    doc=(
        "J9: interval-overlap PAIR join — which session intervals "
        "overlap which (meeting-collision / co-presence / resource-"
        "contention shape), the interval query the merge/concurrency "
        "ops cannot answer because they collapse intervals instead of "
        "pairing them. The classic trap is the per-day theta self-join "
        "(quadratic in daily sessions); the scale path here explodes "
        "each interval onto its covered HOUR slices and equi-joins on "
        "(day, hour) — candidates are only interval pairs sharing a "
        "slice (output-proportional on real workloads), then the exact "
        "inclusive overlap test and the DISTINCT pair dedup run on "
        "candidates alone. Overlap seconds use the pinned "
        "unix_timestamp/datediff floor pairing; day-grain rollup "
        "(intervals, overlapping pairs, total overlap seconds) keeps "
        "the wire format scalar and exact. The oracle states the "
        "SEMANTICS as the naive theta join — the hash match proves "
        "the sliced plan equivalent (the merge_asof-twin pattern)."
    ),
    tags=("join", "timeseries"),
)
def join_interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    iv = (
        t.events.filter(F.col("user_id") <= 50)
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    sliced = iv.select(
        "user_id",
        "day",
        "s",
        "e",
        F.explode(F.expr("sequence(hour(s), hour(e))")).alias("hr"),
    )
    a = sliced.select(
        F.col("user_id").alias("ua"),
        "day",
        "hr",
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    b = sliced.select(
        F.col("user_id").alias("ub"),
        "day",
        "hr",
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    pairs = (
        a.join(b, ["day", "hr"])
        .filter(
            (F.col("ua") < F.col("ub"))
            & (F.col("sa") <= F.col("eb"))
            & (F.col("sb") <= F.col("ea"))
        )
        .select("day", "ua", "ub", "sa", "ea", "sb", "eb")
        .distinct()
        .select(
            "day",
            F.expr(
                "CAST(unix_timestamp(CASE WHEN ea < eb THEN ea ELSE eb END)"
                " - unix_timestamp(CASE WHEN sa > sb THEN sa ELSE sb END)"
                " AS BIGINT)"
            ).alias("ov_s"),
        )
    )
    per_day_pairs = pairs.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlapping_pairs"),
        F.sum("ov_s").cast("bigint").alias("total_overlap_seconds"),
    )
    per_day_iv = iv.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_intervals")
    )
    return (
        per_day_iv.join(per_day_pairs, "day", "left")
        .select(
            "day",
            "n_intervals",
            F.coalesce("n_overlapping_pairs", F.lit(0)).cast("bigint").alias(
                "n_overlapping_pairs"
            ),
            F.coalesce("total_overlap_seconds", F.lit(0)).cast("bigint").alias(
                "total_overlap_seconds"
            ),
        )
        .orderBy("day")
    )


# --- J10: Allen's interval algebra census (r11) -----------------------------

#: shared classifier for NON-disjoint proper-interval pairs, evaluated
#: in mutual-exclusion order (meets checked first: touching endpoints;
#: a meets pair cannot be equals/starts/finishes/during because the
#: intervals are proper). Identical text in Spark and DuckDB.
_ALLEN_CLASS = (
    "CASE WHEN ea = sb OR eb = sa THEN 'meets' "
    "WHEN sa = sb AND ea = eb THEN 'equals' "
    "WHEN sa = sb THEN 'starts' "
    "WHEN ea = eb THEN 'finishes' "
    "WHEN (sb < sa AND ea < eb) OR (sa < sb AND eb < ea) THEN 'during' "
    "ELSE 'overlaps' END"
)


@register(
    "join_interval_allen_census",
    oracle=f"""
        WITH iv AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   MIN(ts) AS s, MAX(ts) AS e
            FROM events WHERE user_id <= 50
            GROUP BY user_id, CAST(ts AS DATE)
            HAVING MIN(ts) < MAX(ts)
        ),
        pairs AS (
            SELECT a.day,
                   CASE WHEN a.e < b.s OR b.e < a.s THEN 'precedes'
                        ELSE {_ALLEN_CLASS.replace('sa', 'a.s').replace('ea', 'a.e').replace('sb', 'b.s').replace('eb', 'b.e')}
                   END AS rel
            FROM iv a JOIN iv b
              ON a.day = b.day AND a.user_id < b.user_id
        )
        SELECT iv.day,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS n_pairs,
               CAST(COALESCE((SELECT COUNT(*) FROM pairs p
                    WHERE p.day = iv.day AND rel = 'precedes'), 0) AS BIGINT)
                   AS n_precedes,
               CAST(COALESCE((SELECT COUNT(*) FROM pairs p
                    WHERE p.day = iv.day AND rel = 'meets'), 0) AS BIGINT)
                   AS n_meets,
               CAST(COALESCE((SELECT COUNT(*) FROM pairs p
                    WHERE p.day = iv.day AND rel = 'overlaps'), 0) AS BIGINT)
                   AS n_overlaps,
               CAST(COALESCE((SELECT COUNT(*) FROM pairs p
                    WHERE p.day = iv.day AND rel = 'starts'), 0) AS BIGINT)
                   AS n_starts,
               CAST(COALESCE((SELECT COUNT(*) FROM pairs p
                    WHERE p.day = iv.day AND rel = 'during'), 0) AS BIGINT)
                   AS n_during,
               CAST(COALESCE((SELECT COUNT(*) FROM pairs p
                    WHERE p.day = iv.day AND rel = 'finishes'), 0) AS BIGINT)
                   AS n_finishes,
               CAST(COALESCE((SELECT COUNT(*) FROM pairs p
                    WHERE p.day = iv.day AND rel = 'equals'), 0) AS BIGINT)
                   AS n_equals
        FROM iv
        GROUP BY iv.day
        ORDER BY iv.day
    """,
    doc=(
        "J10: Allen's interval-algebra census — every same-day pair of "
        "proper session intervals classified into the seven relation "
        "classes (each merged with its inverse): precedes / meets / "
        "overlaps / starts / during / finishes / equals — the "
        "temporal-reasoning vocabulary behind scheduling, co-presence, "
        "and provenance queries. Scale design: the only pairs that "
        "need pairwise inspection are the NON-disjoint ones, and every "
        "non-disjoint (touching included) pair shares an hour slice — "
        "so candidates come from the J9 hour-slice equi-join, the "
        "classifier CASE runs on candidates alone, and the disjoint "
        "'precedes' count is derived per day by complement arithmetic "
        "n_pairs - classified (never enumerated). The oracle states "
        "the semantics as the naive per-day theta join classifying "
        "EVERY pair directly, precedes included — the hash match "
        "PROVES the complement arithmetic + sliced candidates "
        "equivalent to direct enumeration (the J9/merge_asof-twin "
        "pattern). Proper intervals only (s < e), so the 13 relations "
        "are mutually exclusive and the CASE order is total."
    ),
    tags=("join", "interval", "timeseries"),
)
def join_interval_allen_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    iv = (
        t.events.filter(F.col("user_id") <= 50)
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
        .filter(F.col("s") < F.col("e"))
    )
    sliced = iv.select(
        "user_id",
        "day",
        "s",
        "e",
        F.explode(F.expr("sequence(hour(s), hour(e))")).alias("hr"),
    )
    a = sliced.select(
        F.col("user_id").alias("ua"), "day", "hr",
        F.col("s").alias("sa"), F.col("e").alias("ea"),
    )
    b = sliced.select(
        F.col("user_id").alias("ub"), "day", "hr",
        F.col("s").alias("sb"), F.col("e").alias("eb"),
    )
    classified = (
        a.join(b, ["day", "hr"])
        .filter(
            (F.col("ua") < F.col("ub"))
            & (F.col("sa") <= F.col("eb"))
            & (F.col("sb") <= F.col("ea"))
        )
        .select("day", "ua", "ub", "sa", "ea", "sb", "eb")
        .distinct()
        .selectExpr("day", f"{_ALLEN_CLASS} AS rel")
        .groupBy("day")
        .agg(
            *[
                F.sum(F.when(F.col("rel") == r, 1).otherwise(0))
                .cast("bigint")
                .alias(f"n_{r}")
                for r in ("meets", "overlaps", "starts", "during",
                          "finishes", "equals")
            ]
        )
    )
    per_day = iv.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals")
    )
    classes = ["n_meets", "n_overlaps", "n_starts", "n_during",
               "n_finishes", "n_equals"]
    return (
        per_day.join(classified, "day", "left")
        .na.fill(0, classes)
        .selectExpr(
            "day",
            "n_intervals",
            "CAST(n_intervals * (n_intervals - 1) div 2 AS BIGINT) AS n_pairs",
            "CAST(n_intervals * (n_intervals - 1) div 2 - ("
            + " + ".join(classes)
            + ") AS BIGINT) AS n_precedes",
            "n_meets",
            "n_overlaps",
            "n_starts",
            "n_during",
            "n_finishes",
            "n_equals",
        )
        .orderBy("day")
    )
