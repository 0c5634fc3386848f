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


@register(
    "cdc_scd2_from_event_log",
    oracle="""
        WITH e AS (
            SELECT user_id, event_type, ts, event_id
            FROM events WHERE user_id < 50
        ),
        o AS (
            SELECT user_id, event_type, ts,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM e
        ),
        ch AS (
            SELECT user_id, event_type, ts FROM o
            WHERE prev IS NULL OR event_type != prev
        )
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   AS is_current
        FROM ch
    """,
    doc=(
        "SCD Type-2 dimension built from an append-only event log: "
        "collapse consecutive identical attribute values per key "
        "(lag != current -> change point), then derive "
        "[valid_from, valid_to) intervals with lead() and flag the "
        "open-ended current row. Both windows share one partitioning "
        "(user_id), so the whole history build is a single shuffle — "
        "the standard warehouse pattern for reconstructing dimension "
        "history from CDC streams, at any scale. Bounded here to a "
        "deterministic user subset to keep driver output small."
    ),
    tags=("cdc", "window", "scd2"),
)
def cdc_scd2_from_event_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    e = t.events.filter(F.col("user_id") < 50).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    ch = (
        e.withColumn("prev", F.lag("event_type").over(w_ord))
        .filter(F.col("prev").isNull() | (F.col("event_type") != F.col("prev")))
        .select("user_id", "event_type", F.col("ts").alias("valid_from"))
    )
    w_iv = W.partitionBy("user_id").orderBy("valid_from")
    return ch.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_iv).alias("valid_to"),
        F.lead("valid_from").over(w_iv).isNull().alias("is_current"),
    )


@register(
    "cdc_incremental_mv_refresh",
    oracle=f"""
        WITH base AS (
            SELECT o_orderstatus,
                   COUNT(*) AS n_orders,
                   SUM(o_totalprice) AS sum_price
            FROM orders WHERE o_orderkey % 7 != 0
            GROUP BY o_orderstatus
        ),
        delta AS (
            SELECT o_orderstatus,
                   COUNT(*) AS n_orders,
                   SUM(o_totalprice) AS sum_price
            FROM orders WHERE o_orderkey % 7 = 0
            GROUP BY o_orderstatus
        )
        SELECT o_orderstatus,
               CAST(COALESCE(b.n_orders, 0) + COALESCE(d.n_orders, 0) AS BIGINT)
                   AS n_orders,
               CAST(CAST(COALESCE(b.sum_price, 0) + COALESCE(d.sum_price, 0)
                         AS VARCHAR) AS DOUBLE) AS total_price
        FROM base b FULL OUTER JOIN delta d USING (o_orderstatus)
    """,
    doc=(
        "Incremental materialized-view maintenance: the standing "
        "aggregate snapshot (base, = orders seen so far) absorbs a "
        "change batch (delta) by merging PARTIAL aggregate states — "
        "count adds, decimal sum adds — instead of rescanning the "
        "fact. The merge is a full-outer join on the group key, "
        "group-cardinality-sized on both sides (tiny at any fact "
        "scale). The oracle re-derives the same result, proving the "
        "merged view equals a full recompute — the associativity "
        "property that makes MV maintenance sound at 100 TB. Decimal "
        "accumulation throughout; one VARCHAR-hop DOUBLE cast at the "
        "edge (operators/_helpers.py)."
    ),
    tags=("cdc", "agg", "mv"),
)
def cdc_incremental_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    o = t.orders.select("o_orderkey", "o_orderstatus", "o_totalprice")

    def _agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("sum_price"),
        )

    base = _agg(o.filter(F.col("o_orderkey") % 7 != 0))
    delta = _agg(o.filter(F.col("o_orderkey") % 7 == 0))
    merged = base.alias("b").join(
        delta.alias("d"), ["o_orderstatus"], "full_outer"
    )
    zero = F.lit(0).cast("decimal(38,8)")
    return merged.select(
        "o_orderstatus",
        (
            F.coalesce(F.col("b.n_orders"), F.lit(0))
            + F.coalesce(F.col("d.n_orders"), F.lit(0))
        ).cast("bigint").alias("n_orders"),
        (
            F.coalesce(F.col("b.sum_price"), zero)
            + F.coalesce(F.col("d.sum_price"), zero)
        ).cast("string").cast("double").alias("total_price"),
    )


@register(
    "cdc_pit_join_state_before",
    oracle="""
        WITH e AS (
            SELECT user_id, event_type, ts, event_id
            FROM events WHERE user_id < 50
        ),
        o AS (
            SELECT user_id, event_type, ts,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM e
        ),
        ch AS (
            SELECT user_id, event_type, ts FROM o
            WHERE prev IS NULL OR event_type != prev
        ),
        dim AS (
            SELECT user_id, event_type AS state, ts AS valid_from,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
            FROM ch
        )
        SELECT f.event_id, f.user_id, f.ts,
               d.state AS state_before,
               (d.state IS DISTINCT FROM f.event_type) AS is_state_change
        FROM e f
        LEFT JOIN dim d
          ON d.user_id = f.user_id
         AND d.valid_from <= f.ts - INTERVAL 1 SECOND
         AND (d.valid_to IS NULL OR f.ts - INTERVAL 1 SECOND < d.valid_to)
    """,
    doc=(
        "Point-in-time (as-of) join against the SCD2 history that "
        "cdc_scd2_from_event_log builds: each event is enriched with "
        "the user's state one second BEFORE the event, plus a flag for "
        "whether the event changed it. The oracle is the textbook "
        "range join (key equi-join + interval filter) — which explodes "
        "as keys x versions at scale; the engine instead unions the "
        "dimension's change points with the fact probes, sorts once "
        "per key, and carries the state forward with "
        "last(ignorenulls) — one shuffle, zero pair explosion, the "
        "same plan the as-of join uses. Empty [t, t) versions (two "
        "changes at one timestamp) are dropped before the union to "
        "match interval semantics exactly."
    ),
    tags=("cdc", "join", "asof", "scd2"),
)
def cdc_pit_join_state_before(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    fact = t.events.filter(F.col("user_id") < 50).select(
        "user_id", "ts", "event_id", "event_type"
    )
    dim = cdc_scd2_from_event_log(spark, sf_dir).filter(
        F.col("valid_to").isNull() | (F.col("valid_to") != F.col("valid_from"))
    )

    dim_rows = dim.select(
        "user_id",
        F.col("valid_from").alias("t"),
        F.lit(0).alias("kind"),
        F.col("event_type").alias("state"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("string").alias("cur_type"),
    )
    probes = fact.select(
        "user_id",
        F.expr("ts - INTERVAL 1 SECOND").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("string").alias("state"),
        "event_id",
        "ts",
        F.col("event_type").alias("cur_type"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        dim_rows.unionByName(probes)
        .withColumn("state_before", F.last("state", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "state_before",
            (~F.col("state_before").eqNullSafe(F.col("cur_type"))).alias(
                "is_state_change"
            ),
        )
    )


@register(
    "cdc_snapshot_diff",
    oracle="""
        WITH old_snap AS (
            SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
            FROM orders WHERE o_orderkey % 7 != 0
        ),
        new_snap AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 3 = 0
                        THEN CAST(o_totalprice AS DOUBLE) * 1.1
                        ELSE CAST(o_totalprice AS DOUBLE) END AS price
            FROM orders WHERE o_orderkey % 5 != 0
        ),
        classified AS (
            SELECT CASE
                     WHEN o.o_orderkey IS NULL THEN 'added'
                     WHEN n.o_orderkey IS NULL THEN 'removed'
                     WHEN o.price != n.price THEN 'changed'
                     ELSE 'unchanged'
                   END AS change_kind
            FROM old_snap o FULL OUTER JOIN new_snap n USING (o_orderkey)
        )
        SELECT change_kind, CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM classified GROUP BY change_kind
    """,
    doc=(
        "Snapshot diff / change classification: given yesterday's and "
        "today's keyed snapshots, classify every key as added / "
        "removed / changed / unchanged via ONE full-outer join on the "
        "key — the reconciliation report run before publishing a CDC "
        "feed, and the audit that catches a silently truncated "
        "upstream (a spike in 'removed'). Snapshots are derived "
        "deterministically from the orders table (mod-key membership, "
        "mod-key price bump) so the oracle sees identical inputs. At "
        "100 TB both snapshots are bucketed on the key and the join "
        "is shuffle-free; the classification itself adds no shuffle "
        "beyond the join."
    ),
    tags=("cdc", "join", "dq"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.orders.select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    old_snap = base.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k_old"), F.col("price").alias("p_old")
    )
    new_snap = (
        base.filter(F.col("o_orderkey") % 5 != 0)
        .select(
            F.col("o_orderkey").alias("k_new"),
            F.when(F.col("o_orderkey") % 3 == 0, F.col("price") * 1.1)
            .otherwise(F.col("price"))
            .alias("p_new"),
        )
    )
    classified = old_snap.join(
        new_snap, old_snap["k_old"] == new_snap["k_new"], "full_outer"
    ).select(
        F.when(F.col("k_old").isNull(), "added")
        .when(F.col("k_new").isNull(), "removed")
        .when(F.col("p_old") != F.col("p_new"), "changed")
        .otherwise("unchanged")
        .alias("change_kind")
    )
    return classified.groupBy("change_kind").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )


@register(
    "cdc_upsert_with_deletes",
    oracle=f"""
        WITH changes AS (
            SELECT o_orderkey, 'U' AS op, 'X' AS c_status,
                   o_totalprice + 1000.0 AS c_price
            FROM orders WHERE o_orderkey % 97 = 0
            UNION ALL
            SELECT -o_orderkey, 'I', 'N', 50000.0
            FROM orders WHERE o_orderkey % 499 = 0
            UNION ALL
            SELECT o_orderkey, 'D', NULL, NULL
            FROM orders WHERE o_orderkey % 101 = 0 AND o_orderkey % 97 <> 0
        ),
        merged AS (
            SELECT COALESCE(c.c_status, b.o_orderstatus) AS o_orderstatus,
                   COALESCE(c.c_price, b.o_totalprice) AS o_totalprice
            FROM orders b FULL OUTER JOIN changes c USING (o_orderkey)
            WHERE COALESCE(c.op, '') <> 'D'
        )
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               {dsum_double_sql("o_totalprice")} AS total_price
        FROM merged
        GROUP BY o_orderstatus
    """,
    doc=(
        "Full CDC merge with tombstones: one change batch carrying "
        "inserts, updates AND deletes (op column I/U/D), applied in a "
        "single full-outer join — matched D rows drop out of the "
        "snapshot, U rows override per-column, unmatched I rows land. "
        "The three-way batch is derived deterministically (disjoint "
        "key predicates, so no key carries two ops) and both engines "
        "merge the identical delta; per-status decimal summary proves "
        "the surviving set matches exactly. Same single-shuffle shape "
        "as cdc_upsert_orders_snapshot — delete handling costs nothing "
        "extra, which is the point: tombstones ride the same merge."
    ),
    tags=("cdc", "join", "agg"),
)
def cdc_upsert_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    changes = (
        base.filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.lit("U").alias("op"),
            F.lit("X").alias("c_status"),
            (F.col("o_totalprice") + 1000.0).alias("c_price"),
        )
        .unionByName(
            base.filter(F.col("o_orderkey") % 499 == 0).select(
                (-F.col("o_orderkey")).alias("o_orderkey"),
                F.lit("I").alias("op"),
                F.lit("N").alias("c_status"),
                F.lit(50000.0).alias("c_price"),
            )
        )
        .unionByName(
            base.filter(
                (F.col("o_orderkey") % 101 == 0) & (F.col("o_orderkey") % 97 != 0)
            ).select(
                "o_orderkey",
                F.lit("D").alias("op"),
                F.lit(None).cast("string").alias("c_status"),
                F.lit(None).cast("double").alias("c_price"),
            )
        )
    )
    merged = (
        base.join(changes, ["o_orderkey"], "full_outer")
        .filter(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            F.coalesce("c_status", "o_orderstatus").alias("o_orderstatus"),
            F.coalesce("c_price", "o_totalprice").alias("o_totalprice"),
        )
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum_double("o_totalprice").alias("total_price"),
    )
