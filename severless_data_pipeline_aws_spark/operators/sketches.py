"""Sketch / approximation operators (SURVEY §2.9 X6).

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are shuffle
monsters — the sketch family (HyperLogLog++, GK/KLL quantiles) turns
them into mergeable fixed-size state with map-side partials. Spark's
built-ins are ``approx_count_distinct`` and ``percentile_approx``.

Correctness strategy: sketch outputs are implementation-defined, so the
approximate queries are rows-only for the driver and error-bounded
against exact answers in pytest (tests/test_llm_ops.py). The *exact*
quantile query IS oracle-verified: quantile positions over integral
doubles interpolate at exact quarter fractions, which both engines
compute bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..registry import register


@register(
    "sketch_exact_quantiles",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               quantile_cont(l_quantity, 0.25) AS p25,
               quantile_cont(l_quantity, 0.5) AS p50,
               quantile_cont(l_quantity, 0.75) AS p75
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc=(
        "Exact linear-interpolated quantiles per group (the baseline the "
        "sketches approximate). l_quantity is integral so the quarter-"
        "fraction interpolation is exact in both engines."
    ),
    tags=("sketch", "quantile"),
)
def sketch_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
    )


@register(
    "sketch_approx_count_distinct",
    oracle=None,  # HLL++ estimates are implementation-defined; bounded in pytest
    doc=(
        "X6: HyperLogLog++ distinct counts over events — fixed-size "
        "mergeable state, map-side partials, no distinct-expand shuffle. "
        "rsd=0.01; relative error vs exact asserted <5% in pytest."
    ),
    tags=("sketch", "llm", "approx"),
)
def sketch_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.approx_count_distinct("event_type", rsd=0.01).alias("approx_types"),
        F.approx_count_distinct("event_id", rsd=0.01).alias("approx_ids"),
    )


@register(
    "sketch_approx_quantiles",
    oracle=None,  # GK-sketch outputs are implementation-defined; bounded in pytest
    doc=(
        "X6: approximate percentiles of events.value via the "
        "Greenwald-Khanna sketch (accuracy 10000) — mergeable, one pass. "
        "Absolute error vs exact asserted in pytest."
    ),
    tags=("sketch", "llm", "approx"),
)
def sketch_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.filter(F.col("value").isNotNull()).agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("value", 0.9, 10000).alias("p90_approx"),
        F.percentile_approx("value", 0.99, 10000).alias("p99_approx"),
    )


@register(
    "sketch_histogram_fixed_buckets",
    oracle="""
        SELECT CAST(FLOOR(o_totalprice / 50000) AS INT) AS bucket,
               COUNT(*) AS n,
               MIN(o_totalprice) AS lo,
               MAX(o_totalprice) AS hi
        FROM orders
        GROUP BY CAST(FLOOR(o_totalprice / 50000) AS INT)
    """,
    doc=(
        "Fixed-width histogram (the distribution profile a pipeline "
        "computes before choosing partition bounds) — single hash agg, "
        "min/max are exact on doubles."
    ),
    tags=("sketch", "histogram"),
)
def sketch_histogram_fixed_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("int").alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


def _countmin_oracle() -> str:
    """Exact DuckDB twin of ``sketch_countmin_event_types`` (r4: was
    rows-only): bucket = pmod(xxhash64(event_type, seed), 4096) replayed
    bit-for-bit — the string hash via the recursive-CTE XXH64 emitter,
    the INT seed chained through the hashInt tail.  Sketch counts fold
    from the per-type counts (exploding per-event rows is pointless when
    the bucket depends only on event_type)."""
    from ..functions.xxh64_sql import hash_int_chain_subquery, rec_hash_ctes

    chain = hash_int_chain_subquery("cm_out", ["k", "tag"], "tag", "h", out="hfull")
    return f"""
        WITH RECURSIVE
        etc AS MATERIALIZED (
            SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type
        ),
        cm_src AS (
            SELECT event_type AS k, s.tag, 42::HUGEINT AS seed, event_type AS s
            FROM etc CROSS JOIN (VALUES (0::BIGINT), (1::BIGINT), (2::BIGINT)) s(tag)
        ),
        {rec_hash_ctes('cm')},
        hb AS MATERIALIZED (
            SELECT k, tag, ((hfull % 4096) + 4096) % 4096 AS bucket FROM {chain}
        ),
        sketch AS (
            SELECT h.tag, h.bucket, SUM(e.cnt) AS c
            FROM hb h JOIN etc e ON e.event_type = h.k
            GROUP BY h.tag, h.bucket
        )
        SELECT h.k AS event_type, CAST(MIN(s.c) AS BIGINT) AS cms_estimate
        FROM hb h JOIN sketch s ON s.tag = h.tag AND s.bucket = h.bucket
        GROUP BY h.k
    """


@register(
    "sketch_countmin_event_types",
    oracle=_countmin_oracle(),
    doc=(
        "X6: Count-Min sketch as a pure DataFrame composition — the "
        "sketch builds in one scan of events exploded over D=3 seeds, "
        "hashed into W=4096 buckets per seed (map-side partial counts, "
        "fixed-size state); a second lightweight scan derives the "
        "distinct probe keys, each taking the MIN of its D buckets. "
        "(In production the probe keys are the caller's input, not a "
        "scan.) "
        "Estimates are deterministic (xxhash64) and obey the CMS bound "
        "est >= true, est <= true + eps*N (asserted in pytest)."
    ),
    tags=("sketch", "llm", "approx"),
)
def sketch_countmin_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    width, depth = 1 << 12, 3
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    bucket = (F.xxhash64(F.col("event_type"), F.col("seed")) % width + width) % width
    sketch = (
        t.events.select("event_type")
        .withColumn("seed", F.explode(seeds))
        .groupBy(F.col("seed"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        t.events.select("event_type")
        .distinct()
        .withColumn("seed", F.explode(seeds))
        .select("event_type", "seed", bucket.alias("bucket"))
    )
    return (
        probes.join(sketch, ["seed", "bucket"])
        .groupBy("event_type")
        .agg(F.min("c").alias("cms_estimate"))
    )


@register(
    "sketch_freq_items",
    oracle=None,  # Karp-style freqItems output is implementation-defined
    doc=(
        "X6: approximate frequent items (Karp et al. via "
        "df.stat.freqItems, support=0.1) over event_type — single pass, "
        "bounded state; every item with true frequency > support is "
        "guaranteed present (recall asserted in pytest)."
    ),
    tags=("sketch", "approx"),
)
def sketch_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.select("event_type").stat.freqItems(["event_type"], support=0.1)


@register(
    "sketch_hll_mergeable",
    oracle=None,  # DataSketches HLL has no DuckDB twin; error bound in pytest
    doc=(
        "X6 (mergeability — the property that makes sketches the 100 TB "
        "distinct-count answer): build one DataSketches HLL sketch of "
        "user_id per event_type (partial aggregation, one pass), then "
        "union the per-type sketches with hll_union_agg into a global "
        "cardinality WITHOUT rescanning the input — how per-day/per-"
        "partition sketches roll up to any grain. Output: one row per "
        "event_type plus an ALL row from the sketch union. Estimates "
        "are within ~2% rel. error at lgConfigK=12 (asserted vs exact "
        "counts in pytest)."
    ),
    tags=("sketch", "approx", "hll"),
)
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    per_type = t.events.groupBy("event_type").agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("sk")
    )
    typed = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    merged = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    return typed.unionByName(merged)


@register(
    "sketch_hll_intersection_estimate",
    oracle=None,  # sketch estimate; error bound vs exact in pytest
    doc=(
        "X6 extension: audience-intersection estimate from HLL sketches "
        "by inclusion-exclusion — |A∩B| ≈ est(A) + est(B) - est(A∪B) — "
        "for every pair of event types, WITHOUT any pairwise join of "
        "the raw user sets. One scan builds the per-type sketches; the "
        "pair table is |types|^2 rows of sketch merges (driver-trivial "
        "metadata). This is how overlap matrices are computed at 100 TB "
        "when funnel_audience_overlap_jaccard's exact self-join is too "
        "expensive to run daily; error vs the exact intersection is "
        "bounded in pytest."
    ),
    tags=("sketch", "approx", "hll", "setops"),
)
def sketch_hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    per_type = t.events.groupBy("event_type").agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("sk")
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
    )
    pairs = a.crossJoin(b).filter(F.col("type_a") < F.col("type_b"))
    return pairs.select(
        "type_a",
        "type_b",
        F.hll_sketch_estimate("sk_a").alias("est_a"),
        F.hll_sketch_estimate("sk_b").alias("est_b"),
        (
            F.hll_sketch_estimate("sk_a")
            + F.hll_sketch_estimate("sk_b")
            - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
        ).alias("est_intersection"),
    )
