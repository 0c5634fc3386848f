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


def approx_count_distinct_estimates(t: Tables) -> DataFrame:
    """Production path: HLL++ estimates only — fixed-size mergeable
    state, map-side partials, no distinct-expand shuffle. The registered
    query below is the driver-verifiable AUDIT twin of this plan."""
    return t.events.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.approx_count_distinct("event_type", rsd=0.01).alias("approx_types"),
        F.approx_count_distinct("event_id", rsd=0.01).alias("approx_ids"),
    )


@register(
    "sketch_approx_count_distinct",
    oracle="""
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS exact_types,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_ids,
               TRUE AS users_within_5pct,
               TRUE AS types_within_5pct,
               TRUE AS ids_within_5pct
        FROM events
    """,
    doc=(
        "X6: HyperLogLog++ distinct counts over events. Driver-green "
        "verdict form (r5 verdict #5): the output is the EXACT counts "
        "plus deterministic within-5%% booleans computed Spark-side "
        "(the oracle asserts TRUE from the exact counts — a sketch "
        "estimate outside its bound hash-mismatches). The estimate-only "
        "production plan (one pass, no distinct-expand shuffle) is "
        "``approx_count_distinct_estimates``; this audit twin "
        "deliberately also pays the exact distinct so the bound is a "
        "checkable row, the pattern for validating sketches before "
        "trusting them at 100 TB."
    ),
    tags=("sketch", "llm", "approx"),
)
def sketch_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    agg = t.events.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.countDistinct("event_type").alias("exact_types"),
        F.countDistinct("event_id").alias("exact_ids"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("a_users"),
        F.approx_count_distinct("event_type", rsd=0.01).alias("a_types"),
        F.approx_count_distinct("event_id", rsd=0.01).alias("a_ids"),
    )
    def ok(a: str, e: str) -> F.Column:
        return (F.abs(F.col(a) - F.col(e)) <= 0.05 * F.col(e))
    return agg.select(
        "exact_users",
        "exact_types",
        "exact_ids",
        ok("a_users", "exact_users").alias("users_within_5pct"),
        ok("a_types", "exact_types").alias("types_within_5pct"),
        ok("a_ids", "exact_ids").alias("ids_within_5pct"),
    )


@register(
    "sketch_approx_quantiles",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               TRUE AS p50_rank_ok,
               TRUE AS p90_rank_ok,
               TRUE AS p99_rank_ok
        FROM events
        WHERE value IS NOT NULL
    """,
    doc=(
        "X6: approximate percentiles of events.value via the "
        "Greenwald-Khanna sketch (accuracy 10000) — mergeable, one "
        "pass. Driver-green verdict form: the GK guarantee is a RANK "
        "bound (|rank(est) - q*n| <= n/accuracy), so the query re-scans "
        "once to count values < and <= each estimate and emits booleans "
        "checking the rank INTERVAL [count< + 1, count<=] overlaps "
        "q ± 1%% of n (100x the sketch's own bound); the oracle asserts "
        "TRUE + the exact row count. Heavy ties at the estimate value "
        "widen the interval instead of flipping the verdict (ADVICE "
        "r6: a <=-only count can overshoot the band on tied data even "
        "when the sketch meets its guarantee). The one-row estimate "
        "broadcast is a documented-bounded BNLJ."
    ),
    tags=("sketch", "llm", "approx"),
)
def sketch_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    vals = t.events.filter(F.col("value").isNotNull()).select("value")
    est = vals.agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50"),
        F.percentile_approx("value", 0.9, 10000).alias("p90"),
        F.percentile_approx("value", 0.99, 10000).alias("p99"),
    )
    ranked = vals.crossJoin(F.broadcast(est)).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.when(F.col("value") < F.col(p), 1).otherwise(0)
            ).alias(f"lt{p[1:]}")
            for p in ("p50", "p90", "p99")
        ],
        *[
            F.sum(
                F.when(F.col("value") <= F.col(p), 1).otherwise(0)
            ).alias(f"le{p[1:]}")
            for p in ("p50", "p90", "p99")
        ],
    )
    def rank_ok(lt: str, le: str, q: float) -> F.Column:
        # the estimate's rank set is [count< + 1, count<=] (ties give an
        # interval); pass iff it overlaps [q*n - 1%, q*n + 1%]
        lo = (q - 0.01) * F.col("n")
        hi = (q + 0.01) * F.col("n") + 1
        return (F.col(lt) + 1 <= hi) & (F.col(le) >= lo)
    return ranked.select(
        "n",
        rank_ok("lt50", "le50", 0.5).alias("p50_rank_ok"),
        rank_ok("lt90", "le90", 0.9).alias("p90_rank_ok"),
        rank_ok("lt99", "le99", 0.99).alias("p99_rank_ok"),
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
    oracle="""
        WITH c AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(COUNT(*)) OVER () AS total
            FROM events GROUP BY event_type
        )
        SELECT event_type, n, TRUE AS in_freq_items
        FROM c WHERE n > 0.1 * total
        ORDER BY event_type
    """,
    doc=(
        "X6: approximate frequent items (Karp et al. via "
        "df.stat.freqItems, support=0.1) over event_type — single pass, "
        "bounded state. Driver-green verdict form: freqItems' guarantee "
        "is RECALL (every item with true frequency > support is "
        "present), so the query emits one row per truly-frequent item "
        "with a boolean asserting membership in the sketch output; the "
        "oracle derives the same rows from exact counts and asserts "
        "TRUE. The one-row freqItems array broadcast is a "
        "documented-bounded BNLJ."
    ),
    tags=("sketch", "approx"),
)
def sketch_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    freq = (
        t.events.select("event_type")
        .stat.freqItems(["event_type"], support=0.1)
        .select(F.col("event_type_freqItems").alias("sketch_items"))
    )
    counts = (
        t.events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("total", F.sum("n").over(Window.partitionBy()))
    )
    return (
        counts.filter(F.col("n") > 0.1 * F.col("total"))
        .crossJoin(F.broadcast(freq))
        .select(
            "event_type",
            "n",
            F.array_contains(F.col("sketch_items"), F.col("event_type")).alias(
                "in_freq_items"
            ),
        )
        .orderBy("event_type")
    )


def hll_mergeable_estimates(t: Tables) -> DataFrame:
    """Production path: per-type DataSketches HLL sketches rolled up to
    a global cardinality via ``hll_union_agg`` WITHOUT rescanning the
    input — how per-day/per-partition sketches roll up to any grain.
    The registered query below is the driver-verifiable AUDIT twin."""
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
    "sketch_hll_mergeable",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS within_5pct
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE
        FROM events
        ORDER BY event_type
    """,
    doc=(
        "X6 (mergeability — the property that makes sketches the 100 TB "
        "distinct-count answer): one DataSketches HLL sketch of user_id "
        "per event_type (partial aggregation, one pass), per-type "
        "sketches unioned with hll_union_agg into a global cardinality "
        "without rescanning. Driver-green verdict form (r5 verdict #5): "
        "output is exact distinct counts per type + ALL, each with a "
        "boolean asserting the sketch estimate (incl. the MERGED one) "
        "landed within 5%% (lgConfigK=12 ≈ 1.6%% SE); the oracle "
        "asserts TRUE from exact counts. Estimate-only production plan: "
        "``hll_mergeable_estimates``."
    ),
    tags=("sketch", "approx", "hll"),
)
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    est = hll_mergeable_estimates(t)
    exact_typed = t.events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    exact_all = t.events.agg(F.countDistinct("user_id").alias("exact_users")).select(
        F.lit("ALL").alias("event_type"), "exact_users"
    )
    exact = exact_typed.unionByName(exact_all)
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_5pct"),
        )
        .orderBy("event_type")
    )


def hll_intersection_estimates(t: Tables) -> DataFrame:
    """Production path: audience-intersection estimates from HLL
    sketches by inclusion-exclusion — |A∩B| ≈ est(A) + est(B) -
    est(A∪B) — for every pair of event types, WITHOUT any pairwise join
    of the raw user sets. One scan builds the per-type sketches; the
    pair table is |types|^2 rows of sketch merges (driver-trivial
    metadata). The registered query below is the driver-verifiable
    AUDIT twin."""
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


@register(
    "sketch_hll_intersection_estimate",
    oracle="""
        WITH d AS (SELECT DISTINCT event_type, user_id FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS exact_intersection,
               TRUE AS within_5pct
        FROM d a JOIN d b ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
        ORDER BY type_a, type_b
    """,
    doc=(
        "X6 extension: audience-intersection estimate from HLL sketches "
        "by inclusion-exclusion for every pair of event types, without "
        "any pairwise join of the raw user sets (the 100 TB overlap-"
        "matrix pattern when funnel_audience_overlap_jaccard's exact "
        "self-join is too expensive to run daily). Driver-green verdict "
        "form: output is the EXACT pairwise intersection (equi-join on "
        "user_id at audit scale) + a boolean asserting the sketch "
        "estimate landed within 5%% of min(est_a, est_b) — HLL's error "
        "scales with the SET cardinalities, not the overlap, so a "
        "bound relative to a small true intersection would flip on "
        "larger corpora even when the sketch meets its guarantee "
        "(ADVICE r6); the oracle asserts TRUE from the exact counts. "
        "Estimate-only production plan: ``hll_intersection_estimates``."
    ),
    tags=("sketch", "approx", "hll", "setops"),
)
def sketch_hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    est = hll_intersection_estimates(t)
    d = t.events.select("event_type", "user_id").distinct()
    a = d.select(F.col("event_type").alias("type_a"), "user_id")
    b = d.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    return (
        exact.join(est, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "exact_intersection",
            (
                F.abs(F.col("est_intersection") - F.col("exact_intersection"))
                <= 0.05 * F.least(F.col("est_a"), F.col("est_b"))
            ).alias("within_5pct"),
        )
        .orderBy("type_a", "type_b")
    )


_BLOOM_AUDIT_BITS = 65536  # m: 1024 x 64-bit words, map-backed
_BLOOM_AUDIT_K = 3


@register(
    "sketch_bloom_membership_audit",
    # verdict-oracle form (the r6 sketch pattern): exact member /
    # non-member counts + deterministic booleans the oracle asserts
    # literally TRUE — a bloom filter that ever false-negatives, or
    # whose false-positive rate escapes the LOAD-AWARE bound,
    # hash-mismatches at the driver instead of hiding behind no_oracle.
    oracle="""
        WITH u AS (SELECT DISTINCT user_id FROM events)
        SELECT CAST(SUM(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_members,
               CAST(SUM(CASE WHEN user_id % 3 <> 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nonmembers,
               TRUE AS no_false_negatives,
               TRUE AS fp_rate_within_bound
    FROM u
    """,
    doc=(
        "X6 extension: bloom-filter membership audit — build a 65536-"
        "bit, 3-probe xxhash64 bloom over the member user set "
        "(user_id %% 3 = 0, a deterministic subset so non-members "
        "exist at every SF; the same hand-rolled construction as "
        "join_bloom_prefilter_semireduction), probe EVERY distinct "
        "user, and verify the two guarantees that make blooms usable "
        "as join prefilters at 100 TB: zero false negatives "
        "(definitional — a FALSE means corrupt filter bits) and a "
        "false-positive rate within the LOAD-AWARE bound 1.5 x "
        "(1 - e^(-k n/m))^k + slack, computed from the exact member "
        "count so the verdict tracks the sketch's actual guarantee at "
        "any SF (the ADVICE-r6 lesson: hardcoded bounds flip on "
        "bigger corpora). Filter words live in a broadcast MAP (one "
        "row); probes are map-only bit tests."
    ),
    tags=("sketch", "approx", "join"),
)
def sketch_bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    m, k = _BLOOM_AUDIT_BITS, _BLOOM_AUDIT_K
    t = Tables(spark, sf_dir)
    u = t.events.select("user_id").distinct()
    members = u.filter(F.col("user_id") % 3 == 0)

    def positions(key: str) -> list[str]:
        return [
            f"pmod(pmod(xxhash64({key}, {s}), {m}) + {m}, {m})"
            for s in range(k)
        ]

    probe_rows = members.selectExpr(
        f"explode(array({', '.join(positions('user_id'))})) AS pos"
    )
    words = (
        probe_rows.select(
            F.expr("CAST(pos DIV 64 AS INT)").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("bm")
    )
    hit = " AND ".join(
        f"((coalesce(element_at(bm, CAST(({p}) DIV 64 AS INT)),"
        f" CAST(0 AS BIGINT)) >> CAST(({p}) % 64 AS INT))"
        " & CAST(1 AS BIGINT)) = CAST(1 AS BIGINT)"
        for p in positions("user_id")
    )
    probed = u.crossJoin(F.broadcast(bloom)).select(
        "user_id",
        (F.col("user_id") % 3 == 0).alias("is_member"),
        F.expr(hit).alias("hits"),
    )
    agg = probed.agg(
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_members"),
        F.sum(F.when(~F.col("is_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nonmembers"),
        F.coalesce(
            F.expr("bool_and(NOT is_member OR hits)"), F.lit(True)
        ).alias("no_false_negatives"),
        F.sum(F.when(~F.col("is_member") & F.col("hits"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_fp"),
    )
    return agg.select(
        "n_members",
        "n_nonmembers",
        "no_false_negatives",
        F.expr(
            f"CAST(n_fp AS DOUBLE) <= 1.5 * pow(1.0 - exp(-{k}.0"
            f" * CAST(n_members AS DOUBLE) / {m}.0), {k})"
            " * CAST(n_nonmembers AS DOUBLE) + 5.0"
        ).alias("fp_rate_within_bound"),
    )


_KMV_K = 64


def _kmv_oracle() -> str:
    from ..functions.xxh64_sql import hash_long_chain_subquery

    hashed = hash_long_chain_subquery(
        "(SELECT DISTINCT user_id FROM events)", ["user_id"], ["user_id"], out="h"
    )
    return f"""
        WITH u64 AS (
            SELECT CAST(h AS HUGEINT)
                   + CASE WHEN h < 0 THEN 18446744073709551616::HUGEINT
                          ELSE 0::HUGEINT END AS u
            FROM {hashed}
        ),
        kmin AS (
            SELECT MAX(u) AS kth, CAST(COUNT(*) AS BIGINT) AS k
            FROM (SELECT u FROM u64 ORDER BY u LIMIT {_KMV_K})
        ),
        ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct
               FROM (SELECT DISTINCT user_id FROM events))
        SELECT CAST(k AS INT) AS k,
               CAST(kth AS VARCHAR) AS kth_hash,
               (CAST(k - 1 AS DOUBLE) * 18446744073709551616.0)
                   / CAST(CAST(kth AS VARCHAR) AS DOUBLE) AS est_distinct,
               exact_distinct,
               ((CAST(k - 1 AS DOUBLE) * 18446744073709551616.0)
                   / CAST(CAST(kth AS VARCHAR) AS DOUBLE)
                - CAST(exact_distinct AS DOUBLE))
                   / CAST(exact_distinct AS DOUBLE) AS rel_err
        FROM kmin CROSS JOIN ex
    """


@register(
    "sketch_kmv_distinct_estimate",
    oracle=_kmv_oracle(),
    doc=(
        "X6g: K-minimum-values distinct-count sketch — keep the k "
        "smallest xxhash64 values of the key and estimate "
        "|distinct| = (k-1) * 2^64 / kth_min. Unlike HLL (whose "
        "register layout is implementation-defined, hence the verdict "
        "oracles), KMV is FULLY deterministic given the hash: the "
        "oracle replays the hash via the pure-SQL XXH64 twin and "
        "reproduces estimate, kth value, and relative error "
        "bit-for-bit — the only exactly-replayable member of the "
        "sketch tier. Plan: distinct fold (map-side combinable), then "
        "a k-row TakeOrdered — local top-k per partition merged once, "
        "never a global sort; sketches merge by keeping the k smallest "
        "of a union, the same property HLL rollups rely on. The kth "
        "hash crosses the wire as exact decimal digits (STRING)."
    ),
    tags=("sketch", "llm", "approx"),
)
def sketch_kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    d = t.events.select("user_id").distinct()
    u = d.select(
        F.expr(
            "CAST(xxhash64(user_id) AS DECIMAL(20,0))"
            " + CASE WHEN xxhash64(user_id) < 0"
            " THEN CAST(18446744073709551616 AS DECIMAL(20,0))"
            " ELSE CAST(0 AS DECIMAL(20,0)) END"
        ).alias("u")
    )
    kmin = (
        u.orderBy("u")
        .limit(_KMV_K)
        .agg(F.max("u").alias("kth"), F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    ex = d.agg(F.count(F.lit(1)).cast("bigint").alias("exact_distinct"))
    est = (
        "(CAST(k - 1 AS DOUBLE) * 18446744073709551616.0D)"
        " / CAST(CAST(kth AS STRING) AS DOUBLE)"
    )
    return kmin.crossJoin(F.broadcast(ex)).select(
        F.col("k").cast("int").alias("k"),
        F.col("kth").cast("string").alias("kth_hash"),
        F.expr(est).alias("est_distinct"),
        "exact_distinct",
        F.expr(
            f"({est} - CAST(exact_distinct AS DOUBLE))"
            " / CAST(exact_distinct AS DOUBLE)"
        ).alias("rel_err"),
    )
