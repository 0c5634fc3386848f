"""Anomaly detection (SURVEY §2.8 W5 — the detection counterpart of the
generator's 1% injection, iot-data-stream.py:184-193).

Two detectors, both single-pass-plus-broadcast shapes that hold at
100 TB (per-key stats are tiny; the fact scan joins against them
broadcast, so no second shuffle of the data):

* min/max snap — the reference injects anomalies by snapping a sensor
  to its exact range bound, so equality with the per-key extreme IS the
  detector;
* z-score — mean/std from exact decimal sums (value has 2 decimals and
  value² has 4, so DECIMAL(38,8) sums are exact and the derived double
  math is bit-identical across engines, keeping the oracle hash exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..registry import register


@register(
    "anomaly_minmax_snap",
    oracle="""
        WITH stats AS (
            SELECT event_type,
                   MIN(value) AS v_min, MAX(value) AS v_max
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, e.value,
               e.value = s.v_min AS at_min,
               e.value = s.v_max AS at_max
        FROM events e JOIN stats s ON e.event_type = s.event_type
        WHERE e.value IS NOT NULL AND (e.value = s.v_min OR e.value = s.v_max)
    """,
    doc=(
        "W5: range-snap detector — rows sitting exactly on their key's "
        "min/max (how the reference injects anomalies). Stats aggregate "
        "is tiny -> broadcast back against the fact scan."
    ),
    tags=("anomaly", "detection"),
)
def anomaly_minmax_snap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("value").isNotNull())
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("v_min"), F.max("value").alias("v_max")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter((F.col("value") == F.col("v_min")) | (F.col("value") == F.col("v_max")))
        .select(
            "event_id",
            "event_type",
            "value",
            (F.col("value") == F.col("v_min")).alias("at_min"),
            (F.col("value") == F.col("v_max")).alias("at_max"),
        )
    )


@register(
    "anomaly_zscore",
    oracle="""
        WITH stats AS (
            SELECT event_type,
                   COUNT(value) AS n,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS s1,
                   CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS s2
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        ),
        ms AS (
            SELECT event_type, n, s1 / n AS mean,
                   sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std
            FROM stats
        )
        SELECT e.event_id, e.event_type, e.value,
               (e.value - m.mean) / m.std AS zscore
        FROM events e JOIN ms m ON e.event_type = m.event_type
        WHERE e.value IS NOT NULL
          AND ABS((e.value - m.mean) / m.std) > 1.96
    """,
    doc=(
        "W5: z-score outliers per key — mean/std derived from exact "
        "decimal sums (order-independent), flagged at |z| > 1.96. "
        "Single scan + broadcast of the per-key stats."
    ),
    tags=("anomaly", "detection"),
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("value").isNotNull())
    stats = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE)").alias("s1"),
        F.expr("CAST(SUM(CAST(value * value AS DECIMAL(38,8))) AS DOUBLE)").alias("s2"),
    )
    ms = stats.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "std"
        ),
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        ev.join(F.broadcast(ms), "event_type")
        .filter(F.abs(z) > 1.96)
        .select("event_id", "event_type", "value", z.alias("zscore"))
    )


@register(
    "anomaly_seasonal_baseline",
    oracle="""
        WITH ev AS (
            SELECT event_id, event_type, value,
                   CAST(EXTRACT(hour FROM ts) AS INT) AS hod
            FROM events WHERE value IS NOT NULL
        ),
        scored AS (
            SELECT event_id, event_type, hod, value,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) OVER w AS VARCHAR) AS DOUBLE)
                       / COUNT(*) OVER w AS mu,
                   CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,8))) OVER w AS VARCHAR) AS DOUBLE)
                       / COUNT(*) OVER w AS msq
            FROM ev
            WINDOW w AS (PARTITION BY event_type, hod)
        )
        SELECT event_id, event_type, hod, value,
               (value - mu) / sqrt(msq - mu * mu) AS deviation
        FROM scored
        WHERE abs(value - mu) > 3.0 * sqrt(msq - mu * mu)
        ORDER BY event_id
    """,
    doc=(
        "Seasonal anomaly detection: each event scored against the "
        "baseline of ITS OWN (event_type, hour-of-day) cell — catches "
        "values that are normal at 3pm but anomalous at 3am, which a "
        "global z-score (anomaly_zscore) misses. Cell stats are window "
        "aggregates over one scan (a groupBy+join-back would scan events "
        "twice); decimal power sums -> identical doubles -> identical "
        "flag decisions on both engines."
    ),
    tags=("anomaly", "timeseries", "window"),
)
def anomaly_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    w = W.partitionBy("event_type", "hod")
    mu = (
        F.sum(F.expr("CAST(value AS DECIMAL(38,8))")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    msq = (
        F.sum(F.expr("CAST(value * value AS DECIMAL(38,8))")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    scored = (
        t.events.filter(F.col("value").isNotNull())
        .select("event_id", "event_type", F.hour("ts").alias("hod"), "value")
        .withColumn("mu", mu)
        .withColumn("msq", msq)
    )
    std = F.sqrt(F.col("msq") - F.col("mu") * F.col("mu"))
    return (
        scored.filter(F.abs(F.col("value") - F.col("mu")) > 3.0 * std)
        .select(
            "event_id",
            "event_type",
            "hod",
            "value",
            ((F.col("value") - F.col("mu")) / std).alias("deviation"),
        )
        .orderBy("event_id")
    )


@register(
    "anomaly_mad_robust",
    oracle="""
        WITH ranked AS (
            SELECT event_id, event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        med AS (
            SELECT event_type,
                   MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                            THEN value END) AS median_v
            FROM ranked GROUP BY event_type
        ),
        devs AS (
            SELECT r.event_id, r.event_type, r.value, m.median_v,
                   abs(r.value - m.median_v) AS dev,
                   row_number() OVER (PARTITION BY r.event_type
                                      ORDER BY abs(r.value - m.median_v),
                                               r.event_id) AS drn,
                   COUNT(*) OVER (PARTITION BY r.event_type) AS dn
            FROM ranked r JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type,
                   MAX(CASE WHEN drn = CAST(ceil(0.5 * dn) AS BIGINT)
                            THEN dev END) AS mad_v
            FROM devs GROUP BY event_type
        )
        SELECT d.event_id, d.event_type, d.value, d.median_v, m2.mad_v,
               d.dev / m2.mad_v AS robust_score
        FROM devs d JOIN mad m2 USING (event_type)
        WHERE d.dev > 5.0 * m2.mad_v
    """,
    doc=(
        "Robust outlier detection via median absolute deviation: flag "
        "events whose |value - median| exceeds 5 MAD of their type — "
        "the estimator that, unlike the z-score, is not dragged by the "
        "outliers it is hunting (50% breakdown point). Both the median "
        "and the MAD are RANK-BASED disc percentiles (actual data "
        "values at row ceil(n/2), the winsorize trick), so no float "
        "interpolation and the whole query is hash-exact. Plan: two "
        "window passes over the same event_type partitioning plus two "
        "broadcast joins of the per-type cut tables — the second pass "
        "is unavoidable (deviations need the median first), matching "
        "the two-pass lower bound for exact MAD."
    ),
    tags=("anomaly", "stats", "window"),
)
def anomaly_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    e = t.events.select("event_id", "event_type", "value")
    ranked = e.select(
        "event_id",
        "event_type",
        "value",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("value", "event_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.5 * F.col("n")).cast("bigint"), F.col("value"))
        ).alias("median_v")
    )
    devs = ranked.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "median_v",
        F.abs(F.col("value") - F.col("median_v")).alias("dev"),
    )
    dev_ranked = devs.select(
        "*",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("dev", "event_id"))
        .alias("drn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("dn"),
    )
    mad = dev_ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("drn") == F.ceil(0.5 * F.col("dn")).cast("bigint"), F.col("dev"))
        ).alias("mad_v")
    )
    return (
        dev_ranked.join(F.broadcast(mad), "event_type")
        .filter(F.col("dev") > 5.0 * F.col("mad_v"))
        .select(
            "event_id",
            "event_type",
            "value",
            "median_v",
            "mad_v",
            (F.col("dev") / F.col("mad_v")).alias("robust_score"),
        )
    )


@register(
    "anomaly_tukey_fences",
    oracle="""
        WITH ranked AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events WHERE value IS NOT NULL
        ),
        quarts AS (
            SELECT event_type,
                   MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                            THEN value END) AS q1,
                   MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                            THEN value END) AS q3,
                   MAX(n) AS n_rows
            FROM ranked GROUP BY event_type
        ),
        fences AS (
            SELECT event_type, q1, q3, CAST(n_rows AS BIGINT) AS n_rows,
                   q1 - 1.5 * (q3 - q1) AS lo_fence,
                   q3 + 1.5 * (q3 - q1) AS hi_fence
            FROM quarts
        )
        SELECT f.event_type, f.q1, f.q3, f.lo_fence, f.hi_fence, f.n_rows,
               CAST(COUNT(CASE WHEN r.value < f.lo_fence
                                 OR r.value > f.hi_fence THEN 1 END) AS BIGINT)
                 AS n_outliers
        FROM ranked r JOIN fences f USING (event_type)
        GROUP BY f.event_type, f.q1, f.q3, f.lo_fence, f.hi_fence, f.n_rows
    """,
    doc=(
        "Tukey boxplot fences per event type (the fourth detector in "
        "the outlier family, alongside min-max snap, z-score, seasonal "
        "baseline, and MAD): exact rank-based discrete quartiles, "
        "fences at 1.5 IQR as shared per-row expressions, outliers "
        "counted against the broadcast fence table in the same two-"
        "pass shape as winsorize/MAD. Quartiles are SELECTED values "
        "(no interpolation semantics to disagree on), so the whole "
        "report is hash-exact."
    ),
    tags=("anomaly", "stats", "window"),
)
def anomaly_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    ranked = t.events.filter(F.col("value").isNotNull()).select(
        "event_type",
        "value",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("value", "event_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n"),
    )
    quarts = ranked.groupBy("event_type").agg(
        F.max(
            F.expr("CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN value END")
        ).alias("q1"),
        F.max(
            F.expr("CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN value END")
        ).alias("q3"),
        F.max("n").cast("bigint").alias("n_rows"),
    )
    fences = quarts.select(
        "event_type",
        "q1",
        "q3",
        "n_rows",
        F.expr("q1 - 1.5 * (q3 - q1)").alias("lo_fence"),
        F.expr("q3 + 1.5 * (q3 - q1)").alias("hi_fence"),
    )
    return (
        ranked.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "q1", "q3", "lo_fence", "hi_fence", "n_rows")
        .agg(
            F.expr(
                "CAST(COUNT(CASE WHEN value < lo_fence OR value > hi_fence"
                " THEN 1 END) AS BIGINT)"
            ).alias("n_outliers")
        )
    )


@register(
    "anomaly_iqr_tukey_fences",
    oracle="""
        WITH pts AS (
            SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS x
            FROM events WHERE value IS NOT NULL
        ),
        q AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   quantile_cont(x, 0.25) AS q1,
                   quantile_cont(x, 0.75) AS q3
            FROM pts GROUP BY event_type
        ),
        fences AS (
            SELECT event_type, n, q1, q3,
                   q1 - 1.5 * (q3 - q1) AS lo_fence,
                   q3 + 1.5 * (q3 - q1) AS hi_fence
            FROM q
        )
        SELECT f.event_type, f.n,
               f.q1 / 10000.0 AS q1,
               f.q3 / 10000.0 AS q3,
               f.lo_fence / 10000.0 AS lo_fence,
               f.hi_fence / 10000.0 AS hi_fence,
               CAST(SUM(CASE WHEN p.x < f.lo_fence THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_low_outliers,
               CAST(SUM(CASE WHEN p.x > f.hi_fence THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_high_outliers,
               CAST(SUM(CASE WHEN p.x < f.lo_fence OR p.x > f.hi_fence
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(f.n AS DOUBLE) AS outlier_rate
        FROM pts p JOIN fences f ON p.event_type = f.event_type
        GROUP BY f.event_type, f.n, f.q1, f.q3, f.lo_fence, f.hi_fence
        ORDER BY f.event_type
    """,
    doc=(
        "Tukey boxplot fences per event type: outliers beyond "
        "[Q1 - 1.5*IQR, Q3 + 1.5*IQR] — the distribution-free outlier "
        "screen every monitoring system runs beside the z-score "
        "(which assumes normality) and MAD (which this complements at "
        "the quartile grain). Values quantize to 1e-4 fixed-point "
        "integers so the quarter-fraction quantile interpolation is "
        "bit-identical cross-engine (the Bowley contract); fences are "
        "one shared expression, and the second fact pass counts "
        "fence-crossers against the BROADCAST per-type fence table. "
        "Exact counts, one shared rate division."
    ),
    tags=("anomaly", "stats", "quantile"),
)
def anomaly_iqr_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    pts = t.events.filter(F.col("value").isNotNull()).select(
        "event_type", F.expr("CAST(round(value * 10000) AS BIGINT)").alias("x")
    )
    q = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("percentile(x, 0.25)").alias("q1"),
        F.expr("percentile(x, 0.75)").alias("q3"),
    )
    fences = q.select(
        "event_type",
        "n",
        "q1",
        "q3",
        F.expr("q1 - 1.5 * (q3 - q1)").alias("lo_fence"),
        F.expr("q3 + 1.5 * (q3 - q1)").alias("hi_fence"),
    )
    return (
        pts.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "n", "q1", "q3", "lo_fence", "hi_fence")
        .agg(
            F.sum(F.when(F.col("x") < F.col("lo_fence"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_low_outliers"),
            F.sum(F.when(F.col("x") > F.col("hi_fence"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_high_outliers"),
            (
                F.sum(
                    F.when(
                        (F.col("x") < F.col("lo_fence"))
                        | (F.col("x") > F.col("hi_fence")),
                        1,
                    ).otherwise(0)
                ).cast("double")
                / F.col("n").cast("double")
            ).alias("outlier_rate"),
        )
        .select(
            "event_type",
            "n",
            F.expr("q1 / 10000.0").alias("q1"),
            F.expr("q3 / 10000.0").alias("q3"),
            F.expr("lo_fence / 10000.0").alias("lo_fence"),
            F.expr("hi_fence / 10000.0").alias("hi_fence"),
            "n_low_outliers",
            "n_high_outliers",
            "outlier_rate",
        )
        .orderBy("event_type")
    )
