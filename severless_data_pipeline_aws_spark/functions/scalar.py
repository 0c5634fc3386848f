"""Scalar-function battery (SURVEY §2.7, F1–F14) + the promised
date / string / array / map / JSON query set.

Reference anchors (file:line cite the reference):
  F1  timestamp parse       iot_dashboard.py:32-36,111
  F2  timestamp format      iot-data-stream.py:146
  F3  round to precision    iot-data-stream.py:172
  F4  clamp min/max         iot-data-stream.py:169
  F5  abs + negate          iot-data-stream.py:161-163
  F7  weighted choice       iot-data-stream.py:110-111,182
  F8  bernoulli gates       iot-data-stream.py:185,188,254
  F9  string interpolation  iot-data-stream.py:227,338-339
  F10 id suffix             iot-data-stream.py:227
  F11 JSON ser/deser        iot-data-stream.py:279,379
  F12 numeric normalize     iot_dashboard.py:27-31
  F14 math battery          iot-data-stream.py:169,163

Everything is a built-in JVM-side column expression — no Python UDFs —
so each query stays inside whole-stage codegen. Randomness in the
reference (F6–F8) is made deterministic here by keying off stable ids
(``event_id % N`` thresholds) so the DuckDB oracle can reproduce it —
the *stochastic* twins live in operators/generator.py where the driver
verifies distributional invariants instead of exact values.

Cross-engine gotchas encoded below (verified against DuckDB):
* DuckDB ``dayofweek`` is 0-based (Sunday=0); Spark is 1-based -> +1.
* DuckDB ``CAST(double AS INT)`` rounds; Spark truncates -> use FLOOR.
* DuckDB ``map_extract`` returns a LIST -> index ``[1]``.
* ``ROUND(double)`` disagrees on halfway doubles -> round DECIMAL, then
  cast to DOUBLE (see operators/_helpers.py).
* never ln/exp/pow in hashed output (libm-dependent); sqrt is IEEE
  correctly-rounded and safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..registry import register


@register(
    "scalar_timestamp_parse_format",
    oracle="""
        SELECT event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
               strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ts_reparsed,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS unix_secs
        FROM events WHERE user_id <= 5
    """,
    doc="F1/F2: timestamp <-> string round-trip + epoch seconds (iot_dashboard.py:32-36).",
    tags=("scalar", "date"),
)
def scalar_timestamp_parse_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    fmt = "yyyy-MM-dd HH:mm:ss"
    return t.events.filter(F.col("user_id") <= 5).select(
        "event_id",
        F.date_format("ts", fmt).alias("ts_str"),
        F.to_timestamp(F.date_format("ts", fmt), fmt).alias("ts_reparsed"),
        F.unix_timestamp("ts").alias("unix_secs"),
    )


@register(
    "scalar_date_parts",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mth,
               CAST(day(o_orderdate) AS INT) AS dom,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
        FROM orders WHERE o_orderkey <= 200
    """,
    doc="Date-part extraction battery (DuckDB dayofweek is 0-based; Spark 1-based).",
    tags=("scalar", "date"),
)
def scalar_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.filter(F.col("o_orderkey") <= 200).select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
    )


@register(
    "scalar_date_arithmetic",
    oracle="""
        SELECT o_orderkey, o_orderdate,
               o_orderdate + INTERVAL 30 DAY AS due_date,
               CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-01 00:00:00') AS INT) AS days_to_cutoff
        FROM orders WHERE o_orderkey <= 200
    """,
    doc="Date arithmetic: interval add + day difference to a cutoff.",
    tags=("scalar", "date"),
)
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.filter(F.col("o_orderkey") <= 200).select(
        "o_orderkey",
        "o_orderdate",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_cutoff"
        ),
    )


@register(
    "scalar_round_clamp",
    oracle="""
        SELECT event_id, value,
               CAST(ROUND(CAST(value AS DECIMAL(18,4)), 1) AS DOUBLE) AS value_rounded,
               LEAST(GREATEST(value, 2.0), 8.0) AS value_clamped
        FROM events WHERE value IS NOT NULL AND user_id <= 10
    """,
    doc=(
        "F3/F4: round-to-precision (iot-data-stream.py:172) + clamp to "
        "[min,max] (iot-data-stream.py:169). Rounds the DECIMAL, not the "
        "double — engines disagree on halfway doubles."
    ),
    tags=("scalar", "math"),
)
def scalar_round_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.filter(F.col("value").isNotNull() & (F.col("user_id") <= 10)).select(
        "event_id",
        "value",
        F.round(F.col("value").cast("decimal(18,4)"), 1).cast("double").alias("value_rounded"),
        F.least(F.greatest("value", F.lit(2.0)), F.lit(8.0)).alias("value_clamped"),
    )


@register(
    "scalar_math_battery",
    oracle="""
        SELECT event_id,
               ABS(-value) AS abs_val,
               -ABS(value) AS neg_abs_val,
               CAST(FLOOR(value) AS BIGINT) AS floor_val,
               CAST(CEIL(value) AS BIGINT) AS ceil_val,
               CAST(SIGN(value - 5.0) AS DOUBLE) AS sign_centered,
               SQRT(ABS(value)) AS sqrt_val,
               GREATEST(value, CAST(user_id AS DOUBLE)) AS hi,
               LEAST(value, CAST(user_id AS DOUBLE)) AS lo
        FROM events WHERE value IS NOT NULL AND user_id <= 10
    """,
    doc="F5/F14: abs/negate (battery decay, iot-data-stream.py:161-163) + floor/ceil/sign/sqrt/greatest/least.",
    tags=("scalar", "math"),
)
def scalar_math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    v, u = F.col("value"), F.col("user_id").cast("double")
    return t.events.filter(F.col("value").isNotNull() & (F.col("user_id") <= 10)).select(
        "event_id",
        F.abs(-v).alias("abs_val"),
        (-F.abs(v)).alias("neg_abs_val"),
        F.floor(v).alias("floor_val"),
        F.ceil(v).alias("ceil_val"),
        F.signum(v - 5.0).alias("sign_centered"),
        F.sqrt(F.abs(v)).alias("sqrt_val"),
        F.greatest(v, u).alias("hi"),
        F.least(v, u).alias("lo"),
    )


@register(
    "scalar_string_ops",
    oracle="""
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               lower(c_mktsegment) AS seg_lower,
               substring(c_name, 1, 9) AS name_prefix,
               CAST(length(c_name) AS INT) AS name_len,
               concat_ws('/', c_mktsegment, c_name) AS seg_name,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
               replace(c_name, '#', '-') AS name_dashed,
               trim('  ' || c_name || ' ') AS name_trimmed
        FROM customer WHERE c_name LIKE '%5'
    """,
    doc="F9: string interpolation/concat battery + LIKE predicate.",
    tags=("scalar", "string"),
)
def scalar_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.customer.filter(F.col("c_name").like("%5")).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("/", "c_mktsegment", "c_name").alias("seg_name"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trimmed"),
    )


@register(
    "scalar_string_id_hash",
    oracle="""
        SELECT event_id,
               'device_' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8) AS device_id,
               md5(event_type) AS type_md5,
               sha256(event_type) AS type_sha256
        FROM events WHERE user_id <= 5
    """,
    doc=(
        "F10: reference's uuid-suffix device id (iot-data-stream.py:227) made "
        "deterministic via md5 of the stable id; md5/sha256 agree across engines."
    ),
    tags=("scalar", "string", "hash"),
)
def scalar_string_id_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.filter(F.col("user_id") <= 5).select(
        "event_id",
        F.concat(
            F.lit("device_"), F.substring(F.md5(F.col("event_id").cast("string")), 1, 8)
        ).alias("device_id"),
        F.md5("event_type").alias("type_md5"),
        F.sha2("event_type", 256).alias("type_sha256"),
    )


@register(
    "scalar_regexp",
    oracle="""
        SELECT event_id, props,
               regexp_extract(props, '(\\d+)', 1) AS first_number,
               regexp_replace(props, '\\d+', 'N') AS numbers_masked
        FROM events
        WHERE user_id <= 10 AND regexp_matches(props, '\\d\\d+')
    """,
    doc="Regex battery: extract / replace / match-filter over the JSON props string.",
    tags=("scalar", "string", "regex"),
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.filter((F.col("user_id") <= 10) & F.col("props").rlike(r"\d\d+"))
        .select(
            "event_id",
            "props",
            F.regexp_extract("props", r"(\d+)", 1).alias("first_number"),
            F.regexp_replace("props", r"\d+", "N").alias("numbers_masked"),
        )
    )


@register(
    "scalar_json",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
               to_json(struct_pack(event_id := event_id, event_type := event_type)) AS as_json
        FROM events WHERE user_id <= 10
    """,
    doc=(
        "F11: JSON decode (get_json_object over events.props — the reference "
        "Lambda's json.loads, iot-data-stream.py:279) + encode "
        "(to_json(struct), the Kinesis wire format)."
    ),
    tags=("scalar", "json"),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.filter(F.col("user_id") <= 10).select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.to_json(F.struct("event_id", "event_type")).alias("as_json"),
    )


@register(
    "scalar_array_ops",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_words,
               string_split(text, ' ')[1] AS first_word,
               list_contains(string_split(text, ' '), 'spark') AS has_spark,
               array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS top3_sorted
        FROM documents WHERE doc_id <= 100
    """,
    doc="Array battery: split/size/element_at/contains/sort/slice/join over documents.text.",
    tags=("scalar", "array"),
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    return t.documents.filter(F.col("doc_id") <= 100).select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_join(F.slice(F.sort_array(words), 1, 3), ",").alias("top3_sorted"),
    )


@register(
    "scalar_map_ops",
    oracle="""
        SELECT event_id,
               map_extract(MAP {'type': event_type, 'kind': 'event'}, 'type')[1] AS type_back,
               CAST(len(map_keys(MAP {'type': event_type, 'kind': 'event'})) AS INT) AS n_keys,
               array_to_string(map_keys(MAP {'type': event_type, 'kind': 'event'}), ',') AS keys_csv
        FROM events WHERE user_id <= 5
    """,
    doc=(
        "Map battery: construct / element_at / map_keys — the reference's "
        "readings map surface (iot-data-stream.py:205). DuckDB map_extract "
        "returns a LIST, hence the [1]."
    ),
    tags=("scalar", "map"),
)
def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    m = F.create_map(F.lit("type"), F.col("event_type"), F.lit("kind"), F.lit("event"))
    return t.events.filter(F.col("user_id") <= 5).select(
        "event_id",
        F.element_at(m, "type").alias("type_back"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@register(
    "scalar_conditional_choice",
    oracle="""
        SELECT event_id,
               CASE WHEN event_id % 1000 < 950 THEN 'operational'
                    WHEN event_id % 1000 < 980 THEN 'maintenance'
                    WHEN event_id % 1000 < 995 THEN 'warning'
                    ELSE 'error' END AS status,
               event_id % 100 < 1 AS is_anomaly,
               CASE WHEN event_id % 100 < 1
                    THEN (CASE WHEN event_id % 2 = 0 THEN 'spike' ELSE 'drop' END)
               END AS anomaly_kind
        FROM events WHERE user_id <= 10
    """,
    doc=(
        "F7/F8: the reference's weighted status choice (.95/.03/.015/.005, "
        "iot-data-stream.py:110-111) and 1% anomaly gate with 50/50 "
        "spike-vs-drop (:185-188), keyed deterministically off event_id so "
        "the oracle reproduces it (stochastic twin: operators/generator.py)."
    ),
    tags=("scalar", "conditional"),
)
def scalar_conditional_choice(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    m = F.col("event_id") % 1000
    return t.events.filter(F.col("user_id") <= 10).select(
        "event_id",
        F.when(m < 950, "operational")
        .when(m < 980, "maintenance")
        .when(m < 995, "warning")
        .otherwise("error")
        .alias("status"),
        (F.col("event_id") % 100 < 1).alias("is_anomaly"),
        F.when(
            F.col("event_id") % 100 < 1,
            F.when(F.col("event_id") % 2 == 0, "spike").otherwise("drop"),
        ).alias("anomaly_kind"),
    )


@register(
    "scalar_cast_normalize",
    oracle="""
        SELECT event_id,
               CAST(FLOOR(value) AS BIGINT) AS value_int,
               CAST(event_id AS VARCHAR) AS id_str,
               CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DOUBLE) AS k_double,
               CAST(value > 5.0 AS INT) AS above_mid
        FROM events WHERE value IS NOT NULL AND user_id <= 10
    """,
    doc=(
        "F12: type normalization (the dashboard's Decimal->int/float coerce, "
        "iot_dashboard.py:27-31). double->int goes through FLOOR: DuckDB's "
        "CAST rounds while Spark's truncates."
    ),
    tags=("scalar", "cast"),
)
def scalar_cast_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.filter(F.col("value").isNotNull() & (F.col("user_id") <= 10)).select(
        "event_id",
        F.floor("value").alias("value_int"),
        F.col("event_id").cast("string").alias("id_str"),
        F.get_json_object("props", "$.k").cast("int").cast("double").alias("k_double"),
        (F.col("value") > 5.0).cast("int").alias("above_mid"),
    )


@register(
    "scalar_posexplode_outer",
    oracle="""
        WITH base AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 5 = 0 THEN CAST(NULL AS BIGINT[])
                        WHEN o_orderkey % 4 = 0 THEN CAST([] AS BIGINT[])
                        ELSE range(1, o_orderkey % 4 + 1) END AS arr
            FROM orders WHERE o_orderkey <= 500
        ),
        pairs AS (
            SELECT o_orderkey,
                   CASE WHEN arr IS NULL OR len(arr) = 0
                        THEN [{'pos': CAST(NULL AS INT), 'val': CAST(NULL AS BIGINT)}]
                        ELSE list_transform(range(1, len(arr) + 1),
                                            i -> {'pos': CAST(i - 1 AS INT),
                                                  'val': arr[i]}) END AS ps
            FROM base
        )
        SELECT o_orderkey, u.pos AS pos, u.val AS val
        FROM (SELECT o_orderkey, unnest(ps) AS u FROM pairs)
    """,
    doc=(
        "LATERAL VIEW OUTER posexplode: row-preserving array explosion "
        "— NULL and empty arrays still emit one (NULL, NULL) row, the "
        "semantics that keep left-side rows alive through a flatten. "
        "The generator runs inside whole-stage codegen (no shuffle)."
    ),
    tags=("scalar", "array", "explode", "nulls"),
)
def scalar_posexplode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    arr = F.expr(
        "CASE WHEN o_orderkey % 5 = 0 THEN CAST(NULL AS ARRAY<BIGINT>) "
        "WHEN o_orderkey % 4 = 0 THEN CAST(ARRAY() AS ARRAY<BIGINT>) "
        "ELSE sequence(CAST(1 AS BIGINT), o_orderkey % 4) END"
    )
    return (
        t.orders.filter(F.col("o_orderkey") <= 500)
        .select("o_orderkey", arr.alias("arr"))
        .select("o_orderkey", F.posexplode_outer("arr").alias("pos", "val"))
    )


@register(
    "scalar_bitwise_ops",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS low_byte,
               o_orderkey | 4096 AS with_flag,
               xor(o_orderkey, 1365) AS xored,
               o_orderkey << 2 AS shifted_l,
               o_orderkey >> 3 AS shifted_r,
               CAST(bit_count(o_orderkey) AS INT) AS popcount
        FROM orders WHERE o_orderkey <= 2000
    """,
    doc=(
        "Bitwise battery: AND/OR/XOR, shifts, popcount — the flag-field "
        "and bitmap-index manipulation layer, all codegen'd JVM "
        "expressions."
    ),
    tags=("scalar", "bitwise"),
)
def scalar_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("low_byte"),
        F.expr("o_orderkey | 4096").alias("with_flag"),
        F.expr("o_orderkey ^ 1365").alias("xored"),
        F.expr("shiftleft(o_orderkey, 2)").alias("shifted_l"),
        F.expr("shiftright(o_orderkey, 3)").alias("shifted_r"),
        F.expr("bit_count(o_orderkey)").alias("popcount"),
    )


@register(
    "scalar_try_cast",
    oracle="""
        SELECT o_orderkey,
               TRY_CAST(o_orderpriority AS INT) AS bad_int,
               TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_digit,
               TRY_CAST(o_orderpriority AS DOUBLE) IS NULL AS unparseable,
               COALESCE(TRY_CAST(substr(o_orderpriority, 1, 1) AS INT), -1)
                   AS prio_or_default
        FROM orders WHERE o_orderkey <= 2000
    """,
    doc=(
        "TRY_CAST data-cleaning battery: malformed strings become NULL "
        "instead of job-killing exceptions — the ingestion posture for "
        "dirty 100 TB feeds ('1-URGENT' fails, its leading digit "
        "parses), with COALESCE defaulting."
    ),
    tags=("scalar", "cast", "nulls"),
)
def scalar_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.expr("TRY_CAST(o_orderpriority AS INT)").alias("bad_int"),
        F.expr("TRY_CAST(substr(o_orderpriority, 1, 1) AS INT)").alias("prio_digit"),
        F.expr("TRY_CAST(o_orderpriority AS DOUBLE)").isNull().alias("unparseable"),
        F.coalesce(
            F.expr("TRY_CAST(substr(o_orderpriority, 1, 1) AS INT)"), F.lit(-1)
        ).alias("prio_or_default"),
    )


@register(
    "scalar_variant_json",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
               CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc=(
        "Spark 4 VARIANT path for semi-structured data: parse_json once "
        "into the binary VARIANT encoding, then typed variant_get "
        "extraction — unlike get_json_object (string re-parse per "
        "access), VARIANT parses once and fields extract at "
        "binary-offset speed, the right plan when many fields are read "
        "per row at 100 TB. Aggregated per event_type; integer sums "
        "exact on both engines."
    ),
    tags=("scalar", "json", "variant"),
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        t.events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "scalar_array_lambda",
    oracle="""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '),
                                    w -> length(w) > 5)) AS INT) AS n_long_words,
               len(list_filter(string_split(text, ' '),
                               w -> length(w) >= 8)) > 0 AS has_very_long,
               len(list_filter(string_split(text, ' '),
                               w -> length(w) = 0)) = 0 AS all_nonempty,
               CAST(list_sum(list_transform(string_split(text, ' '),
                                            w -> length(w))) AS BIGINT) AS letter_chars,
               list_transform(string_split(text, ' '), w -> w || '!')[1] AS first_bang
        FROM documents WHERE doc_id <= 100
    """,
    doc=(
        "Higher-order lambda battery (the Catalyst-native alternative "
        "to a Python UDF for per-row collection logic): filter / "
        "exists / forall / aggregate / transform over the word array — "
        "all codegen'd JVM expressions, zero Python. These are the "
        "primitives the dedup/similarity modules build on; this entry "
        "pins their cross-engine semantics directly."
    ),
    tags=("scalar", "array", "lambda"),
)
def scalar_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = "split(text, ' ')"
    return t.documents.filter(F.col("doc_id") <= 100).select(
        "doc_id",
        F.expr(f"size(filter({w}, x -> length(x) > 5))").alias("n_long_words"),
        F.expr(f"exists({w}, x -> length(x) >= 8)").alias("has_very_long"),
        F.expr(f"forall({w}, x -> length(x) > 0)").alias("all_nonempty"),
        F.expr(f"CAST(aggregate({w}, 0L, (a, x) -> a + length(x)) AS BIGINT)").alias(
            "letter_chars"
        ),
        F.expr(f"transform({w}, x -> concat(x, '!'))[0]").alias("first_bang"),
    )


@register(
    "scalar_string_pad_translate",
    oracle="""
        SELECT doc_id,
               lpad(lang, 5, '.') AS lang_padded,
               rpad(source, 8, '-') AS source_padded,
               translate(lang, 'aeiou', 'AEIOU') AS lang_vowels_up,
               trim(BOTH 's' FROM source) AS source_trimmed,
               repeat(lang, 2) AS lang_twice,
               reverse(source) AS source_rev,
               ascii(lang) AS first_code,
               chr(65 + CAST(doc_id % 26 AS INT)) AS letter
        FROM documents WHERE doc_id <= 100
    """,
    doc=(
        "Second string battery: lpad/rpad/translate/trim-chars/repeat/"
        "reverse/ascii/chr — the fixed-width formatting and character-"
        "mapping functions a report/export layer leans on, pinned "
        "cross-engine."
    ),
    tags=("scalar", "string"),
)
def scalar_string_pad_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.documents.filter(F.col("doc_id") <= 100).select(
        "doc_id",
        F.lpad("lang", 5, ".").alias("lang_padded"),
        F.rpad("source", 8, "-").alias("source_padded"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_vowels_up"),
        F.expr("trim(BOTH 's' FROM source)").alias("source_trimmed"),
        F.repeat("lang", 2).alias("lang_twice"),
        F.reverse("source").alias("source_rev"),
        F.ascii("lang").alias("first_code"),
        F.chr(F.lit(65) + (F.col("doc_id") % 26).cast("int")).alias("letter"),
    )


@register(
    "scalar_timezone_battery",
    oracle="""
        SELECT event_id,
               timezone('America/New_York', timezone('UTC', ts)) AS ny_wall,
               timezone('Asia/Tokyo', timezone('UTC', ts)) AS tokyo_wall,
               ts AS roundtrip_utc,
               CAST(hour(timezone('America/New_York', timezone('UTC', ts)))
                    AS BIGINT) AS ny_hour
        FROM events
    """,
    doc=(
        "Timezone conversion battery: from_utc_timestamp / "
        "to_utc_timestamp between session-UTC instants and "
        "America/New_York (DST-observing) and Asia/Tokyo (no DST) wall "
        "clocks, plus local-hour extraction — the dashboard's "
        "display-timezone path. The roundtrip column re-converts the NY "
        "wall time back to UTC and the oracle pins it to the original "
        "ts, proving from/to are exact inverses on this range. Pure "
        "per-row JVM intrinsics (whole-stage codegen, no shuffle); the "
        "oracle composes DuckDB's two-argument timezone() so neither "
        "engine's session timezone participates."
    ),
    tags=("scalar", "timestamp", "timezone"),
)
def scalar_timezone_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ny = F.from_utc_timestamp("ts", "America/New_York")
    return t.events.select(
        "event_id",
        ny.alias("ny_wall"),
        F.from_utc_timestamp("ts", "Asia/Tokyo").alias("tokyo_wall"),
        F.to_utc_timestamp(ny, "America/New_York").alias("roundtrip_utc"),
        F.hour(ny).cast("bigint").alias("ny_hour"),
    )


@register(
    "scalar_inline_charge_breakdown",
    oracle="""
        SELECT o_orderkey, u.kind AS charge_kind,
               CAST(u.amount AS DOUBLE) AS amount
        FROM (
            SELECT o_orderkey,
                   unnest([
                       struct_pack(kind := 'base',
                                   amount := CAST(o_totalprice AS DOUBLE)),
                       struct_pack(kind := 'tax',
                                   amount := CAST(o_totalprice AS DOUBLE) * 0.08),
                       struct_pack(kind := 'freight',
                                   amount := CAST(o_totalprice AS DOUBLE) * 0.025)
                   ]) AS u
            FROM orders
        )
        WHERE o_orderkey <= 2000
    """,
    doc=(
        "inline() generator: each order row fans out into its charge "
        "breakdown (base / tax / freight) from a constructed "
        "array<struct> — the row-to-rows normalization that turns a "
        "wide denormalized record into a ledger without a join or a "
        "shuffle (map-side Generate node, like explode but emitting "
        "the struct's columns directly). Amounts are single shared "
        "double expressions, so the ledger is hash-exact."
    ),
    tags=("scalar", "generator", "array"),
)
def scalar_inline_charge_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.expr(
                "inline(array("
                "struct('base' AS kind, CAST(o_totalprice AS DOUBLE) AS amount),"
                "struct('tax' AS kind, CAST(o_totalprice AS DOUBLE) * 0.08 AS amount),"
                "struct('freight' AS kind, CAST(o_totalprice AS DOUBLE) * 0.025 AS amount)"
                "))"
            ),
        )
        .select("o_orderkey", F.col("kind").alias("charge_kind"), "amount")
    )


@register(
    "scalar_try_arithmetic",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(l_discount AS DOUBLE) AS l_discount,
               CASE WHEN l_discount = 0 THEN NULL
                    ELSE CAST(l_extendedprice AS DOUBLE) / l_discount END
                   AS price_per_discount_unit,
               l_discount = 0 AS divide_blocked
        FROM lineitem WHERE l_orderkey <= 2000
    """,
    doc=(
        "ANSI-safe arithmetic: try_divide turns division-by-zero into "
        "NULL instead of an Infinity that silently poisons downstream "
        "aggregates (or, under ANSI mode, a job-killing exception) — "
        "the arithmetic counterpart of TRY_CAST's ingest posture. The "
        "oracle spells out the guarded CASE, verifying try_divide's "
        "exact NULL semantics; non-zero rows are one IEEE division, "
        "bit-identical."
    ),
    tags=("scalar", "nulls", "ansi"),
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.filter(F.col("l_orderkey") <= 2000).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_discount").cast("double").alias("l_discount"),
        F.expr(
            "try_divide(CAST(l_extendedprice AS DOUBLE), CAST(l_discount AS DOUBLE))"
        ).alias("price_per_discount_unit"),
        (F.col("l_discount") == 0).alias("divide_blocked"),
    )


@register(
    "scalar_url_parse",
    oracle="""
        SELECT doc_id,
               'https://' || lang || '.example.com/' || source || '/'
                   || CAST(doc_id AS VARCHAR) || '?q=' || lang
                   || '&n=' || CAST(n_chars AS VARCHAR) AS url,
               lang || '.example.com' AS host,
               '/' || source || '/' || CAST(doc_id AS VARCHAR) AS path,
               'q=' || lang || '&n=' || CAST(n_chars AS VARCHAR) AS query,
               CAST(n_chars AS VARCHAR) AS q_n,
               'https' AS protocol
        FROM documents
    """,
    doc=(
        "URL structure extraction with Spark's parse_url (HOST / PATH "
        "/ QUERY / named query parameter / PROTOCOL) — the standard "
        "first step of web-crawl curation (host-level dedup, source "
        "throttling, tracking-param stripping). The URLs are "
        "constructed from document columns, so the oracle states the "
        "ground truth componentwise instead of re-parsing — the test "
        "verifies the parser against what was actually assembled. "
        "parse_url is a codegen'd JVM expression: per-row, no shuffle, "
        "scales with the scan."
    ),
    tags=("scalar", "string", "text"),
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    url = (
        "concat('https://', lang, '.example.com/', source, '/', "
        "CAST(doc_id AS STRING), '?q=', lang, '&n=', CAST(n_chars AS STRING))"
    )
    return t.documents.select(
        "doc_id",
        F.expr(url).alias("url"),
        F.expr(f"parse_url({url}, 'HOST')").alias("host"),
        F.expr(f"parse_url({url}, 'PATH')").alias("path"),
        F.expr(f"parse_url({url}, 'QUERY')").alias("query"),
        F.expr(f"parse_url({url}, 'QUERY', 'n')").alias("q_n"),
        F.expr(f"parse_url({url}, 'PROTOCOL')").alias("protocol"),
    )


@register(
    "scalar_onehot_index_encode",
    oracle="""
        WITH freq AS (
            SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment
        ),
        idx AS (
            SELECT c_mktsegment,
                   CAST(row_number() OVER (ORDER BY n DESC, c_mktsegment) AS INT)
                     AS seg_index,
                   CAST(COUNT(*) OVER () AS INT) AS k
            FROM freq
        )
        SELECT c.c_custkey, c.c_mktsegment, i.seg_index,
               CAST(to_json(list_transform(range(1, k + 1),
                            j -> CASE WHEN j = seg_index THEN 1 ELSE 0 END))
                    AS VARCHAR) AS onehot
        FROM customer c JOIN idx i USING (c_mktsegment)
        WHERE c.c_custkey <= 50
    """,
    doc=(
        "Deterministic label indexing + one-hot encoding (the "
        "StringIndexer/OneHotEncoder pair as pure relational ops): "
        "category index = rank by (frequency DESC, value) — the "
        "frequency ordering ML pipelines use so index 1 is always the "
        "modal class — then a dense 0/1 vector built row-locally from "
        "the broadcast index. The index table is category-cardinality-"
        "sized; the fact scan does one broadcast join, zero shuffles. "
        "Wire format: the one-hot vector crosses the driver boundary "
        "as a to_json string (r6 verdict #1/#2 — raw array columns "
        "crash the driver's pandas canonicalizer)."
    ),
    tags=("scalar", "ml", "encode"),
)
def scalar_onehot_index_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    freq = t.customer.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    idx = freq.select(
        "c_mktsegment",
        F.row_number()
        .over(W.orderBy(F.desc("n"), "c_mktsegment"))
        .cast("int")
        .alias("seg_index"),
        F.count(F.lit(1)).over(W.partitionBy()).cast("int").alias("k"),
    )
    return (
        t.customer.filter(F.col("c_custkey") <= 50)
        .join(F.broadcast(idx), "c_mktsegment")
        .select(
            "c_custkey",
            "c_mktsegment",
            "seg_index",
            F.to_json(
                F.expr(
                    "transform(sequence(1, k), j -> CASE WHEN j = seg_index THEN 1 ELSE 0 END)"
                )
            ).alias("onehot"),
        )
    )


@register(
    "scalar_json_infer_flatten",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               json_valid(props) AS props_valid
        FROM events WHERE user_id <= 20
    """,
    doc=(
        "Semi-structured ingestion with schema DISCOVERY: the wire "
        "field's JSON schema is inferred by spark.read.json over a "
        "bounded sample (the driver-side metadata fetch every schema-"
        "on-read system performs), then the full scan parses with the "
        "inferred StructType via from_json and flattens every "
        "discovered field — no hand-written schema. Inference cost is "
        "sample-bounded; the scan itself is map-only. The flattened "
        "typed columns + validity flag are what lands in the silver "
        "table of a bronze/silver JSON pipeline."
    ),
    tags=("scalar", "json", "ingest"),
)
def scalar_json_infer_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("user_id") <= 20)
    # schema inference over a bounded NON-NULL sample (metadata-scale
    # driver work; a null-bearing sample crashes spark.read.json)
    sample = ev.select("props").filter(F.col("props").isNotNull()).limit(200)
    inferred = spark.read.json(
        sample.rdd.map(lambda r: r["props"]), multiLine=False
    ).schema
    parsed = ev.select(
        "event_id",
        F.from_json("props", inferred).alias("p"),
        (F.get_json_object("props", "$").isNotNull()).alias("props_valid"),
    )
    # fixed output contract (the oracle's column list): a schema-drifting
    # sample must not change the result schema — inference feeds the
    # parse, not the projection
    k = (
        F.col("p.k").cast("bigint")
        if "k" in inferred.fieldNames()
        else F.lit(None).cast("bigint")
    )
    return parsed.select("event_id", k.alias("k"), "props_valid")


@register(
    "scalar_variant_shred_props",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k,
               COALESCE(json_valid(props), FALSE) AS parsed
        FROM events
        WHERE user_id <= 20
    """,
    doc=(
        "Semi-structured shredding through the VARIANT type (Spark 4's "
        "first-class semi-structured column — the open-format answer "
        "to schema-on-read JSON strings): try_parse_json lands the "
        "wire field as VARIANT once, then typed-path extraction "
        "(try_variant_get '$.k' as BIGINT) shreds it without "
        "re-parsing per path — at N paths the string parses once, not "
        "N times, which is the entire cost story vs get_json_object "
        "chains at 100 TB. NULL/corrupt records shred to NULL with a "
        "parsed flag; the oracle is DuckDB's JSON path semantics, "
        "proving the variant path agrees with classic JSON extraction."
    ),
    tags=("scalar", "json", "variant", "spark4"),
)
def scalar_variant_shred_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.filter(F.col("user_id") <= 20).select(
        "event_id",
        F.expr("try_variant_get(try_parse_json(props), '$.k', 'bigint')").alias("k"),
        F.expr("try_parse_json(props) IS NOT NULL").alias("parsed"),
    )


@register(
    "scalar_collation_lcase_group",
    oracle="""
        WITH mixed AS (
            SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                        ELSE event_type END AS raw_type
            FROM events
        )
        SELECT lower(raw_type) AS event_type_ci,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT raw_type) AS BIGINT) AS n_raw_variants
        FROM mixed
        GROUP BY lower(raw_type)
    """,
    doc=(
        "Collation-aware grouping (Spark 4 COLLATE UTF8_LCASE): a "
        "deterministically case-mangled event_type column (UPPER on "
        "even event_ids) groups back together under the "
        "case-insensitive collation WITHOUT rewriting every "
        "expression through lower() — the engine carries the "
        "comparison semantics in the type. The projected key is "
        "lower(min-representative) so the output is representative-"
        "order independent; the oracle is the classic lower() "
        "rewrite, proving the collated GROUP BY partitions the rows "
        "identically. n_raw_variants = 2 per type pins that the mix "
        "actually exercised both cases (non-vacuous)."
    ),
    tags=("scalar", "string", "spark4"),
)
def scalar_collation_lcase_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    mixed = t.events.selectExpr(
        "CASE WHEN event_id % 2 = 0 THEN upper(event_type)"
        " ELSE event_type END AS raw_type"
    )
    return (
        mixed.selectExpr("raw_type", "raw_type COLLATE UTF8_LCASE AS type_ci")
        .groupBy("type_ci")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct(F.expr("raw_type COLLATE UTF8_BINARY"))
            .cast("bigint")
            .alias("n_raw_variants"),
        )
        .select(
            F.lower(F.col("type_ci").cast("string")).alias("event_type_ci"),
            "n",
            "n_raw_variants",
        )
    )


_GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GEOHASH_BITS = 15  # per axis -> 30 interleaved bits -> 6 base32 chars
_GEOHASH_CAP = 5000  # bounded output slice for the per-event encode


def _geohash_exprs() -> tuple[str, str, str]:
    """(u_lat, u_lon, interleaved) integer expressions shared by both
    engines; only integer *, DIV-style floor division, shifts, masks."""
    u_lat = f"(lat_centi + 9000) * {1 << _GEOHASH_BITS} {{div}} 18000"
    u_lon = f"(lon_centi + 18000) * {1 << _GEOHASH_BITS} {{div}} 36000"
    terms = []
    for k in range(_GEOHASH_BITS):
        terms.append(f"((u_lon >> {k}) & 1) * {1 << (2 * k + 1)}")
        terms.append(f"((u_lat >> {k}) & 1) * {1 << (2 * k)}")
    return u_lat, u_lon, " + ".join(terms)


def _geohash_chars(col: str) -> str:
    """6 base32 chars from the 30-bit interleave — identical substr
    arithmetic on both engines (1-based substring, alphabet literal)."""
    parts = [
        f"substring('{_GEOHASH_ALPHABET}', "
        f"CAST((({col} >> {25 - 5 * j}) & 31) + 1 AS INT), 1)"
        for j in range(6)
    ]
    return " || ".join(parts)


@register(
    "scalar_geohash_encode",
    oracle=f"""
        WITH coords AS (
            SELECT event_id,
                   ((user_id * 7919) % 18000
                     + (event_id % 21)) % 18000 - 9000 AS lat_centi,
                   ((user_id * 104729) % 36000
                     + (event_id % 17)) % 36000 - 18000 AS lon_centi
            FROM events WHERE event_id <= {_GEOHASH_CAP}
        ),
        u AS (
            SELECT event_id, lat_centi, lon_centi,
                   {_geohash_exprs()[0].format(div='//')} AS u_lat,
                   {_geohash_exprs()[1].format(div='//')} AS u_lon
            FROM coords
        ),
        v AS (
            SELECT event_id, lat_centi, lon_centi,
                   {_geohash_exprs()[2]} AS iv
            FROM u
        )
        SELECT event_id, lat_centi, lon_centi,
               {_geohash_chars('iv')} AS geohash6
        FROM v
    """,
    doc=(
        "Geohash encoding (precision 6, ~1.2 km cells) of the "
        "deterministic event coordinates (same derivation as "
        "geo_grid_hotspots): quantize each axis to 15 bits by exact "
        "integer floor division, interleave lon/lat bits (lon takes "
        "the even positions from the MSB — the geohash convention), "
        "and emit 6 base32 characters by substring arithmetic over "
        "the standard alphabet. Every step is integer multiply/"
        "shift/mask — no floats anywhere, so the string is bit-exact "
        "by construction on both engines. Geohashes are the "
        "PREFIX-JOINABLE spatial key: equality on a 4-char prefix is "
        "a ~39 km cell match, which turns radius-ish joins into "
        "equi-joins (the same trick the nearest-hub grid join uses "
        "with explicit cells). Row-local, zero shuffle, codegen."
    ),
    tags=("scalar", "geo"),
)
def scalar_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    u_lat, u_lon, inter = _geohash_exprs()
    coords = t.events.filter(F.col("event_id") <= _GEOHASH_CAP).select(
        "event_id",
        F.expr(
            "((user_id * 7919) % 18000 + (event_id % 21)) % 18000 - 9000"
        ).alias("lat_centi"),
        F.expr(
            "((user_id * 104729) % 36000 + (event_id % 17)) % 36000 - 18000"
        ).alias("lon_centi"),
    )
    u = coords.select(
        "event_id",
        "lat_centi",
        "lon_centi",
        F.expr(u_lat.format(div="DIV")).alias("u_lat"),
        F.expr(u_lon.format(div="DIV")).alias("u_lon"),
    )
    v = u.select("event_id", "lat_centi", "lon_centi", F.expr(inter).alias("iv"))
    return v.select(
        "event_id", "lat_centi", "lon_centi", F.expr(_geohash_chars("iv")).alias("geohash6")
    )


@register(
    "scalar_codec_digest_battery",
    oracle="""
        SELECT p_partkey,
               to_base64(encode(p_name)) AS b64,
               hex(encode(p_name)) AS hx,
               md5(p_name) AS md5_hex,
               sha256(p_name) AS sha256_hex,
               decode(from_base64(to_base64(encode(p_name)))) = p_name
                   AS b64_roundtrip_ok,
               decode(from_hex(hex(encode(p_name)))) = p_name
                   AS hex_roundtrip_ok
        FROM part WHERE p_partkey <= 200
        ORDER BY p_partkey
    """,
    doc=(
        "Encoding/digest scalar battery — base64, hex, md5, sha-256 "
        "plus decode round-trip proofs, the content-addressing surface "
        "a manifest/cache layer is built on (all JVM codegen, map-"
        "only). Cross-engine trap handled and documented: Spark's "
        "base64 is the Java MIME encoder (wraps at 76 chars with CRLF) "
        "while DuckDB never wraps — the battery strips CR LF on the "
        "Spark side, which is also what any content-addressed store "
        "must do before comparing digests of long payloads."
    ),
    tags=("scalar", "functions"),
)
def scalar_codec_digest_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.part.filter(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            F.expr(
                "replace(base64(encode(p_name, 'utf-8')),"
                " concat(char(13), char(10)), '')"
            ).alias("b64"),
            F.expr("hex(encode(p_name, 'utf-8'))").alias("hx"),
            F.expr("md5(p_name)").alias("md5_hex"),
            F.expr("sha2(p_name, 256)").alias("sha256_hex"),
            F.expr(
                "decode(unbase64(base64(encode(p_name, 'utf-8'))), 'utf-8') = p_name"
            ).alias("b64_roundtrip_ok"),
            F.expr(
                "decode(unhex(hex(encode(p_name, 'utf-8'))), 'utf-8') = p_name"
            ).alias("hex_roundtrip_ok"),
        )
        .orderBy("p_partkey")
    )


@register(
    "scalar_ipv4_parse_battery",
    oracle="""
        WITH ips AS (
            SELECT user_id,
                   (user_id * 2654435761) % 4294967296 AS ip_int
            FROM (SELECT DISTINCT user_id FROM events)
        ),
        rendered AS (
            SELECT user_id, ip_int,
                   CAST(ip_int // 16777216 AS VARCHAR) || '.'
                   || CAST((ip_int // 65536) % 256 AS VARCHAR) || '.'
                   || CAST((ip_int // 256) % 256 AS VARCHAR) || '.'
                   || CAST(ip_int % 256 AS VARCHAR) AS ip_str
            FROM ips
        ),
        parsed AS (
            SELECT user_id, ip_int, ip_str,
                   CAST(string_split(ip_str, '.')[1] AS BIGINT) AS o1,
                   CAST(string_split(ip_str, '.')[2] AS BIGINT) AS o2,
                   CAST(string_split(ip_str, '.')[3] AS BIGINT) AS o3,
                   CAST(string_split(ip_str, '.')[4] AS BIGINT) AS o4
            FROM rendered
        )
        SELECT o1 AS octet1,
               CAST(COUNT(*) AS BIGINT) AS n_ips,
               CAST(SUM(CASE WHEN o1 = 10
                             OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
                             OR (o1 = 192 AND o2 = 168)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_private,
               bool_and(o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 = ip_int)
                   AS roundtrip_ok,
               CAST(COUNT(DISTINCT o1 * 256 + o2) AS BIGINT) AS n_slash16
        FROM parsed
        GROUP BY o1
        ORDER BY o1
    """,
    doc=(
        "F27: IPv4 parse/render battery — the address plumbing every "
        "log pipeline needs: render a 32-bit address to dotted-quad, "
        "re-PARSE the string back to octets (a genuine string split + "
        "cast, not an echo), verify the integer round-trip per row "
        "(bool_and — one wrong octet order fails the whole group), "
        "classify RFC-1918 private ranges with exact integer "
        "comparisons, and roll up to /8 groups with distinct-/16 "
        "counts (the subnet cardinality a rate-limiter keys on). "
        "Addresses derive deterministically from user_id (Knuth "
        "multiplicative hash mod 2^32), so both engines see the same "
        "field; the rollup output is <= 256 rows."
    ),
    tags=("scalar", "dq"),
)
def scalar_ipv4_parse_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ips = (
        t.events.select("user_id")
        .distinct()
        .selectExpr(
            "user_id",
            "(user_id * 2654435761) % 4294967296 AS ip_int",
        )
    )
    rendered = ips.selectExpr(
        "user_id",
        "ip_int",
        "concat(CAST(ip_int DIV 16777216 AS STRING), '.',"
        " CAST((ip_int DIV 65536) % 256 AS STRING), '.',"
        " CAST((ip_int DIV 256) % 256 AS STRING), '.',"
        " CAST(ip_int % 256 AS STRING)) AS ip_str",
    )
    parsed = rendered.selectExpr(
        "user_id",
        "ip_int",
        "CAST(element_at(split(ip_str, '\\\\.'), 1) AS BIGINT) AS o1",
        "CAST(element_at(split(ip_str, '\\\\.'), 2) AS BIGINT) AS o2",
        "CAST(element_at(split(ip_str, '\\\\.'), 3) AS BIGINT) AS o3",
        "CAST(element_at(split(ip_str, '\\\\.'), 4) AS BIGINT) AS o4",
    )
    return (
        parsed.groupBy(F.col("o1").alias("octet1"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ips"),
            F.expr(
                "CAST(SUM(CASE WHEN o1 = 10"
                " OR (o1 = 172 AND o2 BETWEEN 16 AND 31)"
                " OR (o1 = 192 AND o2 = 168) THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_private"),
            F.expr(
                "bool_and(o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 = ip_int)"
            ).alias("roundtrip_ok"),
            F.expr("CAST(COUNT(DISTINCT o1 * 256 + o2) AS BIGINT)").alias(
                "n_slash16"
            ),
        )
        .orderBy("octet1")
    )


#: synthesized UA templates (family derived from user_id % 5) — the
#: version fields are arithmetic in user_id so the oracle can PREDICT
#: what the parse must re-read
_UA_SPARK = """
    CASE user_id % 5
      WHEN 0 THEN concat('Mozilla/5.0 (Windows NT 10.0; Win64; x64)',
                         ' AppleWebKit/537.36 (KHTML, like Gecko) Chrome/',
                         CAST(100 + user_id % 30 AS STRING),
                         '.0.0.0 Safari/537.36')
      WHEN 1 THEN concat('Mozilla/5.0 (X11; Linux x86_64; rv:',
                         CAST(90 + user_id % 40 AS STRING),
                         '.0) Gecko/20100101 Firefox/',
                         CAST(90 + user_id % 40 AS STRING), '.0')
      WHEN 2 THEN concat('Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7)',
                         ' AppleWebKit/605.1.15 (KHTML, like Gecko) Version/',
                         CAST(14 + user_id % 4 AS STRING),
                         '.0 Safari/605.1.15')
      WHEN 3 THEN concat('Mozilla/5.0 (Windows NT 10.0; Win64; x64)',
                         ' AppleWebKit/537.36 (KHTML, like Gecko) Chrome/',
                         CAST(100 + user_id % 20 AS STRING),
                         '.0.0.0 Safari/537.36 Edg/',
                         CAST(100 + user_id % 20 AS STRING), '.0.0.0')
      ELSE concat('curl/8.', CAST(user_id % 10 AS STRING), '.0')
    END
"""


@register(
    "scalar_user_agent_parse",
    oracle="""
        WITH ua AS (
            SELECT user_id,
                   CASE user_id % 5
                     WHEN 0 THEN 'Chrome' WHEN 1 THEN 'Firefox'
                     WHEN 2 THEN 'Safari' WHEN 3 THEN 'Edge'
                     ELSE 'curl' END AS family,
                   CASE user_id % 5
                     WHEN 0 THEN 'Windows' WHEN 1 THEN 'Linux'
                     WHEN 2 THEN 'macOS' WHEN 3 THEN 'Windows'
                     ELSE 'other' END AS os,
                   CASE user_id % 5
                     WHEN 0 THEN 100 + user_id % 30
                     WHEN 1 THEN 90 + user_id % 40
                     WHEN 2 THEN 14 + user_id % 4
                     WHEN 3 THEN 100 + user_id % 20
                     ELSE 8 END AS major,
                   user_id % 5 = 4 AS is_tool
            FROM events
        )
        SELECT family, os,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(MIN(major) AS BIGINT) AS min_major,
               CAST(MAX(major) AS BIGINT) AS max_major,
               bool_and(is_tool) AS all_tool_traffic
        FROM ua
        GROUP BY family, os
        ORDER BY family, os
    """,
    doc=(
        "F28: User-Agent parse battery — the log-enrichment string "
        "work every web pipeline runs first. UA strings are "
        "synthesized from versioned templates (family keyed on "
        "user_id), then genuinely RE-PARSED with the precedence rules "
        "that make UA parsing a classic trap: Edg/ must match before "
        "Chrome/ (Edge embeds the Chrome token), Version/+Safari "
        "identifies Safari (Chrome also carries a Safari token), and "
        "a missing Mozilla/ prefix flags tool traffic. Family, major "
        "version (regexp digit extract + cast) and OS (token "
        "membership) roll up per (family, os) with distinct users and "
        "version ranges — exact integers; the oracle predicts every "
        "value from the synthesis arithmetic, so a precedence mistake "
        "(Chrome swallowing Edge) breaks the hash. Map-only."
    ),
    tags=("scalar", "dq"),
)
def scalar_user_agent_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ua = t.events.selectExpr("user_id", f"({_UA_SPARK}) AS ua")
    parsed = ua.selectExpr(
        "user_id",
        """CASE
             WHEN ua LIKE '%Edg/%' THEN 'Edge'
             WHEN ua LIKE '%Chrome/%' THEN 'Chrome'
             WHEN ua LIKE '%Firefox/%' THEN 'Firefox'
             WHEN ua LIKE '%Version/%' AND ua LIKE '%Safari/%' THEN 'Safari'
             WHEN ua NOT LIKE 'Mozilla/%' THEN 'curl'
             ELSE 'other'
           END AS family""",
        """CASE
             WHEN ua LIKE '%Windows NT%' THEN 'Windows'
             WHEN ua LIKE '%Mac OS X%' THEN 'macOS'
             WHEN ua LIKE '%X11; Linux%' THEN 'Linux'
             ELSE 'other'
           END AS os""",
        """CAST(CASE
             WHEN ua LIKE '%Edg/%'
               THEN regexp_extract(ua, 'Edg/([0-9]+)', 1)
             WHEN ua LIKE '%Chrome/%'
               THEN regexp_extract(ua, 'Chrome/([0-9]+)', 1)
             WHEN ua LIKE '%Firefox/%'
               THEN regexp_extract(ua, 'Firefox/([0-9]+)', 1)
             WHEN ua LIKE '%Version/%'
               THEN regexp_extract(ua, 'Version/([0-9]+)', 1)
             ELSE regexp_extract(ua, '^[a-z]+/([0-9]+)', 1)
           END AS BIGINT) AS major""",
        "ua NOT LIKE 'Mozilla/%' AS is_tool",
    )
    return (
        parsed.groupBy("family", "os")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.min("major").cast("bigint").alias("min_major"),
            F.max("major").cast("bigint").alias("max_major"),
            F.expr("bool_and(is_tool)").alias("all_tool_traffic"),
        )
        .orderBy("family", "os")
    )


# --- RFC 4648 base32 (the content-address alphabet) ------------------------

_B32_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
_B32_LIMIT = 400


def _b32_encode_char(i: int, nib: "callable", idiv: str = "div") -> str:
    """base32 char i (0-based) of a 16-byte digest given a nibble
    emitter: 5-bit group [5i, 5i+5) read from a 12-bit window of three
    nibbles — all indices LITERAL (unrolled, no lambdas). ``idiv`` is
    the engine's integer-division token (Spark div, DuckDB //)."""
    b = 5 * i
    n0, r = b // 4, b % 4
    v = " + ".join(
        f"{16 ** (2 - k)} * ({nib(n0 + k)})" if n0 + k < 32 else "0"
        for k in range(3)
    )
    return f"substr('{_B32_ALPHA}', CAST((({v}) {idiv} {1 << (7 - r)}) % 32 AS INT) + 1, 1)"


def _b32_decode_byte(k: int, cval: "callable", idiv: str = "div") -> str:
    """decoded byte k (0..15) from the 26 base32 chars: 8-bit group
    [8k, 8k+8) read from a 15-bit window of three char values."""
    b = 8 * k
    c0, r = b // 5, b % 5
    v = " + ".join(
        f"{32 ** (2 - j)} * ({cval(c0 + j)})" if c0 + j < 26 else "0"
        for j in range(3)
    )
    return f"(({v}) {idiv} {1 << (7 - r)}) % 256"


@register(
    "scalar_base32_rfc4648",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, md5(text) AS dig FROM documents
            WHERE doc_id < {_B32_LIMIT}
        ),
        enc AS (
            SELECT doc_id, dig,
                   {" || ".join(
                       _b32_encode_char(i, lambda n: f"strpos('0123456789abcdef', substr(dig, {n} + 1, 1)) - 1", idiv="//")
                       for i in range(26))}
                   AS b32core
            FROM d
        )
        SELECT doc_id, dig AS digest_hex,
               b32core || '======' AS b32,
               CAST(length(b32core || '======') AS BIGINT) AS b32_len,
               TRUE AS pad_ok,
               {" || ".join(
                   "lpad(lower(hex(" + _b32_decode_byte(
                       k, lambda c: f"strpos('{_B32_ALPHA}', substr(b32core, {c} + 1, 1)) - 1", idiv="//")
                   + ")), 2, '0')" for k in range(16))}
                   = dig AS decode_roundtrip_ok
        FROM enc ORDER BY doc_id
    """,
    doc=(
        "RFC 4648 base32 codec over the 16-byte md5 digest — the "
        "content-address alphabet (A-Z2-7) used by casket/CID-style "
        "object names, onion addresses, and TOTP secrets. Both the "
        "ENCODE (26 five-bit groups read from literal-index 12-bit "
        "nibble windows) and a genuine DECODE round-trip (16 bytes "
        "re-extracted from literal-index 15-bit character windows, "
        "compared to the original digest) run as fully unrolled "
        "scalar integer arithmetic — no lambdas, no UDFs, identical "
        "semantics in both engines by construction; the encoder is "
        "additionally pinned against Python's base64.b32encode in "
        "tests. The 16 mod 5 = 1 tail takes the RFC's six-char '=' "
        "padding. Map-only, zero shuffle."
    ),
    tags=("scalar", "codec"),
)
def scalar_base32_rfc4648(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    d = t.documents.filter(F.col("doc_id") < _B32_LIMIT).selectExpr(
        "doc_id", "md5(text) AS dig"
    )
    enc = d.selectExpr(
        "doc_id",
        "dig",
        "concat("
        + ", ".join(
            _b32_encode_char(
                i, lambda n: f"conv(substr(dig, {n} + 1, 1), 16, 10)"
            )
            for i in range(26)
        )
        + ") AS b32core",
    )
    dec = ", ".join(
        "lpad(lower(hex("
        + _b32_decode_byte(
            k, lambda c: f"instr('{_B32_ALPHA}', substr(b32core, {c} + 1, 1)) - 1"
        )
        + ")), 2, '0')"
        for k in range(16)
    )
    return enc.selectExpr(
        "doc_id",
        "dig AS digest_hex",
        "concat(b32core, '======') AS b32",
        "CAST(length(concat(b32core, '======')) AS BIGINT) AS b32_len",
        "endswith(concat(b32core, '======'), '======') AS pad_ok",
        f"concat({dec}) = dig AS decode_roundtrip_ok",
    ).orderBy("doc_id")
