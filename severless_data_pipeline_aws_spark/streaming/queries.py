"""Driver-verifiable streaming queries.

The driver contract collects batch DataFrames, so each entry here runs
a bounded streaming query (``availableNow`` over a file source) to a
memory sink and returns the materialized result. That makes the
streaming engine itself part of the correctness gate:

* ``streaming_tumbling_window_agg`` — the W6 streaming twin, verified
  against the SAME DuckDB oracle as the batch version (exact hash).
* ``streaming_stateful_drift`` — W4 stateful walk output (rows-only;
  its exactness vs the imperative replay is pinned in
  tests/test_streaming.py).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, table_path
from ..registry import register
from . import stateful



def _replay_events_stream(spark: SparkSession, sf_dir: str, df=None) -> DataFrame:
    """Stage the events table (or ``df`` derived from it) into a temp
    DIRECTORY and open it as a bounded file stream with the nanos->micros
    ts conversion applied — the ONE copy of the replay preamble (file
    streams monitor directories; the test table is a single parquet file;
    at scale the landed table already is a directory, see
    pipeline.land_parquet)."""
    events = df if df is not None else spark.read.parquet(table_path(sf_dir, "events"))
    src = tempfile.mkdtemp(prefix="events_stream_")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    # ts arrives as epoch-nanos bigint when the source parquet stored
    # TIMESTAMP(NANOS) (read under nanosAsLong), or as TIMESTAMP_NTZ for
    # timestamp[us] sources; watermarks need session-zoned TIMESTAMP.
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return stream_df.sparkSession.table(name)


@register(
    "streaming_tumbling_window_agg",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS total_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
    """,
    doc=(
        "W6 under the STREAMING engine: events parquet replayed as a "
        "bounded stream (availableNow), watermarked tumbling window, "
        "complete-mode memory sink — hash-matches the same oracle as the "
        "batch twin, proving engine-equivalence."
    ),
    tags=("streaming", "window"),
)
def streaming_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _replay_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(value AS DECIMAL(38,8))")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    return _run_to_memory(agg, "complete")


@register(
    "streaming_session_window_agg",
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                             OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events WHERE user_id <= 20
        ),
        sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, sid
    """,
    doc=(
        "W6 sessions under the STREAMING engine: F.session_window with a "
        "watermark over the replayed events stream, complete mode — "
        "hash-matches the batch sessionization oracle (gap semantics "
        "identical across engines)."
    ),
    tags=("streaming", "window", "session"),
)
def streaming_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _replay_events_stream(spark, sf_dir).filter(F.col("user_id") <= 20)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete")


@register(
    "streaming_stateful_drift",
    oracle=None,  # W4 custom state op; exact replay-equivalence in tests/test_streaming.py
    doc=(
        "W4 under the STREAMING engine: deterministic drift steps for 6 "
        "devices x 2 sensors x 40 ticks streamed through "
        "applyInPandasWithState (per-key GroupState carrying the last "
        "value), availableNow, memory sink."
    ),
    tags=("streaming", "stateful"),
)
def streaming_stateful_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    rows = []
    for d in range(6):
        dev = f"device_{d}"
        for s, (lo, hi, prec, df_) in {
            "temperature": (-10.0, 45.0, 1, 0.1),
            "battery_level": (0.0, 100.0, 0, 0.5),
        }.items():
            for t in range(1, 41):
                h = int(hashlib.md5(f"{dev}|{s}|{t}".encode()).hexdigest()[:8], 16)
                u = h / 0xFFFFFFFF
                drift = (u * 2 - 1) * df_
                if s == "battery_level":
                    drift = -abs(drift)
                rows.append((dev, s, t, drift, lo, hi, 20.0 if s == "temperature" else 90.0, prec))
    steps = spark.createDataFrame(rows, schema=stateful.STEP_SCHEMA)

    src = tempfile.mkdtemp(prefix="drift_steps_")
    steps.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(stateful.STEP_SCHEMA).parquet(src)
    return _run_to_memory(stateful.drift_walk(stream), "append")


@register(
    "streaming_dedup_within_watermark",
    oracle="""
        SELECT event_type, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
    """,
    doc=(
        "Streaming exact dedup: the events table is replayed with 10% of "
        "its rows duplicated, and dropDuplicatesWithinWatermark(event_id) "
        "under a generous watermark removes them in-flight (keyed state, "
        "expired by event-time — bounded memory at 100 TB/day rates). The "
        "post-dedup aggregate hash-matches the UN-duplicated batch oracle, "
        "which is only possible if every injected duplicate was dropped."
    ),
    tags=("streaming", "dedup"),
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(table_path(sf_dir, "events"))
    dup = events.filter(F.expr("event_id % 10 = 0"))
    stream = (
        _replay_events_stream(spark, sf_dir, df=events.unionAll(dup))
        .withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    deduped = _run_to_memory(stream, "append")
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(value AS DECIMAL(38,8))")).cast("double").alias("total_value"),
    )


@register(
    "streaming_sliding_window_agg",
    oracle="""
        WITH offsets AS (SELECT 0 AS off UNION ALL SELECT 30),
        slid AS (
            SELECT date_trunc('hour', ts - to_minutes(off)) + to_minutes(off) AS window_start,
                   value
            FROM events CROSS JOIN offsets
        )
        SELECT window_start, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS total_value
        FROM slid GROUP BY window_start
    """,
    doc=(
        "W6 (sliding) under the STREAMING engine: 1h windows sliding "
        "every 30min over the replayed event stream — each row feeds 2 "
        "window states, watermark bounds how long each stays open. "
        "Hash-matches the batch twin's oracle (sliding_window_agg), "
        "completing engine-equivalence across all three time-window "
        "kinds (tumbling / sliding / session)."
    ),
    tags=("streaming", "window"),
)
def streaming_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _replay_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(value AS DECIMAL(38,8))")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )
    return _run_to_memory(agg, "complete")


@register(
    "streaming_zscore_anomaly",
    oracle=None,  # stateful float recursion; replay-equivalence in tests/test_streaming.py
    doc=(
        "Second custom stateful operator: prequential running z-score "
        "per event_type via applyInPandasWithState — each event scored "
        "against the Welford statistics of everything before it (3 "
        "doubles of state per key, O(1) however much data streams "
        "through), then folded in. Events replayed as a bounded file "
        "stream; append mode. Exact equivalence with the imperative "
        "batch replay asserted in pytest."
    ),
    tags=("streaming", "stateful", "anomaly"),
)
def streaming_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _replay_events_stream(spark, sf_dir).select(
        "event_type", "event_id", "ts", "value"
    )
    return _run_to_memory(stateful.zscore_walk(stream), "append")


@register(
    "streaming_alert_debounce",
    oracle=None,  # edge emission depends on carried state; batch-twin
    # equivalence asserted in tests/test_streaming.py
    doc=(
        "Third custom stateful operator: alert debounce under the "
        "streaming engine — ONE BIT of state per user "
        "(applyInPandasWithState) suppresses repeat alerts, emitting "
        "only raised/cleared threshold crossings. The batch twin "
        "(window_alert_debounce, oracled) computes the same edges with "
        "a lag window; pytest asserts stream == batch row sets, "
        "proving the state carry is exactly the lag."
    ),
    tags=("streaming", "stateful", "anomaly"),
)
def streaming_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _replay_events_stream(spark, sf_dir).select(
        "user_id", "event_id", "ts", "value"
    )
    return _run_to_memory(stateful.alert_edge_walk(stream), "append")


@register(
    "streaming_rate_limit_tokens",
    oracle=None,  # decision depends on carried bucket state; replay
    # equivalence asserted in tests/test_streaming.py
    doc=(
        "Fourth custom stateful operator: per-source token-bucket rate "
        "limiting (applyInPandasWithState) — burst capacity 3, refill "
        "1/day, TWO INTEGERS of state per key (micro-tokens + last "
        "event micros) deciding allow/throttle for every event. The "
        "ingest back-pressure / per-feed quota primitive of a crawl "
        "pipeline. All-integer arithmetic makes the decision sequence "
        "bit-reproducible; pytest asserts stream == imperative replay "
        "and that both decisions occur on the test data."
    ),
    tags=("streaming", "stateful", "quality"),
)
def streaming_rate_limit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _replay_events_stream(spark, sf_dir).select(
        "event_type", "event_id", "ts"
    )
    return _run_to_memory(stateful.rate_limit_walk(stream), "append")


@register(
    "streaming_holt_forecast",
    oracle=None,  # sequential float recursion; replay-equivalence in tests
    doc=(
        "Fifth custom stateful operator: Holt double-exponential "
        "(level + trend) smoothing per event_type via "
        "applyInPandasWithState — the online forecaster with O(1) "
        "state (two doubles + a counter per key). Prequential output: "
        "each row carries the forecast made BEFORE observing it, so "
        "the error stream is honest out-of-sample error. Exact "
        "equivalence with the imperative batch replay asserted in "
        "pytest, the same contract as the EWMA/z-score/drift family."
    ),
    tags=("streaming", "stateful", "forecast"),
)
def streaming_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _replay_events_stream(spark, sf_dir).select(
        "event_type", "event_id", "ts", "value"
    )
    return _run_to_memory(stateful.holt_walk(stream), "append")


def _replay_events_stream_phased(
    spark: SparkSession, sf_dir: str, n_phases: int = 3
) -> DataFrame:
    """Replay events as MULTIPLE micro-batches in event-time order: the
    table splits into ts-ordered phase files read one per trigger
    (maxFilesPerTrigger=1), so the watermark genuinely ADVANCES between
    batches — required to exercise event-time timeouts. A final far-
    future flush row (user_id = -1) drives the watermark past every
    real session so timeout emission completes within availableNow."""
    import time as _time

    events = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="events_phased_")
    bounds = list(
        events.selectExpr(
            *(
                f"percentile_disc({i / n_phases}) WITHIN GROUP "
                f"(ORDER BY unix_micros(ts)) AS p{i}"
                for i in range(1, n_phases)
            )
        ).first()
    )
    lo = None
    for i in range(n_phases):
        hi = bounds[i] if i < len(bounds) else None
        part = events
        if lo is not None:
            part = part.filter(F.expr("unix_micros(ts)") > F.lit(lo))
        if hi is not None:
            part = part.filter(F.expr("unix_micros(ts)") <= F.lit(hi))
        part.coalesce(1).write.parquet(f"{src}/phase={i:02d}")
        lo = hi
        _time.sleep(0.05)  # distinct mtimes pin the file -> batch order
    # TWO flush phases: the first advances the watermark past every real
    # deadline; the second is a data-bearing batch under that advanced
    # watermark, in which Spark reliably fires the pending event-time
    # timeouts (a trailing no-data batch is not guaranteed under
    # availableNow — observed: tail sessions stayed unemitted at sf0.01)
    # anchor the flush rows on the REAL table max (a limit(1) row's ts
    # would be arbitrary: on data spanning more than the day offset the
    # watermark would never pass tail session deadlines and timeout
    # emission would silently drop sessions)
    max_ts = events.agg(F.max("ts").alias("m")).first()["m"]
    for j, days in enumerate((30, 60)):
        flush = spark.range(1).selectExpr(
            f"CAST(-{j + 1} AS BIGINT) AS event_id",
            f"timestampadd(DAY, {days}, TIMESTAMP '{max_ts}') AS ts",
            "CAST(-1 AS BIGINT) AS user_id",
            "'flush' AS event_type",
            "CAST(NULL AS DOUBLE) AS value",
            "CAST(NULL AS STRING) AS props",
        ).select("event_id", "ts", "user_id", "event_type", "value", "props")
        flush.coalesce(1).write.parquet(f"{src}/phase={n_phases + j:02d}")
        _time.sleep(0.05)
    return (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/phase=*")
    )


@register(
    "streaming_session_emit_on_timeout",
    oracle=None,  # timeout-driven emission; equals-batch-twin in pytest
    doc=(
        "Sixth custom stateful operator: event-time sessionization "
        "whose sessions EMIT when the watermark passes session end + "
        "30 min (GroupStateTimeout.EventTimeTimeout) — mid-stream "
        "emission, the semantics a live dashboard needs, not end-of-"
        "query flushing. The replay stages the events table as ts-"
        "ordered phase files (one per micro-batch) so the watermark "
        "genuinely advances and timeouts actually fire; a far-future "
        "flush row closes the tail. pytest proves the emitted session "
        "set identical to the batch lag + running-sum sessionization."
    ),
    tags=("streaming", "stateful", "session"),
)
def streaming_session_emit_on_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _replay_events_stream_phased(spark, sf_dir).select(
        "user_id", "event_id", "ts"
    )
    out = _run_to_memory(stateful.session_walk(stream), "append")
    return out.filter(F.col("user_id") >= 0)

