"""Streaming pipeline surface (S1/S2/S9, W1/W2/W3/W6/W7).

Reference mapping:
* S1/W1: the generator's fixed-interval micro-batch loop
  (iot-data-stream.py:369-391) → a rate source +
  ``trigger(processingTime=...)``; bounded runs → ``availableNow``.
* S9 [inferred]: Kinesis record → Lambda JSON-decode → DynamoDB put
  (README.md:2, iot-data-stream.py:279) → ``from_json(value, schema)``
  → ``writeStream.format("parquet")`` with a checkpoint — exactly-once
  to the landed table, replacing three AWS services.
* W2: Kinesis partition key = device_id (iot-data-stream.py:281) → the
  shuffle implied by any keyed stateful/grouped operation.
* W3/W7: irregular arrival (2% dropped reports, :253-255) + lateness →
  ``withWatermark`` bounding state.
* W6: tumbling/sliding/session windows over event time — the batch
  twins are oracle-verified in operators/windows.py; these run the same
  expressions under the streaming engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: wire schema of the landed event record (the driver's events table)
EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def rate_reading_stream(spark: SparkSession, rows_per_second: int = 10, n_devices: int = 10) -> DataFrame:
    """S1: unbounded synthetic reading stream off the rate source.

    Each rate row becomes one (device, tick) emission with the same
    hash-uniform deterministic columns as the batch generator — the
    stateless part of the pipeline; the drift walk is the stateful op
    (streaming/stateful.py).
    """
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    device_num = F.pmod(F.col("value"), F.lit(n_devices))
    return rate.select(
        F.col("timestamp").alias("ts"),
        (F.col("value") / n_devices).cast("long").alias("tick"),
        F.concat(F.lit("device_"), F.substring(F.md5(device_num.cast("string")), 1, 8)).alias(
            "device_id"
        ),
    )


def json_wire_stream(spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """S9 ingest: JSON-lines wire records → typed columns via from_json.

    The Lambda equivalent: schema-on-read with null-for-corrupt fields
    (the reference dashboard's tolerance, iot_dashboard.py:33-36).
    """
    reader = spark.readStream.schema(StructType([StructField("value", StringType())]))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.text(src_dir)
    return raw.select(F.from_json("value", EVENT_SCHEMA).alias("r")).select("r.*")


def socket_wire_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S6/S9 over a real TCP wire: JSON-lines records read from a
    socket source and parsed schema-on-read — the closest in-sandbox
    analog of a Kinesis/Kafka consumer (no broker ships in this
    container; the socket source exercises the same unreplayable-wire
    ingest contract: schema projection, corrupt-record tolerance,
    arrival-order processing). NOT for production fault tolerance —
    a socket has no offsets to replay; the landed-file path
    (json_wire_stream + checkpoint) is the exactly-once story."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return raw.select(F.from_json("value", EVENT_SCHEMA).alias("r")).select("r.*")


def land_parquet(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: str | None = None,
) -> DataStreamWriter:
    """S9 landing: exactly-once parquet sink with checkpointed progress.

    Replaces the DynamoDB table; ``partition_by`` gives the
    partition-pruned layout (§3.3 recommends location/device keys).
    """
    w = stream.writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint
    )
    if partition_by:
        w = w.partitionBy(partition_by)
    return w


def tumbling_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "30 minutes") -> DataFrame:
    """W6/W7: watermarked tumbling-window aggregation — the streaming twin
    of tumbling_window_agg (operators/windows.py)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(value AS DECIMAL(38,8))")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def foreach_batch_upsert(
    stream: DataFrame, snapshot_dir: str, checkpoint_dir: str, key: str = "event_id"
) -> DataStreamWriter:
    """Streaming CDC: merge each micro-batch into a parquet snapshot.

    ``foreachBatch`` is the streaming escape hatch for sinks Structured
    Streaming cannot express declaratively — here a MERGE-INTO emulation
    (full-outer join on the key, update-wins coalesce). Semantics:

    * batches are deduplicated per key before merging (latest-wins is
      source-order-dependent; provide a pre-sorted stream if it matters)
      and NULL-key rows are dropped — a NULL key has no merge identity;
    * schema drift is tolerated both ways: batch-new columns appear
      NULL-filled for old snapshot rows, snapshot-only columns survive
      untouched;
    * the snapshot swap is staged (write -> _SUCCESS-complete staging ->
      rename out -> rename in) with crash recovery at the next batch, so
      no crash window loses the snapshot; together with the checkpoint
      this makes replays idempotent.

    At 100 TB the swap targets a table format (Delta/Iceberg) or a
    partition-scoped overwrite; the merge plan itself — batch joined
    against the keyed snapshot — is unchanged.
    """

    def _merge(batch: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        spark = batch.sparkSession
        staging = snapshot_dir.rstrip("/") + ".staging"
        backup = snapshot_dir.rstrip("/") + ".old"

        def _complete(d: str) -> bool:
            return os.path.exists(os.path.join(d, "_SUCCESS"))

        # crash recovery: finish or roll back a half-done swap, then clean
        if not os.path.exists(snapshot_dir):
            if _complete(staging):
                os.rename(staging, snapshot_dir)
            elif os.path.exists(backup):
                os.rename(backup, snapshot_dir)
        for d in (staging, backup):
            if os.path.exists(d):
                shutil.rmtree(d)

        batch = batch.filter(F.col(key).isNotNull()).dropDuplicates([key])
        cols = batch.columns
        upd = batch.select([F.col(c).alias(f"u_{c}") for c in cols])
        if os.path.exists(snapshot_dir):
            base = spark.read.parquet(snapshot_dir)
        else:
            base = spark.createDataFrame([], batch.schema)
        types = dict(batch.dtypes)
        for c in cols:
            if c not in base.columns:
                base = base.withColumn(c, F.lit(None).cast(types[c]))
        out_cols = base.columns
        merged = base.join(upd, base[key] == upd[f"u_{key}"], "full_outer").select(
            *[
                (F.coalesce(f"u_{c}", c) if c in cols else F.col(c)).alias(c)
                for c in out_cols
            ]
        )
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(snapshot_dir):
            os.rename(snapshot_dir, backup)
        os.rename(staging, snapshot_dir)
        if os.path.exists(backup):
            shutil.rmtree(backup)

    return stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )


def merge_partial_aggregates(
    batch: DataFrame,
    snapshot_dir: str,
    batch_id: int,
    group_key: str = "o_orderstatus",
    sum_col: str = "o_totalprice",
) -> None:
    """Merge one micro-batch's partial aggregates into a standing MV.

    The batch is reduced to per-key partial states (count + decimal
    sum), then merged into the snapshot by full-outer join and state
    addition — the streaming twin of ``cdc_incremental_mv_refresh``.
    Unlike a row-level upsert, aggregate merging is NOT naturally
    idempotent (re-adding a replayed batch double-counts), so the
    snapshot carries the last applied batch_id in a ``_batch_id``
    marker that travels through the same staged swap as the data:
    a replayed batch_id <= the marker is a no-op. Crash recovery
    mirrors foreach_batch_upsert (finish or roll back a half-done
    swap before touching anything).
    """
    import os
    import shutil

    spark = batch.sparkSession
    staging = snapshot_dir.rstrip("/") + ".staging"
    backup = snapshot_dir.rstrip("/") + ".old"

    def _complete(d: str) -> bool:
        return os.path.exists(os.path.join(d, "_SUCCESS"))

    if not os.path.exists(snapshot_dir):
        if _complete(staging):
            os.rename(staging, snapshot_dir)
        elif os.path.exists(backup):
            os.rename(backup, snapshot_dir)
    for d in (staging, backup):
        if os.path.exists(d):
            shutil.rmtree(d)

    marker = os.path.join(snapshot_dir, "_batch_id")
    if os.path.exists(marker):
        with open(marker) as f:
            if batch_id <= int(f.read().strip()):
                return  # replayed batch: already folded into the MV

    # accumulate in DECIMAL: double sums are partition/batch-order-
    # dependent, which would make the MV diverge from a recompute
    partial = batch.groupBy(group_key).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(sum_col).cast("decimal(38,8)")).alias("sum_val"),
    )
    if os.path.exists(snapshot_dir):
        base = spark.read.parquet(snapshot_dir)
    else:
        base = spark.createDataFrame([], partial.schema)
    b = base.select(
        F.col(group_key).alias("b_key"),
        F.col("n_rows").alias("b_n"),
        F.col("sum_val").alias("b_s"),
    )
    p = partial.select(
        F.col(group_key).alias("p_key"),
        F.col("n_rows").alias("p_n"),
        F.col("sum_val").alias("p_s"),
    )
    sum_type = dict(partial.dtypes)["sum_val"]
    zero = F.lit(0).cast(sum_type)
    merged = b.join(p, b["b_key"] == p["p_key"], "full_outer").select(
        F.coalesce("b_key", "p_key").alias(group_key),
        (F.coalesce("b_n", F.lit(0)) + F.coalesce("p_n", F.lit(0))).alias("n_rows"),
        (F.coalesce("b_s", zero) + F.coalesce("p_s", zero)).alias("sum_val"),
    )
    merged.write.mode("overwrite").parquet(staging)
    with open(os.path.join(staging, "_batch_id"), "w") as f:
        f.write(str(batch_id))
    if os.path.exists(snapshot_dir):
        os.rename(snapshot_dir, backup)
    os.rename(staging, snapshot_dir)
    if os.path.exists(backup):
        shutil.rmtree(backup)


def foreach_batch_mv_merge(
    stream: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    group_key: str = "o_orderstatus",
    sum_col: str = "o_totalprice",
) -> "DataStreamWriter":
    """Streaming materialized-view maintenance via foreachBatch.

    Each micro-batch folds into the aggregate snapshot by partial-state
    merge (see merge_partial_aggregates) — the MV stays group-
    cardinality-sized however much data streams through, and decimal
    accumulation keeps it exactly equal to a from-scratch recompute."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        merge_partial_aggregates(batch, snapshot_dir, batch_id, group_key, sum_col)

    return stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
