"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline ``abixb/severless-data-pipeline-AWS``
(IoT stream generator + dashboard analytics), rebuilt Spark-first.

Layout:
    session.py    SparkSession factory tuned for local[N] testing and
                  cluster-scale defaults (AQE, Arrow, shuffle sizing).
    io.py         Table loading / view registration over the driver's
                  parquet test tables; generic sources & sinks.
    registry.py   Named-query registry: each operator from SURVEY.md §2
                  registers a (spark_fn, oracle_sql) pair consumed by
                  __spark_entry__.py and the correctness tests.
    operators/    Relational core (relational/joins/aggregates/windows/
                  setops), dashboard + nested data, anomaly detection,
                  and the LLM-pipeline set: dedup, similarity, text,
                  sketches, multimodal.
    functions/    Scalar function battery (reference F1-F14 equivalents)
                  and the pandas UDF surface (scalar / grouped-agg /
                  grouped-map).
    sources/      Synthetic IoT generator (batch) and sinks: console,
                  JSON, CSV-with-flatten, keyed, bucketed writer.
    streaming/    Structured Streaming parity: ingest (readStream ->
                  from_json -> checkpointed parquet landing), watermarked
                  windows, applyInPandasWithState drift (W4), and
                  driver-verifiable bounded streaming queries.
    plans/        Plan-inspection helpers (pushdown / pruning / broadcast
                  / top-k / shuffle-count asserts).
"""

__version__ = "0.2.0"
