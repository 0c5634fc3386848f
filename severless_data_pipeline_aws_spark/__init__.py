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
    operators/    Relational core, windows, dedup, similarity, text.
    functions/    Scalar function battery (reference F1-F14 equivalents).
    sources/      Synthetic IoT generator (batch + streaming), readers.
    streaming/    Structured Streaming parity: stateful ops, windows,
                  ingest pipeline (Kinesis/Lambda/DynamoDB re-expressed
                  as readStream -> from_json -> parquet landing).
    plans/        Plan-inspection helpers (pushdown / broadcast asserts).
"""

__version__ = "0.1.0"
