"""Table loading over the driver's parquet test tables + generic sources.

The reference's storage layer was DynamoDB scanned into pandas
(``iot_dashboard.py:46-86``); here the landed layer is columnar parquet
read by Spark with predicate pushdown and column pruning — the scan cap
(``Limit``) becomes ``df.limit(n)`` planned as CollectLimit/LocalLimit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimensions small enough to broadcast at ANY scale factor (bounded cardinality)
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _nanos_timestamp_cols(path: str) -> frozenset[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) (footer read, cached)."""
    try:
        cached = _nanos_timestamp_cols._cache  # type: ignore[attr-defined]
    except AttributeError:
        cached = _nanos_timestamp_cols._cache = {}  # type: ignore[attr-defined]
    if path not in cached:
        import pyarrow.dataset as ds

        schema = ds.dataset(path, format="parquet").schema
        cached[path] = frozenset(
            f.name for f in schema if str(f.type).startswith("timestamp[ns")
        )
    return cached[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = table_path(sf_dir, name)
    df = spark.read.parquet(path)
    # parquet TIMESTAMP(NANOS) arrives as long under nanosAsLong; convert to
    # TimestampType via integer division (float div would lose precision on
    # ~1.7e18 epoch-nanos). Data is generated at micro precision => lossless.
    # Detection is generic (arrow footer), not hardcoded to one column.
    for col in _nanos_timestamp_cols(path):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    # parquet timestamp[us] arrives as TIMESTAMP_NTZ; normalize to the
    # session-zoned TimestampType (session tz is pinned UTC, so values are
    # unchanged) — streaming watermarks and several chrono functions
    # (unix_millis, window) require TIMESTAMP, and this keeps the engine's
    # surface identical whether the generator stored NANOS or MICROS.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


class Tables:
    """Lazy accessor: ``Tables(spark, sf_dir).lineitem`` etc.

    Each attribute is a fresh DataFrame over the parquet file; Catalyst
    dedups identical scans, so repeated access is free.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return load_table(self.spark, self.sf_dir, name)
        raise AttributeError(name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for the SQL API)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv_tolerant(
    spark: SparkSession, path: str, schema_ddl: str
) -> DataFrame:
    """PERMISSIVE CSV ingest: parse what parses, quarantine what doesn't.

    Rows that violate the declared schema are NOT dropped and do NOT
    fail the job — they land with null fields plus the raw line in
    ``_corrupt_record``, so a downstream filter can route them to a
    quarantine sink while clean rows flow on. This is the ingest
    posture a 100 TB landing zone needs: schema-on-read with explicit,
    auditable rejects instead of silent loss (DROPMALFORMED) or a
    cluster-wide abort on one bad file (FAILFAST).

    The reference tolerated malformed timestamps per-record
    (iot_dashboard.py:33-36); this is the same policy applied at the
    source boundary.

    Spark caveat: a query that references ONLY ``_corrupt_record``
    raises (the parser never materializes the other fields to know
    what failed) — ``cache()`` the frame before routing on the corrupt
    column, as the quarantine test does.
    """
    return spark.read.csv(
        path,
        schema=schema_ddl + ", _corrupt_record STRING",
        header=True,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )


def read_jsonl_tolerant(
    spark: SparkSession, path: str, schema_ddl: str
) -> DataFrame:
    """PERMISSIVE JSON-lines ingest — the wire-format twin of
    :func:`read_csv_tolerant`.

    The reference's ingest path carries JSON records (Kinesis wire
    format, iot-data-stream.py:279); a landing zone reading those files
    needs the same posture as CSV: schema-on-read, malformed lines
    quarantined in ``_corrupt_record`` (truncated payloads, bad quotes,
    type violations), clean rows flowing on. FAILFAST would abort a
    100 TB backfill on one bad shard; DROPMALFORMED loses data silently;
    PERMISSIVE + explicit routing is the only auditable option.

    Same Spark caveat as CSV: cache() before filtering on only the
    corrupt column.
    """
    return spark.read.schema(schema_ddl + ", _corrupt_record STRING").json(
        path,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )


class SchemaContractError(ValueError):
    """A landed table violates its declared schema contract."""


def assert_schema(df: DataFrame, expected_ddl: str) -> DataFrame:
    """Schema contract gate: fail LOUDLY (with a per-column diff) when a
    DataFrame's schema drifts from the declared DDL.

    The ingest-side twin of the dashboard's column-existence guard: a
    producer silently adding/dropping/retyping a column should stop the
    pipeline at the landing step, not corrupt a downstream join. Name
    order is not part of the contract; names and types are.
    """
    from pyspark.sql.types import StructType

    expected = StructType.fromDDL(expected_ddl)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in expected.fields}
    if got == want:
        return df
    problems = []
    for name in sorted(want.keys() - got.keys()):
        problems.append(f"missing column {name} ({want[name]})")
    for name in sorted(got.keys() - want.keys()):
        problems.append(f"unexpected column {name} ({got[name]})")
    for name in sorted(got.keys() & want.keys()):
        if got[name] != want[name]:
            problems.append(f"type drift on {name}: {got[name]} != {want[name]}")
    raise SchemaContractError("; ".join(problems))
