"""Custom Python DataSource (Spark 4 DataSource API) — S1 as a
PLUGGABLE source.

The reference's generator is a standalone script that prints/PUTs
records (iot-data-stream.py:369-391). Re-expressed Spark-4-natively,
the synthetic reading source becomes a registered `format(...)`: any
session can `spark.dataSource.register(SyntheticReadingsDataSource)`
and then `spark.read.format("synthetic_readings").option(...).load()`
— schema, option handling, and PARTITION-PARALLEL reads all flow
through the engine's own source contract instead of a driver-side
loop. Each input partition owns one device shard and generates its
rows independently (Arrow-batched back to the JVM), which is exactly
how a 1000-executor cluster would parallelize ingestion of 10^12
synthetic rows.

Determinism: values derive from md5(device|sensor|tick) — the repo's
standard hash-uniform construction (sources/generator.py) — so reads
are bit-reproducible across runs and partitionings; the pytest battery
asserts reproducibility, partition counts, and agreement with the
column-expression generator's value law.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SENSORS = {
    # sensor -> (lo, hi): clamp range mirrors sources/generator.py
    "temperature": (-10.0, 45.0),
    "humidity": (0.0, 100.0),
    "battery_level": (0.0, 100.0),
}


def _u01(key: str) -> float:
    """Hash-uniform in [0, 1]: md5 32-bit slice / 2^32-1 (the shared
    deterministic-randomness law used across the repo)."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF


class _DevicePartition(InputPartition):
    def __init__(self, device_num: int):
        self.device_num = device_num


class SyntheticReadingsDataSource(DataSource):
    """`format("synthetic_readings")`: options n_devices (default 4)
    and n_ticks (default 25)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_readings"

    def schema(self) -> str:
        return (
            "device_id string, sensor string, tick bigint, "
            "value double, pct double"
        )

    def reader(self, schema) -> "SyntheticReadingsReader":
        return SyntheticReadingsReader(self.options)


class SyntheticReadingsReader(DataSourceReader):
    def __init__(self, options):
        self.n_devices = int(options.get("n_devices", 4))
        self.n_ticks = int(options.get("n_ticks", 25))

    def partitions(self):
        # one partition per device: the shard key of the keyed sink
        # (S6) is also the parallelism unit of the source
        return [_DevicePartition(d) for d in range(self.n_devices)]

    def read(self, partition: _DevicePartition) -> Iterator[tuple]:
        d = partition.device_num
        device_id = f"device_{hashlib.md5(str(d).encode()).hexdigest()[:8]}"
        for sensor, (lo, hi) in _SENSORS.items():
            for tick in range(1, self.n_ticks + 1):
                u = _u01(f"{device_id}|{sensor}|{tick}")
                value = lo + u * (hi - lo)
                yield (device_id, sensor, tick, value, u)


def register_synthetic_source(spark) -> None:
    """Idempotent registration of the custom format on a session."""
    spark.dataSource.register(SyntheticReadingsDataSource)
