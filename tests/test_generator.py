"""Generation invariants for the synthetic IoT source (FIXTURES.md B).

The generator is stochastic (hash-uniform), so correctness is the
reference's behavioral contract, not exact values:
clamp to per-sensor [min,max] (iot-data-stream.py:169), precision
rounding (:172), battery monotone non-increasing (:161-163), sensor
subsets of 4-6 (:234-236), valid status enum (:110-111), ~98% report
rate (:254), and the flatten's wide CSV schema (:322-341).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from severless_data_pipeline_aws_spark.sources.generator import (
    LOCATIONS,
    SENSOR_TYPES,
    STATUSES,
    device_dimension,
    flatten_readings,
    generate_readings,
)

N_DEVICES, N_TICKS = 8, 50


def _readings(spark):
    return generate_readings(spark, n_devices=N_DEVICES, n_ticks=N_TICKS).cache()


def test_values_clamped_and_rounded(spark):
    df = _readings(spark)
    long = df.select("device_id", F.explode("readings").alias("sensor", "r")).select(
        "device_id", "sensor", F.col("r.value").alias("value"), F.col("r.unit").alias("unit")
    )
    rows = long.collect()
    assert rows
    for r in rows:
        cfg = SENSOR_TYPES[r["sensor"]]
        assert cfg["min"] <= r["value"] <= cfg["max"], r
        assert r["unit"] == cfg["unit"]
        scaled = r["value"] * (10 ** cfg["precision"])
        assert math.isclose(scaled, round(scaled), abs_tol=1e-6), r


def test_battery_monotone_non_increasing(spark):
    df = _readings(spark)
    batt = (
        df.select("device_id", "tick", F.element_at("readings", "battery_level").alias("b"))
        .filter(F.col("b").isNotNull())
        .select("device_id", "tick", F.col("b.value").alias("v"))
        .orderBy("device_id", "tick")
        .collect()
    )
    last: dict[str, float] = {}
    # anomalies may snap battery to max/min (iot-data-stream.py:184-193);
    # monotonicity holds on the non-anomalous walk, so tolerate snaps to
    # the exact extremes only
    for r in batt:
        prev = last.get(r["device_id"])
        if prev is not None and r["v"] not in (0.0, 100.0):
            assert r["v"] <= prev + 1e-9, r
        if r["v"] not in (0.0, 100.0):
            last[r["device_id"]] = r["v"]


def test_sensor_subsets_and_locations(spark):
    dim = device_dimension(spark, N_DEVICES).collect()
    loc_ids = {l[0] for l in LOCATIONS}
    for d in dim:
        assert 4 <= len(d["sensors"]) <= 6
        assert len(set(d["sensors"])) == len(d["sensors"])
        assert set(d["sensors"]) <= set(SENSOR_TYPES)
        assert d["location_id"] in loc_ids


def test_status_enum_and_report_rate(spark):
    df = _readings(spark)
    assert df.filter(~F.col("status").isin(*STATUSES)).count() == 0
    n = df.count()
    # 98% report gate over N_DEVICES * N_TICKS slots
    expected = N_DEVICES * N_TICKS * 0.98
    assert abs(n - expected) / expected < 0.1, (n, expected)
    # the dominant status must be 'operational' (95% weight)
    top = df.groupBy("status").count().orderBy(F.desc("count")).first()
    assert top["status"] == "operational"


def test_flatten_schema_matches_reference_csv(spark):
    wide = flatten_readings(_readings(spark))
    expected = {"device_id", "timestamp", "location_id", "location_name",
                "latitude", "longitude", "status"}
    for s in SENSOR_TYPES:
        expected |= {f"{s}_value", f"{s}_unit"}
    assert set(wide.columns) == expected
    # missing sensors are null, present ones populated
    row = wide.first()
    assert row["device_id"].startswith("device_")
    n_vals = sum(1 for s in SENSOR_TYPES if row[f"{s}_value"] is not None)
    assert 4 <= n_vals <= 6


def test_deterministic_across_runs(spark):
    a = _readings(spark).select("device_id", "tick", "status").collect()
    b = generate_readings(spark, n_devices=N_DEVICES, n_ticks=N_TICKS).select(
        "device_id", "tick", "status"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fixedpoint_generator_invariants(spark):
    """S1-FP: the fixed-point variant must keep the reference
    invariants (range clamp, precision grid, battery monotone decay)
    AND be partition-invariant — plus its defining property: every
    value is exactly value_scaled / 10^p, no double rounding anywhere."""
    from severless_data_pipeline_aws_spark.sources.generator import (
        SENSOR_TYPES,
        generate_readings_fixedpoint,
    )

    df = generate_readings_fixedpoint(spark, n_devices=6, n_ticks=40)
    rows = df.collect()
    assert rows
    by_series = {}
    for r in rows:
        md = SENSOR_TYPES[r["sensor"]]
        assert md["min"] - 1e-9 <= r["value"] <= md["max"] + 1e-9
        scale = 10 ** md["precision"]
        assert r["value"] == r["value_scaled"] / scale
        by_series.setdefault((r["device_id"], r["sensor"]), []).append(
            (r["tick"], r["value_scaled"])
        )
    bat = [
        sorted(v)
        for (d, s), v in by_series.items()
        if s == "battery_level"
    ]
    assert bat, "no battery series generated"
    for series in bat:
        vals = [v for _, v in series]
        assert all(a >= b for a, b in zip(vals, vals[1:])), "battery must decay"
    # partition invariance: the same stream under a different shuffle
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        again = sorted(map(tuple, generate_readings_fixedpoint(spark, 6, 40).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert sorted(map(tuple, rows)) == again
