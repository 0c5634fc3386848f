"""Synthetic IoT reading generator (SURVEY §2.1 S1, M2 pipeline parity).

The reference generates readings imperatively — per-device Python
objects mutating ``current_values`` each tick (iot-data-stream.py:
115-257). Re-expressed Spark-first: the whole reading stream for
``n_ticks × n_devices`` is ONE declarative plan over ``spark.range``:

* per-device randomness is *hash-uniform* — ``xxhash64`` of (device,
  sensor, tick, tag) scaled to [0,1) — so the data is deterministic
  under any partitioning/reordering (``F.rand`` is only seed-stable per
  partition arrangement, which breaks replay);
* the random-walk drift (iot-data-stream.py:155-173) is a keyed
  cumulative-sum window over ticks (SURVEY §2.5), then clamp + round —
  W4's batch twin. Battery decay forces drift negative (= monotone
  non-increasing after clamp/round);
* anomaly injection (1% spike-or-drop, :184-193), weighted status
  choice (.95/.03/.015/.005, :110-111), 98% report gate (:254), sensor
  subsets of 4-6 per device (:234-236), GPS jitter (:202-203) — all
  stateless column expressions.

Scale: generation is embarrassingly parallel over (device, tick); the
only shuffle is the drift window's partition-by-(device, sensor) and
the final per-reading map assembly — both keyed on the device axis, so
a 1000-executor run just needs ``spark.range`` partitioning, which is
uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

#: sensor metadata — unit / range / precision / drift per type
#: (iot-data-stream.py:54-98; ``decay`` marks battery monotone decrease)
SENSOR_TYPES: dict[str, dict] = {
    "temperature": {"unit": "°C", "min": -10.0, "max": 45.0, "precision": 1, "drift": 0.1},
    "humidity": {"unit": "%", "min": 0.0, "max": 100.0, "precision": 1, "drift": 2.0},
    "pressure": {"unit": "hPa", "min": 970.0, "max": 1050.0, "precision": 1, "drift": 0.5},
    "light_level": {"unit": "lux", "min": 0.0, "max": 10000.0, "precision": 0, "drift": 50.0},
    "air_quality": {"unit": "PM2.5", "min": 0.0, "max": 500.0, "precision": 1, "drift": 5.0},
    "battery_level": {
        "unit": "%",
        "min": 0.0,
        "max": 100.0,
        "precision": 0,
        "drift": 0.1,
        "decay": True,
    },
}

#: 5-site location dimension (iot-data-stream.py:101-107)
LOCATIONS = [
    ("warehouse_a", "Warehouse A", 47.6062, -122.3321),
    ("warehouse_b", "Warehouse B", 47.6152, -122.3447),
    ("office_main", "Main Office", 47.6205, -122.3493),
    ("production_floor", "Production Floor", 47.6170, -122.3377),
    ("storage_cold", "Cold Storage", 47.6180, -122.3399),
]

STATUSES = ("operational", "maintenance", "warning", "error")
#: cumulative weights of .95/.03/.015/.005 (iot-data-stream.py:110-111)
_STATUS_CUM = (0.95, 0.98, 0.995, 1.0)

_SENSORS = tuple(SENSOR_TYPES)


def _hash_uniform(*cols) -> F.Column:
    """Deterministic uniform [0,1) from column values (partition-invariant)."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1 << 31)) / float(1 << 31)).cast("double")


def device_dimension(spark: SparkSession, n_devices: int) -> DataFrame:
    """One row per device: id, location, and its 4-6 sensor subset."""
    loc = spark.createDataFrame(
        LOCATIONS, "location_id string, location_name string, lat double, lon double"
    ).withColumn("loc_idx", F.expr("row_number() over (order by location_id) - 1"))

    d = spark.range(n_devices).select(
        F.col("id").alias("device_num"),
        F.concat(F.lit("device_"), F.substring(F.md5(F.col("id").cast("string")), 1, 8)).alias(
            "device_id"
        ),
        F.pmod(F.xxhash64(F.col("id"), F.lit("loc")), F.lit(len(LOCATIONS))).alias("loc_idx"),
        (4 + F.pmod(F.xxhash64(F.col("id"), F.lit("nsens")), F.lit(3))).alias("n_sensors"),
    )
    # deterministic "random sample without replacement": order the sensor
    # list by a per-(device, sensor) hash and keep the first n
    sensor_arr = F.array(*[F.lit(s) for s in _SENSORS])
    ordered = F.expr(
        "transform(array_sort(transform(sensors_all, "
        "s -> struct(xxhash64(device_id, s) AS h, s AS name))), p -> p.name)"
    )
    d = (
        d.withColumn("sensors_all", sensor_arr)
        .withColumn("sensors", F.slice(ordered, 1, 6))
        .withColumn("sensors", F.expr("slice(sensors, 1, n_sensors)"))
        .drop("sensors_all")
    )
    return d.join(F.broadcast(loc), "loc_idx").drop("loc_idx")


def generate_readings(
    spark: SparkSession,
    n_devices: int = 10,
    n_ticks: int = 100,
    frequency_s: int = 1,
    base_ts: str = "2024-01-01 00:00:00",
) -> DataFrame:
    """Nested reading records, one per (reporting device, tick).

    Schema matches the reference record (iot-data-stream.py:196-207):
    device_id, timestamp (ISO string), location fields, coordinates
    struct, readings map<sensor, struct<value double, unit string>>,
    status.
    """
    devices = device_dimension(spark, n_devices)
    ticks = spark.range(1, n_ticks + 1).select(F.col("id").alias("tick"))

    # long form: one row per (device, sensor, tick) for the drift walk
    long = (
        devices.select("device_num", "device_id", F.explode("sensors").alias("sensor"))
        .join(ticks)  # cross join: tick axis
    )

    # per-sensor metadata as CASE expressions (JVM-side, no UDF)
    def meta(field: str) -> F.Column:
        col = F.lit(SENSOR_TYPES[_SENSORS[0]][field])
        expr = F.when(F.col("sensor") == _SENSORS[0], col)
        for s in _SENSORS[1:]:
            expr = expr.when(F.col("sensor") == s, F.lit(SENSOR_TYPES[s][field]))
        return expr

    lo, hi, drift_f = meta("min"), meta("max"), meta("drift")
    is_decay = F.col("sensor") == "battery_level"

    init = _hash_uniform(F.col("device_id"), F.col("sensor"), F.lit("init")) * (hi - lo) + lo
    step = _hash_uniform(F.col("device_id"), F.col("sensor"), F.col("tick")) * 2.0 * drift_f - drift_f
    step = F.when(is_decay, -F.abs(step)).otherwise(step)

    from pyspark.sql import Window as W

    walk = W.partitionBy("device_id", "sensor").orderBy("tick").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    clamped = F.least(F.greatest(init + F.sum(step).over(walk), lo), hi)
    long = long.withColumn(
        "value",
        F.when(meta("precision") == 0, F.round(clamped, 0)).otherwise(F.round(clamped, 1)),
    )

    # 1% anomaly: one of the device's sensors snaps to min or max
    anom_u = _hash_uniform(F.col("device_id"), F.col("tick"), F.lit("anomaly"))
    anom_pick = F.pmod(F.xxhash64(F.col("device_id"), F.col("tick"), F.lit("pick")), F.lit(6))
    sensor_idx = F.array_position(F.array(*[F.lit(s) for s in _SENSORS]), F.col("sensor")) - 1
    spike = _hash_uniform(F.col("device_id"), F.col("tick"), F.lit("spike")) < 0.5
    long = long.withColumn(
        "value",
        F.when(
            (anom_u < 0.01) & (anom_pick == sensor_idx),
            F.when(spike, hi).otherwise(lo),
        ).otherwise(F.col("value")),
    ).withColumn("unit", meta("unit"))

    # assemble the nested record per (device, tick)
    readings = (
        long.groupBy("device_num", "device_id", "tick")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("sensor").alias("key"),
                            F.struct(F.col("value").alias("value"), F.col("unit").alias("unit")).alias(
                                "val"
                            ),
                        )
                    )
                )
            ).alias("readings")
        )
    )

    status_u = _hash_uniform(F.col("device_id"), F.col("tick"), F.lit("status"))
    status = (
        F.when(status_u < _STATUS_CUM[0], STATUSES[0])
        .when(status_u < _STATUS_CUM[1], STATUSES[1])
        .when(status_u < _STATUS_CUM[2], STATUSES[2])
        .otherwise(STATUSES[3])
    )
    jitter_lat = _hash_uniform(F.col("device_id"), F.col("tick"), F.lit("jlat")) * 2e-4 - 1e-4
    jitter_lon = _hash_uniform(F.col("device_id"), F.col("tick"), F.lit("jlon")) * 2e-4 - 1e-4

    out = (
        readings.join(F.broadcast(devices.select("device_num", "device_id", "location_id", "location_name", "lat", "lon")), ["device_num", "device_id"])
        .withColumn(
            "timestamp",
            F.date_format(
                F.lit(base_ts).cast("timestamp") + F.make_interval(secs=F.col("tick") * frequency_s),
                "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
            ),
        )
        .filter(_hash_uniform(F.col("device_id"), F.col("tick"), F.lit("report")) < 0.98)
        .select(
            "device_id",
            "timestamp",
            "location_id",
            "location_name",
            F.struct(
                (F.col("lat") + jitter_lat).alias("latitude"),
                (F.col("lon") + jitter_lon).alias("longitude"),
            ).alias("coordinates"),
            "readings",
            status.alias("status"),
            "tick",
        )
    )
    return out


def flatten_readings(df: DataFrame) -> DataFrame:
    """P1: nested reading → wide CSV-shape frame (iot-data-stream.py:322-341).

    One flat row per reading: top-level fields, coordinates leaves, and
    ``{sensor}_value`` / ``{sensor}_unit`` per known sensor (null when
    the device lacks that sensor — the reference's pandas NaN fill).
    """
    cols = [
        "device_id",
        "timestamp",
        "location_id",
        "location_name",
        F.col("coordinates.latitude").alias("latitude"),
        F.col("coordinates.longitude").alias("longitude"),
        "status",
    ]
    for s in _SENSORS:
        entry = F.element_at(F.col("readings"), s)
        cols.append(entry.getField("value").alias(f"{s}_value"))
        cols.append(entry.getField("unit").alias(f"{s}_unit"))
    return df.select(*cols)


@register(
    "iot_generated_readings",
    oracle=None,  # stochastic generator: invariants verified in pytest
    doc=(
        "S1/M2: the reference's synthetic IoT stream in batch form — one "
        "declarative plan (hash-uniform randomness, window-cumsum drift, "
        "clamp/round, sparse sensor maps, weighted status, 1% anomalies, "
        "98% report gate). Invariants (range, precision, battery "
        "monotonicity, subset sizes) asserted in tests/test_generator.py. "
        "Wire format (r5 verdict #3): the nested coordinates struct and "
        "readings map are emitted as to_json strings so the driver's "
        "pandas canonicalizer can sort/hash the rows — the nested "
        "DataFrame stays the library API (generate_readings)."
    ),
    tags=("generator", "source"),
)
def iot_generated_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    nested = generate_readings(spark, n_devices=10, n_ticks=60).drop("tick")
    return nested.withColumn("coordinates", F.to_json("coordinates")).withColumn(
        "readings", F.to_json(F.map_entries("readings"))
    )


@register(
    "iot_flatten_wide",
    oracle=None,  # derived from the stochastic generator; schema checked in pytest
    doc="P1: flatten the generated nested readings to the reference's wide CSV schema.",
    tags=("generator", "flatten"),
)
def iot_flatten_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flatten_readings(generate_readings(spark, n_devices=10, n_ticks=60))


@register(
    "iot_generator_invariants_audit",
    oracle="""
        SELECT * FROM (VALUES
            ('battery_monotone_nonincreasing', TRUE),
            ('coordinate_jitter_within_1e4', TRUE),
            ('report_rate_in_95_100pct', TRUE),
            ('sensor_subset_4_to_6', TRUE),
            ('status_in_reference_set', TRUE),
            ('units_match_sensor_metadata', TRUE),
            ('values_match_precision', TRUE),
            ('values_within_sensor_ranges', TRUE)
        ) t(check_name, ok)
        ORDER BY check_name
    """,
    doc=(
        "S1 verdict audit (the sketch-verdict pattern applied to the "
        "generator): every reference invariant of the synthetic IoT "
        "stream — per-sensor clamp ranges and rounding precision "
        "(iot-data-stream.py:169-172), battery monotone decay "
        "(:161-163), 4-6 sensor subsets (:234-236), weighted status "
        "membership (:110-111), GPS jitter <= 1e-4 (:202-203), and "
        "the 98%% report gate (:254) — computed Spark-side over the "
        "actual generated stream as one boolean per check; the oracle "
        "asserts the literal expectations, so a generator regression "
        "hash-mismatches AT THE DRIVER instead of only in pytest. The "
        "full value-level replay stays out of SQL by design: the "
        "drift walk ends in round(double, precision), whose half-ULP "
        "tie behavior is engine-specific — the documented boundary "
        "that keeps the two wire queries rows-only."
    ),
    tags=("generator", "dq", "audit"),
)
def iot_generator_invariants_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen = generate_readings(spark, n_devices=10, n_ticks=60)
    n_expected = 10 * 60

    meta = spark.createDataFrame(
        [(s, m["unit"], m["min"], m["max"], m["precision"]) for s, m in SENSOR_TYPES.items()],
        "sensor string, exp_unit string, lo double, hi double, prec int",
    )
    per_sensor = gen.select(
        "device_id",
        "tick",
        F.explode("readings").alias("sensor", "rv"),
    ).select(
        "device_id",
        "tick",
        "sensor",
        F.col("rv.value").alias("value"),
        F.col("rv.unit").alias("unit"),
    ).join(F.broadcast(meta), "sensor")

    sensor_checks = per_sensor.agg(
        F.min(
            (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi"))
        ).alias("values_within_sensor_ranges"),
        F.min(F.col("unit") == F.col("exp_unit")).alias("units_match_sensor_metadata"),
        F.min(
            F.col("value")
            == F.expr(
                "CASE WHEN prec = 0 THEN round(value, 0) ELSE round(value, 1) END"
            )
        ).alias("values_match_precision"),
    )

    from pyspark.sql import Window as W

    # anomalies snap battery to the exact extremes (0/100) mid-walk;
    # monotonicity holds on the non-anomalous subsequence (the same
    # tolerance the pytest invariant uses), so extremes drop BEFORE the
    # per-device lag
    wb = W.partitionBy("device_id").orderBy("tick")
    battery = (
        per_sensor.filter(
            (F.col("sensor") == "battery_level")
            & ~F.col("value").isin(0.0, 100.0)
        )
        .select(
            "device_id",
            "tick",
            (
                F.col("value")
                <= F.coalesce(F.lag("value").over(wb), F.col("value")) + 1e-9
            ).alias("mono"),
        )
        .agg(F.min("mono").alias("battery_monotone_nonincreasing"))
    )

    loc = spark.createDataFrame(
        LOCATIONS, "location_id string, ln string, base_lat double, base_lon double"
    ).select("location_id", "base_lat", "base_lon")
    record_checks = (
        gen.join(F.broadcast(loc), "location_id")
        .select(
            (F.size("readings").between(4, 6)).alias("nsens_ok"),
            F.col("status").isin(*STATUSES).alias("status_ok"),
            (
                (F.abs(F.col("coordinates.latitude") - F.col("base_lat")) <= 1.0001e-4)
                & (F.abs(F.col("coordinates.longitude") - F.col("base_lon")) <= 1.0001e-4)
            ).alias("jitter_ok"),
        )
        .agg(
            F.min("nsens_ok").alias("sensor_subset_4_to_6"),
            F.min("status_ok").alias("status_in_reference_set"),
            F.min("jitter_ok").alias("coordinate_jitter_within_1e4"),
            (
                (F.count(F.lit(1)) >= F.lit(int(0.95 * n_expected)))
                & (F.count(F.lit(1)) <= F.lit(n_expected))
            ).alias("report_rate_in_95_100pct"),
        )
    )

    wide = sensor_checks.crossJoin(battery).crossJoin(record_checks)
    return wide.selectExpr(
        """stack(8,
            'battery_monotone_nonincreasing', battery_monotone_nonincreasing,
            'coordinate_jitter_within_1e4', coordinate_jitter_within_1e4,
            'report_rate_in_95_100pct', report_rate_in_95_100pct,
            'sensor_subset_4_to_6', sensor_subset_4_to_6,
            'status_in_reference_set', status_in_reference_set,
            'units_match_sensor_metadata', units_match_sensor_metadata,
            'values_match_precision', values_match_precision,
            'values_within_sensor_ranges', values_within_sensor_ranges
        ) AS (check_name, ok)"""
    ).orderBy("check_name")


# ---------------------------------------------------------------------------
# Round-8 (r7 verdict #8): fixed-point generator variant — the drift
# walk, clamp, rounding, anomaly snap, status draw, and report gate all
# re-expressed on SCALED INTEGERS (1e-4 units) with integer threshold
# comparisons, so the whole stream is hash-exact cross-engine: the
# double-rounding tie (round(double, p), the documented rows-only
# boundary of S1) never occurs because no double is ever rounded.
# ---------------------------------------------------------------------------

_FP_SCALE = 10_000  # 1e-4 fixed point
_M31 = 1 << 31


def _fp_consts() -> dict[str, dict]:
    """Per-sensor integer constants (exact: every min/max/drift carries
    <= 1 decimal digit)."""
    out = {}
    for i, (s, md) in enumerate(SENSOR_TYPES.items()):
        lo = int(round(md["min"] * _FP_SCALE))
        hi = int(round(md["max"] * _FP_SCALE))
        d = int(round(md["drift"] * _FP_SCALE))
        pdiv = _FP_SCALE // (10 ** md["precision"])  # 10^(4-p)
        out[s] = {
            "lo": lo,
            "hi": hi,
            "d": d,
            "pdiv": pdiv,
            "half": pdiv // 2,
            "lop": lo // pdiv,  # exact: lo is a multiple of pdiv
            "hip": hi // pdiv,
            "idx": i,
            "unit": md["unit"],
            "p": md["precision"],
            "decay": bool(md.get("decay")),
        }
    return out


def _fp_cut(t: float) -> int:
    """Integer cutoff c with  pmod(h, 2^31) < c  <=>  uniform < t,
    where uniform = m / 2^31 and t is the exact binary double."""
    import math
    from fractions import Fraction

    x = Fraction(t) * _M31
    return int(x) if x.denominator == 1 else math.ceil(x)


_FP_CUT_ANOM = _fp_cut(0.01)
_FP_CUT_SPIKE = _fp_cut(0.5)
_FP_CUT_REPORT = _fp_cut(0.98)
_FP_CUT_STATUS = tuple(_fp_cut(t) for t in _STATUS_CUM[:3])


def generate_readings_fixedpoint(
    spark: SparkSession, n_devices: int = 10, n_ticks: int = 100
) -> DataFrame:
    """Long-form fixed-point reading stream: one row per reported
    (device, sensor, tick) with the walked value as an exact scaled
    integer plus its double rendering (one per-row division)."""
    from pyspark.sql import Window as W

    consts = _fp_consts()
    devices = device_dimension(spark, n_devices)
    ticks = spark.range(1, n_ticks + 1).select(F.col("id").alias("tick"))
    rows = devices.select(
        "device_id", "location_id", F.explode("sensors").alias("sensor")
    ).join(ticks)

    def cc(field: str) -> F.Column:
        expr = F.when(F.col("sensor") == _SENSORS[0], F.lit(consts[_SENSORS[0]][field]))
        for s in _SENSORS[1:]:
            expr = expr.when(F.col("sensor") == s, F.lit(consts[s][field]))
        return expr

    m = lambda *cols: F.pmod(F.xxhash64(*cols), F.lit(_M31))  # noqa: E731

    def idiv_m31(a: F.Column) -> F.Column:
        """Exact a div 2^31 for non-negative a < 2^53: subtract the
        remainder, then one exact double division (the ntile_from_rn
        idiom — both engines agree bit-for-bit)."""
        return ((a - a % F.lit(_M31)) / F.lit(_M31)).cast("bigint")

    lo, hi, d = cc("lo"), cc("hi"), cc("d")
    # integer step in [-D, D]: (m * 2D) div 2^31 - D — the dividend is
    # non-negative, so the division is a true floor on both engines
    m_step = m(F.col("device_id"), F.col("sensor"), F.col("tick"))
    step = idiv_m31(m_step * (d * 2)) - d
    is_decay = F.col("sensor") == "battery_level"
    step = F.when(is_decay, -F.abs(step)).otherwise(step)

    m_init = m(F.col("device_id"), F.col("sensor"), F.lit("init"))
    init = lo + idiv_m31(m_init * (hi - lo))

    walk = W.partitionBy("device_id", "sensor").orderBy("tick").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    v = F.least(F.greatest(init + F.sum(step).over(walk), lo), hi)

    pdiv, half, lop, hip = cc("pdiv"), cc("half"), cc("lop"), cc("hip")
    # round-half-up at the declared precision, entirely on integers:
    # shift to non-negative, add half, exact divide by 10^(4-p)
    shifted = v - lo + half
    value_scaled = ((shifted - shifted % pdiv) / pdiv).cast("bigint") + lop

    anom = m(F.col("device_id"), F.col("tick"), F.lit("anomaly")) < F.lit(_FP_CUT_ANOM)
    pick = F.pmod(
        F.xxhash64(F.col("device_id"), F.col("tick"), F.lit("pick")), F.lit(6)
    )
    spike = m(F.col("device_id"), F.col("tick"), F.lit("spike")) < F.lit(_FP_CUT_SPIKE)
    value_scaled = F.when(
        anom & (pick == cc("idx")), F.when(spike, hip).otherwise(lop)
    ).otherwise(value_scaled)

    value = F.when(cc("p") == 1, value_scaled / F.lit(10.0)).otherwise(
        value_scaled.cast("double")
    )

    ms = m(F.col("device_id"), F.col("tick"), F.lit("status"))
    status = (
        F.when(ms < F.lit(_FP_CUT_STATUS[0]), STATUSES[0])
        .when(ms < F.lit(_FP_CUT_STATUS[1]), STATUSES[1])
        .when(ms < F.lit(_FP_CUT_STATUS[2]), STATUSES[2])
        .otherwise(STATUSES[3])
    )

    # the report gate hides EMISSION only — the walk state advances on
    # every tick (reference semantics: a device that skips a report
    # still drifts), so the window cumsum must see unfiltered rows:
    # project first, filter after
    return (
        rows.select(
            "device_id",
            "location_id",
            "sensor",
            "tick",
            cc("unit").alias("unit"),
            status.alias("status"),
            value_scaled.alias("value_scaled"),
            value.alias("value"),
            (
                m(F.col("device_id"), F.col("tick"), F.lit("report"))
                < F.lit(_FP_CUT_REPORT)
            ).alias("_reported"),
        )
        .filter(F.col("_reported"))
        .drop("_reported")
    )


def _fixedpoint_oracle(n_devices: int = 10, n_ticks: int = 60) -> str:
    """Complete DuckDB replay of the fixed-point generator: every
    xxhash64 site (device location/sensor-count draws, sensor-subset
    ranking, init, per-tick steps, anomaly/pick/spike/status/report)
    is re-derived via the pure-SQL XXH64 twins, and the walk itself is
    integer arithmetic — the whole stream hash-exact, closing the S1
    rows-only boundary for this variant."""
    from ..functions.xxh64 import SPARK_SEED
    from ..functions.xxh64_sql import (
        hash_long_chain_subquery,
        hash_long_seeded_subquery,
        rec_hash_ctes,
    )

    m64 = (1 << 64) - 1
    locs = sorted(LOCATIONS)  # row_number ORDER BY location_id - 1
    loc_values = ", ".join(
        f"({i}, '{lid}')" for i, (lid, _name, _la, _lo) in enumerate(locs)
    )
    consts = _fp_consts()
    sensor_values = ", ".join(
        "({idx}, '{s}', {lo}, {hi}, {d}, {pdiv}, {half}, {lop}, {hip}, '{unit}', {p}, {dec})".format(
            s=s, dec=str(c["decay"]).upper(), **c
        )
        for s, c in consts.items()
    )
    status_case = f"""CASE WHEN da_m_status < {_FP_CUT_STATUS[0]} THEN '{STATUSES[0]}'
                  WHEN da_m_status < {_FP_CUT_STATUS[1]} THEN '{STATUSES[1]}'
                  WHEN da_m_status < {_FP_CUT_STATUS[2]} THEN '{STATUSES[2]}'
                  ELSE '{STATUSES[3]}' END"""

    devh = hash_long_chain_subquery(
        "dev0", ["device_num"], ["device_num"], out="hd"
    )
    steph = hash_long_seeded_subquery(
        "stepsrc", ["device_num", "sensor_idx", "tick"], "tick", "sseed", out="hstep"
    )
    dth = hash_long_seeded_subquery(
        "dtsrc", ["device_num", "tick"], "tick", "dseed", out="hdt"
    )
    return f"""
        WITH RECURSIVE
        dev0 AS (SELECT range AS device_num FROM range({n_devices})),
        devh AS MATERIALIZED (
            SELECT device_num, hd,
                   CAST(hd AS HUGEINT)
                   + CASE WHEN hd < 0 THEN 18446744073709551616::HUGEINT
                          ELSE 0::HUGEINT END AS hd_u
            FROM {devh}
        ),
        d1_src AS (
            SELECT device_num AS k, t.tag, hd_u AS seed,
                   CASE t.tag WHEN 0 THEN 'loc' ELSE 'nsens' END AS s
            FROM devh CROSS JOIN (VALUES (0::BIGINT), (1::BIGINT)) t(tag)
        ),
        {rec_hash_ctes('d1')},
        devices AS MATERIALIZED (
            SELECT d.device_num,
                   'device_' || substr(md5(CAST(d.device_num AS VARCHAR)), 1, 8)
                       AS device_id,
                   lv.location_id,
                   4 + ((ns.hsig % 3) + 3) % 3 AS n_sensors
            FROM devh d
            JOIN d1_out li ON li.k = d.device_num AND li.tag = 0
            JOIN d1_out ns ON ns.k = d.device_num AND ns.tag = 1
            JOIN (VALUES {loc_values}) lv(loc_idx, location_id)
              ON lv.loc_idx = ((li.hsig % 5) + 5) % 5
        ),
        dv_src AS (
            SELECT device_num AS k, 0::BIGINT AS tag,
                   {SPARK_SEED & m64}::HUGEINT AS seed, device_id AS s
            FROM devices
        ),
        {rec_hash_ctes('dv')},
        sens(sensor_idx, sensor, lo, hi, d, pdiv, half, lop, hip, unit, p, decay)
            AS (VALUES {sensor_values}),
        ds_src AS (
            SELECT d.device_num * 10 + s.sensor_idx AS k,
                   s.sensor_idx AS tag, o.h AS seed, s.sensor AS s
            FROM devices d
            JOIN dv_out o ON o.k = d.device_num
            CROSS JOIN sens s
        ),
        {rec_hash_ctes('ds')},
        chosen AS MATERIALIZED (
            SELECT d.device_num, d.device_id, d.location_id,
                   s.sensor_idx, s.sensor, o.h AS sens_seed
            FROM devices d
            JOIN ds_out o ON o.k // 10 = d.device_num
            JOIN sens s ON s.sensor_idx = o.tag
            QUALIFY row_number() OVER (PARTITION BY d.device_num
                                       ORDER BY o.hsig, s.sensor)
                    <= d.n_sensors
        ),
        ini_src AS (
            SELECT device_num * 10 + sensor_idx AS k, 0::BIGINT AS tag,
                   sens_seed AS seed, 'init' AS s
            FROM chosen
        ),
        {rec_hash_ctes('ini')},
        stepsrc AS (
            SELECT c.device_num, c.sensor_idx, t.range AS tick,
                   c.sens_seed AS sseed
            FROM chosen c CROSS JOIN range(1, {n_ticks + 1}) t
        ),
        steps AS MATERIALIZED (
            SELECT device_num, sensor_idx, tick,
                   ((hstep % {_M31}) + {_M31}) % {_M31} AS m_step
            FROM {steph}
        ),
        dtsrc AS (
            SELECT d.device_num, t.range AS tick, o.h AS dseed
            FROM devices d
            JOIN dv_out o ON o.k = d.device_num
            CROSS JOIN range(1, {n_ticks + 1}) t
        ),
        dth AS MATERIALIZED (
            SELECT device_num, tick, hdt_u64 FROM {dth}
        ),
        da_src AS (
            SELECT device_num * 1000000 + tick AS k, t.tag, hdt_u64 AS seed,
                   CASE t.tag WHEN 0 THEN 'anomaly' WHEN 1 THEN 'pick'
                        WHEN 2 THEN 'spike' WHEN 3 THEN 'status'
                        ELSE 'report' END AS s
            FROM dth CROSS JOIN (VALUES (0::BIGINT), (1::BIGINT), (2::BIGINT),
                                        (3::BIGINT), (4::BIGINT)) t(tag)
        ),
        {rec_hash_ctes('da')},
        dt AS MATERIALIZED (
            SELECT k // 1000000 AS device_num, k % 1000000 AS tick,
                   ((MAX(CASE WHEN tag = 0 THEN hsig END) % {_M31}) + {_M31}) % {_M31}
                       AS da_m_anom,
                   ((MAX(CASE WHEN tag = 1 THEN hsig END) % 6) + 6) % 6 AS da_pick,
                   ((MAX(CASE WHEN tag = 2 THEN hsig END) % {_M31}) + {_M31}) % {_M31}
                       AS da_m_spike,
                   ((MAX(CASE WHEN tag = 3 THEN hsig END) % {_M31}) + {_M31}) % {_M31}
                       AS da_m_status,
                   ((MAX(CASE WHEN tag = 4 THEN hsig END) % {_M31}) + {_M31}) % {_M31}
                       AS da_m_report
            FROM da_out GROUP BY k
        ),
        walked AS (
            SELECT c.device_id, c.location_id, c.sensor, st.tick,
                   c.device_num, c.sensor_idx,
                   s.lo + (((((i.hsig % {_M31}) + {_M31}) % {_M31}) * (s.hi - s.lo))
                           // {_M31})
                   + SUM(CASE WHEN s.decay
                              THEN -abs((st.m_step * (s.d * 2)) // {_M31} - s.d)
                              ELSE (st.m_step * (s.d * 2)) // {_M31} - s.d END)
                     OVER (PARTITION BY c.device_num, c.sensor_idx
                           ORDER BY st.tick) AS raw
            FROM chosen c
            JOIN sens s ON s.sensor_idx = c.sensor_idx
            JOIN ini_out i ON i.k = c.device_num * 10 + c.sensor_idx
            JOIN steps st ON st.device_num = c.device_num
                         AND st.sensor_idx = c.sensor_idx
        ),
        valued AS (
            SELECT w.device_id, w.location_id, w.sensor, w.tick,
                   w.device_num, s.unit, s.p,
                   CASE WHEN d.da_m_anom < {_FP_CUT_ANOM}
                             AND d.da_pick = w.sensor_idx
                        THEN CASE WHEN d.da_m_spike < {_FP_CUT_SPIKE}
                                  THEN s.hip ELSE s.lop END
                        ELSE (least(greatest(w.raw, s.lo), s.hi) - s.lo + s.half)
                             // s.pdiv + s.lop
                   END AS value_scaled,
                   {status_case} AS status,
                   d.da_m_report
            FROM walked w
            JOIN sens s ON s.sensor_idx = w.sensor_idx
            JOIN dt d ON d.device_num = w.device_num AND d.tick = w.tick
        )
        SELECT device_id, location_id, sensor, tick, unit, status,
               CAST(value_scaled AS BIGINT) AS value_scaled,
               CASE WHEN p = 1 THEN value_scaled / 10.0
                    ELSE CAST(value_scaled AS DOUBLE) END AS value
        FROM valued
        WHERE da_m_report < {_FP_CUT_REPORT}
        ORDER BY device_id, sensor, tick
    """


@register(
    "iot_generated_readings_fixedpoint",
    oracle=_fixedpoint_oracle(),
    doc=(
        "S1-FP (r7 verdict #8): the synthetic IoT stream re-expressed "
        "on SCALED INTEGERS — drift steps (m*2D div 2^31 - D), init, "
        "clamp, and round-half-up at the declared precision are all "
        "exact integer arithmetic, and every stochastic draw compares "
        "pmod(xxhash64, 2^31) against Python-precomputed integer "
        "cutoffs (exact binary-double thresholds via Fraction), so NO "
        "double is ever rounded: the round(double, p) half-ULP tie "
        "that keeps the original S1 wire query rows-only cannot occur. "
        "The DuckDB oracle replays the ENTIRE generator — md5 device "
        "ids, location/sensor-count draws, hash-ranked sensor subsets, "
        "init, all per-tick steps, anomaly snap, weighted status, 98%% "
        "report gate — through the pure-SQL XXH64 twins (4 recursive "
        "string passes + 2 seeded long-hash grids), making the "
        "generated stream itself hash-exact end-to-end. Same "
        "embarrassingly-parallel scale shape as S1: one keyed window "
        "on (device, sensor), everything else stateless."
    ),
    tags=("generator", "source"),
)
def iot_generated_readings_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return generate_readings_fixedpoint(spark, n_devices=10, n_ticks=60).orderBy(
        "device_id", "sensor", "tick"
    )
