"""W4: per-key mutable state — the reference's ONE genuinely stateful
operator (SURVEY §4.2).

Each SensorDevice holds ``current_values`` and every emission mutates
it: drift → (battery: force negative) → clamp → round → write back
(iot-data-stream.py:128,150-173). In Spark this is
``applyInPandasWithState``: GroupState per (device, sensor) carrying
the last value; each micro-batch continues the walk exactly where the
previous one stopped, surviving restarts via the checkpoint.

The processing itself is an Arrow-batched pandas walk — the per-row
recurrence ``v[i] = round(clamp(v[i-1] + drift[i]))`` is not
expressible as a window aggregate (clamping is applied per STEP, so a
plain cumulative sum diverges the moment any step clips). That makes
this the textbook case for stateful custom code rather than built-ins.

Scale: state is O(devices × sensors) doubles, hash-partitioned by key;
the watermark-free design matches the reference (generation-time
stamps, no late data). A 1000-executor run shards the key space evenly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: input rows: one proposed step per (device, sensor, tick)
STEP_SCHEMA = StructType(
    [
        StructField("device_id", StringType()),
        StructField("sensor", StringType()),
        StructField("tick", LongType()),
        StructField("drift", DoubleType()),
        StructField("lo", DoubleType()),
        StructField("hi", DoubleType()),
        StructField("init", DoubleType()),
        StructField("precision", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("device_id", StringType()),
        StructField("sensor", StringType()),
        StructField("tick", LongType()),
        StructField("value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType([StructField("last_value", DoubleType())])


def walk_steps(
    last: float | None,
    pdf: pd.DataFrame,
) -> tuple[pd.DataFrame, float | None]:
    """Pure per-key walk: stepwise drift+clamp+round from ``last``.

    Shared by the streaming state function and the batch replay oracle
    (tests assert their equivalence), so the semantics live in exactly
    one place.
    """
    pdf = pdf.sort_values("tick")
    out_vals = []
    v = last
    for row in pdf.itertuples(index=False):
        base = row.init if v is None else v
        stepped = min(max(base + row.drift, row.lo), row.hi)
        v = round(stepped, int(row.precision)) if row.precision > 0 else float(round(stepped))
        out_vals.append(v)
    result = pd.DataFrame(
        {
            "device_id": pdf["device_id"].values,
            "sensor": pdf["sensor"].values,
            "tick": pdf["tick"].values,
            "value": out_vals,
        }
    )
    return result, v


def _apply_drift(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last = state.get[0] if state.exists else None
    for pdf in pdfs:
        out, last = walk_steps(last, pdf)
        yield out
    if last is not None:
        state.update((float(last),))


def drift_walk(steps: DataFrame) -> DataFrame:
    """Apply the stateful walk to a streaming step frame.

    (applyInPandasWithState requires a streaming query; the batch twin
    is ``batch_replay``, and tests assert stream == replay both for a
    single-shot run and across a checkpointed restart.)
    """
    return steps.groupBy("device_id", "sensor").applyInPandasWithState(
        _apply_drift,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_replay(steps_pdf: pd.DataFrame) -> pd.DataFrame:
    """Imperative single-process replay — the equivalence oracle."""
    outs = []
    for _, grp in steps_pdf.groupby(["device_id", "sensor"], sort=False):
        out, _ = walk_steps(None, grp)
        outs.append(out)
    return pd.concat(outs, ignore_index=True)


# ---------------------------------------------------------------------------
# Same operator on the Spark 4 transformWithState API
# ---------------------------------------------------------------------------

def tws_runtime_available() -> bool:
    """True when transformWithState can actually RUN here.

    The Python side of transformWithState talks to the JVM over a
    protobuf channel; without ``google.protobuf`` in the worker env the
    streaming runner crashes at init. The operator below is real and
    tested wherever protobuf exists — environments without it get a
    clean skip instead of a mid-query crash.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


try:  # the StatefulProcessor API landed in Spark 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class DriftProcessor(StatefulProcessor):
        """``walk_steps`` on the modern arbitrary-state API.

        vs applyInPandasWithState: state is a named, typed ValueState on
        a handle (composable with ListState/MapState/timers), the
        processor is an object with a lifecycle, and the runtime can use
        the RocksDB state store with changelog checkpointing — the
        forward-looking way to run this at 100 TB state sizes. Semantics
        are identical by construction: both call walk_steps, and tests
        assert stream == stream == batch replay.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last_value", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            last = self._last.get()[0] if self._last.exists() else None
            for pdf in rows:
                out, last = walk_steps(last, pdf)
                yield out
            if last is not None:
                self._last.update((float(last),))

        def close(self) -> None:
            pass

    def drift_walk_tws(steps: DataFrame) -> DataFrame:
        """The drift walk via ``transformWithStateInPandas`` (Spark 4+)."""
        return steps.groupBy("device_id", "sensor").transformWithStateInPandas(
            statefulProcessor=DriftProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )

except ImportError:  # pragma: no cover - pre-4.0 PySpark
    drift_walk_tws = None  # type: ignore[assignment]
