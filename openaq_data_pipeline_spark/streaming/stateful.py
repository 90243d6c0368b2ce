"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's incremental marts silently drop measurements that
arrive strictly older than the target's high-watermark
(``mart_location_air_quality.sql:16-19`` — SURVEY §2.9 "late-data
handling" documents the gap). This operator makes that loss
*observable*: a per-sensor stateful auditor that tracks the running
event-time high-watermark and counts how many rows each micro-batch
delivered below it — i.e. exactly the rows the reference's batch
MERGE would never have applied.

Shape (the idiomatic Spark custom-stateful-operator recipe):

- ``groupBy(sensor_id).applyInPandasWithState(...)`` — state is
  partitioned by the same key the bronze table clusters on
  (``_audit_sensor_id``, ``dags/01_openaq_ingestion.py:191``), so the
  shuffle matches the reference's physical design.
- State per sensor is three scalars (max-seen epoch, total, late) —
  O(|sensors|) bytes total, independent of row volume; checkpointed
  by the engine, so the audit survives restarts exactly once.
- Arrow batches in, Arrow batches out — no per-row Python.

"Late" is defined against the high-watermark *at micro-batch start*
(state from prior batches), not the running max within the batch:
intra-batch file ordering is nondeterministic, the batch boundary is
checkpointed and replayable. This matches the reference, where a
whole daily run compares against the mart's pre-run MAX(hour).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

AUDIT_OUTPUT_SCHEMA = (
    "sensor_id long, n_total long, n_late long, max_seen_utc timestamp"
)
_STATE_SCHEMA = "max_seen double, n_total long, n_late long"


def _audit_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        max_seen, n_total, n_late = state.get
    else:
        max_seen, n_total, n_late = float("-inf"), 0, 0
    hwm_at_start = max_seen  # late ⇔ below the pre-batch watermark
    for pdf in pdfs:
        if not len(pdf):
            continue
        # normalize to ns first: Arrow may hand pandas datetime64[us]
        epoch = pdf["measured_from_utc"].astype("datetime64[ns]").astype("int64") / 1e9
        n_late += int((epoch < hwm_at_start).sum())
        n_total += len(pdf)
        max_seen = max(max_seen, float(epoch.max()))
    state.update((max_seen, n_total, n_late))
    yield pd.DataFrame(
        {
            "sensor_id": [key[0]],
            "n_total": [n_total],
            "n_late": [n_late],
            # NaT, not Timestamp(-inf): converting -inf raises
            # OverflowError and would kill the query if this fn ever
            # runs for a group with no rows seen (e.g. under a future
            # timeout conf)
            "max_seen_utc": [
                pd.Timestamp(max_seen, unit="s")
                if max_seen != float("-inf")
                else pd.NaT
            ],
        }
    )


def sensor_late_arrival_audit(stg_stream: DataFrame) -> DataFrame:
    """Per-sensor late-arrival audit over a staged measurement stream
    (:func:`streaming.pipeline.stream_stg_measurements` output, or any
    stream with ``sensor_id`` + ``measured_from_utc``).

    Emits one updated row per sensor per micro-batch:
    ``(sensor_id, n_total, n_late, max_seen_utc)`` where ``n_late``
    is the cumulative count of rows that arrived below the sensor's
    pre-batch event-time high-watermark — the rows the reference's
    incremental MERGE silently discards."""
    return (
        stg_stream.select("sensor_id", "measured_from_utc")
        .groupBy("sensor_id")
        .applyInPandasWithState(
            _audit_fn,
            outputStructType=AUDIT_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
