"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's incremental loop keeps per-feed progress in a JSON state file
and re-derives "what changed" each run (DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY
:321,370-397).  Structured Streaming's managed per-key state is the
Spark-native generalization: here a per-user running profile (event count,
session count, value sum, last-seen) is maintained in GroupState and updated
once per micro-batch — the pattern to reach for when windows/watermarks can't
express the semantics (arbitrary per-key carry-over logic).

Scale notes: state lives in the state store keyed by user_id (RocksDB-backed
on a real cluster), partitioned by the groupBy key — no driver state, no
collect.  (Spark 4's successor API, ``transformWithStateInPandas``, needs
the protobuf runtime for its state-server protocol — absent in this
container, verified crashing at stream start — so the engine standardizes
on ``applyInPandasWithState``, which is pure Arrow.)  Each micro-batch ships only that batch's rows through Arrow to
pandas; the emitted rows are one per active key per batch (cumulative
snapshot), so downstream ``max(cum_*)`` per key reconstructs final totals
regardless of how many batches the bounded input was split into.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType,
                               TimestampType)

# state: (n_events, n_sessions, sum_value, last_ts_epoch_us)
_STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("n_sessions", LongType()),
    StructField("sum_value", DoubleType()),
    StructField("last_ts_us", LongType()),
])

_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("cum_events", LongType()),
    StructField("cum_sessions", LongType()),
    StructField("cum_value", DoubleType()),
    StructField("last_ts", TimestampType()),
])

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, microseconds


def _update_user_profile(key: Tuple[Any, ...],
                         pdfs: Iterator[pd.DataFrame],
                         state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the carried state.

    Rows are sorted by event time inside the batch; a gap > 30 min (including
    the gap against the carried ``last_ts`` from earlier batches) opens a new
    session.  Emits ONE cumulative-snapshot row for the key.
    """
    (user_id,) = key
    if state.exists:
        n_events, n_sessions, sum_value, last_ts_us = state.get
    else:
        n_events, n_sessions, sum_value, last_ts_us = 0, 0, 0.0, None

    for pdf in pdfs:
        if pdf.empty:
            continue
        pdf = pdf.sort_values("ts")
        ts_us = (pdf["ts"].astype("int64") // 1_000).to_numpy()
        for t in ts_us:
            if last_ts_us is None or t - last_ts_us > SESSION_GAP_US:
                n_sessions += 1
            last_ts_us = int(t)
        n_events += len(pdf)
        sum_value += float(pdf["value"].sum())

    state.update((n_events, n_sessions, sum_value, last_ts_us))
    yield pd.DataFrame({
        "user_id": [user_id],
        "cum_events": [n_events],
        "cum_sessions": [n_sessions],
        "cum_value": [sum_value],
        "last_ts": [pd.Timestamp(last_ts_us, unit="us")],
    })


def running_user_profile(events_stream: DataFrame) -> DataFrame:
    """Per-user running profile over a stream of events.

    ``events_stream`` must be a streaming DataFrame with columns
    ``user_id:long, ts:timestamp, value:double``.  Returns a streaming
    DataFrame emitting, per micro-batch and active user, the cumulative
    (events, sessions, value-sum, last-seen) snapshot.
    """
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
