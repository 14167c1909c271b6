"""Custom stateful streaming operator via ``applyInPandasWithState``.

``user_activity_tracker`` maintains per-user running state across
micro-batches — cumulative event count, cumulative value, and a high-water
mark — emitting one updated row per user per batch. This is the template for
any custom sessionization/accumulation logic the built-in windowed
aggregations can't express; state lives in the state store (checkpointed,
exactly-once) and is bounded by the key cardinality plus the configured
timeout.

Everything crosses the JVM↔Python boundary as Arrow batches (pandas
DataFrames per key-group), never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("event_cnt", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_cnt", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def _track(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        cnt, vsum, vmax = state.get
    else:
        cnt, vsum, vmax = 0, 0.0, float("-inf")
    for pdf in batches:
        cnt += len(pdf)
        vsum += float(pdf["value"].sum())
        if len(pdf):
            vmax = max(vmax, float(pdf["value"].max()))
    state.update((cnt, vsum, vmax))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "event_cnt": [cnt],
            "value_sum": [vsum],
            "max_value": [vmax],
        }
    )


def user_activity_tracker(events: DataFrame) -> DataFrame:
    """Per-user running activity stats as an arbitrary-stateful streaming op.

    Update output mode; no timeout (state persists for the stream lifetime —
    add ``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.setTimeoutDuration``
    in ``_track`` to evict idle users at scale).
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
