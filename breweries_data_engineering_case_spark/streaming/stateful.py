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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
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


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas — the successor arbitrary-state API
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

TYPE_COUNT_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("event_cnt", LongType()),
    ]
)


class TypeCountProcessor(StatefulProcessor):
    """Per-user event-type counters held in MapState (event_type → count).

    transformWithStateInPandas is Spark 4's replacement for
    applyInPandasWithState: state is TYPED and COMPOSABLE (ValueState /
    ListState / MapState per processor, each schema'd and independently
    checkpointed) instead of one opaque tuple. The map accumulation is
    ORDER-INSENSITIVE (pure counts), so the result is independent of
    micro-batch partitioning — what makes an exact batch-twin oracle
    possible (contrast order-sensitive transition counting, which would
    depend on file arrival order)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "type_counts", "event_type string", "cnt bigint"
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        batch: dict[str, int] = {}
        for pdf in rows:
            for t, c in pdf["event_type"].value_counts().items():
                batch[t] = batch.get(t, 0) + int(c)
        out_types: list[str] = []
        out_cnts: list[int] = []
        for t, c in sorted(batch.items()):
            prev = (
                self._counts.getValue((t,))[0]
                if self._counts.containsKey((t,))
                else 0
            )
            total = prev + c
            self._counts.updateValue((t,), (total,))
            out_types.append(t)
            out_cnts.append(total)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_types),
                "event_type": out_types,
                "event_cnt": out_cnts,
            }
        )

    def close(self) -> None:
        pass


def user_type_counter(events: DataFrame) -> DataFrame:
    """Per-(user, event_type) running counts via transformWithStateInPandas."""
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            TypeCountProcessor(),
            outputStructType=TYPE_COUNT_OUTPUT,
            outputMode="update",
            timeMode="none",
        )
    )


def tws_available() -> bool:
    """transformWithStateInPandas needs protobuf on the Python side
    (pyspark.sql.streaming.proto) — probe instead of crashing mid-stream."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


_TC_STATE = StructType(
    [
        StructField("types", ArrayType(StringType())),
        StructField("cnts", ArrayType(LongType())),
    ]
)


def _track_types(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    counts: dict[str, int] = {}
    if state.exists:
        types, cnts = state.get
        counts = dict(zip(types, cnts))
    for pdf in batches:
        for t, c in pdf["event_type"].value_counts().items():
            counts[t] = counts.get(t, 0) + int(c)
    items = sorted(counts.items())
    state.update(([t for t, _ in items], [c for _, c in items]))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(items),
            "event_type": [t for t, _ in items],
            "event_cnt": [c for _, c in items],
        }
    )


def user_type_counter_fallback(events: DataFrame) -> DataFrame:
    """Same per-(user, type) running counts on the applyInPandasWithState
    API — the execution path when protobuf (required by the TWS Python
    worker) is absent. Identical emissions contract: update-mode, counts
    only grow, last emission per key is the total."""
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_types,
            outputStructType=TYPE_COUNT_OUTPUT,
            stateStructType=_TC_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming near-dup detection: LSH band buckets as stateful stream keys
# ---------------------------------------------------------------------------

LSH_STATE_SCHEMA = StructType([StructField("min_doc_id", LongType())])

LSH_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band_idx", LongType()),
        StructField("canon_id", LongType()),
    ]
)


def _band_dedup(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-(band_idx, band_hash) bucket state: the minimum doc_id ever seen.

    Each incoming doc that lands in a bucket some SMALLER-id doc already
    occupies is emitted as a near-dup candidate pair (doc, canonical=min
    id so far). Ids are processed in ascending order within a batch; the
    persisted min carries the invariant across batches — the streaming
    twin of the batch banded self-join (candidates only; the exact-Jaccard
    verify stays a batch post-pass on the tiny candidate set, same as
    minhash_lsh_pairs). Arrival order across batches is arbitrary: when a
    batch delivers an id SMALLER than the persisted min, the previously-
    canonical doc is itself emitted as a candidate of the new minimum —
    without that emission the (old-min, new-min) bucket collision would be
    lost in both directions (ADVICE r9).

    CROSS-BATCH SEMANTICS (ADVICE r10): the output is arrival-order
    candidate PAIRS, transitively connected within a bucket — NOT per-doc
    full-corpus minima. A doc emitted in an earlier batch keeps its
    then-current canonical even if a later batch brings a smaller id
    (bucket sees 5 then 11 → emits 11→5; a later 1 emits only 5→1, so
    doc 11's aggregated dup_candidate_of stays 5 while a full-corpus
    batch pass would give 1). Consumers needing per-doc minima must
    resolve the pair graph (connected components / transitive min), as
    the downstream registry queries do; the oracle stages a single
    deterministic micro-batch so this never diverges in the gate."""
    # Per-group Python overhead is THE scale cost of this operator (SF1:
    # ~200k near-singleton groups), so the common path is kept allocation-
    # free: a singleton new bucket does one state write and yields NOTHING
    # (no output-DataFrame construction), and a re-observed bucket whose
    # min is unchanged skips the state write too.
    prev = int(state.get[0]) if state.exists else None
    cur = prev
    out_doc: list[int] = []
    out_canon: list[int] = []
    chunks = [pdf["doc_id"].to_numpy() for pdf in batches]
    if not chunks:  # timeout-only invocation: nothing to do under NoTimeout
        return
    ids = np.sort(np.concatenate(chunks)) if len(chunks) > 1 else np.sort(chunks[0])
    for d in ids:
        d = int(d)
        if cur is None:
            cur = d
        elif d > cur:
            out_doc.append(d)
            out_canon.append(cur)
        elif d < cur:
            # a later batch brought a smaller id: demote the old canonical
            # doc to a candidate of the new minimum, then adopt it
            out_doc.append(cur)
            out_canon.append(d)
            cur = d
        # d == cur: the canonical doc re-observed — no pair
    if cur != prev:
        state.update((cur,))
    if out_doc:
        yield pd.DataFrame(
            {
                "doc_id": out_doc,
                "band_idx": np.full(len(out_doc), int(key[0]), dtype=np.int64),
                "canon_id": out_canon,
            }
        )


def lsh_band_dedup(banded: DataFrame) -> DataFrame:
    """Stateful streaming near-dup candidates over (band_idx, band_hash).

    ``banded``: a STREAMING frame of (doc_id, band_idx, band_hash) rows —
    one per LSH band per document (signature/banding are stateless map
    expressions upstream). State per bucket is ONE long (the canonical
    min doc id), so state size is bounded by the number of occupied
    buckets regardless of stream length — the property that makes
    streaming near-dup viable where a dropDuplicates-on-text would hold
    full payloads in the state store."""
    return banded.groupBy("band_idx", "band_hash").applyInPandasWithState(
        _band_dedup,
        outputStructType=LSH_OUTPUT_SCHEMA,
        stateStructType=LSH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
