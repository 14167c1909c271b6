"""transformWithStateInPandas (Spark 4 typed-state API) and its
applyInPandasWithState fallback: one emissions contract, two engines.

The TWS Python worker needs protobuf; this container lacks it, so the
end-to-end TWS test is skip-gated on `tws_available()` and the fallback
path carries the executable coverage (plus the oracle-checked registry
query `streaming_transform_with_state`).
"""

from __future__ import annotations

import hashlib
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from breweries_data_engineering_case_spark.sources.readers import table_scan
from breweries_data_engineering_case_spark.streaming.events import stream_events
from breweries_data_engineering_case_spark.streaming.stateful import (
    TYPE_COUNT_OUTPUT,
    tws_available,
    user_type_counter,
    user_type_counter_fallback,
)


def _staged(spark, sf_dir: str) -> str:
    # key the staging dir by sf_dir (as q_streaming_transform_with_state
    # does): a fixed path would replay stale data if the corpus or scale
    # factor changes between runs while _batch_counts reads the new one.
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    staging = Path(tempfile.gettempdir()) / f"bdec_tws_test_{key}"
    if not (staging / "_SUCCESS").exists():
        table_scan(spark, sf_dir, "events").repartition(3).write.mode(
            "overwrite"
        ).parquet(str(staging))
    return str(staging)


def _final_counts(spark, stream_df, qname: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("event_cnt")
    )
    return {
        (r.user_id, r.event_type): r.event_cnt
        for r in spark.table(qname)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .collect()
    }


def _batch_counts(spark, sf_dir: str):
    return {
        (r.user_id, r.event_type): r.cnt
        for r in table_scan(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }


def test_tws_plan_builds_without_worker(spark, sf_dir):
    """Constructing the transformWithStateInPandas plan needs no Python
    worker — the API wiring (schemas, output mode, time mode) is checked
    even where protobuf is absent."""
    df = user_type_counter(stream_events(spark, _staged(spark, sf_dir)))
    assert df.isStreaming
    assert df.schema == TYPE_COUNT_OUTPUT


def test_fallback_equals_batch_groupby(spark, sf_dir):
    got = _final_counts(
        spark,
        user_type_counter_fallback(
            stream_events(spark, _staged(spark, sf_dir))
        ),
        "tws_fallback_test",
    )
    assert got == _batch_counts(spark, sf_dir)


@pytest.mark.skipif(not tws_available(), reason="protobuf not installed")
def test_tws_equals_batch_groupby(spark, sf_dir):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = _final_counts(
            spark,
            user_type_counter(stream_events(spark, _staged(spark, sf_dir))),
            "tws_real_test",
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    assert got == _batch_counts(spark, sf_dir)
