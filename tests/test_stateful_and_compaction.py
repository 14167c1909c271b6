"""applyInPandasWithState tracker, parquet compaction, incremental silver."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from breweries_data_engineering_case_spark.plans.silver import (
    transform_silver_incremental,
)
from breweries_data_engineering_case_spark.sources.readers import table_scan
from breweries_data_engineering_case_spark.sources.writers import compact_parquet
from breweries_data_engineering_case_spark.streaming.events import stream_events
from breweries_data_engineering_case_spark.streaming.stateful import (
    user_activity_tracker,
)


def test_stateful_user_tracker_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "in")
    table_scan(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(src)

    tracked = user_activity_tracker(stream_events(spark, src))
    q = (
        tracked.writeStream.format("memory")
        .queryName("t_user_tracker")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode may emit a row per user per micro-batch: final state = last
    got_df = spark.table("t_user_tracker")
    batch = (
        spark.read.parquet(src)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.sum("value").alias("value_sum"),
            F.max("value").alias("max_value"),
        )
    )
    b = {r.user_id: (r.event_cnt, round(r.value_sum, 6), r.max_value) for r in batch.collect()}
    # keep the max-count (latest) emission per user
    g: dict = {}
    for r in got_df.collect():
        cur = g.get(r.user_id)
        if cur is None or r.event_cnt > cur[0]:
            g[r.user_id] = (r.event_cnt, round(r.value_sum, 6), r.max_value)
    assert g == b


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    li = table_scan(spark, sf_dir, "lineitem")
    li.repartition(64).write.mode("overwrite").parquet(src)  # 64 tiny files
    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, out, target_file_mb=128)
    assert n == 1  # tiny dataset → single target file
    files = [f for f in __import__("pathlib").Path(out).rglob("*.parquet")]
    assert len(files) == 1
    assert spark.read.parquet(out).count() == li.count()


def test_incremental_silver_processes_only_new_files(spark, tmp_path):
    bronze = tmp_path / "bronze"
    silver = str(tmp_path / "silver")
    ck = str(tmp_path / "ck")

    def land(date: str, records: list[dict]):
        d = bronze / f"ingestion_date={date}"
        d.mkdir(parents=True, exist_ok=True)
        (d / "page_1.json").write_text(json.dumps(records))

    land("2024-01-01", [
        {"id": "a", "name": " A ", "country": "US", "state": "CA"},
        {"id": "b", "name": "B", "country": "US", "state": ""},  # dropped (state blank, no fallback)
    ])
    transform_silver_incremental(spark, str(bronze), silver, ck)
    assert {r.id for r in spark.read.parquet(silver).collect()} == {"a"}

    land("2024-01-02", [
        {"id": "c", "name": "C", "country": "US", "state": "TX"},
    ])
    transform_silver_incremental(spark, str(bronze), silver, ck)  # catch-up run
    got = {r.id for r in spark.read.parquet(silver).collect()}
    assert got == {"a", "c"}  # only the new file processed; no re-emission of a
