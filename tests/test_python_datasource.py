"""Custom Python DataSource (DSv2): partition pruning, filter fallback,
and content parity with the hash-generated oracle."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    LessThanOrEqual,
    StringStartsWith,
)

from breweries_data_engineering_case_spark.sources.python_datasource import (
    CATEGORIES,
    FeedReader,
    _h,
    register_feed_source,
)


def test_pushdown_prunes_page_partitions():
    r = FeedReader({"pages": "8", "rows_per_page": "10"})
    leftover = list(r.pushFilters([LessThanOrEqual(("page",), 3)]))
    assert leftover == []  # fully consumed by the connector
    assert [p.page for p in r.partitions()] == [0, 1, 2, 3]


def test_pushdown_composes_and_yields_unsupported():
    r = FeedReader({"pages": "8", "rows_per_page": "10"})
    unsupported = list(
        r.pushFilters(
            [
                GreaterThan(("page",), 1),
                LessThanOrEqual(("page",), 5),
                StringStartsWith(("category",), "al"),  # not prunable
            ]
        )
    )
    assert len(unsupported) == 1 and isinstance(unsupported[0], StringStartsWith)
    assert [p.page for p in r.partitions()] == [2, 3, 4, 5]


def test_equal_to_keeps_single_partition():
    r = FeedReader({"pages": "8", "rows_per_page": "10"})
    list(r.pushFilters([EqualTo(("page",), 6)]))
    assert [p.page for p in r.partitions()] == [6]


def test_scan_content_matches_hash_oracle(spark):
    register_feed_source(spark)
    rows = (
        spark.read.format("synthetic_feed")
        .option("pages", 2)
        .option("rows_per_page", 5)
        .load()
        .orderBy("item_id")
        .collect()
    )
    assert len(rows) == 10
    for row in rows:
        assert row.page == row.item_id // 5
        assert row.category == CATEGORIES[_h(f"feed:{row.item_id}") % 4]
        assert row.amount == _h(f"amt:{row.item_id}") % 10000


def test_residual_filter_still_applied_after_pushdown(spark):
    """Spark must re-apply what the connector declined (category filter)
    while the page filter prunes connector-side."""
    register_feed_source(spark)
    df = (
        spark.read.format("synthetic_feed")
        .option("pages", 4)
        .option("rows_per_page", 50)
        .load()
        .filter((F.col("page") <= 1) & (F.col("category") == "alpha"))
    )
    got = {(r.item_id, r.category) for r in df.collect()}
    want = {
        (i, "alpha")
        for i in range(100)
        if CATEGORIES[_h(f"feed:{i}") % 4] == "alpha"
    }
    assert got == want and got


def test_stream_reader_multi_batch_distributed(spark):
    """The streaming feed source must advance through MULTIPLE micro-batches
    (pages_per_batch < pages) and read each batch via executor partitions;
    the complete-mode aggregate over all batches equals the batch source's
    unfiltered aggregate."""
    import tempfile

    from pyspark.sql import functions as F

    from breweries_data_engineering_case_spark.sources.python_datasource import (
        register_feed_source,
        register_feed_stream_source,
    )

    register_feed_stream_source(spark)
    feed = (
        spark.readStream.format("synthetic_feed_stream")
        .option("pages", 8)
        .option("rows_per_page", 200)
        .option("pages_per_batch", 2)
        .load()
    )
    agg = feed.groupBy("category").agg(
        F.count(F.lit(1)).alias("items"),
        F.sum("amount").cast("long").alias("total_amount"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_feed_stream_mb")
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.processAllAvailable()
    n_data_batches = sum(
        1 for p in q.recentProgress if p["numInputRows"] > 0
    )
    rows_in = sum(p["numInputRows"] for p in q.recentProgress)
    q.stop()
    got = {
        (r["category"], r["items"], r["total_amount"])
        for r in spark.table("t_feed_stream_mb").collect()
    }
    assert n_data_batches >= 4, f"expected >=4 data micro-batches, saw {n_data_batches}"
    assert rows_in == 1600

    register_feed_source(spark)
    batch = (
        spark.read.format("synthetic_feed")
        .option("pages", 8)
        .option("rows_per_page", 200)
        .load()
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("items"),
            F.sum("amount").cast("long").alias("total_amount"),
        )
    )
    want = {
        (r["category"], r["items"], r["total_amount"]) for r in batch.collect()
    }
    assert got == want
