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
