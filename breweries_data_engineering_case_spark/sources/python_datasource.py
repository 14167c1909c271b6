"""Custom Python DataSource (Spark 4 DSv2 API): a synthetic paginated feed.

The reference ingests a paginated REST API imperatively (driver-side page
loop, ``app/tasks/extract.py:29-77``); ``sources/rest.py`` ports those
semantics. This module is the *connector-native* expression of the same
idea: a first-class ``pyspark.sql.datasource.DataSource`` where

- each page is an ``InputPartition`` → pages are fetched **in parallel by
  executors**, not serially by the driver (the property that matters when
  "pages" are thousands of API shards at 100 TB);
- predicate pushdown on the ``page`` column prunes partitions *before any
  task launches* (``pushFilters``), so ``WHERE page <= 3`` schedules 4
  tasks, not 8 — the custom-source analogue of parquet partition pruning.

Row content is deterministic via the engine-portable md5-prefix hash
(``functions/hashing.py: portable_hash64``): ``hashlib.md5`` here produces
bit-identical values to DuckDB's ``md5()`` and Spark's ``F.md5``, so a SQL
oracle can regenerate the exact feed without running the connector.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CATEGORIES = ("alpha", "beta", "gamma", "delta")


def _h(s: str) -> int:
    """Portable 60-bit hash: first 15 hex chars of md5 (matches DuckDB/Spark)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


class _PagePartition(InputPartition):
    def __init__(self, page: int, rows_per_page: int):
        self.page = page
        self.rows_per_page = rows_per_page


class FeedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_pages = int(options.get("pages", 8))
        self.rows_per_page = int(options.get("rows_per_page", 200))
        self._kept_pages = list(range(self.n_pages))

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Prune page partitions from comparison filters on `page`.

        Supported filters are consumed (partitions drop out before task
        launch); anything else is yielded back for Spark to re-apply."""
        for f in filters:
            col = f.attribute[0] if f.attribute else None
            if col == "page" and isinstance(
                f, (EqualTo, LessThan, LessThanOrEqual, GreaterThan,
                    GreaterThanOrEqual),
            ):
                v = f.value
                keep = {
                    EqualTo: lambda p: p == v,
                    LessThan: lambda p: p < v,
                    LessThanOrEqual: lambda p: p <= v,
                    GreaterThan: lambda p: p > v,
                    GreaterThanOrEqual: lambda p: p >= v,
                }[type(f)]
                self._kept_pages = [p for p in self._kept_pages if keep(p)]
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        return [_PagePartition(p, self.rows_per_page) for p in self._kept_pages]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        base = partition.page * partition.rows_per_page
        for i in range(partition.rows_per_page):
            item_id = base + i
            cat = CATEGORIES[_h(f"feed:{item_id}") % 4]
            amount = _h(f"amt:{item_id}") % 10000
            yield (partition.page, item_id, cat, amount)


class FeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_feed"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("page", IntegerType()),
                StructField("item_id", LongType()),
                StructField("category", StringType()),
                StructField("amount", LongType()),
            ]
        )

    def reader(self, schema: StructType) -> FeedReader:
        return FeedReader(self.options)


def register_feed_source(spark) -> None:
    """Idempotently register the synthetic_feed data source on a session.

    Python-data-source filter pushdown is off by default; it is a
    runtime-settable SQL conf, so enable it here rather than relying on
    session-build conf (driver sessions are vanilla — see NOTES.md)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FeedDataSource)


class FeedStreamReader(DataSourceStreamReader):
    """Distributed streaming reader over the same md5-portable feed.

    Offsets advance ``pages_per_batch`` pages per micro-batch until the
    feed is exhausted; ``partitions(start, end)`` fans the offset range out
    as one InputPartition per page, so every micro-batch's rows are read BY
    EXECUTORS in parallel (the distributed ``streamReader`` API, not the
    driver-side ``SimpleDataSourceStreamReader``). Row content is identical
    to the batch FeedReader, so a SQL oracle regenerates the full stream."""

    def __init__(self, options: dict):
        self.n_pages = int(options.get("pages", 8))
        self.rows_per_page = int(options.get("rows_per_page", 200))
        self.pages_per_batch = int(options.get("pages_per_batch", 2))
        self._current = 0

    def initialOffset(self) -> dict:
        return {"page": 0}

    def latestOffset(self) -> dict:
        self._current = min(self._current + self.pages_per_batch, self.n_pages)
        return {"page": self._current}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return [
            _PagePartition(p, self.rows_per_page)
            for p in range(start["page"], end["page"])
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        base = partition.page * partition.rows_per_page
        for i in range(partition.rows_per_page):
            item_id = base + i
            cat = CATEGORIES[_h(f"feed:{item_id}") % 4]
            amount = _h(f"amt:{item_id}") % 10000
            yield (partition.page, item_id, cat, amount)

    def commit(self, end: dict) -> None:
        pass


class FeedStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_feed_stream"

    def schema(self) -> StructType:
        return FeedDataSource(options={}).schema()

    def streamReader(self, schema: StructType) -> FeedStreamReader:
        return FeedStreamReader(self.options)


def register_feed_stream_source(spark) -> None:
    """Idempotently register the synthetic_feed_stream source."""
    spark.dataSource.register(FeedStreamDataSource)
