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

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    WriterCommitMessage,
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


@dataclass
class JsonlCommitMessage(WriterCommitMessage):
    """Per-task commit message: where the task staged its file, row count."""

    staged: str
    n_rows: int


class JsonlSinkWriter(DataSourceWriter):
    """Executor/driver halves of the two-phase commit protocol.

    ``write`` runs ON EXECUTORS: each task serializes its partition to a
    uniquely-named file under ``<path>/_staged/`` (never the final name —
    a re-tried task must not collide with its zombie predecessor) and
    reports the staged path back. ``commit`` runs ON THE DRIVER only after
    every task succeeded: it publishes the staged files under their final
    ``part-N.jsonl`` names and writes the ``_SUCCESS`` manifest LAST, so
    readers that require the manifest never observe a partial write.
    ``abort`` deletes the staged files, leaving previously-committed data
    untouched. This is the same commit dance a real object-store sink
    performs (staged multipart uploads + manifest flip); the local
    filesystem stands in for the shared store."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_audit_sink requires a path")
        self.overwrite = overwrite

    def write(self, iterator) -> JsonlCommitMessage:
        import json as _json
        import os
        import uuid

        staged_dir = os.path.join(self.path, "_staged")
        os.makedirs(staged_dir, exist_ok=True)
        staged = os.path.join(staged_dir, f"task-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return JsonlCommitMessage(staged=staged, n_rows=n)

    def commit(self, messages) -> None:
        import json as _json
        import os

        prev_files = 0
        prev_rows = 0
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") or name == "_SUCCESS":
                    os.remove(os.path.join(self.path, name))
        else:
            # append: never reuse a published part index — a second write
            # starting at part-00000 would silently replace the first
            # write's files. Offset past whatever is already committed and
            # carry the prior manifest's counts forward so _SUCCESS stays
            # cumulative.
            existing = [
                n for n in os.listdir(self.path)
                if n.startswith("part-") and n.endswith(".jsonl")
            ]
            prev_files = len(existing)
            success = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(success):
                try:
                    with open(success) as f:
                        prev_rows = int(_json.load(f).get("rows", 0))
                except (ValueError, OSError):
                    prev_rows = 0
        offset = prev_files
        total = 0
        published = 0
        for m in messages:
            if m is None:
                continue
            os.replace(
                m.staged, os.path.join(self.path, f"part-{offset + published:05d}.jsonl")
            )
            published += 1
            total += m.n_rows
        self._cleanup_staged()
        manifest = {"files": prev_files + published, "rows": prev_rows + total}
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(_json.dumps(manifest))

    # staged task files older than this are zombie attempts (their job is
    # long finished: a commit would have published or an abort removed them).
    # LIMITATION: a LIVE concurrent job whose task-write-to-commit span
    # exceeds this age looks like a zombie — its staged file gets reaped and
    # its commit's os.replace fails. 24h is far above any realistic single
    # job on this sink; jobs that can exceed it must use distinct sink roots
    # (or this constant must be raised to exceed their worst-case runtime).
    _REAP_AGE_SEC = 24 * 3600

    def _cleanup_staged(self) -> None:
        """Reap zombie staged files, then remove the _staged dir if empty.

        A wholesale rmtree would delete a CONCURRENT writer's staged task
        files (two writers on one sink root share _staged; each task file is
        uuid-unique, so only the shared dir ever collides). This writer's
        own files are already gone — published by commit's os.replace or
        removed by abort. What can accumulate is task files from attempts
        that died WITHOUT reaching commit or abort (killed executors, OOMed
        jobs): those have no owner left, so any file older than
        ``_REAP_AGE_SEC`` is removed by age (ADVICE r9 — without this,
        _staged leaks zombie-attempt files indefinitely).

        Known benign race (documented, tolerated): a concurrent writer's
        ``write()`` has a window between its makedirs(_staged) and
        open(staged) where the dir is momentarily empty — this rmdir can
        win, making that open fail with FileNotFoundError. The task retry
        recreates the dir and succeeds; the commit protocol is unaffected
        (a spurious single-task retry, never data loss).
        """
        import os
        import time

        staged_dir = os.path.join(self.path, "_staged")
        try:
            cutoff = time.time() - self._REAP_AGE_SEC
            for name in os.listdir(staged_dir):
                p = os.path.join(staged_dir, name)
                try:
                    if os.path.getmtime(p) < cutoff:
                        os.remove(p)
                except OSError:
                    pass  # concurrently published/removed — someone owns it
        except OSError:
            pass  # _staged already gone
        try:
            os.rmdir(staged_dir)
        except OSError:
            pass  # non-empty (another writer's staged files) or already gone

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
        self._cleanup_staged()


class JsonlSinkDataSource(DataSource):
    """Writable Python DataSource (Spark 4 DSv2 write path) — completes the
    custom-connector matrix next to FeedDataSource (batch read, partition
    pruning) and FeedStreamDataSource (distributed streaming read)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit_sink"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, overwrite)


def register_jsonl_sink(spark) -> None:
    """Idempotently register the jsonl_audit_sink data source."""
    spark.dataSource.register(JsonlSinkDataSource)
