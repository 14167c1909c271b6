"""End-to-end medallion pipeline: bronze → silver → gold (+ quality).

≈ the reference flow ``run()`` (app/pipeline.py:10-26): strict sequencing,
per-stage retries (@task retries=2, delay 5 s; @flow retries=1), metric
logging. Orchestrator-agnostic: a plain Python entrypoint with a retry
decorator — swap in any scheduler.
"""

from __future__ import annotations

import datetime as _dt
import functools
import logging
import time
from collections.abc import Callable
from typing import Any, TypeVar

from pyspark.sql import SparkSession

from ..config import Settings, settings as default_settings
from ..sources.rest import Fetcher, ingest_to_bronze, requests_fetcher
from .gold import aggregate_gold
from .quality import run_checks
from .silver import transform_silver

log = logging.getLogger("breweries_spark.pipeline")
T = TypeVar("T")


def with_retries(retries: int = 2, delay_s: float = 5.0) -> Callable[[Callable[..., T]], Callable[..., T]]:
    """≈ Prefect ``@task(retries=2, retry_delay_seconds=5)``
    (app/tasks/extract.py:29, app/tasks/silver.py:5, app/tasks/gold.py:44)."""

    def deco(fn: Callable[..., T]) -> Callable[..., T]:
        @functools.wraps(fn)
        def wrapped(*args: Any, **kwargs: Any) -> T:
            last: BaseException | None = None
            for attempt in range(retries + 1):
                try:
                    return fn(*args, **kwargs)
                except BaseException as e:  # noqa: BLE001 — retry anything, like Prefect
                    last = e
                    if attempt < retries:
                        log.warning("%s failed (attempt %d/%d): %s — retrying in %.0fs",
                                    fn.__name__, attempt + 1, retries + 1, e, delay_s)
                        time.sleep(delay_s)
            assert last is not None
            raise last

        return wrapped

    return deco


def run(
    spark: SparkSession,
    ingestion_date: str | None = None,
    cfg: Settings | None = None,
    fetcher: Fetcher | None = None,
) -> dict[str, Any]:
    """Full pipeline for one run date (defaults to today, app/pipeline.py:14).

    ``fetcher`` is injectable for offline runs/tests; defaults to the real
    HTTP fetcher.
    """
    cfg = cfg or default_settings
    d = ingestion_date or _dt.date.today().isoformat()
    fetch = fetcher or requests_fetcher(cfg)

    extract = with_retries()(ingest_to_bronze)
    silver = with_retries()(transform_silver)
    gold = with_retries()(aggregate_gold)

    pages, records = extract(fetch, cfg.bronze_breweries, d, cfg.per_page, cfg.max_pages)
    log.info("bronze: %d pages, %d records", pages, records)

    rows, silver_path = silver(spark, cfg.bronze_breweries, cfg.silver_breweries, d)
    log.info("silver: %d rows → %s", rows, silver_path)
    run_checks(spark.read.parquet(silver_path))  # ≈ soda/checks/silver_breweries.yml

    exports = gold(spark, silver_path, cfg.gold_counts, cfg.warehouse_dir, d)
    log.info("gold: %s", exports)
    run_checks(  # ≈ soda/checks/gold_breweries.yml:1-3
        spark.read.parquet(cfg.warehouse_dir), positive_cols=("brewery_count",)
    )

    return {
        "ingestion_date": d,
        "bronze_pages": pages,
        "bronze_records": records,
        "silver_rows": rows,
        "silver_path": silver_path,
        "gold_exports": exports,
    }
