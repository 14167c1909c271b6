"""CLI entry point — ≈ ``python -m app.pipeline`` in the reference
(app/pipeline.py:28-29, README.md:279-287).

    python -m breweries_data_engineering_case_spark [--date YYYY-MM-DD] [--offline]

``--offline`` swaps the HTTP fetcher for a deterministic built-in fixture so
the full bronze→silver→gold run works with no network (the reference needs a
live API + MinIO; this engine needs neither).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def _offline_fetcher():
    """Three deterministic pages shaped like the Open Brewery DB API."""
    per_page = 50
    pages = []
    for p in range(3):
        n = per_page if p < 2 else 17
        pages.append(
            [
                {
                    "id": f"brewery-{p * per_page + i}",
                    "name": f" Brewery {p * per_page + i} ",
                    "brewery_type": ["micro", "brewpub", "regional", ""][i % 4],
                    "country": "United States",
                    "state": ["California", "Texas", "", "Oregon"][i % 4],
                    "state_province": "Fallback State",
                    "city": f"City {i % 10}",
                    "postal_code": f"9{i:04d}",
                    "latitude": str(32.0 + (i % 50) / 10.0),
                    "longitude": str(-120.0 + (i % 50) / 10.0),
                }
                for i in range(n)
            ]
        )

    def fetch(page: int):
        return (pages[page - 1] if page <= len(pages) else []), None

    return fetch


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="breweries_data_engineering_case_spark")
    ap.add_argument("--date", default=None, help="ingestion date (default: today)")
    ap.add_argument("--offline", action="store_true", help="use the built-in fixture fetcher")
    args = ap.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s"
    )

    from .config import Settings
    from .plans.pipeline import run
    from .session import get_spark

    cfg = None
    if args.offline:
        # page size must match the fixture's pages or the short-page rule
        # (app/tasks/extract.py:62-74) stops after page 1
        cfg = Settings(per_page=50)

    spark = get_spark(app_name="breweries-medallion-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        result = run(
            spark,
            ingestion_date=args.date,
            cfg=cfg,
            fetcher=_offline_fetcher() if args.offline else None,
        )
        print(json.dumps({k: v for k, v in result.items()}, default=str))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
