"""Paginated REST source semantics — mirrors the reference's pagination unit
cases (tests/unit/test_pagination.py:3-11) plus the loop regimes
(app/tasks/extract.py:51-74), all offline via an injected fetcher.
"""

from __future__ import annotations

import json
from pathlib import Path

from breweries_data_engineering_case_spark.sources.rest import (
    ingest_to_bronze,
    iter_pages,
    parse_last_page,
)


def test_parse_last_page_happy():
    link = '<https://x?page=2>; rel="next", <https://x?page=17>; rel="last"'
    assert parse_last_page(link) == 17


def test_parse_last_page_missing():
    assert parse_last_page(None) is None


def test_parse_last_page_malformed():
    assert parse_last_page('<https://x?page=2>; rel="next"') is None


def _fake_fetcher(pages: list[list[dict]], link: str | None = None):
    def fetch(page: int):
        rec = pages[page - 1] if page <= len(pages) else []
        return rec, (link if page == 1 else None)

    return fetch


def test_iter_pages_link_regime():
    pages = [[{"id": str(i * 10 + j)} for j in range(3)] for i in range(4)]
    link = '<https://x?page=4>; rel="last"'
    got = list(iter_pages(_fake_fetcher(pages, link), per_page=3))
    assert [p for p, _ in got] == [1, 2, 3, 4]


def test_iter_pages_fallback_stops_on_short_page():
    pages = [[{"id": "1"}, {"id": "2"}], [{"id": "3"}]]  # second page short
    got = list(iter_pages(_fake_fetcher(pages), per_page=2))
    assert [p for p, _ in got] == [1, 2]


def test_iter_pages_fallback_stops_on_empty():
    pages = [[{"id": "1"}, {"id": "2"}], [{"id": "3"}, {"id": "4"}], []]
    got = list(iter_pages(_fake_fetcher(pages), per_page=2))
    assert [p for p, _ in got] == [1, 2]


def test_iter_pages_respects_cap():
    def endless(page: int):
        return [{"id": str(page)}, {"id": str(page) + "b"}], None

    got = list(iter_pages(endless, per_page=2, max_pages=5))
    assert len(got) == 5


def test_ingest_to_bronze_layout(tmp_path: Path):
    pages = [[{"id": "1", "name": "a"}], []]
    n_pages, n_records = ingest_to_bronze(
        _fake_fetcher(pages), str(tmp_path), "2024-06-01", per_page=2
    )
    assert (n_pages, n_records) == (1, 1)
    files = list((tmp_path / "ingestion_date=2024-06-01").glob("page_1_*.json"))
    assert len(files) == 1
    assert json.loads(files[0].read_text()) == pages[0]
