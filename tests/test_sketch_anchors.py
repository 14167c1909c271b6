"""Accuracy anchors for sketch-based approximate queries: the sketch output
must stay within its error bound of the exact answer computed on the same
data — turning rows-only driver checks into bounded ones.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from breweries_data_engineering_case_spark.plans import registry
from breweries_data_engineering_case_spark.sources.readers import table_scan


def test_approx_percentiles_within_bound(spark, sf_dir):
    got = {
        r["o_orderpriority"]: (r["p50_approx"], r["p95_approx"])
        for r in registry.QUERIES["approx_order_percentiles"](spark, sf_dir).collect()
    }
    exact = {
        r["o_orderpriority"]: (r["p50"], r["p95"])
        for r in table_scan(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for k, (a50, a95) in got.items():
        e50, e95 = exact[k]
        # accuracy=10000 → rank error <= n/10000; translate to a loose value
        # tolerance: 2% of the group's value range
        rng = max(abs(e95), 1.0) * 0.02
        assert abs(a50 - e50) <= rng, f"{k}: p50 {a50} vs exact {e50}"
        assert abs(a95 - e95) <= rng, f"{k}: p95 {a95} vs exact {e95}"


def test_hll_weekly_users_within_bound(spark, sf_dir):
    got = {
        r["week"]: r["approx_weekly_users"]
        for r in registry.QUERIES["events_dau_hll_mergeable"](spark, sf_dir).collect()
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
    assert set(got) == set(exact)
    for wk, est in got.items():
        # default lgConfigK=12 → relative error ~1.6%; allow 5%
        assert abs(est - exact[wk]) <= max(2, 0.05 * exact[wk]), (wk, est, exact[wk])


def test_driver_rows_witness_bounds(spark, sf_dir):
    """VERDICT r5 #5: the rows-only driver run itself must witness each
    sketch's error bound — every row of the three sketch queries carries
    within_bound=true."""
    for name in (
        "approx_distinct_users",
        "approx_order_percentiles",
        "events_dau_hll_mergeable",
    ):
        rows = registry.QUERIES[name](spark, sf_dir).collect()
        assert rows, name
        bad = [r.asDict() for r in rows if not r["within_bound"]]
        assert not bad, f"{name}: bound violated: {bad}"
