"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once as a count() action after a shared warm-up (JVM +
parquet footer caches), timing the full plan execution (scan → shuffle →
agg). Results are deliberately not collected to the driver — the cost being
measured is the distributed plan, not row transfer.
"""

from __future__ import annotations

import json
import os
import time

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_top_orders",
    "join_broadcast_dim",
    "join_shuffle_fact",
    "agg_count_group_by",
    "grouping_sets_hierarchy",
    "window_dedup_rownum",
    "silver_clean_contract",
    "gold_counts_hierarchy",
    "events_tumbling_window_hourly",
    "events_type_stats",
    "doc_dedup_exact",
    "doc_token_count",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from breweries_data_engineering_case_spark.plans import registry
    from breweries_data_engineering_case_spark.session import get_spark

    spark = get_spark(app_name="bdec-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM JIT + file listing + parquet footers, not measured
    registry.QUERIES["agg_count_group_by"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
