"""Gold stage — four-granularity aggregation hierarchy + warehouse history.

≈ ``aggregate_gold`` (app/tasks/gold.py:45-180):

    read silver run slice                     ≈ gold.py:50-53,71
    → base counts (COUNT(*), COALESCE dims)   ≈ gold.py:74-86
    → idempotent append to history by date    ≈ gold.py:89-113 (DELETE+INSERT)
    → 4 granularity exports, partitioned      ≈ gold.py:115-178
    → temp-view mirrors of the _run views     ≈ gold.py:130,146,162,178

Spark-first choices:
- DELETE+INSERT → dynamic partition overwrite on ``ingestion_date``
  (sources.writers.idempotent_date_overwrite).
- The three coarser granularities re-aggregate the (tiny) base counts with
  SUM — like the reference — rather than rescanning silver; the counts
  DataFrame is computed once and reused, so Spark runs one silver scan total.
- The alternative single-pass GROUPING SETS plan is exposed as
  ``counts_grouping_sets`` for users who want all levels in one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.agg import grouped_count, grouping_sets_counts, regroup_sum
from ..schemas import GOLD_GRANULARITIES
from ..sources.readers import parquet_scan
from ..sources.writers import idempotent_date_overwrite, write_partitioned_parquet


def base_counts(silver: DataFrame) -> DataFrame:
    """COUNT(*) by (country, state, brewery_type), NULL dims → ''.

    ≈ v_gold_counts (app/tasks/gold.py:74-86).
    """
    return grouped_count(silver, ["country", "state", "brewery_type"]).orderBy(
        "country", "state", "brewery_type"
    )


def counts_grouping_sets(silver: DataFrame) -> DataFrame:
    """All four granularities in one shuffle (GROUPING SETS plan)."""
    return grouping_sets_counts(
        silver,
        list(GOLD_GRANULARITIES.values()),
        count_name="brewery_count",
        blank_fill="",
    )


def aggregate_gold(
    spark: SparkSession,
    silver_run_dir: str,
    gold_dir: str,
    warehouse_path: str,
    ingestion_date: str,
) -> dict[str, str]:
    """Full gold stage. Returns {granularity: export_path}."""
    silver = parquet_scan(spark, silver_run_dir)
    counts = base_counts(silver)

    # history table, idempotent per run date (≈ gold.py:89-113)
    idempotent_date_overwrite(counts, warehouse_path, ingestion_date)

    # per-run slice re-read from the history table, as the reference's four
    # exports read gold_breweries_counts, not the transient view (gold.py:120-121)
    history = spark.read.parquet(warehouse_path)
    run_slice = history.filter(F.col("ingestion_date") == F.to_date(F.lit(ingestion_date)))

    out: dict[str, str] = {}
    base = f"{gold_dir.rstrip('/')}/ingestion_date={ingestion_date}"
    for gran, dims in GOLD_GRANULARITIES.items():
        sel = regroup_sum(run_slice, dims) if dims != ("country", "state", "brewery_type") else (
            run_slice.select("country", "state", "brewery_type", "brewery_count")
        )
        sel = sel.orderBy(*dims)  # presentation order, gold.py:84 etc.
        path = f"{base}/{gran}"
        # partition by all dims but the last (a 1-dim export partitions flat),
        # mirroring _copy_to_gold_layer's PARTITION_BY (gold.py:19-21)
        part_cols = list(dims[:-1])
        if part_cols:
            write_partitioned_parquet(sel, path, part_cols)
        else:
            sel.write.mode("overwrite").option("compression", "snappy").parquet(path)
        sel.createOrReplaceTempView(f"v_gold_{gran}_run")  # ≈ gold.py:130 etc.
        out[gran] = path
    return out
