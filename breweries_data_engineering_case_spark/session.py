"""SparkSession factory with scale-ready defaults.

Replaces the reference's in-process DuckDB connection setup
(``app/io/duck.py:6-26``: S3 endpoint config + object cache). On Spark the
equivalents are s3a Hadoop conf and Catalyst/AQE defaults. Every setting here
is chosen for the 100 TB / 1000-executor target, then works unchanged on
``local[N]``:

- **AQE on** (runtime partition coalescing + skew-join splitting) so plans
  self-correct at scale without per-query tuning.
- **Dynamic partition overwrite** so date-partition re-runs replace only their
  own partition — the Spark-native analog of the reference's
  ``DELETE WHERE ingestion_date = …; INSERT`` idempotency (``app/tasks/gold.py:101-113``)
  and ``OVERWRITE_OR_IGNORE`` COPY (``app/tasks/silver.py:69``).
- **UTC session time** so timestamp semantics are deployment-independent.
- **Arrow enabled** so the few pandas-UDF operators (similarity, multimodal)
  move batches, not rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import Settings, settings as default_settings


def get_spark(
    app_name: str = "breweries-data-engineering-case-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    cfg: Settings | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``$SPARK_GRAFT_MASTER`` or ``local[N]`` with
    N=``$SPARK_GRAFT_CPUS`` (or all cores). On a real cluster, pass no master
    and let spark-submit decide — nothing else changes.
    """
    cfg = cfg or default_settings
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # -- correctness-critical semantics --------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # testdata parquet carries TIMESTAMP(NANOS); read as timestamp_ntz
        # (micros) instead of erroring (readers.py sets this per-session too)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # -- scale defaults -------------------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.files.maxPartitionBytes", "128MB")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # -- python/arrow path ----------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # managed-table root (bucketed tables); never the process CWD
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/bdec-spark-warehouse"),
        )
    )

    if cfg.lake_root.startswith("s3a://") and cfg.s3_endpoint:
        # ≈ reference app/io/duck.py:12-25 (endpoint, path-style, ssl, keys)
        b = (
            b.config("spark.hadoop.fs.s3a.endpoint", cfg.s3_endpoint)
            .config("spark.hadoop.fs.s3a.access.key", cfg.s3_access_key)
            .config("spark.hadoop.fs.s3a.secret.key", cfg.s3_secret_key)
            .config("spark.hadoop.fs.s3a.path.style.access", str(cfg.s3_path_style).lower())
            .config("spark.hadoop.fs.s3a.connection.ssl.enabled", str(cfg.s3_ssl).lower())
        )

    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)

    return b.getOrCreate()
