"""breweries_data_engineering_case_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``alexmagalhaesdev/breweries-data-engineering-case``
(a DuckDB-SQL medallion ETL pipeline; see SURVEY.md). All relational compute
is declared with the DataFrame / Spark SQL API so Catalyst + Tungsten pick the
physical strategy; nothing here hand-schedules work the optimizer already does.

Layout
------
- ``session``    SparkSession factory with scale-ready defaults (AQE, dynamic
                 partition overwrite, UTC session time).
- ``config``     env-driven settings (≈ reference ``app/config.py:4-22``).
- ``schemas``    explicit StructType contracts (≈ ``app/utils/models.py:4-13``).
- ``sources``    readers (JSON/Parquet scans), writers (partitioned sinks,
                 idempotent date overwrite), paginated REST ingestion.
- ``functions``  column-level expression helpers (cleaning, text, vectors).
- ``operators``  composable DataFrame→DataFrame operators (dedup, enforce,
                 aggregation hierarchy, joins, similarity, multimodal).
- ``plans``      composed stages: silver, gold, pipeline, quality.
- ``streaming``  Structured Streaming analogs (file-source incremental
                 bronze→silver, event-time windows).
"""

__version__ = "0.1.0"
