"""Sources & sinks: JSON/Parquet scans, partitioned writers, REST ingestion."""
