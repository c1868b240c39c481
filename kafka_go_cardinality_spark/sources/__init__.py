"""Data sources: fixture parquet tables and (gated) Kafka connectors."""

from kafka_go_cardinality_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    write_bucketed,
)

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "write_bucketed"]
