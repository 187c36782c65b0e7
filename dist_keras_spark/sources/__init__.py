"""Sources & sinks: fixture-table loaders, generic readers, parquet sinks."""

from dist_keras_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "register_views"]
