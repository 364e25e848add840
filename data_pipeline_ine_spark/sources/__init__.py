"""Sources & sinks: parquet/CSV/JSON readers, table registry, JDBC writer."""

from data_pipeline_ine_spark.sources.registry import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views"]
