from tugas_2_big_data_spark.sources.catalog import (
    TABLES,
    load_table,
    register_views,
    schema_for,
)

__all__ = ["TABLES", "load_table", "register_views", "schema_for"]
