"""tugas_2_big_data_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``salsilsulselsol/Tugas-2-Big-Data``
(an ETL/batch-analytics pipeline over Indonesian stock-market data), plus
the large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) required for 100 TB-scale operation.

Design stance (see SURVEY.md §7):
- DataFrame/SQL declarative plans; Catalyst picks physical strategies.
- Explicit schemas; parquet-first IO; broadcast small dimensions.
- Pandas UDFs only where built-ins can't express the semantics.
- Every ranking operator takes an explicit, total sort key (the reference
  relied on MongoDB natural order — non-deterministic; see SURVEY.md §7).
"""

from tugas_2_big_data_spark.session import get_spark, tune_session

__all__ = ["get_spark", "tune_session"]
__version__ = "0.1.0"
