"""IDX financial-report pipeline (Spark-first re-expression of
idx_transform.py).

Reference shape: Mongo find() → ALL docs through driver RAM → pandas →
createDataFrame → transform → count + toPandas (plan computed twice) →
driver-side insert_many (SURVEY.md §3.2). Engine shape: connector/
parquet scan → the declarative 32-column transform
(operators/financial.py) → distributed overwrite sink. No driver
materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from tugas_2_big_data_spark.operators import financial


def transform_reports(nested_reports: DataFrame) -> DataFrame:
    """Nested {company_code, year, period, data{...}} docs → the exact
    32-column frame of idx_transform.py:234-267."""
    return financial.transform(nested_reports)


def run(
    nested_reports: DataFrame,
    output_path: str | None = None,
    partition_by: tuple[str, ...] = ("year",),
) -> DataFrame:
    """Transform and (optionally) write partitioned parquet, overwrite
    mode — the idiomatic replacement for the reference's drop +
    insert_many (idx_transform.py:318-331)."""
    out = transform_reports(nested_reports)
    if output_path is not None:
        out.write.mode("overwrite").partitionBy(*partition_by).parquet(output_path)
    return out
