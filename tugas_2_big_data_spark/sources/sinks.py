"""Sink operators (SURVEY.md §2.2 K1-K3, parquet-first).

Reference sinks and their engine replacements:
- K1 append sink (yfinance_transform.py:125-137)      → mode("append")
- K2 drop-and-replace via driver collect + insert_many
  (idx_transform.py:318-331)                          → mode("overwrite"),
  fully distributed — no toPandas round-trip
- K3 per-row insert_one (IQ*:105,127)                 → overwrite/append

Engine default is overwrite-BY-PARTITION (dynamic partition overwrite):
re-running a day's job replaces exactly that day — the reference's
blind append double-writes on re-run (SURVEY.md §7 idempotency trap),
and full overwrite rewrites 100 TB to update one partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: Sequence[str]
) -> None:
    """Idempotent incremental write: replace only the partitions present
    in `df` (dynamic partition overwrite), leaving others untouched."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def append(df: DataFrame, path: str, partition_by: Sequence[str] = ()) -> None:
    """K1 parity: blind append (documented as non-idempotent on re-run)."""
    write_parquet(df, path, mode="append", partition_by=partition_by)
