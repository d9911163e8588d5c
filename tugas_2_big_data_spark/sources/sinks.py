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


def _path_exists(spark, path: str) -> bool:
    """True iff `path` exists, via the JVM Hadoop FileSystem bound to
    the session (so s3a://, hdfs://, file:// all resolve correctly)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def merge_upsert(
    updates: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str] = (),
) -> None:
    """Keyed MERGE (upsert) into a parquet table: rows in `updates`
    replace target rows with the same key; all other target rows are
    kept; new keys are inserted.

    Plain parquet has no transactional merge (that is a table-format
    feature — Delta/Iceberg/Hudi `MERGE INTO`), so this is the honest
    no-lakehouse formulation: anti-join the target against the update
    keys, union the updates, rewrite. The rewrite cost is the real
    story at scale: unpartitioned, it rewrites the whole table; with
    `partition_by` it narrows to dynamic overwrite of ONLY the
    partitions the updates touch — which is why upsert-heavy tables
    must be partitioned by something update-local (ingest date), and
    why a table format is the right tool once updates are frequent.

    Caveats stated, not hidden: the read-modify-write is not atomic
    (concurrent writers need a table format), and the target must not
    be read lazily from the same path being overwritten — the target
    is materialized (localCheckpoint) before the write so the rewrite
    never scans the files it is replacing.
    """
    spark = updates.sparkSession
    keys = list(keys)
    # Take the create path ONLY when the target genuinely does not
    # exist. A bare except here would treat ANY read failure (corrupt
    # footer, transient FS error, permissions) as "no table" and
    # overwrite the whole table with just the update batch — silent
    # loss of every non-updated row. Probe existence via the Hadoop
    # FileSystem API (works for any supported scheme), then let real
    # read errors propagate.
    if not _path_exists(spark, path):
        write_parquet(updates, path, mode="overwrite", partition_by=partition_by)
        return
    target = spark.read.parquet(path)
    if partition_by:
        # narrow the rewrite: only partitions present in the updates
        parts = updates.select(*partition_by).distinct()
        target = target.join(parts, list(partition_by), "left_semi")
    survivors = target.join(
        updates.select(*keys).distinct(), keys, "left_anti"
    )
    merged = survivors.unionByName(updates).localCheckpoint()
    if partition_by:
        overwrite_partitions(merged, path, partition_by)
    else:
        write_parquet(merged, path, mode="overwrite")
