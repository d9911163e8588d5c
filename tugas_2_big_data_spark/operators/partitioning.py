"""Parallelism repair for compute-bound narrow stages.

Spark's scan parallelism is bounded by input splits, and a parquet file
is splittable only at row-group boundaries. The local testdata tables
are single-file, single-row-group — so every scan is ONE task, and any
expensive per-row projection above it (shingling, minhash, simhash,
per-centroid distance folds, Arrow-batched UDFs) runs serially on one
of 32 cores. On a real cluster a 100 TB table arrives as tens of
thousands of splits, so this problem disappears — which is exactly why
the fix must be CONDITIONAL: an unconditional repartition() would add
a full-table round-robin shuffle (100 TB of network) to repair
parallelism the scan already has.

``fan_out`` widens the frame only when the physical plan's current
partitioning is narrower than the session's parallelism. The check
reads the planned RDD partition count (static metadata; no job runs),
so the decision is free. When it does fire, the shuffle moves only the
narrow pre-compute rows — for a compute-bound stage that is by
definition cheap relative to the work it unlocks.

The post-shuffle twin of this problem — AQE coalescing kilobyte-sized
shuffle outputs back to one partition below a compute-heavy projection
— is handled in session.py by lowering
``spark.sql.adaptive.coalescePartitions.minPartitionSize`` instead;
see the note there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to session parallelism IFF the frame's
    planned partitioning is narrower. No-op (and no shuffle) when the
    source already provides enough splits — i.e. at cluster scale."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df.repartition(target)
    if current >= target:
        return df
    return df.repartition(target)
