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

``fan_out`` widens the frame only when the plan's current partitioning
is narrower than the session's parallelism, and it PROBES only
scan-shaped plans (project/filter over a file or local relation). For
those, ``df.rdd.getNumPartitions()`` is static split metadata — no job
runs. For any plan containing an exchange (join/agg/window upstream),
converting to an RDD under AQE materializes the upstream query stages
— i.e. the probe would EXECUTE part of the query — so fan_out no-ops
there instead: post-shuffle parallelism is governed by
``spark.sql.shuffle.partitions`` and the AQE coalesce floor that
session.py already tunes. When the probe does fire, the shuffle moves
only the narrow pre-compute rows — for a compute-bound stage that is
by definition cheap relative to the work it unlocks.

The post-shuffle twin of this problem — AQE coalescing kilobyte-sized
shuffle outputs back to one partition below a compute-heavy projection
— is handled in session.py by lowering
``spark.sql.adaptive.coalescePartitions.minPartitionSize`` instead;
see the note there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


# Optimized-logical-plan node names that cannot introduce an exchange:
# probing df.rdd below such a plan reads split metadata without running
# a job, even with AQE on. Anything else (Join, Aggregate, Window,
# Sort, RepartitionByExpression, ...) may plan exchanges, and the probe
# would materialize those query stages.
_SCAN_ONLY_NODES = frozenset(
    {
        "Project",
        "Filter",
        "Relation",
        "LogicalRelation",
        "LocalRelation",
        "SubqueryAlias",
        "LocalLimit",
        "GlobalLimit",
        "Sample",
        "OneRowRelation",
        # narrow multi-child / generating nodes: a Union concatenates
        # its children's partitions and a Generate (explode) is
        # map-only — neither plans an Exchange, so probing below them
        # is still free (the synthetic-dup corpora union scan branches)
        "Union",
        "Generate",
    }
)


def _scan_only(df: DataFrame) -> bool:
    """True iff every node of the optimized logical plan is scan-shaped
    (no operator that could plan an exchange)."""
    try:
        tree = df._jdf.queryExecution().optimizedPlan().treeString()
    except Exception:
        return False
    for line in tree.splitlines():
        name = line.lstrip(" :+-*'").split(" ", 1)[0].split("(", 1)[0]
        if name and name not in _SCAN_ONLY_NODES:
            return False
    return True


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to session parallelism IFF the frame is
    scan-shaped AND its planned split count is narrower. No-op (and no
    shuffle) when the source already provides enough splits — i.e. at
    cluster scale — and no-op on post-shuffle plans, where probing
    would eagerly execute upstream query stages under AQE (parallelism
    there is already governed by shuffle.partitions + the AQE coalesce
    floor in session.py)."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if not _scan_only(df):
        return df
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= target:
        return df
    return df.repartition(target)
