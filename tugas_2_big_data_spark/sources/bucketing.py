"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem,
corpus ⋈ corpus candidate pairs) is shuffling both sides on the join
key. Bucketing pays that shuffle ONCE at write time: `bucketBy(n, key)`
hash-partitions rows into n fixed buckets per table, so any later
equi-join or aggregation on the bucket key reads matching buckets
side-by-side — Catalyst plans a SortMergeJoin with NO Exchange on
either side (pinned in tests/test_bucketing.py). `sortBy` within
buckets additionally drops the per-task Sort for sort-merge.

Rules that make co-location actually kick in (all pinned by test):
- both tables bucketed on the join key with the SAME bucket count
  (different counts shuffle the smaller side; a multiple can coalesce
  when spark.sql.bucketing.coalesceBucketsInJoin.enabled is on);
- the join key must equal the bucket key (a superset predicate is
  fine; a prefix is not);
- bucketed reads produce one task per bucket — size n_buckets so a
  bucket's largest key-slice fits an executor (at 100 TB: thousands).

Spark persists bucketing metadata in the session catalog
(`saveAsTable`) — on a cluster back it with a metastore so the
bucket spec survives sessions. Reference parity note: the reference
has no joins at all (SURVEY.md §2.5); this is an extension for the
engine's own fact-fact workloads.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Materialize `df` as a bucketed parquet table (pays the shuffle
    once so joins/aggs on `bucket_cols` never shuffle again)."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back with the bucket spec attached (a plain
    `spark.read.parquet(path)` on the same files LOSES the spec and
    re-shuffles — always read bucketed data through the catalog)."""
    return spark.table(table)


def compact_appended_state(
    spark: SparkSession,
    src_path: str,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> DataFrame:
    """Compact an append-accumulated state directory into a bucketed
    table and return the catalog-backed (bucket-spec-carrying) frame.

    The incremental-ingest loop's state merges are deliberately
    append-only (`dedup.merge_fingerprint_state` et al.): each ingest
    appends a batch-sized parquet piece, so after B batches the state
    directory holds O(B × batch partitions) small files AND any plain
    read of it has no bucket spec — every per-batch gate join
    re-shuffles the whole state (the spec-less contrast measured in
    INCR_STATE_PROBE.json: 6.1 s vs 3.6 s per check at the 100× state
    tier). Compaction pays ONE state-sized shuffle to restore both
    properties: `repartition(n_buckets, keys)` puts each bucket's rows
    in exactly one task (same murmur3 hash as the bucket spec, so each
    task writes exactly one file — n_buckets files total, no
    small-file explosion), and `bucketBy` records the spec in the
    catalog so subsequent gate joins shuffle ONLY the batch side.

    At 100 TB this is the standard maintenance trade: appends stay
    O(batch) on the ingest path; an off-peak compaction every N
    batches is O(state/N) amortized per batch. Results are invariant —
    `dedup_incremental_compacted`'s oracle is the UNCHANGED incremental
    oracle, and the unit test pins file count + no state-side
    Exchange."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(src_path).repartition(
        n_buckets, *[F.col(c) for c in bucket_cols]
    )
    write_bucketed(df, table, bucket_cols, n_buckets, sort_cols, path)
    return read_bucketed(spark, table)
