"""Bucketized range join — timeseries extension (not in the reference,
which has no joins at all, SURVEY.md §2.5).

Joins a POINTS relation (one timestamp per row) to an INTERVALS relation
([start, end) per row) on containment, with no equi-key required.

Spark plans a bare inequality join as BroadcastNestedLoopJoin (or a
cartesian product when neither side broadcasts) — O(|points| ×
|intervals|) comparisons, a non-starter at scale. The classic fix is
interval bucketing:

  1. pick a bucket width >= the maximum interval length;
  2. each interval is exploded to the (at most 2, in general
     ceil(len/width)+1) buckets it overlaps;
  3. each point maps to exactly 1 bucket;
  4. equi-join on the bucket key, then re-check exact containment.

Every candidate pair shares a bucket, and an interval of length <= width
overlaps at most 2 buckets, so the join multiplies data by <= 2 instead
of |intervals|. The shuffle is a plain hash-partition on the bucket key:
shuffle-parallel at any scale, AQE-salvageable if one bucket is hot
(skew-join splitting applies to equi-joins, never to nested-loop plans).

When intervals can be long, pass an explicit `bucket_width` >= max
length; correctness never depends on the width (the exact predicate
re-checks), only the candidate amplification does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket_of(ts: Column, width_s: int) -> Column:
    return F.floor(F.unix_timestamp(ts) / F.lit(width_s)).cast("long")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_ts: str = "start",
    end_ts: str = "end",
    bucket_width_s: int = 1800,
    how: str = "inner",
) -> DataFrame:
    """Rows = (interval columns) × (point columns) for every point with
    start <= point_ts < end. Column names must not collide (alias
    upstream). `bucket_width_s` must be >= the longest interval; the
    exact containment predicate makes the result independent of the
    chosen width.
    """
    ivl = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket_of(F.col(start_ts), bucket_width_s),
                # end is exclusive, but a point in the same bucket as
                # `end` can still precede it — include end's bucket
                _bucket_of(F.col(end_ts), bucket_width_s),
            )
        ),
    )
    pts = points.withColumn("_b", _bucket_of(F.col(point_ts), bucket_width_s))
    return (
        ivl.join(pts, "_b", how)
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) < F.col(end_ts))
        )
        .drop("_b")
    )
