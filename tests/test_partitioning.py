"""fan_out: conditional parallelism repair (operators/partitioning.py).

The contract that matters at scale: fan_out must be a NO-OP (no
Exchange added) when the input already has enough partitions — i.e. on
any real cluster scan — and must widen the narrow local single-split
scan to session parallelism.
"""

from __future__ import annotations

from tugas_2_big_data_spark.operators.partitioning import fan_out


def test_fan_out_widens_narrow_scan(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    wide = fan_out(df)
    assert (
        wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )


def test_fan_out_noop_on_wide_frame(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(par + 4)
    out = fan_out(df)
    # no-op: same object back, so no Exchange enters the plan
    assert out is df


def test_fan_out_values_unchanged(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert sorted(r.doc_id for r in fan_out(df).collect()) == sorted(
        r.doc_id for r in df.collect()
    )


def test_fan_out_noop_on_post_shuffle_plan(spark):
    """Plans containing exchanges must not be probed: df.rdd under AQE
    materializes upstream query stages (ADVICE r2). fan_out returns the
    frame untouched; post-shuffle parallelism is AQE's job."""
    from pyspark.sql import functions as F

    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = fan_out(df)
    assert out is df


def test_fan_out_widens_union_of_scans(spark):
    """Union and Generate add no exchanges — a union of narrow scans is
    still probe-safe and must be widened (the synthetic-dup corpora are
    unions of scan branches)."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    u = df.unionByName(df)
    wide = fan_out(u)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
