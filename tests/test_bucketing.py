"""Bucketed co-located joins: the write-once-shuffle-never-again seam.

Pins the claims in sources/bucketing.py: a join of two tables bucketed
on the join key with equal bucket counts plans NO Exchange on either
side, while the same join over plain parquet shuffles both sides.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_UNIT
from tugas_2_big_data_spark.sources import bucketing


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = spark.read.parquet(f"{SF_UNIT}/orders.parquet")
    customer = spark.read.parquet(f"{SF_UNIT}/customer.parquet")
    bucketing.write_bucketed(
        orders, "orders_b", ["o_custkey"], n_buckets=4,
        path=str(base / "orders_b"),
    )
    bucketing.write_bucketed(
        customer, "customer_b", ["c_custkey"], n_buckets=4,
        path=str(base / "customer_b"),
    )
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def _join(spark, left, right):
    return (
        left.join(right, left["o_custkey"] == right["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bucketed_join_no_exchange(spark, bucketed_pair):
    orders_b, customer_b = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.read_bucketed(spark, orders_b).join(
            bucketing.read_bucketed(spark, customer_b),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

        # the identical join over plain parquet shuffles both sides
        plain = spark.read.parquet(f"{SF_UNIT}/orders.parquet").join(
            spark.read.parquet(f"{SF_UNIT}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert "Exchange" in _physical_plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain(spark, bucketed_pair):
    orders_b, customer_b = bucketed_pair
    got = _join(
        spark,
        bucketing.read_bucketed(spark, orders_b),
        bucketing.read_bucketed(spark, customer_b),
    )
    want = _join(
        spark,
        spark.read.parquet(f"{SF_UNIT}/orders.parquet"),
        spark.read.parquet(f"{SF_UNIT}/customer.parquet"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_bucketed_agg_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also skips the shuffle: partial
    and final hash agg collapse into one stage per bucket."""
    orders_b, _ = bucketed_pair
    agg = (
        bucketing.read_bucketed(spark, orders_b)
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    assert "Exchange" not in _physical_plan(agg)


def test_compact_appended_state(spark, tmp_path):
    """compact_appended_state: 8 appends worth of small files become
    exactly n_buckets files, the gate result is unchanged, and the
    gate's state-side join plans with NO Exchange below the scan
    (only the batch side shuffles into the state's layout)."""
    import glob

    from tugas_2_big_data_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"state doc number {i} with words") for i in range(64)],
        ["doc_id", "text"],
    )
    appends = str(tmp_path / "appends")
    for i in range(8):
        piece = docs.filter(F.col("doc_id") % 8 == i)
        dedup.fingerprint_groups(piece).select("fp").write.mode(
            "append"
        ).parquet(appends)
    n_small = len(glob.glob(f"{appends}/part-*"))
    # one file per append here (tiny inline frames, AQE-coalesced);
    # at scale each append is batch-partitions files
    assert n_small >= 8

    state = bucketing.compact_appended_state(
        spark, appends, "t2bd_state_compact_test", ["fp"],
        n_buckets=4, path=str(tmp_path / "compacted"),
    )
    try:
        n_compact = len(glob.glob(f"{tmp_path}/compacted/part-*"))
        assert n_compact == 4  # one file per bucket: repartition first

        batch = spark.createDataFrame(
            [(100 + i, f"state doc number {i} with words") for i in range(8)]
            + [(200, "a genuinely fresh document here")],
            ["doc_id", "text"],
        )
        got = {
            r.doc_id
            for r in dedup.incremental_new_docs(batch, state).collect()
        }
        plain = {
            r.doc_id
            for r in dedup.incremental_new_docs(
                batch, spark.read.parquet(appends)
            ).collect()
        }
        assert got == plain == {200}

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _physical_plan(
                dedup.incremental_new_docs(batch, state)
            )
            # exactly one Exchange (the batch side); the bucketed state
            # scan feeds the join with no shuffle
            assert plan.count("Exchange hashpartitioning") == 1, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t2bd_state_compact_test")
