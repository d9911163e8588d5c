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
