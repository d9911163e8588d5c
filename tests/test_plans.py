"""Physical-plan regression tests: scale hygiene pinned in CI.

A correctness-green query whose plan stops pushing filters, pruning
columns, or broadcasting dims would still pass the oracle gate — these
tests are what catches that before a 100 TB run would."""

from __future__ import annotations

import pytest

from tests.conftest import SF_UNIT
from tugas_2_big_data_spark import queries as q
from tugas_2_big_data_spark.plans import inspect as pi

REG = q.queries()


@pytest.fixture(scope="module")
def dfs(spark):
    return {name: fn(spark, SF_UNIT) for name, fn in REG.items()}


def test_q1_filter_pushed_to_scan(dfs):
    pushed = " ".join(pi.pushed_filters(dfs["tpch_q1"]))
    assert "l_shipdate" in pushed and "LessThanOrEqual" in pushed


def test_q1_column_pruning(dfs):
    cols = pi.read_schema_columns(dfs["tpch_q1"], "lineitem")
    # 7 of 11 lineitem columns needed; keys/partkeys must NOT be read
    assert "l_orderkey" not in cols
    assert "l_partkey" not in cols
    assert "l_quantity" in cols


def test_q3_dimension_broadcast(dfs):
    assert pi.uses_broadcast_join(dfs["tpch_q3"])
    assert not pi.uses_cartesian_or_bnl(dfs["tpch_q3"])


def test_q5_broadcasts_no_cartesian(dfs):
    assert pi.uses_broadcast_join(dfs["tpch_q5"])
    assert not pi.uses_cartesian_or_bnl(dfs["tpch_q5"])
    cols = pi.read_schema_columns(dfs["tpch_q5"], "lineitem")
    assert cols == {"l_discount", "l_extendedprice", "l_orderkey", "l_suppkey"}


def test_ann_topk_broadcasts_queries(dfs):
    # the small query side must broadcast: corpus stays partition-parallel
    assert pi.uses_broadcast_join(dfs["ann_cosine_topk"])
    assert not pi.uses_cartesian_or_bnl(dfs["ann_cosine_topk"])


def test_yf_agg_prunes_scan(dfs):
    cols = pi.read_schema_columns(dfs["yf_agg_month"], "lineitem")
    assert "l_orderkey" not in cols and "l_linenumber" not in cols


def test_topk_uses_window_group_limit(dfs):
    # Spark 3.5+/4.x prunes rank>k rows before the full window sort
    plan = pi.explain_formatted(dfs["win_topk_orders_per_customer"])
    assert "WindowGroupLimit" in plan


def test_q1_codegen_live(dfs):
    assert pi.wholestage_codegen_ids(dfs["tpch_q1"]) >= 1
