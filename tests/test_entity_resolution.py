"""Entity resolution: blocking invariance, match correctness,
survivorship rules, and the never-all-pairs plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tugas_2_big_data_spark.operators import entity_resolution as er
from tugas_2_big_data_spark.plans import inspect as pi
from tugas_2_big_data_spark import queries as q  # noqa: F401  (registers all modules first)
from tugas_2_big_data_spark import queries_analytics as qa

from conftest import SF_UNIT


def test_block_key_invariant_under_corruptions(spark):
    """The digit-stream block key must survive both perturbations the
    dirty registry applies — a dropped letter and a word suffix."""
    df = spark.createDataFrame(
        [
            ("Customer#000000123",),
            ("Custmer#000000123",),   # letter dropped
            ("Customer#000000123 jr",),  # suffix alias
        ],
        ["name"],
    )
    keys = [
        r[0]
        for r in df.select(er.digits_block_key(F.col("name"))).collect()
    ]
    assert keys == ["00000012"] * 3


def test_block_key_bounds_block_size(spark):
    """Blocking on all-but-last digit caps base blocks at 10 records
    regardless of table size — the scale argument in one assert."""
    base = qa._er_base(spark, SF_UNIT)
    sizes = base.groupBy("block").count().agg(F.max("count")).collect()
    assert sizes[0][0] <= 10


def test_best_match_recovers_true_parent(spark):
    """Every dirty twin must resolve to the customer it was derived
    from: the typo twin at distance 1, the suffix alias at 3."""
    cand = er.blocked_candidates(
        qa._er_dirty(spark, SF_UNIT), qa._er_base(spark, SF_UNIT)
    )
    m = er.best_match(cand, max_dist=3).select(
        "d_id", "c_custkey", "dist"
    )
    rows = m.collect()
    assert rows, "no matches produced"
    for r in rows:
        assert r.c_custkey == r.d_id % 100000
        assert r.dist == (1 if r.d_id < 200000 else 3)


def test_every_dirty_record_is_matched(spark):
    dirty = qa._er_dirty(spark, SF_UNIT)
    cand = er.blocked_candidates(dirty, qa._er_base(spark, SF_UNIT))
    m = er.best_match(cand, max_dist=3)
    assert m.count() == dirty.count()


def test_survivorship_prefers_max_acctbal(spark):
    """The typo twin carries acctbal+1.5, so in every cluster that
    contains one, the survivor must be the typo twin (d_id in the
    +100000 range); alias-only clusters keep the base record."""
    base = qa._er_base(spark, SF_UNIT)
    cand = er.blocked_candidates(qa._er_dirty(spark, SF_UNIT), base)
    m = er.best_match(cand, max_dist=3)
    surv = er.survivorship(m, base)
    rows = {r.cluster_key: r for r in surv.collect()}
    assert rows, "no clusters produced"
    for key, r in rows.items():
        if key % 5 == 0:  # cluster contains a typo twin
            assert r.survivor_id == key + 100000
        else:  # alias-only cluster: base wins (alias is acctbal-2.0)
            assert r.survivor_id == key
        expected_n = 1 + (key % 5 == 0) + (key % 7 == 0)
        assert r.n_records == expected_n
    # clusters exist exactly for custkeys with at least one twin
    n_base = base.count()
    expected_clusters = sum(
        1 for k in range(n_base) if k % 5 == 0 or k % 7 == 0
    )
    assert len(rows) == expected_clusters


def test_er_plans_never_cartesian(spark):
    """The match must ride the block equi-join — a CartesianProduct or
    broadcast nested loop here is the all-pairs blowup blocking
    exists to prevent."""
    for name in ("er_blocked_candidates", "er_match_pairs", "er_survivorship"):
        fn = getattr(qa, name)
        df = fn(spark, SF_UNIT)
        plan = pi.explain_formatted(df)
        assert "CartesianProduct" not in plan, name
        if name != "er_blocked_candidates":
            # the one-row naive-pairs audit legitimately crosses two
            # single-row aggregates; the match/survivor paths must not
            # contain any nested-loop join at all
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_levenshtein_matches_duckdb():
    """Both engines implement standard edit distance — pin a few pairs
    so an engine swap can't silently change match semantics."""
    import duckdb

    pairs = [
        ("Customer#000000123", "Custmer#000000123"),
        ("Customer#000000123", "Customer#000000123 jr"),
        ("kitten", "sitting"),
        ("", "abc"),
    ]
    con = duckdb.connect()
    for a, b in pairs:
        d = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        expected = {"kitten": 3, "": 3}.get(a, 1 if "Custmer" in b else 3)
        assert d == expected, (a, b, d)
