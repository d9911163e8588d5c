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
        assert r.c_custkey == r.d_id // 10
        assert r.dist == (1 if r.d_id % 10 == 1 else 3)


def test_every_dirty_record_is_matched(spark):
    dirty = qa._er_dirty(spark, SF_UNIT)
    cand = er.blocked_candidates(dirty, qa._er_base(spark, SF_UNIT))
    m = er.best_match(cand, max_dist=3)
    assert m.count() == dirty.count()


def test_survivorship_prefers_max_acctbal(spark):
    """The typo twin carries acctbal+1.5, so in every cluster that
    contains one, the survivor must be the typo twin (variant 1 in
    the *10+variant rec-id encoding); alias-only clusters keep the
    base record (variant 0)."""
    base = qa._er_base(spark, SF_UNIT)
    cand = er.blocked_candidates(qa._er_dirty(spark, SF_UNIT), base)
    m = er.best_match(cand, max_dist=3)
    surv = er.survivorship(m, base, base_rec_id=F.col("c_custkey") * 10)
    rows = {r.cluster_key: r for r in surv.collect()}
    assert rows, "no clusters produced"
    for key, r in rows.items():
        if key % 5 == 0:  # cluster contains a typo twin
            assert r.survivor_id == key * 10 + 1
        else:  # alias-only cluster: base wins (alias is acctbal-2.0)
            assert r.survivor_id == key * 10
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


def _hot_block_fixture(spark, n_base=2000, hot_dirty=200, hot_base=50):
    """Synthetic registry with ONE planted hot block: `hot_base` base
    records and `hot_dirty` dirty records (1% of a 20k registry,
    scaled down 10x for test speed) share block '99999999' — the
    boilerplate-name shape that turns a block equi-join into a
    single straggler task."""
    base = spark.range(1, n_base + 1).selectExpr(
        "id AS c_custkey",
        "lpad(CAST(id AS STRING), 8, '0') AS block",
    ).withColumn(
        "block",
        F.when(F.col("c_custkey") <= hot_base, F.lit("99999999")).otherwise(
            F.col("block")
        ),
    )
    dirty = spark.range(1, n_base + 1).selectExpr(
        "id * 10 + 1 AS d_id",
        "lpad(CAST(id AS STRING), 8, '0') AS block",
    ).withColumn(
        "block",
        F.when(F.col("d_id") <= hot_dirty * 10, F.lit("99999999")).otherwise(
            F.col("block")
        ),
    )
    return dirty, base


def test_salted_candidates_same_set_as_plain(spark):
    """Salting must not change WHAT is compared — only where: the
    (d_id, c_custkey) candidate set is identical pair-for-pair."""
    dirty, base = _hot_block_fixture(spark, n_base=400, hot_dirty=40, hot_base=20)
    plain = er.blocked_candidates(dirty, base)
    salted = er.blocked_candidates_salted(dirty, base, salt=8)
    p = sorted(map(tuple, plain.select("d_id", "c_custkey").collect()))
    s = sorted(map(tuple, salted.select("d_id", "c_custkey").collect()))
    assert p == s
    assert len(p) > 0


def test_salted_join_balances_hot_block(spark):
    """Task-balance pin on the planted hot block: with AQE's skew
    rescue off and broadcast disabled (the worst-case plan — a plain
    sort-merge join), the unsalted join lands every hot-block pair in
    one shuffle partition; salt=8 must cut the max-partition share by
    at least 3x. This is the measured fallback for the paths AQE
    skew-split does not cover (broadcast/bucketed joins)."""
    dirty, base = _hot_block_fixture(spark)
    before = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def max_part_rows(df):
            parts = (
                df.withColumn("_pid", F.spark_partition_id())
                .groupBy("_pid")
                .count()
                .collect()
            )
            return max(r["count"] for r in parts)

        plain = er.blocked_candidates(dirty, base)
        salted = er.blocked_candidates_salted(dirty, base, salt=8)
        total = plain.count()
        hot_pairs = 200 * 50
        assert total >= hot_pairs
        plain_max = max_part_rows(plain)
        salted_max = max_part_rows(salted)
        # unsalted: the whole hot block is one key -> one partition
        assert plain_max >= hot_pairs
        assert salted_max * 3 <= plain_max, (plain_max, salted_max)
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_rejects_bad_salt(spark):
    dirty, base = _hot_block_fixture(spark, n_base=10, hot_dirty=2, hot_base=2)
    with pytest.raises(ValueError, match="salt"):
        er.blocked_candidates_salted(dirty, base, salt=0)


def test_salted_rejects_preexisting_salt_column(spark):
    """ADVICE r9: a caller-owned '_salt' column would be silently
    overwritten by the salting withColumn and then DROPPED from the
    output — corrupting caller data on a pure name collision. The
    guard must fire for the collision on EITHER side."""
    dirty, base = _hot_block_fixture(spark, n_base=10, hot_dirty=2, hot_base=2)
    with pytest.raises(ValueError, match="_salt"):
        er.blocked_candidates_salted(
            dirty.withColumn("_salt", F.lit(99)), base
        )
    with pytest.raises(ValueError, match="_salt"):
        er.blocked_candidates_salted(
            dirty, base.withColumn("_salt", F.lit(99))
        )


def test_dirty_rec_ids_collision_free_above_100k():
    """Regression for the additive-offset hazard: on a custkey space
    crossing 100k, +100000/+200000 offsets made a typo twin of c+100k
    collide with the alias twin of c (and dirty ids collide with real
    custkeys in the survivorship rec-id space). The *10+variant
    encoding must keep typo ids, alias ids, and base rec-ids (key*10)
    pairwise disjoint on exactly that space."""
    import duckdb

    con = duckdb.connect()
    # contiguous keys straddling 100k, including the old collision
    # pair (c, c+100000) with c%7==0 and (c+100000)%5==0
    con.execute(
        "CREATE VIEW customer AS "
        "SELECT k AS c_custkey, "
        "       'Customer#' || lpad(CAST(k AS VARCHAR), 9, '0') AS c_name, "
        "       CAST(k % 997 AS DOUBLE) AS c_acctbal "
        "FROM (SELECT unnest(generate_series(1, 210000)) AS k)"
    )
    dirty = con.execute(
        f"SELECT d_id FROM ({qa._ER_DIRTY_SQL})"
    ).fetchall()
    ids = [r[0] for r in dirty]
    assert len(ids) == len(set(ids)), "dirty d_id collision"
    n_typo = con.execute(
        "SELECT count(*) FROM customer WHERE c_custkey % 5 = 0"
    ).fetchone()[0]
    n_alias = con.execute(
        "SELECT count(*) FROM customer WHERE c_custkey % 7 = 0"
    ).fetchone()[0]
    assert len(ids) == n_typo + n_alias
    base_rec = {k * 10 for (k,) in con.execute(
        "SELECT c_custkey FROM customer"
    ).fetchall()}
    assert not base_rec & set(ids), "dirty id aliases a base rec id"


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
