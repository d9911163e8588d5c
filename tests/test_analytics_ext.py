"""Tests for the analytics extensions: range join, hypertable rollup,
sketch aggregates (error-bounded vs exact), and plan-shape pins.

The oracle-equality of evt_range_join_30min / evt_hypertable_rollup /
unpivot / window-distribution queries is covered by test_oracle_parity
(they register DuckDB SQL); here we pin the properties an oracle can't
see: plan shape (no nested-loop join) and sketch error bounds (no
exact oracle exists by construction).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_UNIT
from tugas_2_big_data_spark import queries as q
from tugas_2_big_data_spark.operators import rangejoin, timeseries
from tugas_2_big_data_spark.plans import inspect as pi
from tugas_2_big_data_spark.sources.catalog import load_table

REG = q.queries()


def test_range_join_is_equi_join_not_nested_loop(spark):
    """The whole point of bucketization: Catalyst must plan a hash/sort
    equi-join on the bucket key, never BroadcastNestedLoop/cartesian."""
    df = REG["evt_range_join_30min"](spark, SF_UNIT)
    assert not pi.uses_cartesian_or_bnl(df)


def test_range_join_width_independence(spark):
    """Containment predicate makes results independent of bucket width
    (width only shapes candidate amplification)."""
    ev = load_table(spark, "events", SF_UNIT)
    anchors = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 150))
        .select(
            F.col("event_id").alias("anchor_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
        )
    )
    points = ev.select(F.col("event_id").alias("pid"), "ts")
    kwargs = dict(point_ts="ts", start_ts="start_ts", end_ts="end_ts")
    narrow = rangejoin.bucketed_range_join(
        points, anchors, bucket_width_s=1800, **kwargs
    )
    wide = rangejoin.bucketed_range_join(
        points, anchors, bucket_width_s=7200, **kwargs
    )
    a = sorted((r.anchor_id, r.pid) for r in narrow.collect())
    b = sorted((r.anchor_id, r.pid) for r in wide.collect())
    assert a == b and len(a) > 0


def test_rollup_grains_nest_exactly(spark):
    """Every 1d bucket's n_rows equals the sum of its 1h buckets, and
    total rows at each grain equal the raw count (lossless rollup)."""
    ev = load_table(spark, "events", SF_UNIT)
    out = timeseries.hypertable_rollup(
        ev, "ts", "value", widths_s=(300, 3600, 86400),
        grain_labels=("5m", "1h", "1d"),
    ).cache()
    raw = ev.count()
    per_grain = {
        r.grain: r.total
        for r in out.groupBy("grain").agg(F.sum("n_rows").alias("total")).collect()
    }
    assert per_grain == {"5m": raw, "1h": raw, "1d": raw}
    out.unpersist()


def test_rollup_rejects_non_nesting_widths(spark):
    ev = load_table(spark, "events", SF_UNIT)
    with pytest.raises(ValueError, match="nest"):
        timeseries.hypertable_rollup(ev, "ts", "value", widths_s=(300, 1000))


def test_hll_distinct_within_rsd(spark):
    """sketch_distinct_users emits the exact per-group answer plus a
    within_bound flag asserting the HLL++ estimate is inside 5x the
    configured rsd (1%) — the flag itself is the error-bound check the
    driver hash-compares against the all-true oracle column."""
    rows = REG["sketch_distinct_users"](spark, SF_ORACLE).collect()
    ev = load_table(spark, "events", SF_ORACLE)
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.exact_users == exact[r.event_type]
        assert r.within_bound, (r.event_type, r.exact_users)


def test_approx_quantiles_rank_error(spark):
    """sketch_value_quantiles emits exact p50/p90/p99 plus within_bound
    pinning each GK estimate between the exact quantiles at rank
    p ± 0.01. Cross-check the exact values independently and assert the
    flag is true for every group."""
    import bisect

    rows = REG["sketch_value_quantiles"](spark, SF_ORACLE).collect()
    ev = load_table(spark, "events", SF_ORACLE)
    for r in rows:
        vals = sorted(
            x.value
            for x in ev.filter(F.col("event_type") == r.event_type)
            .select("value")
            .collect()
            if x.value is not None
        )
        n = len(vals)
        assert r.within_bound, r.event_type
        for p, exact_v in [
            (0.5, r.p50_exact), (0.9, r.p90_exact), (0.99, r.p99_exact)
        ]:
            rank = bisect.bisect_right(vals, exact_v) / n
            assert abs(rank - p) <= 0.02, (r.event_type, p, exact_v, rank)

def test_heavy_hitters_bounds_and_guarantee(spark):
    """Misra-Gries merge contract under a deliberately tiny local_k:
    bounds always contain the exact count, and an item heavier than the
    total residual can never be missed from the candidate set."""
    from tugas_2_big_data_spark.operators import sketches

    # 4 heavy users (200..50 events each) + 60 singleton users, keyed
    # by a deterministic event_id so shards are reproducible
    rows, eid = [], 0
    for uid, cnt in [(1, 200), (2, 120), (3, 80), (4, 50)]:
        for _ in range(cnt):
            rows.append((eid, uid))
            eid += 1
    for uid in range(100, 160):
        rows.append((eid, uid))
        eid += 1
    df = spark.createDataFrame(rows, ["event_id", "user_id"])
    # local_k=4 keeps every heavy user above the residual cut: with
    # ~6-25 events per heavy user per shard vs singleton counts of 1,
    # the per-shard residual is 1 and Σ residuals (≤ 8) is far below
    # user 4's 50 events — the miss-proof premise of the guarantee
    out = sketches.heavy_hitters(
        df, "user_id", "event_id", n_shards=8, local_k=4, top_n=4
    ).collect()
    got = {r.item: r for r in out}
    assert set(got) == {1, 2, 3, 4}  # heavy items all surface
    for r in out:
        assert r.within_bound, r
        assert r.est_lo <= r.exact_cnt <= r.est_hi, r
    # ordering by est_lo matches true frequency order here
    assert [r.item for r in out] == [1, 2, 3, 4]


def test_heavy_hitters_state_is_bounded(spark):
    """The post-shuffle sketch state is at most n_shards * (local_k+1)
    rows regardless of item cardinality (the bounded-memory claim)."""
    from tugas_2_big_data_spark.operators import sketches

    rows = [(i, i % 500) for i in range(3000)]  # 500 distinct items
    df = spark.createDataFrame(rows, ["event_id", "user_id"])
    out = sketches.heavy_hitters(
        df, "user_id", "event_id", n_shards=4, local_k=3, top_n=50
    ).collect()
    # candidates come only from shard top-k lists: <= 4 shards * 3 kept
    assert len(out) <= 12
    for r in out:
        assert r.est_lo <= r.exact_cnt <= r.est_hi


def test_count_min_never_underestimates_and_state_is_bounded(spark):
    """Count-Min's one-sided guarantee is certain, not probabilistic:
    every occurrence of an item increments all of its cells, so the
    min over rows can only OVER-count. A deliberately tiny width
    forces collisions; the estimates must still bound from above, and
    the counter table must stay <= depth*width rows."""
    from tugas_2_big_data_spark.operators import sketches

    rows = [(i, i % 37) for i in range(1500)]  # skewed-ish 37 items
    df = spark.createDataFrame(rows, ["event_id", "user_id"])
    out = sketches.count_min_heavy(
        df, "user_id", depth=3, width=8, top_n=37
    ).collect()
    assert len(out) == 37
    assert all(r.within_bound for r in out)
    assert all(r.cm_est >= r.exact_cnt for r in out)
    items = df.groupBy(F.col("user_id").alias("item")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    counters = sketches.count_min_counters(items, depth=3, width=8)
    assert counters.count() <= 3 * 8


def test_merge_count_min_equals_sketch_of_concat(spark):
    """Cell-wise sum of two counter tables == the counter table of the
    concatenated streams (the mergeability that lets the sketch ride
    the append-only ingest loop)."""
    from tugas_2_big_data_spark.operators import sketches

    a = spark.createDataFrame(
        [(i, i % 5) for i in range(200)], ["event_id", "user_id"]
    )
    b = spark.createDataFrame(
        [(i, i % 7) for i in range(300)], ["event_id", "user_id"]
    )

    def counts(df):
        return df.groupBy(F.col("user_id").alias("item")).agg(
            F.count(F.lit(1)).alias("cnt")
        )

    cm_a = sketches.count_min_counters(counts(a), depth=4, width=16)
    cm_b = sketches.count_min_counters(counts(b), depth=4, width=16)
    merged = {
        (r.r, r.c): r.cell
        for r in sketches.merge_count_min(cm_a, cm_b).collect()
    }
    whole = {
        (r.r, r.c): r.cell
        for r in sketches.count_min_counters(
            counts(a.unionByName(b)), depth=4, width=16
        ).collect()
    }
    assert merged == whole


def test_hll_registers_bounded_and_accurate(spark):
    """The register table never exceeds 2^b rows whatever the input
    cardinality; the estimate lands within 5 sigma of truth in both
    regimes (linear-counting small-n, raw estimator large-n); rho stays
    inside [1, 53]; NULL items contribute nothing."""
    import math

    from tugas_2_big_data_spark.operators import sketches

    small = spark.createDataFrame(
        [(i % 40,) for i in range(500)] + [(None,)], ["v"]
    )
    big = spark.createDataFrame([(i,) for i in range(20000)], ["v"])
    for df, truth in ((small, 40), (big, 20000)):
        reg = sketches.hll_registers(df, "v")
        rows = reg.collect()
        assert len(rows) <= 256
        assert all(1 <= r.r <= 53 for r in rows)
        [(est,)] = sketches.hll_estimate(reg).collect()
        sigma = 1.04 / math.sqrt(256)
        assert abs(est - truth) / truth <= 5 * sigma, (est, truth)


def test_merge_hll_equals_sketch_of_concat(spark):
    """Cell-wise max of two register tables == the register table of
    the concatenated inputs, register-for-register — the identity that
    lets per-batch sketches merge into the ingest-state sketch without
    re-reading the corpus."""
    from tugas_2_big_data_spark.operators import sketches

    a = spark.createDataFrame([(i,) for i in range(0, 900, 2)], ["v"])
    b = spark.createDataFrame([(i,) for i in range(1, 1200, 3)], ["v"])
    merged = {
        r.idx: r.r
        for r in sketches.merge_hll(
            sketches.hll_registers(a, "v"), sketches.hll_registers(b, "v")
        ).collect()
    }
    whole = {
        r.idx: r.r
        for r in sketches.hll_registers(a.unionByName(b), "v").collect()
    }
    assert merged == whole


def test_hll_intersection_inclusion_exclusion(spark):
    """est_intersection = est_a + est_b - est_union exactly (the I-E
    identity over the three estimates), and the estimate lands near
    the true overlap when the overlap is a large fraction of the
    union (the regime the estimator is for)."""
    from tugas_2_big_data_spark.operators import sketches

    a = spark.createDataFrame([(i,) for i in range(0, 3000)], ["v"])
    b = spark.createDataFrame([(i,) for i in range(1500, 4500)], ["v"])
    ra = sketches.hll_registers(a, "v")
    rb = sketches.hll_registers(b, "v")
    [row] = sketches.hll_intersection_estimate(ra, rb).collect()
    assert abs(
        row.est_intersection - (row.est_a + row.est_b - row.est_union)
    ) < 1e-9
    # truth: 1500 overlap of a 4500 union; 5 sigma of the union size
    assert abs(row.est_intersection - 1500) <= 5 * (1.04 / 16) * row.est_union


def test_bloom_prefilter_join_equals_plain_join(spark):
    """The bloom prefilter is semantically invisible: identical rows to
    the plain inner join, including under a deliberately tiny bloom
    (high false-positive rate — the join must clean up every FP) and
    with fact keys absent from dim."""
    from tugas_2_big_data_spark.operators import joins

    fact = spark.createDataFrame(
        [(i, i % 50, float(i)) for i in range(800)], ["rid", "k", "v"]
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 50, 7)], ["k", "name"]
    )
    plain = sorted(
        (r.rid, r.name) for r in fact.join(dim, "k").collect()
    )
    for n_blocks in (8, 4096):  # 8 blocks ~ saturated bloom, all FPs
        got = sorted(
            (r.rid, r.name)
            for r in joins.bloom_prefilter_join(
                fact, dim, "k", n_blocks=n_blocks
            ).collect()
        )
        assert got == plain, n_blocks


def test_histogram_quantile_bound_and_degenerate_grid(spark):
    """The histogram estimator's certain guarantee: |est - exact| <=
    one bin width, at every probed p; the sketch stays <= n_bins rows;
    an all-equal column (degenerate grid) does not divide by zero."""
    from tugas_2_big_data_spark.operators import sketches

    df = spark.createDataFrame(
        [(float(i) ** 1.5,) for i in range(2000)], ["v"]
    )
    hist = sketches.histogram_counts(df, "v", n_bins=64)
    rows = hist.collect()
    assert len(rows) <= 64
    width = rows[0].width
    est = {
        r.p: r.est
        for r in sketches.histogram_quantile_estimates(
            hist, [0.5, 0.9, 0.99]
        ).collect()
    }
    import math

    n = 2000
    for p, e in est.items():
        # type-7 exact quantile of the generated data
        rank = p * (n - 1)
        lofl = math.floor(rank)
        frac = rank - lofl
        exact = (lofl ** 1.5) * (1 - frac) + ((lofl + 1) ** 1.5) * frac
        assert abs(e - exact) <= width + 1e-9, (p, e, exact)

    flat = spark.createDataFrame([(5.0,)] * 10, ["v"])
    fh = sketches.histogram_counts(flat, "v", n_bins=8)
    [r] = fh.collect()
    assert r.bin == 0 and r.cnt == 10
    [e] = sketches.histogram_quantile_estimates(fh, [0.5]).collect()
    assert e.est is not None


def test_profile_columns_values_and_types(spark):
    """Profile stats on a hand-checkable frame: counts, nulls, exact
    distincts, typed extremes (numeric double, timestamp epoch-us,
    string native), avg only for numerics."""
    from datetime import datetime

    from tugas_2_big_data_spark.operators import profiling

    df = spark.createDataFrame(
        [
            (1, "a", 2.0, datetime(2024, 1, 1, 0, 0, 0)),
            (2, "b", None, datetime(2024, 1, 2, 0, 0, 0)),
            (3, "a", 4.0, None),
            (None, None, 6.0, datetime(2024, 1, 1, 0, 0, 0)),
        ],
        "k long, s string, v double, t timestamp",
    )
    prof = {r.column: r for r in profiling.profile_columns(df).collect()}
    assert set(prof) == {"k", "s", "v", "t"}
    assert all(r.n == 4 for r in prof.values())
    k = prof["k"]
    assert (k.n_null, k.n_distinct, k.min_num, k.max_num) == (1, 3, 1.0, 3.0)
    assert k.avg_num == 2.0 and k.min_str is None
    s = prof["s"]
    assert (s.n_null, s.n_distinct, s.min_str, s.max_str) == (1, 2, "a", "b")
    assert s.min_num is None and s.avg_num is None
    v = prof["v"]
    assert (v.n_null, v.min_num, v.max_num, v.avg_num) == (1, 2.0, 6.0, 4.0)
    t = prof["t"]
    assert t.n_null == 1 and t.n_distinct == 2
    # epoch microseconds, UTC session timezone pinned by the session
    assert t.min_num == 1704067200000000.0
    assert t.max_num == 1704153600000000.0
    assert t.avg_num is None


def test_hll_estimate_empty_registers_is_zero(spark):
    """ADVICE r6: sum over an empty register table is NULL; the
    estimator must coalesce it so the linear-counting branch yields
    the correct 0.0 for an empty input, not NULL."""
    from tugas_2_big_data_spark.operators import sketches

    empty = spark.createDataFrame([], "idx int, r int")
    row = sketches.hll_estimate(empty).collect()[0]
    assert row.estimate == 0.0


def test_cm_join_size_exact_when_collision_free(spark):
    """With far fewer distinct keys than sketch width, the inner
    product has no cross terms and the estimate IS the exact join
    size (sum of per-key count products)."""
    from tugas_2_big_data_spark.operators import sketches

    a = spark.createDataFrame([("u1", 3), ("u2", 5), ("u3", 2)], ["item", "cnt"])
    b = spark.createDataFrame([("u1", 4), ("u3", 7), ("u4", 9)], ["item", "cnt"])
    cm_a = sketches.count_min_counters(a)
    cm_b = sketches.count_min_counters(b)
    est = sketches.count_min_join_size(cm_a, cm_b).collect()[0].cm_est
    assert est == 3 * 4 + 2 * 7


def test_cm_join_size_upper_bound_on_real_data(spark):
    """The estimate must never undershoot: collision cross terms only
    ADD to each row's inner product."""
    df = REG["sketch_join_size_estimate"](spark, SF_UNIT)
    row = df.collect()[0]
    assert row.within_bound
    assert row.cm_est >= row.exact_size


def test_expectations_report_catches_planted_violations(spark):
    """Every expectation fires on a deliberately broken batch and
    stays green on the clean one."""
    from tugas_2_big_data_spark.operators import profiling

    clean = spark.createDataFrame(
        [(1, 10, 5.0), (2, 11, 6.0)], ["pk", "fk", "amount"]
    )
    dirty = spark.createDataFrame(
        [(1, 10, 5.0), (1, 99, -2.0), (None, 11, 3.0)],
        "pk long, fk long, amount double",
    )
    parent = spark.createDataFrame([(10,), (11,)], ["key"])
    checks = [
        ("pk_not_null", F.sum(F.col("pk").isNull().cast("long"))),
        ("pk_unique", F.count("pk") - F.countDistinct("pk")),
        ("amount_nonneg", F.sum((F.col("amount") < 0).cast("long"))),
    ]
    fk = [("fk_exists", parent, "fk", "key")]

    ok = {
        r.check_name: r
        for r in profiling.expectations_report(clean, checks, fk).collect()
    }
    assert all(r.passed and r.observed == 0 for r in ok.values())
    bad = {
        r.check_name: r
        for r in profiling.expectations_report(dirty, checks, fk).collect()
    }
    assert bad["pk_not_null"].observed == 1 and not bad["pk_not_null"].passed
    assert bad["pk_unique"].observed == 1
    assert bad["amount_nonneg"].observed == 1
    assert bad["fk_exists"].observed == 1
    assert set(bad) == {"pk_not_null", "pk_unique", "amount_nonneg", "fk_exists"}


def test_expectations_report_scans_once_by_construction(spark):
    """The scalar-check block must be ONE scan unpivoted explicitly —
    not N union legs that only collapse if ReuseExchange fires. Pin
    it on the physical plan: a 5-check report over a parquet table
    contains exactly one parquet scan."""
    from tugas_2_big_data_spark.operators import profiling
    from tugas_2_big_data_spark.plans import inspect as pi
    from tugas_2_big_data_spark.sources.catalog import load_table

    orders = load_table(spark, "orders", SF_UNIT)
    checks = [
        ("k_null", F.sum(F.col("o_orderkey").isNull().cast("long"))),
        ("k_uni", F.count("o_orderkey") - F.countDistinct("o_orderkey")),
        ("tp_neg", F.sum((F.col("o_totalprice") <= 0).cast("long"))),
        ("st_bad", F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("long"))),
        ("dt_null", F.sum(F.col("o_orderdate").isNull().cast("long"))),
    ]
    import re

    plan = pi.explain_formatted(profiling.expectations_report(orders, checks))
    # count scan NODES (each appears once in the tree header and once
    # in the node-detail section — match the detail headers only)
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert n_scans == 1, f"expected 1 parquet scan node, saw {n_scans}"
    assert "Union" not in plan


def test_dq_orders_all_green_on_testdata(spark):
    df = REG["dq_expectations_orders"](spark, SF_UNIT)
    rows = df.collect()
    assert len(rows) == 6
    assert all(r.passed for r in rows)


def test_benford_shares_and_digits(spark):
    df = REG["dq_benford_totalprice"](spark, SF_UNIT)
    rows = df.collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 1e-4
    assert all(r.chi2_term >= 0 for r in rows)
    # benford shares are the exact log10(1+1/d) table
    import math

    for r in rows:
        assert abs(r.benford_share - math.log10(1 + 1 / r.digit)) < 1e-6


def test_psi_zero_on_identical_halves(spark):
    """A corpus whose halves have the identical lang mix must score
    psi_term == 0 for every lang."""
    from tugas_2_big_data_spark import queries_analytics as qa2

    rows = [(i, "en" if i % 4 < 2 else "de") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang"])
    c = docs.groupBy("lang").agg(
        F.sum((F.col("doc_id") % 2 == 0).cast("long")).alias("na"),
        F.sum((F.col("doc_id") % 2 == 1).cast("long")).alias("nb"),
    )
    t = c.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    pa = F.greatest(F.col("na").cast("double") / F.col("ta"), F.lit(1e-6))
    pb = F.greatest(F.col("nb").cast("double") / F.col("tb"), F.lit(1e-6))
    out = c.crossJoin(F.broadcast(t)).select(
        "lang", F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term")
    )
    assert all(r.psi_term == 0.0 for r in out.collect())
