"""Split-operator semantics: exact quotas, determinism, seed
sensitivity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_UNIT
from tugas_2_big_data_spark.operators import sampling


def _docs(spark):
    return spark.read.parquet(f"{SF_UNIT}/documents.parquet").select(
        "doc_id", "lang"
    )


def test_stratified_split_exact_quotas(spark):
    out = sampling.stratified_split(_docs(spark), strata_cols=("lang",))
    counts = {
        (r["lang"], r["split"]): r["n"]
        for r in out.groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in _docs(spark).groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, n in totals.items():
        train = counts.get((lang, "train"), 0)
        val = counts.get((lang, "val"), 0)
        assert train == math.floor(0.8 * n), lang
        assert val == math.floor(0.9 * n) - math.floor(0.8 * n), lang


def test_stratified_split_deterministic(spark):
    a = sampling.stratified_split(_docs(spark)).orderBy("doc_id").collect()
    b = sampling.stratified_split(_docs(spark)).orderBy("doc_id").collect()
    assert a == b


def test_hash_split_seed_changes_assignment(spark):
    a = sampling.hash_split(_docs(spark), seed=42).select("doc_id", "split")
    b = sampling.hash_split(_docs(spark), seed=43).select("doc_id", "split")
    moved = a.join(b.withColumnRenamed("split", "split_b"), "doc_id").filter(
        F.col("split") != F.col("split_b")
    )
    assert moved.count() > 0


def test_hash_split_proportions(spark):
    out = sampling.hash_split(_docs(spark))
    n = out.count()
    train = out.filter(F.col("split") == "train").count()
    # binomial tolerance at n=500: 0.8 ± ~0.06
    assert abs(train / n - 0.8) < 0.08


def test_pack_shards_contiguous_monotone(spark):
    from tugas_2_big_data_spark.operators import text_analysis

    docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet").select(
        "doc_id", "lang", text_analysis.ws_token_count("text").alias("t")
    )
    out = sampling.pack_shards(
        docs, token_col="t", budget=500, strata_cols=("lang",)
    )
    for lang, rows in (
        (r["lang"], r["shards"])
        for r in out.orderBy("lang", "doc_id")
        .groupBy("lang")
        .agg(F.collect_list("shard_id").alias("shards"))
        .collect()
    ):
        assert rows[0] == 0, lang
        assert all(b - a in (0, 1) or b >= a for a, b in zip(rows, rows[1:])), lang
        assert sorted(set(rows)) == list(range(max(rows) + 1)), lang


def test_weighted_keep_full_weight_always_kept(spark):
    docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    out = sampling.weighted_keep(docs, "n_chars", 500)
    heavy_total = docs.filter(F.col("n_chars") >= 500).count()
    heavy_kept = out.filter(F.col("n_chars") >= 500).count()
    assert heavy_kept == heavy_total  # weight >= 1 is a certain keep
    # thinning actually thins the light tail
    assert out.count() < docs.count()


def test_weighted_keep_deterministic_subset(spark):
    docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    a = sorted(r["doc_id"] for r in sampling.weighted_keep(docs, "n_chars", 500).collect())
    b = sorted(r["doc_id"] for r in sampling.weighted_keep(docs, "n_chars", 500).collect())
    assert a == b
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert set(a) <= all_ids


def test_weighted_reservoir_exact_n_structure(spark):
    docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    out = sampling.weighted_reservoir_exact_n(docs, "n_chars", 25)
    rows = out.collect()
    assert len(rows) == 25  # exact-size contract
    # deterministic: rerun yields the identical sample
    again = sampling.weighted_reservoir_exact_n(docs, "n_chars", 25).collect()
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in again)
    # different seed draws a different sample
    other = sampling.weighted_reservoir_exact_n(
        docs, "n_chars", 25, seed=99
    ).collect()
    assert sorted(r.doc_id for r in rows) != sorted(r.doc_id for r in other)


def test_weighted_reservoir_dominant_weight_wins(spark):
    # w → ∞ drives the A-ES key u^(1/w) → 1, so a row whose weight
    # dwarfs every other must be sampled first; w ≤ 0 is excluded
    rows = [(i, 1) for i in range(1, 21)] + [(99, 10**9), (100, 0)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = sampling.weighted_reservoir_exact_n(df, "w", 1).collect()
    assert [r.doc_id for r in got] == [99]
    all_ids = {
        r.doc_id
        for r in sampling.weighted_reservoir_exact_n(df, "w", 21).collect()
    }
    assert 100 not in all_ids  # zero-weight row can never appear


def test_weighted_reservoir_plan_take_ordered(spark):
    # orderBy().limit(n) must compile to TakeOrderedAndProject
    # (per-partition heaps), never a global Sort + single partition
    from tugas_2_big_data_spark.plans import inspect as pi

    docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    plan = pi.explain_formatted(
        sampling.weighted_reservoir_exact_n(docs, "n_chars", 25)
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_mixture_rebalance_budget_contract(spark):
    docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    budget = 20000
    out = sampling.mixture_rebalance(docs, budget=budget)
    kept = {
        r["lang"]: (r["total"], r["mx"])
        for r in out.groupBy("lang")
        .agg(F.sum("n_chars").alias("total"), F.max("n_chars").alias("mx"))
        .collect()
    }
    totals = {
        r["lang"]: r["total"]
        for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("total")).collect()
    }
    for lang, (total, mx) in kept.items():
        # greedy contract: overflow bounded by one document
        assert total - mx < budget, lang
        if totals[lang] < budget:  # under-budget strata keep everything
            assert total == totals[lang], lang


def test_top_fraction_by_group_quota_and_determinism(spark):
    from tugas_2_big_data_spark.operators.sampling import top_fraction_by_group

    df = spark.createDataFrame(
        [(i, "a" if i < 10 else "b", float(i % 7)) for i in range(15)],
        ["id", "g", "score"],
    )
    kept = top_fraction_by_group(df, ["g"], "score", "id", 0.3).collect()
    by_g = {}
    for r in kept:
        by_g.setdefault(r.g, []).append(r.id)
    # quotas: ceil(0.3*10)=3, ceil(0.3*5)=2
    assert len(by_g["a"]) == 3 and len(by_g["b"]) == 2
    # determinism incl. tie ranks: score desc, id asc
    ranked_a = sorted(
        ((i % 7, -i) for i in range(10)), key=lambda t: (-t[0], -t[1])
    )
    expect_a = sorted(-t[1] for t in ranked_a[:3])
    assert sorted(by_g["a"]) == expect_a
    # every non-empty group keeps at least one row
    one = spark.createDataFrame([(1, "z", 0.0)], ["id", "g", "score"])
    assert top_fraction_by_group(one, ["g"], "score", "id", 0.01).count() == 1


def test_temperature_rates_flatten_toward_uniform(spark):
    """α controls the flattening: α=1 keeps every stratum at the same
    rate (proportional sampling); α→0 equalizes the KEPT COUNTS; any
    α<1 gives the smaller stratum the higher keep rate."""
    rows = [(i, "big") for i in range(900)] + [
        (i + 1000, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    r_half = {
        r.lang: r
        for r in sampling.temperature_rates(df, alpha=0.5).collect()
    }
    assert r_half["small"].keep_rate > r_half["big"].keep_rate
    assert abs(sum(x.weight for x in r_half.values()) - 1.0) < 1e-9
    r_one = {
        r.lang: r.keep_rate
        for r in sampling.temperature_rates(df, alpha=1.0).collect()
    }
    assert abs(r_one["small"] - r_one["big"]) < 1e-9  # proportional
    # expected kept docs = Σ min(budget·p_i, n_i): the min(1, ·) cap
    # truncates WITHOUT redistributing (budget is an upper bound once
    # any stratum saturates). Here p=(0.75, 0.25) of a 500 budget →
    # big keeps 375 expected, small is capped at all 100 → 475.
    expected = sum(r.keep_rate * r.n_docs for r in r_half.values())
    assert abs(expected - 475) < 1e-6
    assert r_half["small"].keep_rate == 1.0  # saturated stratum


def test_temperature_sample_deterministic_and_budget_shaped(spark):
    rows = [(i, "big") for i in range(900)] + [
        (i + 1000, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    a = sorted(r.doc_id for r in sampling.temperature_sample(df).collect())
    b = sorted(r.doc_id for r in sampling.temperature_sample(df).collect())
    assert a == b  # rerun-stable
    kept = spark.createDataFrame(
        [(i,) for i in a], ["doc_id"]
    ).join(df, "doc_id")
    by_lang = {
        r.lang: r.n for r in kept.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    # small stratum keeps a larger FRACTION of itself than the big one
    assert by_lang["small"] / 100 > by_lang["big"] / 900


def test_split_by_component_groups_whole_chain(spark):
    """Every member of a connected component gets the SAME split;
    docs absent from the component map fall back to doc-hash (their
    own id), identical to hash_split for singletons."""
    from tugas_2_big_data_spark.operators import similarity

    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    comps = similarity.connected_components(docs, pairs, id_col="doc_id")
    sp = {
        r.doc_id: r.split
        for r in sampling.split_by_component(docs, comps).collect()
    }
    # the 0..40 chain is one component -> one split
    assert len({sp[i] for i in range(41)}) == 1
    # doc-hash split provably fragments the same chain
    plain = {
        r.doc_id: r.split for r in sampling.hash_split(docs).collect()
    }
    assert len({plain[i] for i in range(41)}) > 1
    # singletons (41..59) match hash_split exactly (component = own id)
    assert all(sp[i] == plain[i] for i in range(41, 60))


def test_split_grouped_leakage_is_zero_where_doc_hash_leaks(spark):
    """The before/after story on the real dup-bearing corpus: the
    doc-hash split leaks verified near-dup pairs across splits; the
    component-aware split leaks NONE by construction."""
    from tugas_2_big_data_spark import queries_training as qt

    before = qt.split_leakage_check(spark, SF_UNIT).collect()
    assert sum(r.n_pairs for r in before if r.is_leak) > 0
    after = qt.split_grouped_leakage(spark, SF_UNIT).collect()
    assert after  # pairs exist
    assert all(not r.is_leak for r in after)


def test_take_token_budget_boundary_semantics(spark):
    """The budget-crossing row is KEPT (before < budget), later rows
    drop, an under-budget stratum keeps everything, and strata fill
    independently."""
    df = spark.createDataFrame(
        [
            (1, "a", 60), (2, "a", 60), (3, "a", 60),  # 60+60 cross 100
            (4, "b", 30),                               # under budget
        ],
        "doc_id long, lang string, n_tokens long",
    )
    kept = sorted(
        r.doc_id
        for r in sampling.take_token_budget(
            df, "n_tokens", 100, strata_cols=("lang",)
        ).collect()
    )
    # doc 2 starts at before=60 < 100 -> kept (total 120, one-doc
    # overflow); doc 3 starts at 120 -> dropped; stratum b all kept
    assert kept == [1, 2, 4]


def test_negative_samples_never_collide_with_positives(spark):
    """Planted positives: every emitted negative must be outside the
    user's positive set, exactly k per user when slack suffices, and
    deterministic across invocations."""
    from tugas_2_big_data_spark.operators import sampling as smp

    users = spark.createDataFrame([(1,), (2,)], ["user_id"])
    # make user 1's positives cover HALF the item space so rejection
    # actually fires
    pos = spark.createDataFrame(
        [(1, i) for i in range(0, 10)] + [(2, 3)], ["user_id", "item_id"]
    )
    n_items = spark.createDataFrame([(20,)], ["n"])
    out = smp.hash_negative_samples(
        users, pos, n_items, k=3, m=12
    )
    rows = out.collect()
    pos_set = {(1, i) for i in range(10)} | {(2, 3)}
    for r in rows:
        assert (r.user_id, r.item_id) not in pos_set
        assert 0 <= r.item_id < 20
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    assert all(len(v) == 3 for v in per_user.values())
    again = sorted(map(tuple, out.collect()))
    assert again == sorted(map(tuple, rows))
