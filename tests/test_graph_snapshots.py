"""Unit tests: graph operators (pagerank_fixed, degree_stats),
snapshots.scd2_merge, profiling.key_skew_profile, and the new
text-analysis ops (ngram_char_fracs, postings)."""

import math

import pytest
from pyspark.sql import functions as F

from tugas_2_big_data_spark.operators import graph, profiling, snapshots
from tugas_2_big_data_spark.operators import text_analysis


def _edges(spark, pairs):
    return graph.symmetrize(
        spark.createDataFrame(pairs, "id_a long, id_b long")
    )


def test_pagerank_sums_to_one_and_ranks_hub_highest(spark):
    """Star graph a-{b,c,d}: ranks sum to 1 (no dangling mass on a
    symmetric graph) and the hub outranks the leaves, which tie."""
    e = _edges(spark, [(1, 2), (1, 3), (1, 4)])
    pr = {r.v: r.pagerank for r in graph.pagerank_fixed(e, iters=10).collect()}
    assert set(pr) == {1, 2, 3, 4}
    assert math.isclose(sum(pr.values()), 1.0, abs_tol=1e-6)
    assert pr[1] > pr[2]
    assert pr[2] == pr[3] == pr[4]


def test_pagerank_regular_graph_is_uniform(spark):
    """On a cycle (2-regular) the stationary distribution is uniform
    and the fixed-iteration iterate stays exactly there from r0."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    pr = [r.pagerank for r in graph.pagerank_fixed(e, iters=3).collect()]
    assert all(math.isclose(p, 0.25, abs_tol=1e-9) for p in pr)


def test_pagerank_empty_edges(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert graph.pagerank_fixed(e, iters=2).count() == 0


def test_degree_stats_symmetric(spark):
    e = _edges(spark, [(1, 2), (1, 3)])
    d = {r.v: (r.out_degree, r.in_degree) for r in graph.degree_stats(e).collect()}
    assert d == {1: (2, 2), 2: (1, 1), 3: (1, 1)}


def _scd2(spark, old_rows, new_rows):
    old = spark.createDataFrame(old_rows, "k long, val string")
    new = spark.createDataFrame(new_rows, "k long, val string")
    return snapshots.scd2_merge(
        old, new, ["k"], ["val"], "2026-01-01", "2026-02-01"
    ).collect()


def test_scd2_classifies_all_four_cases(spark):
    rows = _scd2(
        spark,
        [(1, "a"), (2, "b"), (3, "c")],
        [(1, "a"), (2, "B"), (4, "d")],
    )
    by = {}
    for r in rows:
        by.setdefault(r.k, []).append(r)
    # unchanged: one open row with the OLD valid_from
    (u,) = by[1]
    assert (u.change, u.is_current, u.valid_from, u.valid_to) == (
        "unchanged", True, "2026-01-01", None,
    )
    # changed: closed old + open new
    ch = sorted(by[2], key=lambda r: r.is_current)
    assert [r.change for r in ch] == ["changed", "changed"]
    assert (ch[0].val, ch[0].valid_to, ch[0].is_current) == ("b", "2026-02-01", False)
    assert (ch[1].val, ch[1].valid_to, ch[1].is_current) == ("B", None, True)
    # deleted: single closed row
    (d,) = by[3]
    assert (d.change, d.is_current, d.valid_to) == ("deleted", False, "2026-02-01")
    # inserted: single open row with the NEW valid_from
    (i,) = by[4]
    assert (i.change, i.is_current, i.valid_from) == ("inserted", True, "2026-02-01")


def test_scd2_null_transition_is_a_change(spark):
    """NULL -> value and value -> NULL must classify as changed
    (null-safe compare), not unchanged."""
    rows = _scd2(spark, [(1, None), (2, "x")], [(1, "y"), (2, None)])
    changes = sorted(
        (r.k, r.change, r.is_current) for r in rows
    )
    assert changes == [
        (1, "changed", False), (1, "changed", True),
        (2, "changed", False), (2, "changed", True),
    ]


def test_key_skew_profile_values(spark):
    df = spark.createDataFrame(
        [(k,) for k in [1] * 6 + [2] * 2 + [3] * 2 + [4] * 2], "k long"
    )
    rows = profiling.key_skew_profile(df, "k", top_k=2).collect()
    assert [(r.key, r.cnt, r.rk) for r in rows] == [(1, 6, 1), (2, 2, 2)]
    r = rows[0]
    assert r.n_keys == 4
    # max 6 / mean 3 = 2.0
    assert math.isclose(r.skew_ratio, 2.0, abs_tol=1e-9)
    # entropy: -[.5 log .5 + 3*(1/6 log 1/6)] bits
    exp = -(0.5 * math.log2(0.5) + 3 * (1 / 6) * math.log2(1 / 6))
    assert math.isclose(r.key_entropy, exp, abs_tol=1e-6)
    assert math.isclose(r.share, 0.5, abs_tol=1e-9)


def test_ngram_char_fracs_known_values(spark):
    # "ab ab ab": 2-grams ['ab ab','ab ab'] -> top weight 2*4=8 over
    # 6 chars -> 4/3; no 5-grams -> dup 0
    df = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    r = text_analysis.ngram_char_fracs(df).collect()[0]
    assert math.isclose(r.top_ngram_char_frac, 8 / 6, abs_tol=1e-9)
    assert r.dup_ngram_char_frac == 0.0
    # a repeated 5-gram: 'a b c d e' twice over
    txt = "a b c d e a b c d e"
    r2 = text_analysis.ngram_char_fracs(
        spark.createDataFrame([(1, txt)], "doc_id long, text string")
    ).collect()[0]
    # grams 'a b c d e' (x2 among the 6 distinct 5-gram windows)
    assert r2.dup_ngram_char_frac == pytest.approx(2 * 5 / 10, abs=1e-9)


def test_ngram_char_fracs_empty_text(spark):
    df = spark.createDataFrame([(1, "  ")], "doc_id long, text string")
    r = text_analysis.ngram_char_fracs(df, with_counts=True).collect()[0]
    assert r.top_ngram_char_frac == 0.0 and r.dup_ngram_char_frac == 0.0
    assert r.n_chars_nospace == 0.0


def test_postings_positions_and_tf(spark):
    df = spark.createDataFrame(
        [(1, "x y x"), (2, "y")], "doc_id long, text string"
    )
    rows = {
        (r.word, r.doc_id): (r.tf, r.positions)
        for r in text_analysis.postings(df).collect()
    }
    assert rows[("x", 1)] == (2, [1, 3])
    assert rows[("y", 1)] == (1, [2])
    assert rows[("y", 2)] == (1, [1])


def test_cdc_apply_latest_wins_and_delete_removes(spark):
    log = spark.createDataFrame(
        [
            (1, 1, "I", "a"), (1, 2, "U", "b"),           # update wins
            (2, 1, "I", "x"), (2, 2, "D", None),           # deleted
            (3, 5, "I", "only"),                           # single insert
            (4, 7, "D", None), (4, 7, "U", "tie"),         # tie: U > D
        ],
        "k long, seq long, op string, val string",
    )
    out = {r.k: (r.op, r.val) for r in snapshots.cdc_apply(
        log, ["k"], "seq"
    ).collect()}
    assert out == {1: ("U", "b"), 3: ("I", "only"), 4: ("U", "tie")}


def test_k_hop_reach_path_graph(spark):
    # path 1-2-3-4-5: within 3 hops node 1 reaches {2,3,4}, node 3 all
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    r = {x.v: x.n_reachable for x in graph.k_hop_reach(e, k=3).collect()}
    assert r == {1: 3, 2: 4, 3: 4, 4: 4, 5: 3}


def test_k_hop_reach_ignores_self_loops(spark):
    """ADVICE r7: a self-loop edge must not make a node count itself
    in n_reachable — the base relation filters src == dst, not just
    the expansions."""
    e = _edges(spark, [(1, 1), (1, 2)])
    r = {x.v: x.n_reachable for x in graph.k_hop_reach(e, k=3).collect()}
    assert r == {1: 1, 2: 1}


def test_covariance_top_eigen_rejects_zero_iters(spark):
    """ADVICE r7: iters=0 would leave the norm relation undefined and
    crash downstream — refuse up front."""
    from tugas_2_big_data_spark.operators import similarity

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        similarity.covariance_top_eigen(emb, dim=2, iters=0)


def test_mutual_information_known_cases(spark):
    # independent: MI = 0; identical: MI = H(A)
    rows = [(a, b) for a in ("x", "y") for b in (0, 1) for _ in range(5)]
    ind = spark.createDataFrame(rows, "a string, b long")
    r = profiling.mutual_information(ind, "a", "b").collect()[0]
    assert r.mi_bits == pytest.approx(0.0, abs=1e-9)
    assert r.h_a_bits == pytest.approx(1.0, abs=1e-9)
    same = spark.createDataFrame(
        [("x", 0)] * 5 + [("y", 1)] * 5, "a string, b long"
    )
    r2 = profiling.mutual_information(same, "a", "b").collect()[0]
    assert r2.mi_bits == pytest.approx(1.0, abs=1e-9)
    assert r2.mi_bits == pytest.approx(r2.h_a_bits, abs=1e-9)


def test_covariance_top_eigen_matches_numpy(spark):
    import numpy as np

    from tugas_2_big_data_spark.operators import similarity

    rng = np.random.default_rng(3)
    # anisotropic cloud: a dominant direction exists
    base = rng.standard_normal((200, 8))
    base[:, 2] *= 4.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.covariance_top_eigen(emb, dim=8, iters=30).collect()
    got = np.zeros(8)
    for r in out:
        got[r.dim] = r.loading
    lam = out[0].eigenvalue
    c = np.cov(base.astype(np.float64).T, bias=True)
    w, v = np.linalg.eigh(c)
    ref = v[:, -1]
    ref = ref * np.sign(ref[np.argmax(np.abs(ref))])
    assert np.allclose(got, ref, atol=1e-4)
    assert lam == pytest.approx(w[-1], rel=1e-4)


def test_cdc_compact_is_associative(spark):
    """compact(compact(A) ∪ B) == compact(A ∪ B) — the property the
    streaming fold (run_streaming_cdc) relies on for micro-batching
    invariance, including tombstone survival across folds."""
    a = spark.createDataFrame(
        [(1, 1, "I", "a"), (1, 2, "U", "b"), (2, 1, "I", "x"),
         (3, 9, "D", None)],
        "k long, seq long, op string, val string",
    )
    b = spark.createDataFrame(
        [(1, 3, "D", None), (2, 2, "U", "y"),
         (3, 5, "U", "stale")],  # older than key 3's tombstone
        "k long, seq long, op string, val string",
    )
    folded = snapshots.cdc_compact(
        snapshots.cdc_compact(a, ["k"], "seq").unionByName(b), ["k"], "seq"
    )
    direct = snapshots.cdc_compact(a.unionByName(b), ["k"], "seq")
    key = lambda r: (r.k, r.seq, r.op, r.val)  # noqa: E731
    assert sorted(map(key, folded.collect())) == sorted(
        map(key, direct.collect())
    )
    # the stale key-3 update must NOT resurrect the deleted key
    final = {r.k: r.op for r in direct.collect()}
    assert final[3] == "D"
    assert {r.k for r in snapshots.cdc_apply(
        a.unionByName(b), ["k"], "seq"
    ).collect()} == {2}


def test_rank_within_components_pick_and_ties(spark):
    """row_number is per family (rank desc, id asc): the argmax wins,
    exact ties go to the smaller id, family sizes are counted."""
    ranks = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (10, 0.4)],
        "v long, pagerank double",
    )
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10)], "v long, component_id long"
    )
    out = {
        (r.component_id, r.rank_in_component): (r.v, r.n_members)
        for r in graph.rank_within_components(ranks, comps).collect()
    }
    assert out[(1, 1)] == (2, 3)  # tie 2 vs 3 -> smaller id
    assert out[(1, 2)] == (3, 3)
    assert out[(1, 3)] == (1, 3)
    assert out[(10, 1)] == (10, 1)  # singleton family


def test_component_density_clique_vs_chain(spark):
    """Triangle {1,2,3} -> density 1.0; chain 10-11-12-13 -> 3 edges
    over C(4,2)=6 -> 0.5; the pair {20,21} -> 1.0."""
    from tugas_2_big_data_spark.operators import similarity

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        "id_a long, id_b long",
    )
    verts = graph.symmetrize(pairs).select(
        F.col("src").alias("v")
    ).distinct()
    comps = similarity.connected_components(verts, pairs, id_col="v")
    out = {
        r.component_id: (r.n_members, r.n_edges, r.density)
        for r in graph.component_density(pairs, comps).collect()
    }
    assert out[1] == (3, 3, 1.0)
    assert out[10] == (4, 3, 0.5)
    assert out[20] == (2, 1, 1.0)
