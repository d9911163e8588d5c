"""Property-based checks (SURVEY.md §5.5): aggregate consistency and
ranking invariants under arbitrary generated inputs.

Examples are kept small (Spark job per example) — the properties, not
the volume, carry the value: month-grain aggregates must be consistent
with recomputation from daily rows for ANY input, and ranking must be a
gapless permutation under ANY input order.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tugas_2_big_data_spark.operators import timeseries
from tugas_2_big_data_spark.text import chunking

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_price = st.floats(
    min_value=0.01, max_value=1e6, allow_nan=False, allow_infinity=False
)


@st.composite
def close_rows(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    base = datetime(2023, 11, 20)  # offsets cross the year boundary
    return [
        (base + timedelta(days=draw(st.integers(0, 90))), draw(_price))
        for _ in range(n)
    ]


@given(rows=close_rows())
@settings(**_SETTINGS)
def test_month_agg_consistent_with_daily(spark, rows):
    df = spark.createDataFrame(rows, ["Date", "Close"])
    month = timeseries.aggregate_period(df, "Date", ["Close"], "month")
    got = {
        r["period_key"]: (
            r["sum_close"],
            r["max_close"],
            r["min_close"],
            r["row_count"],
        )
        for r in month.collect()
    }
    expect: dict[str, list] = {}
    for day, close in rows:
        expect.setdefault(day.strftime("%Y-%m"), []).append(close)
    assert set(got) == set(expect)
    for key, closes in expect.items():
        s, mx, mn, cnt = got[key]
        assert cnt == len(closes)
        assert math.isclose(s, sum(closes), rel_tol=1e-9)
        assert mx == max(closes) and mn == min(closes)


@given(rows=close_rows())
@settings(**_SETTINGS)
def test_period_numbers_gapless_permutation(spark, rows):
    df = spark.createDataFrame(rows, ["Date", "Close"])
    month = timeseries.aggregate_period(df, "Date", ["Close"], "month")
    out = month.select("period_key", "month_number").collect()
    nums = sorted(r["month_number"] for r in out)
    assert nums == list(range(1, len(out) + 1))
    # numbering follows period_key sort order (the pinned deterministic key)
    by_key = sorted(out, key=lambda r: r["period_key"])
    assert [r["month_number"] for r in by_key] == list(range(1, len(out) + 1))


@given(
    text=st.text(alphabet=st.sampled_from("abc d."), min_size=0, max_size=300),
    limit=st.integers(min_value=2, max_value=50),
)
@settings(max_examples=100, deadline=None)
def test_pack_chunks_budget_and_preservation(text, limit):
    """Greedy packing: every chunk respects the token budget unless a
    single sentence alone exceeds it; sentence order and content are
    preserved exactly (modulo the reference's leading-empty-chunk quirk
    when the FIRST sentence overflows — kept for parity)."""
    count = chunking.whitespace_token_count
    sentences = chunking.naive_sentences(text)
    chunks = chunking.pack_chunks(text, count, max_tokens=limit)
    joined = " ".join(c for c in chunks if c)
    assert joined.split() == " ".join(sentences).split()
    for ch in chunks:
        if not ch:
            continue  # reference quirk: empty first chunk on overflow
        members = chunking.naive_sentences(ch)
        if len(members) > 1:
            assert count(ch) <= limit


_word = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=6,
)


@given(
    words=st.lists(_word, min_size=0, max_size=200),
    max_tokens=st.integers(min_value=2, max_value=40),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
@settings(**_SETTINGS)
def test_chunk_windows_properties(spark, words, max_tokens, overlap_frac):
    """For ANY document and (max_tokens, overlap): chunks cover every
    token in order, each chunk holds <= max_tokens tokens, consecutive
    chunks agree on their overlap, and reassembling chunk tokens at
    stride offsets reproduces the document exactly."""
    from tugas_2_big_data_spark.operators.text_analysis import chunk_windows

    overlap = min(int(max_tokens * overlap_frac), max_tokens - 1)
    stride = max_tokens - overlap
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = sorted(
        chunk_windows(df, max_tokens=max_tokens, overlap=overlap).collect(),
        key=lambda r: r.chunk_idx,
    )
    if not words:
        assert out == []
        return
    assert [r.chunk_idx for r in out] == list(range(len(out)))
    rebuilt = []
    for r in out:
        toks = r.chunk_text.split()
        assert 1 <= len(toks) <= max_tokens
        assert len(toks) == r.n_tokens
        start = r.chunk_idx * stride
        assert toks == words[start : start + max_tokens]
        rebuilt = rebuilt[:start] + toks
    assert rebuilt == words


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=60,
    ),
    fraction=st.floats(min_value=0.05, max_value=1.0),
)
@settings(**_SETTINGS)
def test_top_fraction_quota_property(spark, rows, fraction):
    """For ANY grouped input and fraction: each group keeps exactly
    ceil(fraction * |group|) rows, and they are the score-maximal rows
    under the deterministic (score desc, id asc) order."""
    from tugas_2_big_data_spark.operators.sampling import top_fraction_by_group

    data = [(i, g, float(s)) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(data, ["id", "g", "score"])
    kept = top_fraction_by_group(df, ["g"], "score", "id", fraction).collect()
    by_g: dict = {}
    for i, g, s in data:
        by_g.setdefault(g, []).append((s, i))
    kept_by_g: dict = {}
    for r in kept:
        kept_by_g.setdefault(r.g, set()).add(r.id)
    for g, members in by_g.items():
        quota = math.ceil(fraction * len(members))
        expect = {
            i for _, i in sorted(members, key=lambda t: (-t[0], t[1]))[:quota]
        }
        assert kept_by_g.get(g, set()) == expect, g


@given(text=st.text(max_size=300))
@settings(**_SETTINGS)
def test_normalize_text_idempotent(spark, text):
    """normalize(normalize(x)) == normalize(x) for ANY input — the
    clean form is a fixed point, so re-running the hygiene pipeline
    never churns bytes (idempotent ingest)."""
    from tugas_2_big_data_spark.operators.text_analysis import normalize_text

    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    once = normalize_text(df).collect()[0].text_norm
    df2 = spark.createDataFrame([(1, once)], ["doc_id", "text"])
    again = normalize_text(df2).collect()[0]
    assert again.text_norm == once
    assert not again.changed


_doc_text = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split()),
    min_size=0,
    max_size=30,
).map(" ".join)


@given(texts=st.lists(_doc_text, min_size=1, max_size=12))
@settings(**_SETTINGS)
def test_jaccard_formulations_agree(spark, texts):
    """The one-pass set-derived inverted index (jaccard_pairs_from_sets)
    and the classic exploded-relation formulation (jaccard_pairs) must
    produce identical pair sets, counts, and scores on ANY corpus."""
    from tugas_2_big_data_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    a = sorted(
        map(tuple, dedup.jaccard_pairs(dedup.doc_shingles(df), threshold=0.4).collect())
    )
    b = sorted(
        map(tuple, dedup.jaccard_pairs_from_sets(dedup.shingle_sets(df), threshold=0.4).collect())
    )
    assert a == b


@given(texts=st.lists(_doc_text, min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_minhash_formulations_agree(spark, texts):
    """Map-only signatures from sets must equal the exploded groupBy
    formulation value-for-value (the docstring's identity claim)."""
    from tugas_2_big_data_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    from_sets = {
        r.doc_id: tuple(r)[1:]
        for r in dedup.minhash_signatures_from_sets(
            dedup.shingle_sets(df), k=4
        ).collect()
    }
    exploded = {
        r.doc_id: tuple(r)[1:]
        for r in dedup.minhash_signatures(dedup.doc_shingles(df), k=4).collect()
    }
    assert from_sets == exploded


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 1000)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
@settings(**_SETTINGS)
def test_weighted_keep_deterministic_and_saturating(spark, rows):
    """weighted_keep: rerun => byte-identical keep set (auditability),
    and rows with weight >= denominator are ALWAYS kept."""
    from tugas_2_big_data_spark.operators.sampling import weighted_keep

    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    k1 = sorted(r.doc_id for r in weighted_keep(df, "n_chars", 500).collect())
    k2 = sorted(r.doc_id for r in weighted_keep(df, "n_chars", 500).collect())
    assert k1 == k2
    saturated = {i for i, w in rows if w >= 500}
    assert saturated <= set(k1)


@given(
    ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=50, unique=True)
)
@settings(**_SETTINGS)
def test_hash_split_partitions_input(spark, ids):
    """hash_split: the three splits partition the input exactly (every
    row in exactly one split), deterministically across reruns."""
    from tugas_2_big_data_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    out = hash_split(df).collect()
    assert sorted(r.doc_id for r in out) == sorted(ids)
    assert {r.split for r in out} <= {"train", "val", "test"}
    again = {r.doc_id: r.split for r in hash_split(df).collect()}
    assert {r.doc_id: r.split for r in out} == again


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=60,
    ),
    split_at=st.integers(min_value=0, max_value=10_000),
)
@settings(**_SETTINGS)
def test_hll_merge_invariant_under_any_split(spark, ids, split_at):
    """For ANY item multiset and ANY split point, merging the two
    halves' register tables equals the whole-input registers (the
    property that lets the sketch ride any micro-batching), and the
    register count never exceeds 2^b."""
    from tugas_2_big_data_spark.operators import sketches

    df = spark.createDataFrame([(i,) for i in ids], ["v"])
    a = df.filter(df.v <= split_at)
    b = df.filter(df.v > split_at)
    merged = {
        r.idx: r.r
        for r in sketches.merge_hll(
            sketches.hll_registers(a, "v"), sketches.hll_registers(b, "v")
        ).collect()
    }
    whole = {r.idx: r.r for r in sketches.hll_registers(df, "v").collect()}
    assert merged == whole
    assert len(whole) <= 256


@given(
    keys=st.lists(
        st.sampled_from(["hot", "k1", "k2", "k3", "k4"]),
        min_size=1,
        max_size=80,
    ),
    hot_top=st.integers(min_value=0, max_value=6),
)
@settings(**_SETTINGS)
def test_hot_split_semi_membership_invariant(spark, keys, hot_top):
    """hot_split_semi_join membership equals the plain left-semi for
    ANY key distribution and ANY hot_top (0 = disabled, larger than
    the key count = everything broadcasts)."""
    from pyspark.sql import functions as F

    from tugas_2_big_data_spark.operators import skew

    left = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], ["rid", "k"]
    )
    keyset = (
        left.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        # drop one key from the set so non-membership is exercised
        .filter(F.col("k") != "k2")
    )
    plain = sorted(
        r.rid
        for r in left.join(keyset.select("k"), "k", "left_semi").collect()
    )
    split = sorted(
        r.rid
        for r in skew.hot_split_semi_join(
            left, keyset, "k", "n", hot_top=hot_top
        ).collect()
    )
    assert split == plain


# ---------------------------------------------------------------------------
# round-8 session properties: Morton interleave and CM join-size bound
# ---------------------------------------------------------------------------

def _deinterleave(z: int, bits: int) -> tuple[int, int]:
    x = y = 0
    for i in range(bits):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@given(
    pts=st.lists(
        st.tuples(
            st.integers(0, 2**21 - 1), st.integers(0, 2**21 - 1)
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=100, deadline=None)
def test_morton_sql_roundtrips_for_any_point(pts):
    """The SQL-text interleave (the form both engines execute) must be
    a bijection: deinterleaving the code recovers the exact point.
    Evaluated through DuckDB — cheap per example, and it is the
    oracle-side arithmetic that parity depends on."""
    import duckdb

    from tugas_2_big_data_spark.operators import layout

    con = duckdb.connect()
    expr = layout.morton_sql("x", "y")
    rows = con.execute(
        "SELECT x, y, " + expr + " AS z FROM (SELECT "
        "unnest(?) AS x, unnest(?) AS y)",
        [[p[0] for p in pts], [p[1] for p in pts]],
    ).fetchall()
    for x, y, z in rows:
        assert _deinterleave(int(z), layout.MORTON_BITS) == (x, y)


@given(
    a=st.dictionaries(
        st.integers(0, 3000), st.integers(1, 50), min_size=1, max_size=40
    ),
    b=st.dictionaries(
        st.integers(0, 3000), st.integers(1, 50), min_size=1, max_size=40
    ),
)
@settings(**_SETTINGS)
def test_cm_join_size_never_undershoots(spark, a, b):
    """For ANY pair of count tables, the CM inner-product estimate is
    >= the exact join size (collision cross terms only add)."""
    from tugas_2_big_data_spark.operators import sketches

    da = spark.createDataFrame(list(a.items()), ["item", "cnt"])
    db = spark.createDataFrame(list(b.items()), ["item", "cnt"])
    est = sketches.count_min_join_size(
        sketches.count_min_counters(da), sketches.count_min_counters(db)
    ).collect()
    exact = sum(c * b[k] for k, c in a.items() if k in b)
    if exact == 0:
        # disjoint keys may still collide into shared cells — the
        # estimate is whatever the collisions produce, but never < 0
        assert not est or est[0].cm_est >= 0
    else:
        assert est and est[0].cm_est >= exact


@given(
    keys=st.lists(st.integers(0, 20), min_size=1, max_size=40),
    cuts=st.lists(st.integers(0, 39), max_size=3),
)
@settings(**_SETTINGS)
def test_streaming_uniqueness_telescopes_for_any_batching(spark, keys, cuts):
    """The streaming DQ gate's uniqueness decomposition — per-batch
    within-dups plus seen-state hits, state unioned after — must equal
    total − distinct for ANY multiset of keys under ANY batching
    (the invariant run_streaming_dq relies on)."""
    bounds = sorted({c for c in cuts if c < len(keys)})
    batches, prev = [], 0
    for b in bounds + [len(keys)]:
        if b > prev:
            batches.append(keys[prev:b])
            prev = b
    if not batches:
        batches = [keys]

    from pyspark.sql import functions as F2

    seen = None
    total_viol = 0
    for chunk in batches:
        b = spark.createDataFrame([(k,) for k in chunk], ["k"])
        row = b.agg(
            (F2.count("k") - F2.countDistinct("k")).alias("w")
        ).collect()[0]
        total_viol += row.w
        dk = b.select("k").distinct()
        if seen is not None:
            total_viol += dk.join(seen, "k", "left_semi").count()
            seen = seen.unionByName(dk).distinct().localCheckpoint()
        else:
            seen = dk.localCheckpoint()
    assert total_viol == len(keys) - len(set(keys))
