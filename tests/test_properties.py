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
