"""Unit tests for the OHLCV period aggregation on a reference-shaped
stock_prices fixture (FIXTURES.md §1: leap day, year boundaries, 1-row
stddev NULL, `Stock Splits` space-in-name, NULL metric skipping)."""

from __future__ import annotations

import datetime as dt

import pytest

from tugas_2_big_data_spark.pipelines import yfinance


def _row(ticker, date, close, vol=100.0, div=0.0, splits=0.0):
    return (
        ticker, date, close + 1, close + 2, close - 1, close, vol, div, splits
    )


COLS = [
    "ticker", "Date", "Open", "High", "Low", "Close", "Volume",
    "Dividends", "Stock Splits",
]


@pytest.fixture(scope="module")
def prices(spark):
    rows = [
        # AAAA: two rows in 2024-02 (incl. leap day), one in 2024-03,
        # one at a year boundary
        _row("AAAA", "2024-02-28 00:00:00", 10.0),
        _row("AAAA", "2024-02-29 00:00:00", 12.0),            # leap day
        _row("AAAA", "2024-03-01 00:00:00", 14.0),
        _row("AAAA", "2023-12-31 00:00:00", 8.0),
        _row("AAAA", "2024-01-01 00:00:00", 9.0),             # boundary pair
        # BBBB: single row overall → stddev NULL at every grain
        _row("BBBB", "2024-06-10 00:00:00", 5.0, div=None, splits=None),
    ]
    df = spark.createDataFrame(rows, COLS)
    return yfinance.prepare(df)


def test_month_keys_and_leap_day(prices):
    out = yfinance.single_grain(prices, "month").collect()
    a = {r["period_key"]: r for r in out if r["ticker"] == "AAAA"}
    assert set(a) == {"2023-12", "2024-01", "2024-02", "2024-03"}
    assert a["2024-02"]["row_count"] == 2          # leap day counted
    assert a["2024-02"]["max_close"] == 12.0
    assert a["2024-02"]["avg_close"] == 11.0


def test_year_boundary_split(prices):
    out = yfinance.single_grain(prices, "year").collect()
    a = {r["period_key"]: r for r in out if r["ticker"] == "AAAA"}
    assert a["2023"]["row_count"] == 1
    assert a["2024"]["row_count"] == 4


def test_single_row_group_stddev_null(prices):
    out = yfinance.single_grain(prices, "month").collect()
    b = [r for r in out if r["ticker"] == "BBBB"][0]
    # sample stddev of 1 row is NULL (yfinance_transform.py:82-88 +
    # SURVEY.md §7); NULL Dividends/Stock Splits skip-aggregate to NULL
    assert b["stddev_close"] is None
    assert b["sum_dividends"] is None
    assert b["avg_stock_splits"] is None
    assert b["row_count"] == 1


def test_sequence_numbers_partitioned_and_gapless(prices):
    out = yfinance.single_grain(prices, "month").collect()
    a = sorted(
        (r["period_key"], r["month_number"]) for r in out if r["ticker"] == "AAAA"
    )
    assert [n for _, n in a] == [1, 2, 3, 4]
    b = [r["month_number"] for r in out if r["ticker"] == "BBBB"]
    assert b == [1]  # per-ticker window restarts (scale fix vs reference)


def test_multi_grain_union_tags(prices):
    out = yfinance.aggregates(prices).collect()
    tags = {r["agg_type"] for r in out}
    assert tags == {"month", "year"}
    months = [r for r in out if r["agg_type"] == "month" and r["ticker"] == "AAAA"]
    assert {r["period_key"] for r in months} == {
        "2023-12", "2024-01", "2024-02", "2024-03"
    }


def test_daily_passthrough(prices):
    out = yfinance.daily(prices).collect()
    assert len(out) == 6                       # no aggregation at day grain
    assert {r["agg_type"] for r in out} == {"day"}
    leap = [r for r in out if r["period_key"] == "2024-02-29"]
    assert len(leap) == 1


def test_month_aggregates_consistent_with_daily(prices):
    # property: month sums/extrema must recompute from daily rows
    daily = yfinance.daily(prices).collect()
    month = yfinance.single_grain(prices, "month").collect()
    feb = [r for r in daily if r["period_key"].startswith("2024-02")]
    m = [r for r in month if r["ticker"] == "AAAA" and r["period_key"] == "2024-02"][0]
    assert m["sum_volume"] == sum(r["Volume"] for r in feb)
    assert m["min_low"] == min(r["Low"] for r in feb)


def test_gap_fill_locf_dense_spine_and_carry(spark):
    from datetime import datetime

    from tugas_2_big_data_spark.operators import timeseries

    rows = [
        # key "a": buckets 0 and 10:00 filled, 5:00 missing
        ("a", datetime(2024, 1, 1, 0, 0, 30), 1.0),
        ("a", datetime(2024, 1, 1, 0, 1, 0), 2.0),
        ("a", datetime(2024, 1, 1, 0, 10, 0), 5.0),
        # key "b": only the middle bucket
        ("b", datetime(2024, 1, 1, 0, 5, 0), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = timeseries.gap_fill_locf(df, "ts", "k", "v", width_s=300)
    got = {(r["k"], r["bucket_start"].minute): r for r in out.collect()}
    # dense spine: 2 keys x 3 buckets (00:00 / 00:05 / 00:10)
    assert len(got) == 6
    # filled bucket sums
    assert got[("a", 0)]["sum_value"] == 3.0 and got[("a", 0)]["n_rows"] == 2
    # gap: zero count, NULL sum, LOCF carries the previous sum
    assert got[("a", 5)]["n_rows"] == 0
    assert got[("a", 5)]["sum_value"] is None
    assert got[("a", 5)]["locf_value"] == 3.0
    assert got[("a", 10)]["locf_value"] == 5.0
    # key b: leading gap has nothing to carry -> NULL locf
    assert got[("b", 0)]["locf_value"] is None
    assert got[("b", 5)]["locf_value"] == 7.0
    assert got[("b", 10)]["locf_value"] == 7.0
