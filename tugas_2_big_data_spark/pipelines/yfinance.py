"""Yfinance OHLCV pipeline (Spark-first re-expression of
yfinance_transform.py).

Reference shape: driver loop over 951 per-company Mongo collections,
re-scanning the source for each of 4 actions per collection
(SURVEY.md §3.1). Engine shape: ONE DataFrame with a `ticker` column,
cached once, fanned out to day/month/year grains; windows partitioned
by ticker; the Daftar_Saham dimension broadcast-joined for enrichment
the reference implies but never materializes (SURVEY.md §2.5).

Column contract per grain (yfinance_transform.py:48-95): period_key,
{mean,sum,max,min,stddev} × {Open, High, Low, Close, Volume, Dividends,
`Stock Splits`} + row_count + {label}_number + agg_type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tugas_2_big_data_spark.operators.timeseries import aggregate_period, multi_grain

OHLCV_METRICS = ["Open", "High", "Low", "Close", "Volume", "Dividends", "Stock Splits"]


def prepare(prices: DataFrame, date_col: str = "Date") -> DataFrame:
    """String date → timestamp (yfinance_transform.py:118); keep only rows
    where the column exists (S6 column-probe parity is a caller concern —
    here the schema is explicit)."""
    return prices.withColumn(date_col, F.to_timestamp(F.col(date_col)))


def daily(prices: DataFrame, date_col: str = "Date") -> DataFrame:
    """Day-grain passthrough: raw rows + period_key + agg_type='day'
    (yfinance_transform.py:121-128 — the day branch does NOT aggregate)."""
    return (
        prices.withColumn("period_key", F.date_format(F.col(date_col), "yyyy-MM-dd"))
        .withColumn("agg_type", F.lit("day"))
    )


def aggregates(
    prices: DataFrame,
    ticker_col: str = "ticker",
    date_col: str = "Date",
    grains: tuple[str, ...] = ("month", "year"),
) -> DataFrame:
    """Month+year stat matrices union-tagged (yfinance_transform.py:130-139).

    Cache the prepared input before this fan-out — the reference re-read
    Mongo once per grain per action (4 scans/collection)."""
    return multi_grain(
        prices, date_col, OHLCV_METRICS, grains=grains, entity_col=ticker_col
    )


def single_grain(
    prices: DataFrame,
    grain: str,
    ticker_col: str = "ticker",
    date_col: str = "Date",
) -> DataFrame:
    return aggregate_period(
        prices, date_col, OHLCV_METRICS, grain, entity_col=ticker_col
    )


def enrich_with_dimension(
    facts: DataFrame,
    daftar_saham: DataFrame,
    ticker_col: str = "ticker",
    kode_col: str = "Kode",
) -> DataFrame:
    """Broadcast-join the 951-row ticker dimension (left join keeps facts
    whose ticker is missing from the CSV)."""
    return facts.join(
        F.broadcast(daftar_saham), facts[ticker_col] == daftar_saham[kode_col], "left"
    )
