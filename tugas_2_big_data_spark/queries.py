"""Query registry: every implemented operator exposed as a (spark_fn, oracle_sql) pair.

This is the engine's public query surface and the correctness gate: the
driver runs each Spark query AND its DuckDB oracle SQL side-by-side at
sf0.01 and hash-compares results (order-insensitive, columns sorted by
name). Column aliases are therefore pinned identically on both sides.

Conventions:
- every callable takes (spark, sf_dir) and returns a DataFrame;
- counts / row_numbers cast to BIGINT on both sides (Spark int vs DuckDB
  int64 would mismatch schemas);
- period keys are strings (date_format ↔ strftime), UTC pinned by
  tune_session;
- queries with no SQL-expressible oracle register oracle=None (driver
  records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tugas_2_big_data_spark.session import tune_session
from tugas_2_big_data_spark.sources.catalog import load_table
from tugas_2_big_data_spark.operators import timeseries

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        _REGISTRY[name] = (wrapped, oracle)
        return wrapped

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1 pricing summary — scan → project → hash agg → sort.
# Exercises the spine: parquet scan w/ pushdown, arithmetic expressions,
# partial+final HashAggregate, whole-stage codegen end-to-end.
# ---------------------------------------------------------------------------

TPCH_Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  sum(l_quantity)                                          AS sum_qty,
  sum(l_extendedprice)                                     AS sum_base_price,
  sum(l_extendedprice * (1 - l_discount))                  AS sum_disc_price,
  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))    AS sum_charge,
  avg(l_quantity)                                          AS avg_qty,
  avg(l_extendedprice)                                     AS avg_price,
  avg(l_discount)                                          AS avg_disc,
  CAST(count(*) AS BIGINT)                                 AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1", TPCH_Q1_SQL)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Reference-parity family: the yfinance day/month/year stat matrix
# (SURVEY.md §2.6 A1, §2.7 W1, §2.8 union-by-tag) re-hosted on the
# lineitem table: metrics = 4 numeric measures, entity = l_returnflag
# (stands in for the per-company collection), window PARTITIONED by
# entity (scale fix for the reference's global window).
# ---------------------------------------------------------------------------

_YF_METRICS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_DUCK_STATS = {"avg": "avg", "sum": "sum", "max": "max", "min": "min", "stddev": "stddev_samp"}
_DUCK_FMT = {"day": "%Y-%m-%d", "month": "%Y-%m", "year": "%Y"}


def _yf_oracle(grain: str, label: str | None = None, seq_name: str | None = None) -> str:
    label = label or grain
    seq_name = seq_name or f"{label}_number"
    stat_sql = ",\n    ".join(
        f"{duck_fn}({m}) AS {stat}_{m}"
        for stat, duck_fn in _DUCK_STATS.items()
        for m in _YF_METRICS
    )
    return f"""
SELECT *,
  CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY period_key) AS BIGINT)
    AS {seq_name},
  '{label}' AS agg_type
FROM (
  SELECT
    l_returnflag,
    strftime(l_shipdate, '{_DUCK_FMT[grain]}') AS period_key,
    {stat_sql},
    CAST(count(*) AS BIGINT) AS row_count
  FROM lineitem
  GROUP BY l_returnflag, period_key
) agg
"""


def _yf_query(grain: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, "lineitem", sf_dir)
        return timeseries.aggregate_period(
            li, "l_shipdate", _YF_METRICS, grain, entity_col="l_returnflag"
        )

    return fn


for _g in ("day", "month", "year"):
    register(f"yf_agg_{_g}", _yf_oracle(_g))(_yf_query(_g))


_YF_MULTI_ORACLE = (
    _yf_oracle("month", seq_name="seq_number")
    + "\nUNION ALL BY NAME\n"
    + _yf_oracle("year", seq_name="seq_number")
)


@register("yf_multi_grain", _YF_MULTI_ORACLE)
def yf_multi_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return timeseries.multi_grain(
        li, "l_shipdate", _YF_METRICS, grains=("month", "year"), entity_col="l_returnflag"
    )
