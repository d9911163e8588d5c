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


# The driver's correctness sweep is capped (~50 queries/round), so
# surface queries by how much a driver CORRECTNESS row is worth:
# (1) queries new or materially changed THIS round (pinned below —
# they need recertification regardless of history); (2) everything
# else ordered by certification AGE read from the CORRECTNESS_r*.json
# files the driver leaves at the repo root — never-certified first,
# then oldest newest-row first, registration order as tie-break. The
# age ordering rotates automatically each round, so no query's newest
# driver row can fall more than ~(registry/cap) rounds behind without
# hand-maintenance of this list.
_SWEEP_CHANGED: tuple[str, ...] = (
    # materially changed in round 12: the nprobe sweep was restructured
    # from four unioned per-nprobe re-derivations into one shared
    # assignment/scoring plan over an exploded nprobe dimension —
    # oracle SQL unchanged, values bit-equal at sf0.001/sf0.01
    # (tools/value_hashes.py), but the Spark plan is new and deserves
    # a fresh driver row
    "ann_ivf_nprobe_curve",
    # round 12: connected-components loop now checks convergence every
    # second round and checkpoints the edge relation — labels proven
    # bit-equal, new loop structure; pin the two cheapest consumers
    "dedup_text_components", "dedup_embedding_components",
)


def _certified_rounds() -> dict[str, int]:
    """Newest PASSING driver-correctness round per query name, from the
    CORRECTNESS_r{N}.json files at the repo root (absent files — e.g. a
    fresh checkout — just mean 'never certified'). A FAILED row is not
    certification: counting it would sort the failing query to the back
    of the capped sweep as 'freshly checked' — exactly the starvation
    this ordering exists to prevent — so failures keep the query at its
    previous age (or never-certified) and it re-runs first."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            passed = (
                row.get("err") is None
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            if passed:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def _sweep_order() -> list[str]:
    cert = _certified_rounds()
    pos = {n: i for i, n in enumerate(_REGISTRY)}
    changed = [n for n in _SWEEP_CHANGED if n in _REGISTRY]
    rest = sorted(
        (n for n in _REGISTRY if n not in set(changed)),
        key=lambda n: (cert.get(n, 0), pos[n]),
    )
    return changed + rest


def queries() -> dict[str, QueryFn]:
    return {name: _REGISTRY[name][0] for name in _sweep_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: _REGISTRY[name][1]
        for name in _sweep_order()
        if _REGISTRY[name][1] is not None
    }


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


# ---------------------------------------------------------------------------
# Financial-report family (IDX pipeline parity, SURVEY.md §2.3 P1-P11).
# ---------------------------------------------------------------------------

_FIN_CUST_SQL = """
SELECT
  c.c_custkey,
  c.c_name,
  c.c_acctbal,
  COALESCE(a.revenue, 0)                          AS revenue,
  CAST(COALESCE(a.n_orders, 0) AS BIGINT)         AS n_orders,
  COALESCE(a.revenue, 0) / nullif(COALESCE(a.n_orders, 0), 0)
                                                  AS avg_order_value,
  c.c_acctbal / nullif(COALESCE(a.revenue, 0), 0) * 100
                                                  AS balance_to_revenue_pct
FROM customer c
LEFT JOIN (
  SELECT o_custkey, sum(o_totalprice) AS revenue, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
) a ON c.c_custkey = a.o_custkey
"""


@register("fin_customer_ratios", _FIN_CUST_SQL)
def fin_customer_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + zero-fill + null-safe ratio chain (fillna→nullif
    interplay of idx_transform.py:160-231 on the testdata tables)."""
    from pyspark.sql import functions as F

    from tugas_2_big_data_spark.functions.expressions import null_safe_div, ratio_pct

    cust = load_table(spark, "customer", sf_dir)
    agg = (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_custkey")
        .agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    j = (
        cust.join(agg, cust.c_custkey == agg.o_custkey, "left")
        .drop("o_custkey", "c_nationkey", "c_mktsegment")
        .na.fill({"revenue": 0.0, "n_orders": 0})
    )
    return j.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        "revenue",
        "n_orders",
        null_safe_div(F.col("revenue"), F.col("n_orders")).alias("avg_order_value"),
        ratio_pct(F.col("c_acctbal"), F.col("revenue")).alias("balance_to_revenue_pct"),
    )


def _idx_oracle() -> str:
    # Mirrors the synthetic struct built in idx_flatten_ratios plus the
    # reference transform chain. String round-trips are lossless per
    # engine, so the oracle computes the arithmetic directly; 'N/A'
    # parses to NULL then zero-fills; '0' is plain 0.
    return """
SELECT * FROM (
  SELECT
    CAST(o_custkey % 50 AS VARCHAR)                AS company_code,
    strftime(o_orderdate, '%Y')                    AS year,
    o_orderpriority                                AS period,
    o_orderpriority                                AS company_name,
    o_orderstatus                                  AS sector,
    CAST(NULL AS VARCHAR)                          AS subsector,
    o_totalprice                                   AS revenue,
    o_totalprice * 0.4                             AS gross_profit,
    o_totalprice * 0.2 - fc                        AS operating_profit,
    o_totalprice * 0.15                            AS net_profit,
    o_totalprice * 0.3                             AS cash,
    o_totalprice * 3.0                             AS total_assets,
    stl                                            AS short_term_borrowing,
    o_totalprice * 0.5                             AS long_term_borrowing,
    eq                                             AS total_equity,
    o_totalprice * 0.12                            AS cash_from_operations,
    -(o_totalprice) * 0.07                         AS cash_from_investing,
    o_totalprice * 0.02                            AS cash_from_financing,
    o_totalprice * 1.5                             AS total_liabilities,
    o_totalprice * 0.2 + fc                        AS ebitda,
    o_totalprice / 1000.0                          AS basic_eps,
    sell                                           AS selling_expenses,
    o_totalprice * 0.06                            AS g_and_a_expenses,
    sell + o_totalprice * 0.06                     AS operating_expenses,
    o_totalprice * 1.2                             AS current_assets,
    cl                                             AS current_liabilities,
    o_totalprice * 1.2 / nullif(cl, 0)             AS current_ratio,
    o_totalprice * 3.0 / nullif(eq, 0)             AS asset_to_equity_ratio,
    o_totalprice * 1.5 / nullif(eq, 0)             AS debt_to_equity_ratio,
    o_totalprice * 0.4 / nullif(o_totalprice, 0) * 100
                                                   AS gross_margin_pct,
    (o_totalprice * 0.2 - fc) / nullif(o_totalprice, 0) * 100
                                                   AS operating_margin_pct,
    o_totalprice * 0.15 / nullif(o_totalprice, 0) * 100
                                                   AS net_margin_pct
  FROM (
    SELECT *,
      CASE WHEN o_orderkey % 97 = 0 THEN 0 ELSE o_totalprice * 0.05 END AS fc,
      CASE WHEN o_orderkey % 3 = 0 THEN 0 ELSE o_totalprice * 0.1 END   AS stl,
      CASE WHEN o_orderkey % 11 = 0 THEN 0 ELSE o_totalprice * 1.5 END  AS eq,
      CASE WHEN o_orderkey % 7 = 0 THEN 0 ELSE o_totalprice * 0.08 END  AS sell,
      CASE WHEN o_orderkey % 13 = 0 THEN 0 ELSE o_totalprice * 0.8 END  AS cl
    FROM orders
  )
)
"""


@register("idx_flatten_ratios", _idx_oracle())
def idx_flatten_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IDX 32-column contract over a synthetic nested document built
    from orders: numeric values as STRINGS in a `data` struct (including
    'N/A' → cast-NULL and '0' → nullif-NULL paths), then the exact
    flatten → zero-fill → derived → ratios chain of idx_transform.py."""
    from pyspark.sql import functions as F

    from tugas_2_big_data_spark.operators import financial

    o = load_table(spark, "orders", sf_dir)
    p = F.col("o_totalprice")
    k = F.col("o_orderkey")

    def s(c):  # double -> string, the reference's at-rest representation
        return c.cast("string")

    data = F.struct(
        F.col("o_orderpriority").alias("EntityName"),
        F.col("o_orderstatus").alias("Sector"),
        F.lit(None).cast("string").alias("Subsector"),
        s(p).alias("SalesAndRevenue"),
        s(p * 0.4).alias("GrossProfit"),
        s(p * 0.2).alias("ProfitLossBeforeIncomeTax"),
        F.when(k % 97 == 0, F.lit("N/A")).otherwise(s(p * 0.05)).alias("FinanceCosts"),
        s(p * 0.15).alias("ProfitLoss"),
        s(p * 0.3).alias("CashAndCashEquivalents"),
        s(p * 3.0).alias("Assets"),
        F.when(k % 3 == 0, F.lit(None)).otherwise(s(p * 0.1)).alias("ShortTermLoans"),
        F.when(k % 5 == 0, F.lit(None)).otherwise(s(p * 0.05)).alias(
            "CurrentMaturitiesOfBankLoans"
        ),
        s(p * 0.5).alias("LongTermBankLoans"),
        F.when(k % 11 == 0, F.lit("0")).otherwise(s(p * 1.5)).alias("Equity"),
        s(p * 0.12).alias("NetCashFlowsReceivedFromUsedInOperatingActivities"),
        s(-p * 0.07).alias("NetCashFlowsReceivedFromUsedInInvestingActivities"),
        s(p * 0.02).alias("NetCashFlowsReceivedFromUsedInFinancingActivities"),
        s(p * 1.5).alias("Liabilities"),
        s(p / 1000.0).alias("BasicEarningsLossPerShareFromContinuingOperations"),
        F.when(k % 7 == 0, F.lit(None)).otherwise(s(p * 0.08)).alias("SellingExpenses"),
        s(p * 0.06).alias("GeneralAndAdministrativeExpenses"),
        s(p * 1.2).alias("CurrentAssets"),
        F.when(k % 13 == 0, F.lit("0")).otherwise(s(p * 0.8)).alias(
            "CurrentLiabilities"
        ),
    )
    nested = o.select(
        (F.col("o_custkey") % 50).cast("string").alias("company_code"),
        F.date_format("o_orderdate", "yyyy").alias("year"),
        F.col("o_orderpriority").alias("period"),
        data.alias("data"),
    )
    return financial.transform(nested)


# ---------------------------------------------------------------------------
# Join family (SURVEY.md §2.5: the reference has NO joins; these are the
# idiomatic replacements + classic OLAP shapes the engine must serve).
# ---------------------------------------------------------------------------

_Q3_SQL = """
SELECT
  l_orderkey,
  sum(l_extendedprice * (1 - l_discount)) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d')       AS orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("tpch_q3", _Q3_SQL)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q5_SQL = """
SELECT
  n_name,
  sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("tpch_q5", _Q5_SQL)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join: big fact tables shuffle-join on keys; the three
    dimension tables broadcast (explicit hints — at 100 TB the planner
    sees stale stats at best, so smalls are pinned broadcast)."""
    from pyspark.sql import functions as F

    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


_Q6_SQL = """
SELECT sum(l_extendedprice * l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6", _Q6_SQL)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan range-filter aggregate: every predicate must reach
    the parquet scan (PushedFilters) so row groups outside the ranges
    are skipped entirely — at 100 TB this query's cost is IO on the
    surviving row groups, nothing else."""
    from pyspark.sql import functions as F

    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
        )
    )


_SEMI_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45
)
GROUP BY o_orderpriority
"""


@register("order_priority_semijoin", _SEMI_SQL)
def order_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_ANTI_SQL = """
SELECT n_name, CAST(count(*) AS BIGINT) AS customers_without_orders
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000
)
GROUP BY n_name
"""


@register("customers_without_orders", _ANTI_SQL)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no large order (non-empty at every sf)."""
    from pyspark.sql import functions as F

    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_totalprice") > 300000
    )
    nation = load_table(spark, "nation", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("customers_without_orders"))
    )


_ROLLUP_SQL = """
SELECT
  r_name,
  n_name,
  CAST(count(*) AS BIGINT)                  AS n_customers,
  avg(c_acctbal)                            AS avg_acctbal,
  CAST(grouping(r_name) + grouping(n_name) * 2 AS BIGINT) AS gid
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@register("region_nation_rollup", _ROLLUP_SQL)
def region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.avg("c_acctbal").alias("avg_acctbal"),
            (F.grouping("r_name") + F.grouping("n_name") * 2).cast("long").alias("gid"),
        )
    )


_PIVOT_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PIVOT_SQL = """
SELECT
  n_name,
  sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal END) AS "AUTOMOBILE",
  sum(CASE WHEN c_mktsegment = 'BUILDING'   THEN c_acctbal END) AS "BUILDING",
  sum(CASE WHEN c_mktsegment = 'FURNITURE'  THEN c_acctbal END) AS "FURNITURE",
  sum(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN c_acctbal END) AS "HOUSEHOLD",
  sum(CASE WHEN c_mktsegment = 'MACHINERY'  THEN c_acctbal END) AS "MACHINERY"
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("segment_pivot", _PIVOT_SQL)
def segment_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an EXPLICIT value list — without it Spark runs a
    distinct-scan job just to discover the columns (collect at scale)."""
    from pyspark.sql import functions as F

    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", _PIVOT_SEGS)
        .agg(F.sum("c_acctbal"))
    )


# ---------------------------------------------------------------------------
# Window family (SURVEY.md §2.7 W1/W2 generalized). All orderings are
# total: event_id / o_orderkey tiebreaks. Oracle casts ts to µs
# (CAST(ts AS TIMESTAMP)) because Spark truncates parquet ns → µs.
# ---------------------------------------------------------------------------

_WIN_ROWNUM_SQL = """
SELECT event_id, user_id, event_type, value,
  CAST(row_number() OVER (
    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
  ) AS BIGINT) AS seq_number
FROM events
"""


@register("win_rownum_events", _WIN_ROWNUM_SQL)
def win_rownum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tugas_2_big_data_spark.operators import windows

    ev = load_table(spark, "events", sf_dir)
    return windows.sequence_number(
        ev, ["user_id"], ["ts", "event_id"], name="seq_number"
    ).select("event_id", "user_id", "event_type", "value", "seq_number")


_WIN_LAG_SQL = """
SELECT event_id, user_id, value,
  value - lag(value) OVER (
    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
  ) AS delta
FROM events
"""


@register("win_lag_delta", _WIN_LAG_SQL)
def win_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tugas_2_big_data_spark.operators import windows

    ev = load_table(spark, "events", sf_dir)
    return windows.delta_from_previous(
        ev, ["user_id"], ["ts", "event_id"], "value", name="delta"
    ).select("event_id", "user_id", "value", "delta")


_WIN_ROLL_SQL = """
SELECT event_id, user_id, value,
  avg(value) OVER (
    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
  ) AS rolling_avg
FROM events
"""


@register("win_rolling_avg", _WIN_ROLL_SQL)
def win_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tugas_2_big_data_spark.operators import windows

    ev = load_table(spark, "events", sf_dir)
    return windows.rolling_mean(
        ev, ["user_id"], ["ts", "event_id"], "value", preceding=3, name="rolling_avg"
    ).select("event_id", "user_id", "value", "rolling_avg")


_WIN_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    CAST(row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) AS BIGINT) AS rk
  FROM orders
)
WHERE rk <= 3
"""


@register("win_topk_orders_per_customer", _WIN_TOPK_SQL)
def win_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from tugas_2_big_data_spark.operators import windows

    orders = load_table(spark, "orders", sf_dir)
    return windows.top_k_per_group(
        orders, ["o_custkey"], [F.desc("o_totalprice"), F.asc("o_orderkey")], k=3
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rk")


# ---------------------------------------------------------------------------
# Set operations + distinct aggregation (absent in the reference,
# SURVEY.md §2.8 — first-class here).
# ---------------------------------------------------------------------------

_SETOPS_SQL = """
(SELECT user_id FROM events WHERE event_type = 'click'
 GROUP BY user_id HAVING count(*) >= 15
 INTERSECT
 SELECT user_id FROM events WHERE event_type = 'purchase'
 GROUP BY user_id HAVING count(*) >= 15)
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'
GROUP BY user_id HAVING count(*) >= 18
"""


@register("set_ops_users", _SETOPS_SQL)
def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load_table(spark, "events", sf_dir)

    def ids(t: str, min_n: int) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == t)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= min_n)
            .select("user_id")
        )

    return ids("click", 15).intersect(ids("purchase", 15)).exceptAll(ids("error", 18))


_DISTINCT_SQL = """
SELECT event_type,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(count(*) AS BIGINT)                AS n_events,
  sum(value)                              AS total_value
FROM events
GROUP BY event_type
"""


@register("distinct_user_stats", _DISTINCT_SQL)
def distinct_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Event-time tumbling window — batch twin of the Structured Streaming
# ingest path (tugas_2_big_data_spark/streaming). Epoch-aligned buckets:
# Spark F.window ↔ DuckDB time_bucket.
# ---------------------------------------------------------------------------

_TUMBLE_SQL = """
SELECT
  strftime(time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)),
           '%Y-%m-%d %H:%M:%S')           AS window_start,
  event_type,
  CAST(count(*) AS BIGINT)                AS n_events,
  sum(value)                              AS total_value
FROM events
GROUP BY window_start, event_type
"""


@register("evt_tumbling_5min", _TUMBLE_SQL)
def evt_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_CUBE_SQL = """
SELECT r_name, o_orderpriority,
  CAST(count(*) AS BIGINT) AS n_orders,
  sum(o_totalprice)        AS total_price,
  CAST(
    (CASE WHEN r_name IS NULL THEN 1 ELSE 0 END)
    + 2 * (CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
  AS BIGINT) AS gid
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, o_orderpriority)
"""


@register("region_priority_cube", _CUBE_SQL)
def region_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, priority): all four grouping-set combinations
    in one pass (Spark expands to a single Expand + hash aggregate —
    one shuffle for the whole lattice, not one job per grouping set).
    gid disambiguates real NULLs from subtotal rows on both engines."""
    from pyspark.sql import functions as F

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .cube("r_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
            (
                F.grouping("r_name") + F.grouping("o_orderpriority") * 2
            ).cast("long").alias("gid"),
        )
    )


_SQL_SURFACE_SQL = """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity)                   AS sum_qty,
  round(avg(l_discount), 9)         AS avg_disc,
  CAST(count(*) AS BIGINT)          AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("sql_surface_pricing", _SQL_SURFACE_SQL)
def sql_surface_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL entry point: register the catalog as temp views
    and run ANSI SQL through spark.sql — same text a DuckDB/Trino user
    would write (modulo dialect), same Catalyst plan as the DataFrame
    API. Demonstrates that every catalog table is queryable as SQL."""
    from tugas_2_big_data_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
          sum(l_quantity)                 AS sum_qty,
          round(avg(l_discount), 9)       AS avg_disc,
          CAST(count(*) AS BIGINT)        AS n_rows
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )


# register the training-data pipeline extension queries (dedup,
# similarity, text analysis, multimodal) into the same registry
from tugas_2_big_data_spark import queries_training  # noqa: E402,F401

# register the TPC-H-style join/subquery surface (q2/q7..q22 adapted to
# the testdata schema)
from tugas_2_big_data_spark import queries_tpch  # noqa: E402,F401

# register the analytics extensions (range join, hypertable rollup,
# unpivot, distribution windows, sketches)
from tugas_2_big_data_spark import queries_analytics  # noqa: E402,F401

# register the Structured Streaming queries (drained on the bounded
# source so the driver's oracle checks batch/stream parity by value)
from tugas_2_big_data_spark import queries_streaming  # noqa: E402,F401
