"""Financial-report flattening + ratio chain (IDX pipeline parity).

Re-expresses ``idx_transform.py:107-273`` (process_financial_data) as a
declarative spec: nested-struct flatten with casts, a single vectorized
zero-fill, derived columns, null-safe ratios, and the exact 32-column
output contract. Semantic pins preserved deliberately (SURVEY.md §7):

- numeric fields arrive as STRINGS and are cast to double; unparseable
  strings become NULL (Spark cast semantics, ``idx_transform.py:125-156``);
- NULLs are zero-filled BEFORE ratios (``:160-169``), so ratio
  denominators use nullif-guards and the short_term_borrowing coalesce's
  later branches are dead in practice (``:180-183``) — reproduced, not
  "fixed";
- ratio division by zero yields NULL, not error/inf (``:198-231``).

All expressions are built-in Column ops — whole-stage-codegen'd, no UDFs,
no shuffle (pure narrow projection chain; at 100 TB this is a map-only
stage that Catalyst collapses into the scan projection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tugas_2_big_data_spark.functions.expressions import null_safe_div, ratio_pct

# nested field -> output alias (text fields, no cast). idx_transform.py:120-124
IDX_TEXT_FIELDS: dict[str, str] = {
    "EntityName": "company_name",
    "Sector": "sector",
    "Subsector": "subsector",
}

# nested field -> output alias (numeric-as-string fields, cast to double).
# idx_transform.py:125-156
IDX_NUMERIC_FIELDS: dict[str, str] = {
    "SalesAndRevenue": "revenue",
    "GrossProfit": "gross_profit",
    "ProfitLossBeforeIncomeTax": "profit_before_tax",
    "FinanceCosts": "finance_costs",
    "ProfitLoss": "net_profit",
    "CashAndCashEquivalents": "cash",
    "Assets": "total_assets",
    "ShortTermLoans": "short_term_loans",
    "CurrentMaturitiesOfBankLoans": "current_maturities",
    "LongTermBankLoans": "long_term_borrowing",
    "Equity": "total_equity",
    "NetCashFlowsReceivedFromUsedInOperatingActivities": "cash_from_operations",
    "NetCashFlowsReceivedFromUsedInInvestingActivities": "cash_from_investing",
    "NetCashFlowsReceivedFromUsedInFinancingActivities": "cash_from_financing",
    "Liabilities": "total_liabilities",
    "BasicEarningsLossPerShareFromContinuingOperations": "basic_eps",
    "SellingExpenses": "selling_expenses",
    "GeneralAndAdministrativeExpenses": "g_and_a_expenses",
    "CurrentAssets": "current_assets",
    "CurrentLiabilities": "current_liabilities",
}

# final 32-column contract, exact order of idx_transform.py:234-267
FINAL_COLUMNS: list[str] = [
    "company_code", "year", "period",
    "company_name", "sector", "subsector",
    "revenue", "gross_profit", "operating_profit", "net_profit",
    "cash", "total_assets", "short_term_borrowing", "long_term_borrowing",
    "total_equity", "cash_from_operations", "cash_from_investing",
    "cash_from_financing", "total_liabilities", "ebitda", "basic_eps",
    "selling_expenses", "g_and_a_expenses", "operating_expenses",
    "current_assets", "current_liabilities", "current_ratio",
    "asset_to_equity_ratio", "debt_to_equity_ratio", "gross_margin_pct",
    "operating_margin_pct", "net_margin_pct",
]


def flatten(df: DataFrame, struct_col: str = "data") -> DataFrame:
    """Pull the nested report struct into flat, typed columns
    (idx_transform.py:113-157)."""
    cols: list[Column] = [F.col("company_code"), F.col("year"), F.col("period")]
    cols += [F.col(f"{struct_col}.{f}").alias(a) for f, a in IDX_TEXT_FIELDS.items()]
    # try_cast: unparseable numeric strings become NULL — the reference's
    # semantics under Spark 3 non-ANSI cast (idx_transform.py:125-156);
    # Spark 4's ANSI-mode cast would throw instead.
    cols += [
        F.col(f"{struct_col}.{f}").try_cast("double").alias(a)
        for f, a in IDX_NUMERIC_FIELDS.items()
    ]
    return df.select(*cols)


def zero_fill(df: DataFrame) -> DataFrame:
    """Zero-fill every numeric report column in ONE na.fill call — the
    reference loops 20 fillna calls (idx_transform.py:160-169), which is
    20 plan nodes; one call is one node with identical semantics."""
    return df.na.fill(0, subset=list(IDX_NUMERIC_FIELDS.values()))


def with_derived(df: DataFrame) -> DataFrame:
    """Derived arithmetic columns (idx_transform.py:172-195). Note the
    reference's EBITDA definition is profit_before_tax + finance_costs —
    kept verbatim (it is their spec, sic)."""
    return df.withColumns(
        {
            "operating_profit": F.col("profit_before_tax") - F.col("finance_costs"),
            "short_term_borrowing": F.coalesce(
                F.col("short_term_loans"), F.col("current_maturities"), F.lit(0.0)
            ),
            "ebitda": F.col("profit_before_tax") + F.col("finance_costs"),
            "operating_expenses": F.col("selling_expenses") + F.col("g_and_a_expenses"),
        }
    )


def with_ratios(df: DataFrame) -> DataFrame:
    """Null-safe ratio columns (idx_transform.py:198-231)."""
    return df.withColumns(
        {
            "current_ratio": null_safe_div(
                F.col("current_assets"), F.col("current_liabilities")
            ),
            "asset_to_equity_ratio": null_safe_div(
                F.col("total_assets"), F.col("total_equity")
            ),
            "debt_to_equity_ratio": null_safe_div(
                F.col("total_liabilities"), F.col("total_equity")
            ),
            "gross_margin_pct": ratio_pct(F.col("gross_profit"), F.col("revenue")),
            "operating_margin_pct": ratio_pct(
                F.col("operating_profit"), F.col("revenue")
            ),
            "net_margin_pct": ratio_pct(F.col("net_profit"), F.col("revenue")),
        }
    )


def transform(df: DataFrame, struct_col: str = "data") -> DataFrame:
    """Full pipeline: flatten → zero-fill → derived → ratios → 32-column
    contract (idx_transform.py:107-273)."""
    return (
        with_ratios(with_derived(zero_fill(flatten(df, struct_col))))
        .select(*FINAL_COLUMNS)
    )
