"""Unit tests for the IDX 32-column transform on reference-shaped nested
fixtures (FIXTURES.md §3 edge rows; semantic traps of SURVEY.md §7)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tugas_2_big_data_spark.operators import financial

_DATA_FIELDS = list(financial.IDX_TEXT_FIELDS) + list(financial.IDX_NUMERIC_FIELDS)


def _schema() -> T.StructType:
    data = T.StructType([T.StructField(f, T.StringType()) for f in _DATA_FIELDS])
    return T.StructType(
        [
            T.StructField("company_code", T.StringType()),
            T.StructField("year", T.StringType()),
            T.StructField("period", T.StringType()),
            T.StructField("data", data),
        ]
    )


def _doc(**over) -> tuple:
    base = {f: None for f in _DATA_FIELDS}
    base.update(
        EntityName="PT Test",
        Sector="Finance",
        Subsector="Banks",
        SalesAndRevenue="1000",
        GrossProfit="400",
        ProfitLossBeforeIncomeTax="200",
        FinanceCosts="50",
        ProfitLoss="150",
        Equity="500",
        Assets="2000",
        Liabilities="1500",
        CurrentAssets="800",
        CurrentLiabilities="400",
        SellingExpenses="80",
        GeneralAndAdministrativeExpenses="60",
    )
    base.update(over)
    return ("TST", "2024", "tw1", tuple(base[f] for f in _DATA_FIELDS))


@pytest.fixture(scope="module")
def result(spark):
    rows = [
        _doc(),                                             # r0 baseline
        _doc(SalesAndRevenue="0"),                          # r1 zero revenue
        _doc(SalesAndRevenue="N/A"),                        # r2 unparseable
        _doc(ShortTermLoans=None, CurrentMaturitiesOfBankLoans="77"),  # r3
        _doc(ShortTermLoans="33", CurrentMaturitiesOfBankLoans="77"),  # r4
        _doc(Equity="0", CurrentLiabilities="0"),           # r5 zero denoms
        _doc(GrossProfit="-400", ProfitLoss="-150"),        # r6 losses
    ]
    df = spark.createDataFrame(rows, _schema())
    return financial.transform(df).collect()


def test_column_contract(result):
    # exact 32 columns, exact order (idx_transform.py:234-267)
    assert list(result[0].asDict()) == financial.FINAL_COLUMNS


def test_baseline_derived(result):
    r = result[0]
    assert r["operating_profit"] == 150.0      # 200 - 50
    assert r["ebitda"] == 250.0                # 200 + 50 (reference defn, sic)
    assert r["operating_expenses"] == 140.0    # 80 + 60
    assert r["current_ratio"] == 2.0           # 800 / 400
    assert r["gross_margin_pct"] == 40.0
    assert r["asset_to_equity_ratio"] == 4.0
    assert r["debt_to_equity_ratio"] == 3.0


def test_zero_revenue_gives_null_margins(result):
    r = result[1]
    assert r["gross_margin_pct"] is None
    assert r["operating_margin_pct"] is None
    assert r["net_margin_pct"] is None


def test_unparseable_string_casts_to_null_then_zero(result):
    # 'N/A' → cast NULL → fillna 0 → nullif(0) → NULL margins
    r = result[2]
    assert r["revenue"] == 0.0
    assert r["gross_margin_pct"] is None


def test_coalesce_dead_branch_parity(result):
    # reference zero-fills BEFORE coalesce, so NULL ShortTermLoans
    # becomes 0 and the CurrentMaturities branch is DEAD: borrowing is
    # 0, NOT 77 (idx_transform.py:160-183 — preserved, not "fixed")
    assert result[3]["short_term_borrowing"] == 0.0
    assert result[4]["short_term_borrowing"] == 33.0


def test_zero_denominators_null_ratios(result):
    r = result[5]
    assert r["current_ratio"] is None
    assert r["asset_to_equity_ratio"] is None
    assert r["debt_to_equity_ratio"] is None


def test_negative_margins_sign(result):
    r = result[6]
    assert r["gross_margin_pct"] == -40.0
    assert r["net_margin_pct"] == -15.0
