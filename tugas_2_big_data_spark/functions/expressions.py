"""Reusable Column-expression builders.

The reference hand-writes 36 aggregate expressions (5 stats × 7 metrics +
count, ``yfinance_transform.py:53-90``) and 6 null-guarded ratio columns
(``idx_transform.py:198-231``). Here those become generators: declarative
expression lists the Catalyst optimizer folds into a single
partial+final HashAggregate — no UDFs, fully whole-stage-codegen'd.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# stat name -> (pyspark fn, output prefix). Matches the reference's five
# stats (mean/sum/max/min/stddev, yfinance_transform.py:54-88). stddev is
# SAMPLE stddev (NULL on 1-row groups) — semantic pin, SURVEY.md §7.
_STATS = {
    "avg": F.avg,
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "stddev": F.stddev_samp,
}


def metric_stat_aggs(
    metrics: Sequence[str],
    stats: Sequence[str] = ("avg", "sum", "max", "min", "stddev"),
    include_count: bool = True,
) -> list[Column]:
    """stats × metrics aggregate expressions, aliased ``{stat}_{metric}``.

    Generalizes the reference's 36-expression block
    (``yfinance_transform.py:53-90``): metrics=[Open..Stock Splits],
    stats=all five, plus row_count. Aliases are lowercase identifiers even
    when the source column has spaces (`Stock Splits` → `stock_splits`).
    """
    aggs = []
    for stat in stats:
        fn = _STATS[stat]
        for m in metrics:
            alias = f"{stat}_{m.lower().replace(' ', '_')}"
            aggs.append(fn(F.col(m)).alias(alias))
    if include_count:
        aggs.append(F.count(F.lit(1)).alias("row_count"))
    return aggs


def period_key(ts_col: str | Column, grain: str) -> Column:
    """Date-truncation to a string period key.

    Mirrors ``date_format(col, fmt)`` with fmt ∈ yyyy-MM-dd / yyyy-MM /
    yyyy (``yfinance_transform.py:50,121,123``). String keys (not
    date_trunc timestamps) are the reference's semantics and make the
    DuckDB oracle (strftime) exact.
    """
    fmts = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "year": "yyyy"}
    col = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.date_format(col, fmts[grain])


def null_safe_div(num: Column, den: Column) -> Column:
    """``num / nullif(den, 0)`` — division yields NULL (not error/inf) on a
    zero denominator. Parity with ``idx_transform.py:198-231``."""
    return num / F.nullif(den, F.lit(0))


def ratio_pct(num: Column, den: Column) -> Column:
    """Percentage ratio with a null-safe denominator (margin-pct family,
    ``idx_transform.py:212-231``)."""
    return null_safe_div(num, den) * F.lit(100.0)
