"""Window-function operators with deterministic total ordering.

The reference's two window-ish behaviors (global row_number at
``yfinance_transform.py:92-93``; Mongo-natural-order index at
``iqplus_*:95-131``) both relied on non-deterministic order. Engine
policy (SURVEY.md §7): every ranking operator takes an explicit sort key
list whose last element must make the ordering total (callers pass a
unique id as tiebreak).

Scale: all of these shuffle once on the partition keys; the per-partition
sort is Tungsten's UnsafeExternalSorter (spills). A GLOBAL window (no
partition keys) is a deliberate anti-pattern — allowed only for
reference parity, documented at the call site.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _spec(partition_by: Sequence[str], order_by: Sequence[str | Column]) -> WindowSpec:
    w = Window.partitionBy(*partition_by) if partition_by else Window
    return w.orderBy(*order_by)


def sequence_number(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    name: str = "seq_number",
) -> DataFrame:
    """row_number 1..N per partition (BIGINT for oracle parity)."""
    return df.withColumn(
        name, F.row_number().over(_spec(partition_by, order_by)).cast("long")
    )


def delta_from_previous(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    value_col: str,
    name: str = "delta",
) -> DataFrame:
    """value - lag(value) per partition; NULL on each partition's first row."""
    w = _spec(partition_by, order_by)
    return df.withColumn(name, F.col(value_col) - F.lag(value_col).over(w))


def rolling_mean(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    value_col: str,
    preceding: int,
    name: str = "rolling_avg",
) -> DataFrame:
    """Trailing mean over (preceding preceding rows + current row)."""
    w = _spec(partition_by, order_by).rowsBetween(-preceding, 0)
    return df.withColumn(name, F.avg(value_col).over(w))


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_name: str = "rk",
) -> DataFrame:
    """Top-k rows per group by rank (deterministic given a total order).

    Catalyst plans this as a single shuffle + per-partition sort with a
    rank-limit pushdown (WindowGroupLimit in Spark 3.5+/4.x) — rows
    beyond k are dropped before the window materializes full groups.
    """
    ranked = df.withColumn(
        rank_name, F.row_number().over(_spec(partition_by, order_by)).cast("long")
    )
    return ranked.filter(F.col(rank_name) <= k)
