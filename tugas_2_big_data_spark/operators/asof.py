"""As-of (point-in-time) join — timeseries extension (not in the
reference, which has no joins at all, SURVEY.md §2.5; natural for its
OHLCV data model: "attach the latest known X at each observation").

Spark has no built-in ASOF JOIN (DuckDB/Pandas do). The classic
distributed formulation is union-sort-carry:

  1. tag left/right rows and union them on the shared (by, time) spine;
  2. one window sorted by (time, side) per key partition carries the
     most recent right-side payload forward (last(ignorenulls));
  3. keep left rows, now holding the as-of matched payload.

Scale shape: ONE shuffle (the window partition by key) regardless of
table sizes — no range-condition join that Catalyst would plan as a
broadcast-nested-loop or cartesian. Skewed keys behave like any
window: salt the key or split hot entities upstream if one entity
dominates a partition.

A range-interval variant (join events to enclosing [start, end)
windows) composes from the same spine: carry the active interval id
instead of a payload.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    suffix: str = "_r",
    include_right_time: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward inclusive as-of LEFT join: each left row gains the
    payload of the latest right row with right.on <= left.on within the
    same `by` group (NULLs when no prior right row exists).

    Matches DuckDB ``l ASOF LEFT JOIN r ON l.by = r.by AND l.on >= r.on``
    when (by, on) is unique on the right side. With duplicate right
    timestamps, pass ``tiebreak`` (a right-side column forming a total
    order, e.g. an event id): the row with the GREATEST tiebreak value
    among equal timestamps is carried, making the output deterministic
    by construction instead of by data. The tiebreak column is used only
    for ordering and is not emitted. Without it, the carried row among
    equal timestamps is the last in (on, payload) order.

    The carried payload is ATOMIC: all right-side columns are packed
    into one struct and the struct is carried with
    last(ignorenulls=True), so the matched row's fields always travel
    together. (Carrying per-column would backfill a NULL field of the
    winning row from an older right row — emitting a mixed row that
    never existed.)
    """
    by = list(by)
    payload_cols = [
        c for c in right.columns if c not in {*by, on} and c != tiebreak
    ]
    carried_fields = [(f"{c}{suffix}", right.schema[c].dataType) for c in payload_cols]
    if include_right_time:
        carried_fields.append((f"{on}{suffix}", right.schema[on].dataType))
    carry_type = StructType(
        [StructField(n, t, nullable=True) for n, t in carried_fields]
    )

    l2 = left.withColumn("_side", F.lit(1)).withColumn(
        "_carry", F.lit(None).cast(carry_type)
    )
    if tiebreak is not None:
        l2 = l2.withColumn("_tb", F.lit(None).cast(right.schema[tiebreak].dataType))

    r2 = right.select(
        *by,
        F.col(on),
        *([F.col(tiebreak).alias("_tb")] if tiebreak is not None else []),
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols],
            *([F.col(on).alias(f"{on}{suffix}")] if include_right_time else []),
        ).alias("_carry"),
    ).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in {*by, on}:
            r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l2.unionByName(r2)
    # right rows (side 0) sort before left rows at equal timestamps →
    # backward INCLUSIVE semantics; among equal right timestamps the
    # greatest tiebreak sorts last and is the row carried forward.
    # A right row's _carry struct is never NULL (even if every field
    # is), so last(ignorenulls) skips only left rows — the carried
    # payload is exactly the winning right row, atomically.
    order = [F.col(on).asc(), F.col("_side").asc()]
    if tiebreak is not None:
        order.append(F.col("_tb").asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned.withColumn(
        "_carry", F.last("_carry", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    for name, _ in carried_fields:
        out = out.withColumn(name, F.col("_carry").getField(name))
    return out.drop("_side", "_tb", "_carry")
