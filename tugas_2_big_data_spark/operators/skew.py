"""Skew-mitigation utilities: salting for hot keys.

AQE's skew-join handling (enabled in the session factory) splits
oversized SHUFFLE partitions at runtime, which covers most cases. These
helpers cover the two places AQE can't:

- ``salted_agg``: a high-cardinality aggregate where ONE key dominates
  (e.g. null-bucket or bot user). Two-phase: partial aggregate on
  (key, salt) spreads the hot key over `n_salts` reducers, final
  aggregate merges the partials. Works for any algebraic aggregate
  (sum/count/min/max — supply merge expressions for others).
- ``salted_broadcast_left``: when a broadcast join's STREAM side must be
  repartitioned anyway and a residual shuffle join remains skewed,
  explode the (small) build side `n_salts`× and salt the stream side,
  so one hot key spreads across n_salts tasks. Only for small build
  sides — the build side is replicated n_salts times.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Uniform pseudo-random salt in [0, n_salts) — derived from a
    monotonically-increasing id so it is cheap and shuffle-free (NOT
    stable across executions; salts never appear in results)."""
    return df.withColumn(
        col_name, (F.monotonically_increasing_id() % n_salts).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregate.

    `aggs` maps output name -> (partial_expr, merge_expr-over-partial).
    Example::

        salted_agg(df, ["k"], {
            "n":     (F.count(F.lit(1)),  F.sum("n")),
            "total": (F.sum("value"),     F.sum("total")),
            "mx":    (F.max("value"),     F.max("mx")),
        })
    """
    keys = list(keys)
    partial = (
        with_salt(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_broadcast_left(
    stream: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the build side exploded n_salts× and the
    stream side salted — a hot stream key spreads over n_salts tasks."""
    replicated = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    salted = with_salt(stream, n_salts)
    out = salted.join(F.broadcast(replicated), [key, "_salt"])
    return out.drop("_salt")
