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


def _replicate_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Each row duplicated once per salt value in [0, n_salts)."""
    return df.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))


def salted_semi_join(
    left: DataFrame,
    keys: DataFrame,
    key: str,
    salt_expr: Column,
    n_salts: int = 8,
) -> DataFrame:
    """Shuffle left-semi equi-join that survives a hot join key WITHOUT
    broadcasting: the key-set side is exploded n_salts× and the left
    side salted by ``salt_expr`` (a deterministic expression over left
    columns — NOT monotonically_increasing_id, so re-executions of the
    same plan salt identically), so one hot key's occurrence list
    spreads over n_salts reducers instead of landing in one task.

    Unlike ``salted_broadcast_left`` the key-set side is SHUFFLED, not
    broadcast — for when it is too large to broadcast AND has no usable
    hot/cold split. MEASURED CAVEAT: salting rewrites the join key to
    (key, salt), which breaks exchange reuse with any aggregation that
    produced ``keys`` on the bare key — on the span-dedup shape that
    cost 9× at the 100× probe tier (two extra corpus-sized shuffles),
    which is why the span family uses `hot_split_semi_join` instead.
    Prefer this form only when the left side's partitioning is not
    already reusable. Result ≡ plain left-semi on ``key``; n_salts <= 1
    falls back to the plain join."""
    if n_salts <= 1:
        return left.join(keys.select(key), key, "left_semi")
    salted = left.withColumn(
        "_salt", F.pmod(salt_expr, F.lit(n_salts)).cast("int")
    )
    return salted.join(
        _replicate_salts(keys.select(key), n_salts), [key, "_salt"], "left_semi"
    ).drop("_salt")


def hot_split_semi_join(
    left: DataFrame,
    keys: DataFrame,
    key: str,
    cnt_col: str,
    hot_top: int = 1024,
) -> DataFrame:
    """Left-semi equi-join that survives hot join keys by SPLITTING the
    key set: the top ``hot_top`` keys by ``keys[cnt_col]`` (occurrence
    count, key tiebreak — a deterministic bounded TopK) route through a
    BROADCAST semi-join — map-only, so a hot key's occurrence list is
    processed wherever it already sits and can never concentrate in one
    reducer — while the cold remainder keeps the plain shuffle
    semi-join, whose exchange REUSES the aggregation that produced
    ``keys`` when both hash on the bare key (the usual lineage: keys =
    left.groupBy(key).agg(...)). The two key sets partition the key
    set, so the union of the legs' memberships ≡ the unsplit semi-join.

    This is the skew form to reach for first: the cold path's plan is
    bit-identical to the unmitigated join (salting, by contrast,
    rewrites the join key and was measured 9× slower on the span shape
    — see `salted_semi_join`). The left side is read twice (once per
    leg), so materialize it (localCheckpoint/persist) when its lineage
    is expensive. hot_top <= 0 disables the split."""
    if hot_top <= 0:
        return left.join(keys.select(key), key, "left_semi")
    hot = keys.orderBy(F.desc(cnt_col), key).limit(hot_top).select(key)
    cold = keys.join(F.broadcast(hot), key, "left_anti").select(key)
    return left.join(cold, key, "left_semi").unionByName(
        left.join(F.broadcast(hot), key, "left_semi")
    )


def hot_split_inner_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    cnt_col: str,
    hot_top: int = 1024,
) -> DataFrame:
    """Inner twin of ``hot_split_semi_join`` — carries the right side's
    payload columns through (``cnt_col`` is dropped from the output).
    The right side must be DISTINCT on ``key``, which holds for the
    aggregated per-key relations this serves. hot_top <= 0 disables."""
    if hot_top <= 0:
        return left.join(right.drop(cnt_col), key)
    hot = right.orderBy(F.desc(cnt_col), key).limit(hot_top).drop(cnt_col)
    cold = right.join(
        F.broadcast(hot.select(key)), key, "left_anti"
    ).drop(cnt_col)
    return left.join(cold, key).unionByName(
        left.join(F.broadcast(hot), key)
    )
