"""Snapshot-delta operators — warehouse-maintenance surface (extension;
the reference's drop-and-replace sink, SURVEY.md §2.2 K2, is the
degenerate form: replace everything, keep no history).

`scd2_merge` derives a slowly-changing-dimension type-2 history slice
from two full snapshots: the standard pattern when an upstream system
hands over periodic full dumps (the reference's Mongo collections are
exactly that) and downstream wants AS-OF queryability instead of
last-write-wins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def scd2_merge(
    snap_old: DataFrame,
    snap_new: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    old_ts: str,
    new_ts: str,
    materialize: bool = True,
) -> DataFrame:
    """SCD type-2 rows from two full snapshots of a dimension:
    (key..., tracked..., valid_from, valid_to, is_current, change).

    Per key the classification is:
    - unchanged (all tracked cols null-safe-equal): one open row
      carried from the old snapshot (valid_from = old_ts);
    - changed: TWO rows — the old version closed at new_ts and the new
      version opened at new_ts;
    - deleted (key absent from the new snapshot): the old version
      closed at new_ts;
    - inserted (key absent from the old snapshot): the new version
      opened at new_ts.

    `change` carries the per-row classification so downstream audits
    need no re-derivation. valid_to is NULL on open rows (the
    standard SCD2 convention — an end-date sentinel bakes a fake
    timestamp into history).

    Plan: ONE full-outer join keyed on key_cols and two projections of
    its result unioned. The joined relation is localCheckpointed
    (``materialize``, default) — LOAD-BEARING, not a convenience:
    Spark does not share common subplans across a union's branches,
    so the lazy form executes the full-outer join TWICE (plan-pinned
    in test_plans.py); the checkpoint makes it the single co-shuffle
    the operator promises. At 100 TB both snapshots additionally live
    bucketed by the key so that one join plans exchange-free
    (sources/bucketing.py discipline). Null-safe equality (<=>) per
    tracked column: a NULL -> value or value -> NULL transition IS a
    change."""
    keys = list(key_cols)
    tracked = list(tracked_cols)
    o = snap_old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in tracked],
    )
    n = snap_new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in tracked],
    )
    cond = None
    for k in keys:
        eq = F.col(f"_ko_{k}") == F.col(f"_kn_{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"_ko_{keys[0]}").isNotNull()
    in_new = F.col(f"_kn_{keys[0]}").isNotNull()
    same = None
    for c in tracked:
        eq = F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(in_old & in_new & same, F.lit("unchanged"))
        .when(in_old & in_new, F.lit("changed"))
        .when(in_old, F.lit("deleted"))
        .otherwise(F.lit("inserted"))
    )
    j = j.select(
        *[
            F.coalesce(F.col(f"_ko_{k}"), F.col(f"_kn_{k}")).alias(k)
            for k in keys
        ],
        *[F.col(f"_o_{c}") for c in tracked],
        *[F.col(f"_n_{c}") for c in tracked],
        change.alias("change"),
    )
    if materialize:
        j = j.localCheckpoint()
    # open rows: the surviving version per key (old values when
    # unchanged, new values when changed/inserted; none when deleted)
    open_rows = j.filter(F.col("change") != "deleted").select(
        *keys,
        *[
            F.when(
                F.col("change") == "unchanged", F.col(f"_o_{c}")
            )
            .otherwise(F.col(f"_n_{c}"))
            .alias(c)
            for c in tracked
        ],
        F.when(F.col("change") == "unchanged", F.lit(old_ts))
        .otherwise(F.lit(new_ts))
        .alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
        "change",
    )
    # closed rows: the superseded/removed old version
    closed_rows = j.filter(
        F.col("change").isin("changed", "deleted")
    ).select(
        *keys,
        *[F.col(f"_o_{c}").alias(c) for c in tracked],
        F.lit(old_ts).alias("valid_from"),
        F.lit(new_ts).alias("valid_to"),
        F.lit(False).alias("is_current"),
        "change",
    )
    return open_rows.unionByName(closed_rows)


def cdc_apply(
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a CDC changelog (insert/update/delete events with a
    total per-key order) to the final table state: the LATEST event
    per key wins; keys whose latest event is a delete disappear.

    This is the batch compaction half of a CDC ingest (the streaming
    half is a foreachBatch fold over the same logic): given the raw
    append-only changelog a connector lands, produce the queryable
    snapshot.

    Plan: one window (key ORDER BY seq DESC) -> keep row_number 1,
    filter deletes. A single shuffle keyed on the key; at 100 TB the
    changelog lands bucketed by key (sources/bucketing.py) and the
    window runs exchange-free. Ties on seq_col are broken by op DESC
    so a same-sequence delete+upsert pair resolves deterministically
    (U > I > D lexicographically — an upsert wins over a simultaneous
    delete; real changelogs have unique sequence numbers)."""
    return cdc_compact(changelog, key_cols, seq_col, op_col).filter(
        F.col(op_col) != delete_op
    )


def cdc_compact(
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Latest event per key INCLUDING delete tombstones — the
    associative inner step of `cdc_apply`: compact(compact(A) ∪ B) ==
    compact(A ∪ B), because keeping the max-(seq, op) row per key is
    a per-key max. Tombstones must survive compaction (dropping them
    would let an older buffered event resurrect a deleted key when
    batches are folded incrementally); `cdc_apply` filters them at
    serve time. This is the state the streaming fold
    (streaming/events.run_streaming_cdc) persists per micro-batch."""
    keys = list(key_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(seq_col).desc(), F.col(op_col).desc())
    )
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
