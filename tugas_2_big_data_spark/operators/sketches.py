"""Mergeable frequency sketches with deterministic error bounds.

Complements the built-in sketch surface (HyperLogLog++ distinct counts,
Greenwald–Khanna quantiles — queries_analytics.py sketch_*) with the
third classic streaming summary: HEAVY HITTERS (most-frequent items),
via the distributed Misra-Gries / SpaceSaving merge.

Reference scope: the reference has no approximate operators at all
(SURVEY.md §2.6 — its aggregations are exact); this module is part of
the 100 TB extension surface, where "exact top-k users" means shuffling
every distinct (user, count) pair and a bounded-memory summary per
partition is the only viable shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tugas_2_big_data_spark.operators.sampling import hash_unit24

# Deterministic LOGICAL shards (not physical partitions): sharding by a
# portable seeded hash of a row attribute makes the sketch's output a
# pure function of the DATA, so it is rerun-stable, cross-engine
# reproducible (the DuckDB oracle replays the identical math), and
# independent of Spark's physical partitioning. Physical partitions
# would couple results to file splits — correct too, but unauditable.
SHARD_SEED = 5


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    shard_key_col: str,
    n_shards: int = 16,
    local_k: int = 20,
    top_n: int = 10,
) -> DataFrame:
    """Top-`top_n` most frequent items with Misra-Gries merge bounds.

    Each logical shard keeps only its `local_k` highest per-item counts
    (bounded memory: `n_shards · local_k` summary rows total, whatever
    the item cardinality). For every candidate item (union of shard
    top-k lists):

    - ``est_lo`` = Σ counts over shards where the item survived — a
      certain LOWER bound on its true frequency;
    - ``est_hi`` = est_lo + Σ residual over shards where it was
      dropped, residual_s = the (k+1)-th count of shard s (no dropped
      item can exceed it) — a certain UPPER bound.

    An item whose true count exceeds Σ_s residual_s is GUARANTEED to be
    a candidate (it beats the cut in at least one shard), so the
    summary cannot miss a sufficiently heavy hitter — the Misra-Gries
    guarantee, merged.

    Output: (item, exact_cnt, est_lo, est_hi, within_bound) for the
    top_n candidates by est_lo. `exact_cnt` (one extra exact
    aggregation over the candidates) is emitted so the cross-engine
    gate value-compares true frequencies AND pins the sketch's bound
    arithmetic via ``within_bound`` — same contract as the HLL/GK
    sketch queries.

    Scale shape: one partial-aggregated shuffle to (shard, item), a
    WindowGroupLimit-pruned per-shard top-k over the ALREADY-aggregated
    relation (n_shards groups), one broadcast of the one-row total
    residual, and an exact count restricted to candidates. At 100 TB
    the (shard, item) aggregate is the only data-sized stage; all
    sketch state after it is n_shards·local_k rows.
    """
    shard = F.pmod(hash_unit24(shard_key_col, SHARD_SEED), F.lit(n_shards))
    local = (
        df.select(shard.alias("shard"), F.col(item_col).alias("item"))
        .groupBy("shard", "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.col("item"))
    ranked = local.withColumn("rk", F.row_number().over(w))
    kept = ranked.filter(F.col("rk") <= local_k)
    resid = ranked.filter(F.col("rk") == local_k + 1).select(
        "shard", F.col("cnt").alias("residual")
    )
    tot = resid.agg(
        F.coalesce(F.sum("residual"), F.lit(0)).alias("tot_residual")
    )
    per_item = (
        kept.join(resid, "shard", "left")
        .groupBy("item")
        .agg(
            F.sum("cnt").alias("est_lo"),
            F.sum(F.coalesce(F.col("residual"), F.lit(0))).alias(
                "present_resid"
            ),
        )
    )
    # exact counts RESTRICTED to the candidate set: the candidate item
    # ids (≤ n_shards·local_k rows) broadcast into a semi-join on the
    # scan, so the exact branch aggregates only candidate rows — a full
    # per-item aggregate here would be the very all-distinct-items
    # shuffle the sketch exists to avoid
    exact = (
        df.join(
            F.broadcast(per_item.select("item")),
            F.col(item_col) == F.col("item"),
            "left_semi",
        )
        .groupBy(F.col(item_col).alias("item"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return (
        per_item.crossJoin(F.broadcast(tot))
        .withColumn(
            "est_hi",
            F.col("est_lo") + F.col("tot_residual") - F.col("present_resid"),
        )
        .join(exact, "item")
        .withColumn(
            "within_bound",
            (F.col("est_lo") <= F.col("exact_cnt"))
            & (F.col("exact_cnt") <= F.col("est_hi")),
        )
        .orderBy(F.desc("est_lo"), F.col("item"))
        .limit(top_n)
        .select(
            F.col("item"),
            F.col("exact_cnt"),
            F.col("est_lo"),
            F.col("est_hi"),
            F.col("within_bound"),
        )
    )
