"""Join-side reduction operators.

The reference has no joins at all (SURVEY.md §2.5); the engine's join
surface lives in the queries (broadcast/SMJ/semi/anti), in
operators/asof.py, rangejoin.py, skew.py — and here, where a join's
INPUT is reduced before its shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tugas_2_big_data_spark.operators.dedup import (
    _bloom_block_mask,
    bloom_state,
)


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_blocks: int = 4096,
    g: int = 3,
) -> DataFrame:
    """Inner equi-join with an explicit Bloom runtime filter: the DIM
    side's distinct keys build a blocked-Bloom word table (8 bytes per
    block — `dedup.bloom_state`, the same mergeable sketch the ingest
    gate uses), which broadcasts and prefilters the FACT side MAP-SIDE,
    so fact rows whose key definitely isn't in dim never enter the
    join's exchange. Bloom false positives pass the prefilter and are
    eliminated by the join itself, so the result is IDENTICAL to the
    plain join — which is exactly what the registered query's oracle
    asserts (the plain SQL join, no bloom anywhere).

    When it matters at 100 TB: a dim too LARGE to broadcast forces a
    shuffle join that moves EVERY fact row — but the dim's bloom is
    O(n_blocks) (8 bytes/block, fixed) regardless of dim size, so the
    word table still broadcasts and the fact side is thinned map-side
    BEFORE its exchange, to roughly the truly-matching rows plus the
    (1-e^{-gn/m})^g false-positive residue. (When dim fits in a
    broadcast the planner just broadcasts the join and no fact shuffle
    exists to save — this operator is for the tier above that.)
    Spark's AQE/runtime-filter machinery covers some shapes natively;
    this form is explicit, tunable (n_blocks/g), engine-portable, and
    observable — the word table is a first-class relation you can
    persist and reuse across queries, like the ingest bloom artifact.
    The final join is left to the planner: un-hinted, so it shuffles
    or broadcasts on dim's actual size."""
    keys = dim.select(F.col(key).cast("string").alias("_k")).distinct()
    bloom = bloom_state(keys, n_blocks, g, key_col="_k")
    block, mask = _bloom_block_mask(
        F.col(key).cast("string"), n_blocks, g
    )
    hit = F.col("_word").isNotNull() & (
        F.col("_word").bitwiseAND(F.col("_mask")) == F.col("_mask")
    )
    prefiltered = (
        fact.withColumn("_blk", block)
        .withColumn("_mask", mask)
        .join(
            F.broadcast(
                bloom.select(
                    F.col("block_id").alias("_blk"),
                    F.col("word").alias("_word"),
                )
            ),
            "_blk",
            "left",
        )
        .filter(hit)
        .drop("_blk", "_mask", "_word")
    )
    return prefiltered.join(dim, key)
