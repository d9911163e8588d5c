"""Entity resolution: blocking, fuzzy matching, and survivorship.

The reference pipeline has no record-linkage surface (SURVEY.md §2
records the absence); a warehouse feeding an LLM-training corpus needs
one — the same customer/author/source arriving with typos, OCR damage,
or suffix aliases must be resolved to a canonical entity BEFORE
per-entity aggregation, sampling quotas, or dedup keys are computed,
or every downstream count is split across the variants.

Design for 100 TB:
- **Never all-pairs.** A naive match is |dirty| x |base| comparisons;
  at 150 M x 150 M that is 2.25e16 pairs. Blocking maps each record
  to a small key (here: a normalized, corruption-invariant projection
  of the name) and only compares within a block — candidate volume is
  sum(|block_d| * |block_b|), bounded by (max block size)^2 per key.
  The block join is an equi-join Catalyst shuffles on the block key;
  both sides scale out, nothing is collected, and AQE's skew handling
  applies if one block runs hot.
- **Similarity stays JVM-side.** `levenshtein` is a Spark built-in
  (whole-stage codegen), so the verify step is a filter over the
  candidate relation — no Python in the hot path.
- **Best-match is one bounded window.** row_number partitioned by the
  dirty record id over (distance, key) — the window is per dirty
  record, never global.

The DuckDB oracles replay the same blocking expression and the same
`levenshtein` (both engines implement standard edit distance), so the
match relation is value-compared end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def digits_block_key(name: Column, n_digits: int = 8) -> Column:
    """Corruption-invariant blocking key: strip every non-digit and
    keep the first ``n_digits``. Letter-level typos and word suffixes
    leave the digit stream untouched, so a damaged name still lands in
    its parent's block — the textbook trick of blocking on the most
    stable projection of the field, not the raw field. Block size is
    bounded by the id-space fan-out of the dropped digits (10 per
    dropped digit), independent of table size."""
    return F.substring(F.regexp_replace(name, "[^0-9]", ""), 1, n_digits)


def blocked_candidates(
    dirty: DataFrame, base: DataFrame, on: str = "block"
) -> DataFrame:
    """Candidate pairs = equi-join on the block key. This is the ONLY
    place the two relations meet; everything downstream (distance,
    ranking, survivorship) works on the candidate relation, whose size
    is sum over blocks of |dirty block| x |base block| — linear in the
    data for bounded blocks, never quadratic in the tables."""
    return dirty.join(base, on=on)


def blocked_candidates_salted(
    dirty: DataFrame,
    base: DataFrame,
    on: str = "block",
    dirty_id: str = "d_id",
    salt: int = 8,
) -> DataFrame:
    """Skew-resilient variant of `blocked_candidates` for corpora where
    one block runs hot (a boilerplate name, an OCR artifact that
    collapses many records to the same digit stream): the dirty side
    gains a deterministic salt = hash(dirty id) % ``salt`` and the
    base side is replicated once per salt value, so the join key
    becomes (block, salt) and the hot block's pairs spread across
    ``salt`` shuffle partitions instead of one straggler task.

    The candidate SET is identical to the unsalted join — every
    (dirty, base) pair within a block appears exactly once, because
    each dirty row carries one salt and meets the one base replica
    with that salt. Cost: the base side is written ``salt``× into the
    shuffle — pay it only when a measured hot block exists (AQE's
    OptimizeSkewedJoin is the zero-cost first resort for sort-merge
    plans; this is the explicit fallback that also covers broadcast
    and bucketed paths AQE skew-split does not touch)."""
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    for side, df in (("dirty", dirty), ("base", base)):
        if "_salt" in df.columns:
            # withColumn would silently overwrite the caller's column
            # and the final drop would then remove THEIR data
            raise ValueError(
                f"{side} input already has a '_salt' column; rename it "
                "before calling blocked_candidates_salted"
            )
    d = dirty.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(dirty_id)), F.lit(salt)).cast("int")
    )
    b = base.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return d.join(b, on=[on, "_salt"]).drop("_salt")


def best_match(
    candidates: DataFrame,
    dirty_name: str = "d_name",
    base_name: str = "c_name",
    dirty_id: str = "d_id",
    base_key: str = "c_custkey",
    max_dist: int = 3,
) -> DataFrame:
    """Verify + rank: keep candidates within ``max_dist`` edits, then
    pick each dirty record's closest base record (ties broken by the
    smaller key so the result is deterministic). One window partitioned
    by the dirty id — state is per-record, the shuffle key is the same
    dirty id the candidate join already grouped, and the output is at
    most one row per dirty record."""
    dist = F.levenshtein(F.col(dirty_name), F.col(base_name))
    w = Window.partitionBy(dirty_id).orderBy("dist", base_key)
    return (
        candidates.withColumn("dist", dist)
        .filter(F.col("dist") <= max_dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def survivorship(
    matches: DataFrame,
    base: DataFrame,
    base_key: str = "c_custkey",
    matched_key: str = "c_custkey",
    dirty_id: str = "d_id",
    dirty_bal: str = "d_acctbal",
    base_bal: str = "c_acctbal",
    min_cluster: int = 2,
    base_rec_id: Column | None = None,
) -> DataFrame:
    """Collapse each matched cluster (a base record plus every dirty
    record resolved to it) to one survivor row: the record with the
    best completeness signal (here max account balance, ties to the
    smaller record id) wins, the cluster size is kept for audit.

    Shape: matches carry (d_id, matched_key, d_acctbal); base rows
    join in as their own cluster seed. One union + one groupBy on the
    cluster key — a single hash shuffle, no iteration, because
    best-match already made the cluster assignment functional (every
    dirty record points at exactly one base key).

    ``base_rec_id`` sets the base records' id in the shared rec-id
    space (default: the base key itself). When dirty ids are derived
    from base keys, pass an encoding that keeps the two populations
    disjoint — e.g. key*10 for base against key*10+variant for dirty
    twins — so a dirty id can never alias a base record in the
    survivor column."""
    base_rows = base.select(
        F.col(base_key).alias("cluster_key"),
        (
            base_rec_id if base_rec_id is not None else F.col(base_key)
        ).alias("rec_id"),
        F.col(base_bal).alias("acctbal"),
    )
    dirty_rows = matches.select(
        F.col(matched_key).alias("cluster_key"),
        F.col(dirty_id).alias("rec_id"),
        F.col(dirty_bal).alias("acctbal"),
    )
    rows = base_rows.unionByName(dirty_rows)
    best = F.struct(
        F.col("acctbal").alias("a"), (-F.col("rec_id")).alias("negid")
    )
    return (
        rows.groupBy("cluster_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.max(best).alias("b"),
        )
        .filter(F.col("n_records") >= min_cluster)
        .select(
            "cluster_key",
            "n_records",
            (-F.col("b.negid")).cast("long").alias("survivor_id"),
            F.col("b.a").alias("survivor_acctbal"),
        )
    )
