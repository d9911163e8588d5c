"""Deterministic dataset splitting for training pipelines (extension
surface — the reference has no sampling; SURVEY.md §2.8 notes set ops
are absent entirely).

Two split operators with different scale/exactness trade-offs:

- `hash_split`: per-row seeded md5-bucket assignment — MAP-ONLY, zero
  shuffles, proportions are approximate (binomial around the target
  fractions). This is the 100 TB path: no per-stratum ordering, no
  state, reproducible from the id alone, stable under
  repartitioning/insertion of new rows.
- `stratified_split`: EXACT per-stratum quotas via a seeded-hash
  permutation ranked inside each stratum — one shuffle (hash by the
  strata columns). Use when per-stratum proportions must be exact
  (small eval sets); at 100 TB the per-stratum sort makes this the
  expensive variant and few-distinct-strata skew concentrates work —
  prefer `hash_split` unless exactness matters.

Both are deterministic functions of (id, seed) / (stratum, id, seed):
rerunning on the same data yields byte-identical assignments, which is
what makes train/test contamination auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# 4096 hex buckets on the first 3 md5 hex chars; thresholds are part of
# the spec (train 0xccc/4096 ≈ 0.7998, val (0xe66-0xccc)/4096 ≈ 0.1001)
TRAIN_HEX = "ccc"
VAL_HEX = "e66"


def _bucket(id_col: str, seed: int) -> F.Column:
    return F.substring(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))),
        1,
        3,
    )


def hash_split(
    df: DataFrame, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Adds a `split` column ∈ {train, val, test} by seeded md5 bucket.

    Map-only (pinned zero-Exchange in test_plans.py); proportions are
    ≈ 80/10/10 — the hex thresholds, not the fractions, are the spec.
    """
    b = _bucket(id_col, seed)
    return df.withColumn(
        "split",
        F.when(b < TRAIN_HEX, F.lit("train"))
        .when(b < VAL_HEX, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def split_by_component(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    component_col: str = "component_id",
    seed: int = 42,
) -> DataFrame:
    """Group-aware `hash_split`: every member of a near-dup component
    lands in the SAME split by hashing the COMPONENT id instead of the
    doc id — the mitigation `split_leakage_check` measures the need
    for (a doc-hash split always leaks when the corpus has near-dups:
    a test doc whose near-twin is in train inflates eval).

    `components` is (id_col, component_col) — typically
    `similarity.connected_components` output, where a singleton doc's
    component is its own id, so singletons fall back to doc-hash
    behavior automatically; docs absent from `components` entirely
    also fall back to their own id (coalesce). Same seeded md5 bucket
    and hex thresholds as `hash_split`, so proportions stay ≈80/10/10
    in COMPONENTS (and in docs, when components are small — near-dup
    families are).

    Plan: one equi-join onto the component map (broadcast when the
    map is dim-sized; at 100 TB both sides land bucketed by id and the
    join is exchange-free) + the same map-only bucket expression."""
    comp = components.select(
        F.col(id_col), F.col(component_col).alias("_comp")
    )
    b = _bucket("_split_key", seed)
    return (
        df.join(comp, id_col, "left")
        .withColumn(
            "_split_key", F.coalesce(F.col("_comp"), F.col(id_col))
        )
        .withColumn(
            "split",
            F.when(b < TRAIN_HEX, F.lit("train"))
            .when(b < VAL_HEX, F.lit("val"))
            .otherwise(F.lit("test")),
        )
        .drop("_split_key", "_comp")
    )


def take_token_budget(
    df: DataFrame,
    token_col: str,
    budget: int,
    strata_cols: tuple[str, ...] = (),
    order_col: str = "doc_id",
) -> DataFrame:
    """Greedy token-budget fill: keep rows (in `order_col` order,
    within each stratum) while the running token total BEFORE the row
    is under `budget` — the "give me ~N tokens of each domain" cut a
    mixture recipe turns into corpus slices. Same boundary contract as
    `pack_shards`: the row that crosses the budget is KEPT (every
    stratum reaches its budget; one doc of overflow max), a stratum
    with fewer tokens than budget keeps everything.

    Plan: ONE window (cumulative sum, per-stratum partitions) + a
    filter — one shuffle keyed by the strata columns. The empty-strata
    form is a single-partition global window; pass strata at scale,
    exactly as pack_shards documents."""
    strata = [F.col(c) for c in strata_cols]
    w = (
        Window.partitionBy(*strata)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        df.withColumn("_before", before)
        .filter(F.col("_before") < budget)
        .drop("_before")
    )


def pack_shards(
    df: DataFrame,
    token_col: str,
    budget: int,
    strata_cols: tuple[str, ...] = (),
    order_col: str = "doc_id",
) -> DataFrame:
    """Assigns each row a `shard_id` so consecutive rows (in
    `order_col` order, within each stratum) pack into ~`budget`-token
    shards: shard_id = floor(tokens_before_this_row / budget), i.e. a
    row starting before a budget boundary stays in the earlier shard
    (greedy packing — shards may overflow by at most one document,
    which is the standard training-shard contract).

    A running sum over a GLOBAL order is a single-partition bottleneck,
    so pass `strata_cols` at scale: packing then runs per stratum in
    parallel (one shuffle by the strata columns) and shard ids are
    per-stratum. The empty-strata global form exists for small outputs
    only.
    """
    strata = [F.col(c) for c in strata_cols]
    w = (
        Window.partitionBy(*strata)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    before = cum - F.col(token_col)
    return df.withColumn(
        "shard_id", F.floor(before / F.lit(budget)).cast("long")
    )


HEX24 = 16**6  # first 24 md5 bits as an integer range


def hash_unit24(id_col: str, seed: int) -> F.Column:
    """First 24 bits of md5("{id}:{seed}") as a long in [0, 2^24) — the
    integer form of a reproducible uniform draw. Kept integral so keep/
    drop decisions compare exactly in any engine (no float rounding at
    the threshold)."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col(id_col).cast("string"), F.lit(str(seed))
                )
            ),
            1,
            6,
        ),
        16,
        10,
    ).cast("long")


def weighted_keep(
    df: DataFrame,
    weight_num_col: str,
    weight_den: int,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Deterministic per-row Bernoulli(min(1, num/den)) thinning —
    quality- or length-proportional corpus subsampling without an RNG.

    Keep iff ``hash24 · den < min(num, den) · 2^24``: pure integer
    arithmetic, so the decision is exact and portable (the DuckDB
    oracle reproduces it bit-for-bit; a float threshold would hash-
    mismatch on boundary rows). Rows with num ≥ den are always kept.

    MAP-ONLY — zero shuffles, no state; stable under repartitioning
    and incremental appends, which is what makes the sample auditable
    at 100 TB (rerun ⇒ identical keep set, per-file parallel).
    """
    h = hash_unit24(id_col, seed)
    num = F.least(F.col(weight_num_col).cast("long"), F.lit(int(weight_den)))
    return df.filter(h * F.lit(int(weight_den)) < num * F.lit(HEX24))


def weighted_reservoir_exact_n(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    seed: int = 13,
) -> DataFrame:
    """Deterministic EXACT-SIZE weighted sample without replacement —
    Efraimidis–Spirakis A-ES: each row gets key u^(1/w) with u a
    reproducible uniform draw; the global top-n keys ARE a weighted
    sample (inclusion probability proportional to weight, exact-n,
    no replacement).

    This is the third point in the sampling design space: `hash_split`
    is unweighted+fractional, `weighted_keep` is weighted+Bernoulli
    (random SIZE), this is weighted+exact-n. Exact-n matters when the
    downstream contract is a budget ("exactly 50k eval docs"), where a
    Bernoulli sample's size variance is unacceptable.

    Scale shape: the key is map-only; `orderBy(...).limit(n)` compiles
    to TakeOrderedAndProject — per-partition n-row heaps merged on the
    driver (P·n rows), NEVER a global sort. Deterministic and
    rerun-stable (md5 draw, not an RNG), so the sample is auditable.
    Rows with weight ≤ 0 are excluded (their key is undefined).
    The ORDER uses the ROUNDED key (9 decimals) with id tie-break:
    pow() is not guaranteed bit-identical across libm implementations,
    so ordering by the raw key could pick different rows at the rank-n
    cutoff on a 1-ulp divergence — rounding first makes the cutoff a
    decision on identical values on every engine.
    """
    u = (hash_unit24(id_col, seed) + F.lit(0.5)) / F.lit(float(HEX24))
    w = F.col(weight_col).cast("double")
    key = F.round(F.pow(u, F.lit(1.0) / w), 9)
    return (
        df.filter(w > 0)
        .withColumn("es_key", key)
        .orderBy(F.desc("es_key"), F.col(id_col))
        .limit(n)
        .select(F.col(id_col), F.col(weight_col), F.col("es_key"))
    )


def mixture_rebalance(
    df: DataFrame,
    budget: int,
    strata_cols: tuple[str, ...] = ("lang",),
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Data-mixture rebalancing: cap each stratum (language / source /
    domain) at ~``budget`` total weight (chars / tokens), keeping a
    reproducible random subset of its rows.

    Rows are ranked inside each stratum by the seeded md5 permutation
    (id breaks ties); a row is kept while the cumulative weight BEFORE
    it is under budget, so the last kept row may overflow by at most
    one document — the same greedy contract as `pack_shards`. Strata
    under budget keep everything; the selection is a deterministic
    function of (stratum, id, seed).

    ONE shuffle (hash by the strata columns). The per-stratum running
    sum is the same window shape as `pack_shards`: at 100 TB the
    stratum count (languages × sources) bounds parallelism, which is
    fine — mixture strata are few and fat, and a skewed giant stratum
    is exactly the one the budget truncates.
    """
    h = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in strata_cols])
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum(F.col(weight_col)).over(w) - F.col(weight_col)
    return (
        df.withColumn("_before", before)
        .filter(F.col("_before") < budget)
        .drop("_before")
    )


def temperature_rates(
    df: DataFrame,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    strata_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Per-stratum keep rates under TEMPERATURE-scaled mixture weights
    — the multilingual sampling rule (mBERT/XLM-R style): stratum i
    gets probability p_i = n_i^α / Σ n_j^α, flattening the natural
    distribution toward uniform as α→0 so low-resource strata are
    up-weighted relative to their share. The global budget is
    ``budget_frac`` of the corpus; stratum i's keep rate is
    min(1, budget·p_i / n_i).

    Two tiny aggregates (stratum counts, one-row normalizer) — the
    result is a broadcastable rate table, one row per stratum.
    """
    strata = [F.col(c) for c in strata_cols]
    counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("_total"),
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias(
            "_z"
        ),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        *strata_cols,
        "n_docs",
        (F.pow(F.col("n_docs").cast("double"), F.lit(alpha)) / F.col("_z")).alias(
            "weight"
        ),
        # rounded to 9 decimals BEFORE any threshold compare: the rate
        # contains pow(n, alpha), and a cross-libm ulp difference could
        # flip rows sitting exactly on the keep boundary — rounding
        # makes the boundary value identical on every engine
        F.round(
            F.least(
                F.lit(1.0),
                F.col("_total")
                * F.lit(budget_frac)
                * (
                    F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
                    / F.col("_z")
                )
                / F.col("n_docs"),
            ),
            9,
        ).alias("keep_rate"),
    )


def temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    strata_cols: tuple[str, ...] = ("lang",),
    id_col: str = "doc_id",
    seed: int = 17,
) -> DataFrame:
    """Apply `temperature_rates` as a deterministic per-row Bernoulli:
    keep iff the portable md5 draw falls under the stratum's keep rate.
    The rate table rides a broadcast join onto the scan (map-side) —
    no shuffle of the fact, rerun-stable, so the sampled mixture is
    auditable and incrementally extendable like `weighted_keep`."""
    rates = temperature_rates(df, alpha, budget_frac, strata_cols).select(
        *strata_cols, "keep_rate"
    )
    h = hash_unit24(id_col, seed).cast("double")
    return (
        df.join(F.broadcast(rates), list(strata_cols))
        .filter(h < F.col("keep_rate") * F.lit(float(HEX24)))
        .drop("keep_rate")
    )


def stratified_split(
    df: DataFrame,
    strata_cols: tuple[str, ...] = ("lang",),
    id_col: str = "doc_id",
    seed: int = 42,
    fracs: tuple[float, float] = (0.8, 0.9),
) -> DataFrame:
    """Adds a `split` column with EXACT per-stratum quotas.

    Rows are ranked inside each stratum by the seeded md5 hash (a
    reproducible permutation; id breaks hash ties): positions ≤
    floor(fracs[0]·n) are train, ≤ floor(fracs[1]·n) val, the rest
    test. Strata with n=1 therefore land in test — floor semantics are
    part of the spec so the DuckDB oracle matches exactly.
    """
    h = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    strata = [F.col(c) for c in strata_cols]
    order_w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(id_col).asc())
    count_w = Window.partitionBy(*strata)
    pos = F.row_number().over(order_w)
    n = F.count(F.lit(1)).over(count_w)
    return df.withColumn(
        "split",
        F.when(pos <= F.floor(F.lit(fracs[0]) * n), F.lit("train"))
        .when(pos <= F.floor(F.lit(fracs[1]) * n), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def top_fraction_by_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    id_col: str,
    fraction: float,
) -> DataFrame:
    """Keep the top ``fraction`` of rows per group, ranked by
    ``order_col`` descending (id ascending tiebreak — fully
    deterministic, no percent_rank tie ambiguity). The quota is
    ceil(fraction · |group|), so every non-empty group keeps ≥1 row.

    The curation workhorse: "keep the best 30% of documents per source
    by quality score". Scale shape: ONE shuffle (hash by the group
    columns) feeding both windows — the rank and the per-group count
    share the partitioning, so there is no second aggregate join. The
    quota is data-dependent (ceil(fraction·|group|)), which rules out
    WindowGroupLimit's map-side rank pruning (that optimization needs a
    CONSTANT rank bound) — each group pays its full sort; if the keep
    count is a known constant, filter on row_number <= k instead and
    the group-limit pruning applies. Skewed groups behave like any
    window: salt upstream if one group dominates.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc(order_col), F.asc(id_col)
    )
    wc = Window.partitionBy(*group_cols)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .filter(
            F.col("_rk") <= F.ceil(F.lit(fraction) * F.col("_n")).cast("int")
        )
        .drop("_rk", "_n")
    )


def sample_exact_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    n: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic exact-N-per-group downsample: rank rows inside each
    group by a seeded md5 permutation of the id (uniform, reproducible,
    insertion-stable) and keep row_number <= n.

    The constant-bound sibling of `top_fraction_by_group`: because the
    keep count is a LITERAL, the row_number filter activates
    WindowGroupLimit — rank > n rows are pruned map-side before the
    group sort, so the shuffle carries at most n rows per group per
    input partition instead of whole groups. This is the shape to use
    for "exactly 10k docs per language" eval-set carving at corpus
    scale; groups smaller than n pass through whole.
    """
    h = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def hash_negative_samples(
    users: DataFrame,
    positives: DataFrame,
    n_items: DataFrame,
    k: int = 3,
    m: int = 8,
    user_col: str = "user_id",
    item_col: str = "item_id",
    seed: str = "neg",
    item_base: int = 0,
) -> DataFrame:
    """Deterministic negative sampling for contrastive/recommendation
    training: k items per user the user has NOT interacted with.

    The naive formulation is users × items with an anti-join — a
    cross join that dies at scale. This draws ``m`` pseudo-random
    candidate items per user DIRECTLY (item = seeded hash of
    (user, draw index) mod |items| — linear in users, no item-side
    enumeration), rejects the ones colliding with the user's
    positives via one anti-join on (user, item), and keeps the first
    ``k`` surviving draws in draw order. With positives sparse
    relative to the item universe, collisions are rare and m = k +
    slack suffices; the draw sequence is seeded-hash deterministic,
    so both engines (and any rerun) produce the identical sample —
    no RNG, same policy as the A-ES reservoir and hash-split family.

    Shape: one m-way sequence explode over the user relation
    (map-only; the |items| count is a one-row broadcast), one
    (user, item) anti-join against the positives, one per-user window
    over ≤m rows (WindowGroupLimit prunes at k). ``positives`` must
    carry (user_col, item_col); ``n_items`` is a one-row (n) count —
    items are assumed densely keyed item_base..item_base+n-1 (pass
    ``item_base=1`` for 1-based key spaces like TPC-H partkeys; remap
    through a dense rank once at ingest for sparse key spaces —
    drawing outside the real key space emits phantom negatives whose
    positives anti-join is vacuous)."""
    from tugas_2_big_data_spark.functions import hashing

    draws = users.select(user_col).distinct().crossJoin(
        F.broadcast(n_items)
    ).select(
        user_col,
        F.explode(F.sequence(F.lit(1), F.lit(m))).alias("draw_idx"),
        F.col("n"),
    )
    cand = draws.select(
        user_col,
        "draw_idx",
        (
            hashing.hash60(
                F.concat_ws(
                    ":",
                    F.lit(seed),
                    F.col(user_col).cast("string"),
                    F.col("draw_idx").cast("string"),
                )
            )
            % F.col("n")
            + F.lit(item_base)
        ).alias(item_col),
    )
    fresh = cand.join(positives, [user_col, item_col], "left_anti")
    w = Window.partitionBy(user_col).orderBy("draw_idx")
    return (
        fresh.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            user_col,
            F.col(item_col).cast("long").alias(item_col),
            F.col("draw_idx").cast("long").alias("draw_idx"),
        )
    )
