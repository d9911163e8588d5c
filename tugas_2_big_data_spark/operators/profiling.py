"""Single-pass table profiling — the DESCRIBE/data-quality summary an
engine exposes over landing tables before heavier curation runs.

Reference scope: the reference inspects its collections ad hoc
(SURVEY.md §2.1 S5/S6 probe existence only); a profile TABLE (null
rates, exact distinct counts, typed extremes) is the engine-
completeness form of that, and at 100 TB the discipline is the same as
every sketch here: ONE pass over the corpus, bounded output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# how each profiled column contributes extremes: numerics (and
# epoch-able timestamps) land in min_num/max_num as doubles, strings in
# min_str/max_str — one schema for every column type, NULLs where a
# stat does not apply
_NUM = "num"
_STR = "str"
_TS = "ts"


def _kind(dtype: str) -> str:
    if dtype in ("string",):
        return _STR
    if dtype.startswith("timestamp"):
        return _TS
    return _NUM


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Profile table: one row per column with
    (column, n, n_null, n_distinct, min_num, max_num, avg_num,
    min_str, max_str).

    - exact distinct counts (count(DISTINCT c) — Catalyst plans the
      multi-distinct agg with one Expand over the scan: still a single
      corpus pass, widened by one duplicate per distinct column, the
      standard profiling cost; swap for approx_count_distinct when the
      estimate suffices);
    - extremes computed in the column's NATIVE type, then surfaced as
      doubles (numerics; timestamps as epoch MICROSECONDS — exact in a
      double up to year ~2255, and portable where timestamp→string
      formatting is not) or strings;
    - avg only for true numerics, rounded to 6 decimals (oracle
      stability — same policy as the covariance/winsorize queries).

    The wide one-row aggregate (`profile_wide_agg` — plan-pinned as
    ONE Expand over ONE scan) is localCheckpointed (``materialize``,
    default) before the per-column unpivot. The checkpoint is
    LOAD-BEARING, not a convenience: Catalyst prunes columns THROUGH
    the union, so the lazy form re-plans the aggregate per branch —
    measured as 6 independent corpus scans on the events profile —
    while the checkpointed wide row executes the single-pass plan
    once. materialize=False exists for tests/composition only."""
    cols = columns or df.columns
    kinds = dict(zip(df.columns, [_kind(t) for _, t in df.dtypes]))
    wide = profile_wide_agg(df, cols)
    if materialize:
        wide = wide.localCheckpoint()

    parts = []
    for c in cols:
        k = kinds[c]
        parts.append(
            wide.select(
                F.lit(c).alias("column"),
                F.col("_n").cast("long").alias("n"),
                F.col(f"{c}__nulls").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                (
                    F.col(f"{c}__min")
                    if k in (_NUM, _TS)
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"{c}__max")
                    if k in (_NUM, _TS)
                    else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.col(f"{c}__avg")
                    if k == _NUM
                    else F.lit(None).cast("double")
                ).alias("avg_num"),
                (
                    F.col(f"{c}__smin")
                    if k == _STR
                    else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"{c}__smax")
                    if k == _STR
                    else F.lit(None).cast("string")
                ).alias("max_str"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile_wide_agg(df: DataFrame, cols: list[str]) -> DataFrame:
    """The one-row wide profile aggregate all stats ride in — exposed
    separately so its single-pass plan (one Expand, one scan) can be
    inspected and pinned."""
    kinds = dict(zip(df.columns, [_kind(t) for _, t in df.dtypes]))
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        k = kinds[c]
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls")
        )
        aggs.append(F.countDistinct(c).cast("long").alias(f"{c}__nd"))
        if k == _NUM:
            aggs.append(
                F.min(F.col(c)).cast("double").alias(f"{c}__min")
            )
            aggs.append(
                F.max(F.col(c)).cast("double").alias(f"{c}__max")
            )
            aggs.append(
                F.round(F.avg(F.col(c)), 6).alias(f"{c}__avg")
            )
        elif k == _TS:
            aggs.append(
                F.unix_micros(F.min(F.col(c)))
                .cast("double")
                .alias(f"{c}__min")
            )
            aggs.append(
                F.unix_micros(F.max(F.col(c)))
                .cast("double")
                .alias(f"{c}__max")
            )
        else:
            aggs.append(F.min(F.col(c)).alias(f"{c}__smin"))
            aggs.append(F.max(F.col(c)).alias(f"{c}__smax"))
    return df.agg(*aggs)


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
    round_to: int = 9,
) -> DataFrame:
    """Join/groupBy-key skew diagnostic: the top_k heaviest keys with
    their row share, plus corpus-level skew statistics repeated on
    every row — (key, cnt, share, rk, n_keys, skew_ratio, key_entropy).

    This is the measurement an engine runs BEFORE picking a join
    strategy at 100 TB: skew_ratio (max key count / mean key count)
    says whether AQE skew-join splitting or salting
    (operators/skew.py) is needed; key_entropy (Shannon, bits, over
    the key distribution) near log2(n_keys) says uniform, near 0 says
    one key owns the table.

    Plan: ONE hash aggregate keyed on the key (map-side partial), then
    sketch-sized work — the per-key relation aggregates to one stats
    row (broadcast back) and TakeOrdered picks the top_k
    (count DESC, key ASC — deterministic under ties). The corpus is
    scanned once and never re-shuffled.
    """
    per_key = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    stats = per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("double").alias("_total"),
        F.max("cnt").cast("double").alias("_max"),
        # Shannon entropy in bits over the key distribution:
        # -sum(p log2 p); computed from sum(cnt*log2(cnt)) and the
        # total so it folds into the same aggregate pass
        F.sum(F.col("cnt") * F.log2(F.col("cnt"))).alias("_clc"),
    ).select(
        "n_keys",
        "_total",
        (F.col("_max") / (F.col("_total") / F.col("n_keys"))).alias(
            "_skew"
        ),
        (
            F.log2(F.col("_total")) - F.col("_clc") / F.col("_total")
        ).alias("_entropy"),
    )
    # orderBy+limit plans as TakeOrdered (per-partition top-k, merge on
    # the driver) — a global row_number window would instead drag the
    # whole per-key relation through one partition; rk is assigned by a
    # window over only the top_k survivors
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    top = (
        per_key.orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(top_k)
        .withColumn("rk", F.row_number().over(w).cast("long"))
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "key",
        "cnt",
        F.round(F.col("cnt") / F.col("_total"), round_to).alias("share"),
        "rk",
        "n_keys",
        F.round("_skew", round_to).alias("skew_ratio"),
        F.round("_entropy", round_to).alias("key_entropy"),
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 9,
) -> DataFrame:
    """One-row (mi_bits, h_a_bits, h_b_bits, n) — Shannon mutual
    information and marginal entropies between two categorical
    columns: the dependence screen a profiling pass runs to find
    redundant columns (MI ~ min(H) means one determines the other)
    and candidate partition keys (MI ~ 0 against the filter column
    means partitioning by it will not prune).

    Plan: ONE (a, b) hash aggregate over the corpus (map-side
    partial), output |A| x |B| cells; marginals and the MI sum are
    window/aggregate arithmetic over those bounded cells — the corpus
    is scanned once, never re-shuffled. MI = sum p(a,b) *
    log2(p(a,b) / (p(a) p(b)))."""
    joint = df.groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count(F.lit(1)).cast("double").alias("_c"))
    wa = Window.partitionBy("_a")
    wb = Window.partitionBy("_b")
    wt = Window.partitionBy()
    cells = joint.select(
        "_c",
        F.sum("_c").over(wa).alias("_ca"),
        F.sum("_c").over(wb).alias("_cb"),
        F.sum("_c").over(wt).alias("_n"),
    )
    # marginal entropies fold into the same cell scan: summing
    # (c/n)·log2(ca/n) over ALL (a,b) cells equals summing
    # (ca/n)·log2(ca/n) over distinct a, because the cells of one a
    # partition its marginal count
    return cells.agg(
        F.round(
            F.sum(
                (F.col("_c") / F.col("_n"))
                * F.log2(
                    (F.col("_c") * F.col("_n"))
                    / (F.col("_ca") * F.col("_cb"))
                )
            ),
            round_to,
        ).alias("mi_bits"),
        F.round(
            -F.sum(
                (F.col("_c") / F.col("_n"))
                * F.log2(F.col("_ca") / F.col("_n"))
            ),
            round_to,
        ).alias("h_a_bits"),
        F.round(
            -F.sum(
                (F.col("_c") / F.col("_n"))
                * F.log2(F.col("_cb") / F.col("_n"))
            ),
            round_to,
        ).alias("h_b_bits"),
        F.max("_n").cast("long").alias("n"),
    )


def expectations_report(
    df: DataFrame,
    checks: list[tuple[str, Column]],
    fk_checks: list[tuple[str, DataFrame, str, str]] | None = None,
) -> DataFrame:
    """Deequ-style data-quality verification: evaluate a declarative
    expectation set against a table and emit one (check, observed,
    passed) row per expectation — the publish gate a warehouse runs
    before promoting a 100 TB batch, and the audit record it persists
    next to the data.

    ``checks`` are (name, violation-count Column): every aggregate
    expectation — null counts, range violations, uniqueness as
    count − count(distinct) — folds into ONE single-pass aggregate
    over the table (one scan however many checks ride it; map-side
    partial). The one-row wide aggregate is unpivoted EXPLICITLY
    (explode over an inline (name, observed) struct array), so the
    single scan is guaranteed by construction — not by hoping
    ReuseExchange collapses N identical aggregate subplans, which
    plan drift or AQE edge cases could miss, silently re-scanning
    the table once per check. ``fk_checks`` are (name, parent_df, child_key,
    parent_key) referential-integrity probes: each is a LEFT ANTI
    equi-join count — at scale the parent key side broadcasts when
    dim-sized or shuffles co-partitioned otherwise, and AQE handles
    the empty-fast-path. passed == (observed == 0) for every check,
    so the report is also the alert predicate."""
    if not checks:
        raise ValueError(
            "expectations_report needs at least one aggregate check "
            "(fk_checks alone would leave the report shapeless)"
        )
    agg_cols = [c.cast("long").alias(n) for n, c in checks]
    wide = df.agg(*agg_cols)
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("check_name"),
                F.col(n).alias("observed"),
            )
            for n, _ in checks
        ]
    )
    out = wide.select(F.explode(pairs).alias("_kv")).select(
        F.col("_kv.check_name").alias("check_name"),
        F.col("_kv.observed").alias("observed"),
    )
    for name, parent, child_key, parent_key in fk_checks or []:
        orphans = (
            df.join(
                parent.select(F.col(parent_key).alias(child_key)),
                on=child_key,
                how="left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("observed"))
            .select(F.lit(name).alias("check_name"), "observed")
        )
        out = out.unionByName(orphans)
    return out.select(
        "check_name", "observed", (F.col("observed") == 0).alias("passed")
    )
