"""Analytics extension queries: range join, hypertable rollup, unpivot,
ranked-distribution window functions, and sketch aggregates.

Registered into the same oracle-checked registry as queries.py. None of
these exist in the reference (SURVEY.md §2.5/§2.7/§2.8 record the
absences); they are the engine-completeness surface a reference user
migrating real workloads would reach for next.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tugas_2_big_data_spark.queries import register
from tugas_2_big_data_spark.sources.catalog import load_table
from tugas_2_big_data_spark.operators import (
    entity_resolution,
    layout,
    profiling,
    rangejoin,
    sketches,
    skew,
    timeseries,
)


# ---------------------------------------------------------------------------
# Range join: events within [anchor, anchor+30min) of high-value
# purchase anchors — NO equi-key, the bucketized plan replaces the
# BroadcastNestedLoopJoin Catalyst would otherwise produce.
# ---------------------------------------------------------------------------

_RANGE_JOIN_SQL = """
SELECT a.event_id AS anchor_id, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(e.value) AS total_value
FROM (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS start_ts,
         CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS end_ts
  FROM events WHERE event_type = 'purchase' AND value > 150
) a
JOIN (
  SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
  FROM events
) e ON e.ts >= a.start_ts AND e.ts < a.end_ts
GROUP BY anchor_id, e.event_type
"""


@register("evt_range_join_30min", _RANGE_JOIN_SQL)
def evt_range_join_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-anchor activity profile for the 30 minutes after each
    high-value purchase. Bucket width == interval length (1800 s), so
    each interval explodes to exactly 2 bucket keys and the join is a
    plain hash equi-join on the bucket — shuffle-parallel at any scale
    (operators/rangejoin.py)."""
    ev = load_table(spark, "events", sf_dir)
    anchors = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 150))
        .select(
            F.col("event_id").alias("anchor_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
        )
    )
    points = ev.select("event_id", "event_type", "value", "ts")
    joined = rangejoin.bucketed_range_join(
        points,
        anchors,
        point_ts="ts",
        start_ts="start_ts",
        end_ts="end_ts",
        bucket_width_s=1800,
    )
    return joined.groupBy("anchor_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Hypertable rollup: 5min → 1h → 1d continuous aggregate, coarse grains
# re-aggregated from fine (ONE raw-table shuffle). Oracle computes every
# grain from raw — identical values because count/sum/min/max compose.
# ---------------------------------------------------------------------------

def _rollup_grain_sql(width: str, label: str) -> str:
    return f"""
SELECT '{label}' AS grain,
  strftime(time_bucket(INTERVAL '{width}', CAST(ts AS TIMESTAMP)),
           '%Y-%m-%d %H:%M:%S')       AS bucket_start,
  CAST(count(*) AS BIGINT)            AS n_rows,
  sum(value)                          AS sum_value,
  min(value)                          AS min_value,
  max(value)                          AS max_value
FROM events GROUP BY bucket_start
"""


_ROLLUP_SQL = " UNION ALL ".join(
    _rollup_grain_sql(w, lb)
    for w, lb in [("5 minutes", "5m"), ("1 hour", "1h"), ("1 day", "1d")]
)


@register("evt_hypertable_rollup", _ROLLUP_SQL)
def evt_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain rollup where each coarser grain aggregates the
    next-finer aggregate, not the raw table. The oracle recomputes each
    grain from raw rows — equal results ARE the test that the rollup
    composition is lossless. (The two-level sum re-associates float
    addition; at ~10⁴ values the relative drift is ~1e-13, far inside
    the 1e-9 compare tolerance, so no rounding is needed.)"""
    ev = load_table(spark, "events", sf_dir)
    out = timeseries.hypertable_rollup(
        ev, "ts", "value",
        widths_s=(300, 3600, 86400),
        grain_labels=("5m", "1h", "1d"),
    )
    return out.select(
        "grain",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n_rows",
        "sum_value",
        "min_value",
        "max_value",
    )


# ---------------------------------------------------------------------------
# Unpivot (wide → long): the inverse of segment_pivot. Spark's native
# unpivot == SQL stack(); oracle spells it as UNION ALL.
# ---------------------------------------------------------------------------

_UNPIVOT_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         sum(l_quantity)      AS qty,
         sum(l_extendedprice) AS price,
         sum(l_discount)      AS discount,
         sum(l_tax)           AS tax
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'qty' AS metric, qty AS total FROM wide
UNION ALL SELECT l_returnflag, 'price', price FROM wide
UNION ALL SELECT l_returnflag, 'discount', discount FROM wide
UNION ALL SELECT l_returnflag, 'tax', tax FROM wide
"""


@register("unpivot_lineitem_totals", _UNPIVOT_SQL)
def unpivot_lineitem_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide aggregate melted to (key, metric, value) rows via the native
    unpivot operator (Expand node: one pass, no self-union re-scan —
    the UNION ALL oracle formulation would scan the aggregate 4×)."""
    li = load_table(spark, "lineitem", sf_dir)
    wide = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"),
        F.sum("l_extendedprice").alias("price"),
        F.sum("l_discount").alias("discount"),
        F.sum("l_tax").alias("tax"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price", "discount", "tax"],
        variableColumnName="metric",
        valueColumnName="total",
    )


# ---------------------------------------------------------------------------
# Ranked-distribution window suite: ntile / percent_rank / cume_dist
# (none in the reference — SURVEY.md §2.7 has only row_number).
# ---------------------------------------------------------------------------

_WIN_DIST_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal,
  CAST(ntile(4)  OVER w AS BIGINT)        AS balance_quartile,
  round(percent_rank() OVER w, 9)         AS pct_rank,
  round(cume_dist()    OVER w, 9)         AS cume,
  first_value(c_custkey) OVER w           AS poorest_in_segment
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


@register("win_balance_distribution", _WIN_DIST_SQL)
def win_balance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing + rank distributions per market segment. The
    ORDER BY includes c_custkey so ranks are total-ordered and
    deterministic on both engines (SURVEY.md §7 ordering policy)."""
    cust = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).cast("long").alias("balance_quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.first("c_custkey").over(w).alias("poorest_in_segment"),
    )


# ---------------------------------------------------------------------------
# Sketch aggregates — the 100 TB path for distinct counts and quantiles.
# Sketch ESTIMATES are engine-specific (Spark HLL++ / GK have no DuckDB
# twin), so the oracle contract is: emit the EXACT answer (value-compared
# against DuckDB) plus a `within_bound` flag asserting the sketch's
# documented error bound against that exact answer. A sketch drifting
# out of bound flips the flag and fails the hash compare — a real
# pass/fail criterion, not a rows-only count.
# ---------------------------------------------------------------------------

_SKETCH_DISTINCT_SQL = """
SELECT event_type,
  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
  true AS within_bound
FROM events GROUP BY event_type
"""


@register("sketch_distinct_users", _SKETCH_DISTINCT_SQL)
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type at rsd=0.01.
    Mergeable sketch => one map-side-partial shuffle at any scale,
    constant memory per group — countDistinct's exact expand+dedup
    shuffles every distinct (group, user) pair instead. within_bound
    asserts |est - exact| <= 5·rsd·exact (5σ of the documented rsd)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("est"),
            F.countDistinct("user_id").cast("long").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_bound"),
        )
    )


def _heavy_hitters_sql() -> str:
    """DuckDB replay of the ENTIRE sketch math (shards, per-shard
    top-k, residual bounds), not just the exact counts — the bound
    arithmetic itself is value-compared, making this the strongest
    oracle form a sketch can have (HLL/GK can only pin a bound flag;
    this sketch is deterministic, so its estimates are checkable)."""
    from tugas_2_big_data_spark.functions.hashing import hex24_sql

    shard = hex24_sql("md5(CAST(event_id AS VARCHAR) || ':5')")
    return f"""
WITH ev AS (
  SELECT ({shard}) % 16 AS shard, user_id AS item FROM events
),
local AS (SELECT shard, item, count(*) AS cnt FROM ev GROUP BY 1, 2),
ranked AS (
  SELECT shard, item, cnt,
    row_number() OVER (PARTITION BY shard ORDER BY cnt DESC, item) AS rk
  FROM local
),
kept AS (SELECT * FROM ranked WHERE rk <= 20),
resid AS (SELECT shard, cnt AS residual FROM ranked WHERE rk = 21),
tot AS (SELECT coalesce(sum(residual), 0) AS tot_residual FROM resid),
per_item AS (
  SELECT item, sum(cnt) AS est_lo,
         sum(coalesce(residual, 0)) AS present_resid
  FROM kept LEFT JOIN resid USING (shard) GROUP BY item
),
exact AS (
  SELECT user_id AS item, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM events GROUP BY 1
)
SELECT item AS user_id, exact_cnt,
       CAST(est_lo AS BIGINT) AS est_lo,
       CAST(est_hi AS BIGINT) AS est_hi,
       (est_lo <= exact_cnt AND exact_cnt <= est_hi) AS within_bound
FROM (
  SELECT p.item, e.exact_cnt, p.est_lo,
         p.est_lo + t.tot_residual - p.present_resid AS est_hi
  FROM per_item p CROSS JOIN tot t JOIN exact e ON e.item = p.item
)
ORDER BY est_lo DESC, user_id LIMIT 10
"""


@register("sketch_heavy_hitters", _heavy_hitters_sql())
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Misra-Gries/SpaceSaving heavy hitters: top-10 users
    by event count from 16 deterministic logical shards keeping 20
    counters each, with certain [est_lo, est_hi] frequency bounds
    (operators/sketches.py). Completes the classic sketch triple next
    to HLL distinct counts and GK quantiles."""
    ev = load_table(spark, "events", sf_dir)
    hh = sketches.heavy_hitters(
        ev, item_col="user_id", shard_key_col="event_id"
    )
    return hh.select(
        F.col("item").alias("user_id"),
        "exact_cnt",
        F.col("est_lo").cast("long").alias("est_lo"),
        F.col("est_hi").cast("long").alias("est_hi"),
        "within_bound",
    )


_SKETCH_QUANTILES_SQL = """
SELECT event_type,
  quantile_cont(value, 0.5) AS p50_exact,
  quantile_cont(value, 0.9) AS p90_exact,
  quantile_cont(value, 0.99) AS p99_exact,
  true AS within_bound
FROM events GROUP BY event_type
"""


@register("sketch_value_quantiles", _SKETCH_QUANTILES_SQL)
def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of event value per type
    (Greenwald-Khanna, accuracy 1e4 ≈ 0.01% rank error). Exact
    percentile sorts every group; the GK sketch is single-pass,
    mergeable, bounded-memory — the only viable shape at 100 TB.
    Exact quantiles are value-compared against DuckDB quantile_cont;
    within_bound pins each GK estimate inside the exact quantiles at
    rank p ± 0.01 (100× the sketch's rank-error guarantee)."""
    ev = load_table(spark, "events", sf_dir)
    approx = F.percentile_approx("value", [0.5, 0.9, 0.99], 10000)
    exact = F.percentile("value", F.lit([0.5, 0.9, 0.99]))
    lo = F.percentile("value", F.lit([0.49, 0.89, 0.98]))
    hi = F.percentile("value", F.lit([0.51, 0.91, 1.0]))
    agg = ev.groupBy("event_type").agg(
        approx.alias("a"), exact.alias("e"), lo.alias("lo"), hi.alias("hi")
    )
    in_bound = [
        (F.col("a").getItem(i) >= F.col("lo").getItem(i))
        & (F.col("a").getItem(i) <= F.col("hi").getItem(i))
        for i in range(3)
    ]
    return agg.select(
        "event_type",
        F.col("e").getItem(0).alias("p50_exact"),
        F.col("e").getItem(1).alias("p90_exact"),
        F.col("e").getItem(2).alias("p99_exact"),
        (in_bound[0] & in_bound[1] & in_bound[2]).alias("within_bound"),
    )


_CM_DEPTH = 4
_CM_WIDTH = 512


def _count_min_sql(depth: int = _CM_DEPTH, width: int = _CM_WIDTH) -> str:
    """DuckDB replay of the ENTIRE Count-Min math (seeded positions,
    counter cells, min-over-rows estimates) — like the heavy-hitters
    oracle, the sketch is deterministic, so the estimates themselves
    are value-compared, not just bound-flagged."""
    from tugas_2_big_data_spark.functions.hashing import hexn_sql

    legs = []
    for r in range(depth):
        h = hexn_sql(f"md5('cm{r}:' || CAST(item AS VARCHAR))", 15)
        legs.append(
            f"SELECT item, cnt, {r} AS r, ({h}) % {width} AS c FROM items"
        )
    pos = "\nUNION ALL ".join(legs)
    return f"""
WITH items AS (
  SELECT user_id AS item, count(*) AS cnt FROM events GROUP BY 1
),
pos AS (
  {pos}
),
cells AS (SELECT r, c, sum(cnt) AS cell FROM pos GROUP BY 1, 2),
probes AS (
  SELECT item FROM items ORDER BY cnt DESC, item LIMIT 10
),
est AS (
  SELECT p.item, p.cnt AS exact_cnt, min(cl.cell) AS cm_est
  FROM pos p JOIN cells cl ON p.r = cl.r AND p.c = cl.c
  WHERE p.item IN (SELECT item FROM probes)
  GROUP BY 1, 2
)
SELECT item AS user_id,
  CAST(exact_cnt AS BIGINT) AS exact_cnt,
  CAST(cm_est AS BIGINT) AS cm_est,
  CAST(cm_est - exact_cnt AS BIGINT) AS over_est,
  (cm_est >= exact_cnt) AS within_bound
FROM est ORDER BY exact_cnt DESC, user_id
"""


@register("sketch_count_min", _count_min_sql())
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point-frequency sketch (sketches.count_min_heavy):
    per-user event counts estimated from a depth×width counter table
    (4×512 cells — ≤16 KB of state whatever the user cardinality),
    probed for the top-10 users. Completes the mergeable-sketch
    family: HLL distinct counts, GK quantiles, Misra-Gries heavy
    hitters, blocked-Bloom membership, and now Count-Min frequencies
    — cell-wise sum of two tables IS the sketch of the union
    (sketches.merge_count_min, unit-pinned), so the table rides the
    same append-only ingest loop as the bloom state. within_bound
    pins the sketch's certain one-sided guarantee cm_est >=
    exact_cnt; over_est shows the collision inflation at this
    width."""
    ev = load_table(spark, "events", sf_dir)
    cm = sketches.count_min_heavy(
        ev, item_col="user_id", depth=_CM_DEPTH, width=_CM_WIDTH
    )
    return cm.select(
        F.col("item").alias("user_id"),
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        F.col("cm_est").cast("long").alias("cm_est"),
        F.col("over_est").cast("long").alias("over_est"),
        "within_bound",
    )


# ---------------------------------------------------------------------------
# Semi-structured JSON extraction — events.props is a JSON string
# column; parse with an EXPLICIT schema (from_json), never schema
# inference, so the extraction stays a JVM-side codegen'd projection.
# At 100 TB: parse once per row map-side, filter before the agg
# shuffle; no Python, no sampling pass over the corpus.
# ---------------------------------------------------------------------------

_JSON_PROPS_SQL = """
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(k) AS BIGINT) AS sum_k,
  CAST(min(k) AS BIGINT) AS min_k,
  CAST(max(k) AS BIGINT) AS max_k,
  avg(k) AS avg_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
WHERE k >= 50
GROUP BY event_type
"""


@register("evt_json_props", _JSON_PROPS_SQL)
def evt_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction + filter + aggregate over the props JSON
    column: `from_json` with a declared one-field schema pulls `k` out
    as BIGINT in the scan projection, the k>=50 predicate runs before
    the shuffle, and the agg is an ordinary partial+final hash agg.
    Oracle re-extracts with DuckDB's json_extract_string."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.select(
            "event_type",
            F.from_json("props", "k BIGINT").getField("k").alias("k"),
        )
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.avg("k").alias("avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# Gap fill + LOCF — dense 5-minute calendar per event type with
# carried-forward sums (TimescaleDB time_bucket_gapfill/locf).
# ---------------------------------------------------------------------------

_GAPFILL_SQL = """
WITH agg AS (
  SELECT event_type,
         time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS bucket,
         CAST(count(*) AS BIGINT) AS n, sum(value) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM agg),
spine AS (
  SELECT k.event_type, g.bucket
  FROM (SELECT DISTINCT event_type FROM events) k
  CROSS JOIN (
    SELECT unnest(generate_series(lo, hi, INTERVAL '5 minutes')) AS bucket
    FROM bounds
  ) g
)
SELECT s.event_type,
  strftime(s.bucket, '%Y-%m-%d %H:%M:%S') AS window_start,
  CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
  a.v AS total_value,
  last_value(a.v IGNORE NULLS) OVER (
    PARTITION BY s.event_type ORDER BY s.bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM spine s
LEFT JOIN agg a ON s.event_type = a.event_type AND s.bucket = a.bucket
"""


@register("evt_gapfill_5min", _GAPFILL_SQL)
def evt_gapfill_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-type 5-minute series with zero-filled counts and
    LOCF-interpolated sums (operators/timeseries.gap_fill_locf): one
    fact shuffle, a generated spine, and a per-key LOCF window."""
    ev = load_table(spark, "events", sf_dir)
    g = timeseries.gap_fill_locf(ev, "ts", "event_type", "value", width_s=300)
    return g.select(
        "event_type",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.col("n_rows").alias("n_events"),
        F.col("sum_value").alias("total_value"),
        "locf_value",
    )


# ---------------------------------------------------------------------------
# GROUPING SETS: one pass producing three grains (flag×status, flag,
# grand total) — distinct from the cube/rollup queries, which emit the
# full lattice; grouping sets picks exactly the grains asked for.
# ---------------------------------------------------------------------------

_GSETS_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("grouping_sets_pricing", _GSETS_SQL)
def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain aggregate in ONE shuffle via DataFrame.groupingSets
    (Spark 4 native API — Expand feeds a single HashAggregate, so the
    fact table is scanned and shuffled once for all three grains, not
    once per grain as the UNION ALL formulation would). Subtotal rows
    surface the grouping NULLs as an 'ALL' sentinel on both sides; the
    testdata columns are non-null so the sentinel is unambiguous."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# Salted two-phase aggregation: identical results to the plain GROUP BY
# (the oracle IS the plain GROUP BY), with the hot key spread over 16
# reducers. AQE skew handling covers shuffle-partition skew; salting is
# the manual fallback when one KEY dominates inside a task.
# ---------------------------------------------------------------------------

_SALTED_SQL = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(value) AS total_value,
       max(value) AS max_value
FROM events
GROUP BY user_id
"""


@register("skew_salted_user_totals", _SALTED_SQL)
def skew_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user totals via skew.salted_agg: partial aggregate on
    (user_id, salt) then merge — two shuffles, but each ≤ 1/16th of a
    hot user's rows per task. Matching the plain-GROUP-BY oracle
    proves the decomposition is lossless for algebraic aggregates."""
    ev = load_table(spark, "events", sf_dir)
    return skew.salted_agg(
        ev,
        ["user_id"],
        {
            "n_events": (F.count(F.lit(1)), F.sum("n_events")),
            "total_value": (F.sum("value"), F.sum("total_value")),
            "max_value": (F.max("value"), F.max("max_value")),
        },
    )


# ---------------------------------------------------------------------------
# OHLC candlestick resample: argmin/argmax aggregate family. The
# reference's domain is OHLCV bars it receives pre-computed
# (yfinance_transform.py:54-88); this derives them from ticks in one
# hash aggregate — a single fact shuffle, no per-key sort.
# ---------------------------------------------------------------------------

_OHLC_SQL = """
SELECT
  strftime(time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)),
           '%Y-%m-%d %H:%M:%S')       AS bar_start,
  event_type,
  min_by(value, ts)                   AS open,
  max(value)                          AS high,
  min(value)                          AS low,
  max_by(value, ts)                   AS close,
  CAST(count(*) AS BIGINT)            AS n_ticks,
  sum(value)                          AS total_value
FROM events
GROUP BY bar_start, event_type
"""


@register("evt_ohlc_bars_5min", _OHLC_SQL)
def evt_ohlc_bars_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute OHLC bars per event_type from raw ticks (ts is unique
    in the testdata, so min_by/max_by open/close are deterministic)."""
    ev = load_table(spark, "events", sf_dir)
    bars = timeseries.ohlc_bars(ev, "ts", "value", ["event_type"], width_s=300)
    return bars.select(
        F.date_format("bar_start", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
        "event_type",
        "open",
        "high",
        "low",
        "close",
        "n_ticks",
        "total_value",
    )


# ---------------------------------------------------------------------------
# Fixed-width value histogram: bin id is a pure projection (no global
# min/max pre-pass), so the plan is scan → partial agg → ONE shuffle —
# the shape that survives 100 TB. A quantile-bucketed histogram would
# need a global pre-pass; this is the streaming-friendly fixed grid.
# ---------------------------------------------------------------------------

_HISTOGRAM_SQL = """
SELECT event_type,
       CAST(floor(value / 25.0) AS BIGINT)        AS bin_id,
       CAST(floor(value / 25.0) * 25.0 AS DOUBLE) AS bin_low,
       CAST(count(*) AS BIGINT)                   AS n,
       sum(value)                                 AS bin_value_sum
FROM events
GROUP BY event_type, bin_id, bin_low
"""


@register("evt_value_histogram", _HISTOGRAM_SQL)
def evt_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type histogram of `value` on a fixed 25-unit grid."""
    ev = load_table(spark, "events", sf_dir)
    bin_id = F.floor(F.col("value") / F.lit(25.0))
    return (
        ev.select(
            "event_type",
            bin_id.alias("bin_id"),
            (bin_id * F.lit(25.0)).cast("double").alias("bin_low"),
            "value",
        )
        .groupBy("event_type", "bin_id", "bin_low")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("bin_value_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Linear-regression trend per group: the built-in regr_* aggregate
# family (Spark 3.4+/DuckDB both implement the SQL:2003 set). One hash
# aggregate — the moment-sum partials (n, Σx, Σy, Σxy, Σx²) combine
# associatively, so map-side partial agg works and the fact shuffles
# once. x is epoch DAYS (cast timestamp → double seconds / 86400,
# keeping sub-second precision on both engines).
# ---------------------------------------------------------------------------

_TREND_SQL = """
SELECT event_type,
       regr_slope(value, epoch(ts) / 86400.0)                  AS slope_per_day,
       regr_intercept(value, epoch(ts) / 86400.0)              AS intercept,
       regr_r2(value, epoch(ts) / 86400.0)                     AS r2,
       CAST(regr_count(value, epoch(ts) / 86400.0) AS BIGINT)  AS n
FROM events
GROUP BY event_type
"""


@register("evt_trend_by_type", _TREND_SQL)
def evt_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS value-vs-time trend per event_type (slope per day,
    intercept, R²) via the built-in regr_* aggregates."""
    ev = load_table(spark, "events", sf_dir)
    x = (F.col("ts").cast("double") / F.lit(86400.0)).alias("x")
    return (
        ev.select("event_type", F.col("value").alias("y"), x)
        .groupBy("event_type")
        .agg(
            F.regr_slope("y", "x").alias("slope_per_day"),
            F.regr_intercept("y", "x").alias("intercept"),
            F.regr_r2("y", "x").alias("r2"),
            F.regr_count("y", "x").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic per-group mode. Neither engine's native mode() defines
# tie order, so the portable formulation is count + row_number with an
# explicit total tie-break (count DESC, value ASC) — count shuffle then
# a per-group window, and the window input is already the DISTINCT
# (group, value) pairs, tiny relative to the fact.
# ---------------------------------------------------------------------------

_MODE_SQL = """
SELECT event_type,
       value          AS mode_value,
       CAST(n AS BIGINT) AS n_occurrences
FROM (
  SELECT event_type, value, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, value ASC) AS rn
  FROM (
    SELECT event_type, value, count(*) AS n
    FROM events
    GROUP BY event_type, value
  ) counts
) ranked
WHERE rn = 1
"""


@register("evt_mode_per_type", _MODE_SQL)
def evt_mode_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent `value` per event_type with a pinned tie-break
    (highest count, then smallest value)."""
    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("value"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("value").alias("mode_value"),
            F.col("n").alias("n_occurrences"),
        )
    )


# ---------------------------------------------------------------------------
# per-group z-score anomaly flags — the streaming-adjacent monitoring
# query every event pipeline runs in batch form
# ---------------------------------------------------------------------------

_ZSCORE_SQL = """
WITH stats AS (
  SELECT event_type,
    avg(value) AS mu,
    stddev_samp(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
  round((e.value - s.mu) / NULLIF(s.sigma, 0), 9) + 0.0 AS z,
  abs((e.value - s.mu) / NULLIF(s.sigma, 0)) > 2.0 AS is_outlier
FROM events e JOIN stats s USING (event_type)
WHERE e.value IS NOT NULL
"""


@register("evt_value_zscore", _ZSCORE_SQL)
def evt_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score anomaly flags: one hash aggregate builds
    the (mu, sigma) stats relation (5 rows), broadcast back onto the
    event stream — the scan never shuffles. The same plan shape at
    100 TB: stats are |event types| rows regardless of corpus size.
    A partition-by-type window would shuffle the whole fact instead.

    sigma is NULLIF-guarded on BOTH sides: an all-equal group has
    sigma = 0, where Spark's non-ANSI double division yields NULL but
    DuckDB's IEEE default yields ±inf — the guard makes z NULL
    identically."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0.0))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            # + 0.0 folds IEEE -0.0 into +0.0: a value landing within
            # rounding distance of its group mean can produce a z that
            # rounds to signed zero with engine-dependent sign (the
            # emb_covariance hash-mismatch class).
            (F.round(z, 9) + F.lit(0.0)).alias("z"),
            (F.abs(z) > 2.0).alias("is_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# funnel conversion: view -> click -> purchase, strictly ordered per user
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
  GROUP BY e.user_id
)
SELECT
  CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
  CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after_view,
  CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after_click
"""


@register("evt_funnel_conversion", _FUNNEL_SQL)
def evt_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users with a view, a click strictly after their
    first view, and a purchase strictly after that first qualifying
    click. Three per-user min-aggregates chained by equi-joins on
    user_id — every stage is hash-partitioned by the same key (the
    shuffles co-locate), no window over the raw stream, no pairwise
    event comparison. At 100 TB each stage's input is pre-filtered by
    event type before its shuffle."""
    ev = load_table(spark, "events", sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    nv = v.agg(F.count(F.lit(1)).cast("long").alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).cast("long").alias("n_click_after_view"))
    np_ = p.agg(F.count(F.lit(1)).cast("long").alias("n_purchase_after_click"))
    return nv.crossJoin(nc).crossJoin(np_)


# ---------------------------------------------------------------------------
# retention cohorts: users by first-seen day x activity-day offset
# ---------------------------------------------------------------------------

_RETENTION_SQL = """
WITH firstday AS (
  SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
  FROM events
)
SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
  CAST(date_diff('day', f.d0, a.d) AS BIGINT) AS day_offset,
  CAST(count(*) AS BIGINT) AS n_active_users
FROM firstday f JOIN activity a ON f.user_id = a.user_id
GROUP BY cohort_day, day_offset
"""


@register("evt_retention_cohorts", _RETENTION_SQL)
def evt_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention matrix: cohort = user's first-seen day; count
    distinct users active at each day offset from their cohort day.
    One agg builds the cohort dim, one distinct builds the activity
    relation — both hash-partitioned by user_id so the join
    co-locates; the final agg is |cohorts × offsets| rows."""
    ev = load_table(spark, "events", sf_dir)
    firstday = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0")
    )
    activity = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        firstday.join(activity, "user_id")
        .groupBy(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "d0").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active_users"))
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog — the fully-value-checked distinct sketch
# (sketches.hll_registers / hll_estimate / merge_hll). Unlike
# sketch_distinct_users (built-in HLL++, engine-internal hash, only the
# error BOUND is checkable), every register bit and the estimate itself
# are recomputed by the DuckDB oracle.
# ---------------------------------------------------------------------------

_HLL_M = 256  # sketches.HLL_B = 8
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
# 5 sigma of the documented standard error 1.04/sqrt(m)
_HLL_BOUND = 5 * 1.04 / (_HLL_M ** 0.5)


def _hll_reg_sql(col: str, src: str = "events") -> str:
    """DuckDB register table for one column: the SQL twin of
    sketches.hll_registers (same md5 hash, same bit split, same
    minimal-form bin() leading-zero count)."""
    from tugas_2_big_data_spark.functions.hashing import hexn_sql

    h = hexn_sql(f"md5(CAST({col} AS VARCHAR))", 15)
    return f"""
  SELECT h % {_HLL_M} AS idx,
         max(CASE WHEN (h // {_HLL_M}) = 0 THEN 53
             ELSE 53 - length(bin(h // {_HLL_M})) END) AS r
  FROM (SELECT ({h}) AS h FROM {src} WHERE {col} IS NOT NULL)
  GROUP BY 1"""


# alpha_m * m^2 as ONE python-computed double literal, CAST AS DOUBLE:
# DuckDB types a bare decimal literal as DECIMAL(18) and the register
# arithmetic overflows it
_HLL_AMM = f"CAST({_HLL_ALPHA * _HLL_M * _HLL_M!r} AS DOUBLE)"
_HLL_EST_SQL = (
    f"CASE WHEN ({_HLL_AMM} / (s + ({_HLL_M} - present)))"
    f" <= {2.5 * _HLL_M!r} AND present < {_HLL_M} "
    f"THEN {_HLL_M}.0 * ln({_HLL_M}.0 / ({_HLL_M} - present)) "
    f"ELSE {_HLL_AMM} / (s + ({_HLL_M} - present)) END"
)


def _hll_branch_sql(col: str) -> str:
    return f"""
SELECT '{col}' AS col_name, estimate,
  (SELECT CAST(count(DISTINCT {col}) AS BIGINT) FROM events)
    AS exact_distinct,
  abs(estimate - (SELECT count(DISTINCT {col}) FROM events))
    / (SELECT count(DISTINCT {col}) FROM events) AS rel_err,
  abs(estimate - (SELECT count(DISTINCT {col}) FROM events))
    / (SELECT count(DISTINCT {col}) FROM events) <= {_HLL_BOUND!r}
    AS within_bound
FROM (
  SELECT {_HLL_EST_SQL} AS estimate
  FROM (
    SELECT sum(power(2.0, -r)) AS s, count(*) AS present
    FROM ({_hll_reg_sql(col)})
  )
)"""


_HLL_PORTABLE_SQL = (
    _hll_branch_sql("user_id") + "\nUNION ALL" + _hll_branch_sql("event_id")
)


@register("sketch_hll_portable", _HLL_PORTABLE_SQL)
def sketch_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled portable HyperLogLog over two cardinality regimes:
    user_id (~150 distinct — exercises the linear-counting correction,
    zero registers exist) and event_id (10k+ distinct — the raw
    harmonic-mean estimator, registers saturated). The oracle replays
    the ENTIRE sketch — every register's leading-zero count and the
    estimator arithmetic — so the estimate itself is value-compared,
    the strongest oracle form a sketch can have (the built-in HLL++
    twin `sketch_distinct_users` can only pin its error bound).
    within_bound asserts |est-exact|/exact <= 5·(1.04/√m).

    Scale: one map-only projection + a ≤256-row groupBy per column;
    the exact count here is the oracle contract, not the production
    path — a deployment reads the estimate alone."""
    ev = load_table(spark, "events", sf_dir)

    def branch(col: str) -> DataFrame:
        est = sketches.hll_estimate(sketches.hll_registers(ev, col))
        exact = ev.agg(
            F.countDistinct(col).cast("long").alias("exact_distinct")
        )
        return (
            est.crossJoin(F.broadcast(exact))
            .select(
                F.lit(col).alias("col_name"),
                "estimate",
                "exact_distinct",
                (
                    F.abs(F.col("estimate") - F.col("exact_distinct"))
                    / F.col("exact_distinct")
                ).alias("rel_err"),
            )
            .withColumn("within_bound", F.col("rel_err") <= _HLL_BOUND)
        )

    return branch("user_id").unionByName(branch("event_id"))


_HLL_MERGE_SQL = f"""
WITH half_a AS ({_hll_reg_sql("user_id",
    "(SELECT user_id FROM events WHERE abs(coalesce(event_id, 0)) % 2 = 0)")}),
half_b AS ({_hll_reg_sql("user_id",
    "(SELECT user_id FROM events WHERE abs(coalesce(event_id, 0)) % 2 = 1)")}),
merged AS (
  SELECT idx, max(r) AS r
  FROM (SELECT * FROM half_a UNION ALL SELECT * FROM half_b) GROUP BY 1
),
whole AS ({_hll_reg_sql("user_id")}),
mism AS (
  SELECT CAST(count(*) AS BIGINT) AS n_register_mismatches FROM (
    (SELECT * FROM merged EXCEPT SELECT * FROM whole)
    UNION ALL
    (SELECT * FROM whole EXCEPT SELECT * FROM merged)
  )
),
est_m AS (
  SELECT {_HLL_EST_SQL} AS merged_estimate
  FROM (SELECT sum(power(2.0, -r)) AS s, count(*) AS present FROM merged)
),
est_w AS (
  SELECT {_HLL_EST_SQL} AS whole_estimate
  FROM (SELECT sum(power(2.0, -r)) AS s, count(*) AS present FROM whole)
)
SELECT merged_estimate, whole_estimate, n_register_mismatches
FROM est_m, est_w, mism
"""


@register("sketch_hll_merge", _HLL_MERGE_SQL)
def sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof for the portable HLL, executed end-to-end:
    the corpus is split into two halves (event_id parity — a stand-in
    for two ingest batches or two cluster partitions), each half
    builds its own register table, and merge_hll (cell-wise max) must
    reproduce the whole-corpus registers EXACTLY — n_register_mismatches
    pins the identity register-by-register (EXCEPT both ways), and the
    two estimates are value-compared. This is the property that lets
    the sketch ride the append-only ingest loop: per-batch register
    tables merge into the state sketch without ever re-reading the
    corpus (the distinct-count member of the mergeable-state family:
    bloom bit_or, count-min cell sum, SpaceSaving merge)."""
    ev = load_table(spark, "events", sf_dir)
    parity = F.abs(F.coalesce(F.col("event_id"), F.lit(0))) % 2
    half_a = sketches.hll_registers(ev.filter(parity == 0), "user_id")
    half_b = sketches.hll_registers(ev.filter(parity == 1), "user_id")
    merged = sketches.merge_hll(half_a, half_b)
    whole = sketches.hll_registers(ev, "user_id")
    mism = (
        merged.exceptAll(whole)
        .unionByName(whole.exceptAll(merged))
        .agg(F.count(F.lit(1)).cast("long").alias("n_register_mismatches"))
    )
    est_m = sketches.hll_estimate(merged).select(
        F.col("estimate").alias("merged_estimate")
    )
    est_w = sketches.hll_estimate(whole).select(
        F.col("estimate").alias("whole_estimate")
    )
    return est_m.crossJoin(est_w).crossJoin(F.broadcast(mism))


# ---------------------------------------------------------------------------
# Winsorized robust statistics — percentile clipping per group, the
# outlier treatment a feature/quality pipeline applies before
# normalizing signals into training-data filters.
# ---------------------------------------------------------------------------

_WINSORIZE_SQL = """
WITH pct AS (
  SELECT event_type,
    quantile_cont(value, 0.05) AS p05,
    quantile_cont(value, 0.95) AS p95
  FROM events GROUP BY 1
),
clipped AS (
  SELECT e.event_type,
    greatest(least(e.value, p.p95), p.p05) AS v,
    e.value, p.p05, p.p95
  FROM events e JOIN pct p USING (event_type)
)
SELECT event_type,
  CAST(count(value) AS BIGINT) AS n,
  CAST(sum(CASE WHEN value < p05 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clipped_low,
  CAST(sum(CASE WHEN value > p95 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clipped_high,
  round(any_value(p05), 6) AS p05,
  round(any_value(p95), 6) AS p95,
  round(avg(value), 6) AS mean_raw,
  round(avg(v), 6) AS mean_winsorized,
  round(stddev_samp(value), 6) AS std_raw,
  round(stddev_samp(v), 6) AS std_winsorized
FROM clipped GROUP BY event_type
"""


@register("stats_winsorized_by_type", _WINSORIZE_SQL)
def stats_winsorized_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorization at [p05, p95]: EXACT linear-interpolated
    percentiles (Spark `percentile`, DuckDB `quantile_cont` — both
    type-7, so the oracle reproduces the cut points to the bit), values
    clipped into the band, and robust-vs-raw moments side by side. The
    approximate twin for corpus scale is `sketch_value_quantiles` (GK);
    this is the exact form for grouped signals whose per-group row
    count makes a sort-based percentile affordable — two shuffles (the
    percentile agg and the final agg; the join is a broadcast of one
    row per group)."""
    ev = load_table(spark, "events", sf_dir)
    pct = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clipped = ev.join(F.broadcast(pct), "event_type").select(
        "event_type",
        F.greatest(F.least(F.col("value"), F.col("p95")), F.col("p05")).alias(
            "v"
        ),
        "value",
        "p05",
        "p95",
    )
    return clipped.groupBy("event_type").agg(
        F.count("value").cast("long").alias("n"),
        F.sum(
            F.when(F.col("value") < F.col("p05"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_clipped_low"),
        F.sum(
            F.when(F.col("value") > F.col("p95"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_clipped_high"),
        F.round(F.first("p05"), 6).alias("p05"),
        F.round(F.first("p95"), 6).alias("p95"),
        F.round(F.avg("value"), 6).alias("mean_raw"),
        F.round(F.avg("v"), 6).alias("mean_winsorized"),
        F.round(F.stddev_samp("value"), 6).alias("std_raw"),
        F.round(F.stddev_samp("v"), 6).alias("std_winsorized"),
    )


_HLL_OVR_A = "(SELECT user_id FROM events WHERE event_type = 'purchase')"
_HLL_OVR_B = "(SELECT user_id FROM events WHERE event_type = 'click')"

_HLL_OVERLAP_SQL = f"""
WITH reg_a AS ({{ra}}),
reg_b AS ({{rb}}),
reg_u AS (
  SELECT idx, max(r) AS r
  FROM (SELECT * FROM reg_a UNION ALL SELECT * FROM reg_b) GROUP BY 1
),
ea AS (SELECT {_HLL_EST_SQL} AS est_a FROM
  (SELECT sum(power(2.0, -r)) AS s, count(*) AS present FROM reg_a)),
eb AS (SELECT {_HLL_EST_SQL} AS est_b FROM
  (SELECT sum(power(2.0, -r)) AS s, count(*) AS present FROM reg_b)),
eu AS (SELECT {_HLL_EST_SQL} AS est_union FROM
  (SELECT sum(power(2.0, -r)) AS s, count(*) AS present FROM reg_u)),
exact AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_intersection FROM (
    SELECT user_id FROM {_HLL_OVR_A} INTERSECT
    SELECT user_id FROM {_HLL_OVR_B}
  )
)
SELECT est_a, est_b, est_union,
  est_a + est_b - est_union AS est_intersection,
  exact_intersection,
  abs(est_a + est_b - est_union - exact_intersection)
    <= CAST({5 * 1.04 / 16.0!r} AS DOUBLE) * est_union AS within_bound
FROM ea, eb, eu, exact
""".format(
    ra=_hll_reg_sql("user_id", _HLL_OVR_A),
    rb=_hll_reg_sql("user_id", _HLL_OVR_B),
)


@register("sketch_hll_overlap", _HLL_OVERLAP_SQL)
def sketch_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from independent sketches
    (sketches.hll_intersection_estimate): the distinct-user overlap of
    two event types by inclusion-exclusion over three HLL estimates —
    the two sides are sketched INDEPENDENTLY (different scans, different
    days, different clusters) and only 2x256 register rows ever meet, vs
    the exact path's co-shuffle of both user sets. The oracle replays
    all three register tables and the I-E arithmetic; within_bound uses
    5 sigma of the UNION size, the honest scale of an I-E difference
    (a small overlap of two large sets is where this estimator drowns
    — the bound states that, rather than hiding it)."""
    ev = load_table(spark, "events", sf_dir)
    users_a = ev.filter(F.col("event_type") == "purchase")
    users_b = ev.filter(F.col("event_type") == "click")
    est = sketches.hll_intersection_estimate(
        sketches.hll_registers(users_a, "user_id"),
        sketches.hll_registers(users_b, "user_id"),
    )
    exact = (
        users_a.select("user_id")
        .intersect(users_b.select("user_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est_a",
        "est_b",
        "est_union",
        "est_intersection",
        "exact_intersection",
        (
            F.abs(F.col("est_intersection") - F.col("exact_intersection"))
            <= F.lit(5 * 1.04 / 16.0) * F.col("est_union")
        ).alias("within_bound"),
    )


_MAD_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS median_value
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, e.value, m.median_value,
    abs(e.value - m.median_value) AS adev
  FROM events e JOIN med m USING (event_type)
  WHERE e.value IS NOT NULL
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY 1
)
SELECT d.event_type,
  CAST(count(*) AS BIGINT) AS n,
  round(any_value(d.median_value), 6) AS median_value,
  round(any_value(m.mad), 6) AS mad,
  CAST(sum(CASE WHEN abs(d.value - d.median_value)
                     > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
    AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


@register("stats_mad_outliers", _MAD_SQL)
def stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: median absolute deviation
    with the 1.4826 normal-consistency constant, flagging |x - median|
    > 3 sigma-equivalents — the robust twin of evt_value_zscore (whose
    mean/std are themselves dragged by the outliers they're hunting).
    Exact type-7 medians (Spark `percentile` = DuckDB `quantile_cont`);
    two percentile shuffles + one broadcast-stats pass over the fact."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("value").isNotNull()
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("median_value")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "median_value",
        F.abs(F.col("value") - F.col("median_value")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.first("median_value"), 6).alias("median_value"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


_BLOOM_JOIN_SQL = """
SELECT c.c_mktsegment,
  CAST(count(*) AS BIGINT) AS n_orders,
  sum(o.o_totalprice) AS total_price
FROM orders o
JOIN (SELECT c_custkey, c_mktsegment FROM customer
      WHERE c_acctbal > 9000) c
  ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("join_bloom_prefilter", _BLOOM_JOIN_SQL)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom runtime-filter join (joins.bloom_prefilter_join): the
    selective customer dim's keys build a fixed-size blocked-Bloom word
    table that thins the orders fact MAP-SIDE before the join's
    exchange. The oracle is the PLAIN join — the bloom must be
    semantically invisible (false positives are removed by the join
    itself, no false negatives exist). The plan carries the broadcast
    word-table probe before the join (plan-pinned)."""
    from tugas_2_big_data_spark.operators import joins

    orders = load_table(spark, "orders", sf_dir).withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    cust = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_mktsegment")
    )
    joined = joins.bloom_prefilter_join(orders, cust, "c_custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("o_totalprice").alias("total_price"),
    )


_HIST_BINS = 256
_HIST_PROBS = (0.5, 0.9, 0.99)

_HIST_QUANT_SQL = f"""
WITH vals AS (
  SELECT CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL
),
grid AS (
  SELECT min(v) AS lo,
    CASE WHEN max(v) = min(v) THEN 1.0
         ELSE (max(v) - min(v)) / {_HIST_BINS} END AS width
  FROM vals
),
hist AS (
  SELECT CAST(least(floor((v - lo) / width), {_HIST_BINS - 1}) AS INT)
    AS bin, count(*) AS cnt
  FROM vals, grid GROUP BY 1
),
cum AS (
  SELECT bin, cnt,
    sum(cnt) OVER (ORDER BY bin
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    (SELECT sum(cnt) FROM hist) AS total
  FROM hist
),
probs AS (
  SELECT CAST(0.5 AS DOUBLE) AS p
  UNION ALL SELECT CAST(0.9 AS DOUBLE)
  UNION ALL SELECT CAST(0.99 AS DOUBLE)
),
est AS (
  SELECT probs.p, min(c.bin) AS b
  FROM probs, cum c
  WHERE c.cum >= ceil(probs.p * c.total)
  GROUP BY probs.p
),
exact AS (
  SELECT CAST(0.5 AS DOUBLE) AS p, quantile_cont(v, 0.5) AS exact
    FROM vals
  UNION ALL SELECT CAST(0.9 AS DOUBLE), quantile_cont(v, 0.9) FROM vals
  UNION ALL SELECT CAST(0.99 AS DOUBLE), quantile_cont(v, 0.99) FROM vals
)
SELECT est.p, g.lo + (est.b + 1) * g.width AS est, exact.exact,
  abs(g.lo + (est.b + 1) * g.width - exact.exact) <= g.width
    AS within_bound
FROM est JOIN exact USING (p), grid g
"""


@register("sketch_histogram_quantiles", _HIST_QUANT_SQL)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-grid histogram quantile sketch
    (sketches.histogram_counts / histogram_quantile_estimates):
    256 bins on the exact [min, max] grid, estimate = upper edge of the
    first bin reaching ceil(p·total) — DETERMINISTIC, so unlike the GK
    twin (`sketch_value_quantiles`, engine-internal, bound-flag-only)
    the estimates themselves are value-compared by a full DuckDB replay
    of the binning, the cumulative walk, and the edge arithmetic.
    within_bound pins |est − exact| <= width — certain for the lower
    (non-interpolated) quantile, and empirically true here against the
    type-7 interpolated percentile, which can in principle cross a
    sparse bin (see histogram_quantile_estimates' docstring). The bin
    table merges by cell-wise sum (same grid) — the quantile member of
    the portable mergeable-sketch family."""
    ev = load_table(spark, "events", sf_dir)
    hist = sketches.histogram_counts(ev, "value", n_bins=_HIST_BINS)
    est = sketches.histogram_quantile_estimates(hist, list(_HIST_PROBS))
    exact = ev.filter(F.col("value").isNotNull()).agg(
        *[
            F.expr(f"percentile(CAST(value AS DOUBLE), {p})").alias(
                f"_x{i}"
            )
            for i, p in enumerate(_HIST_PROBS)
        ],
        (
            F.when(
                F.max(F.col("value").cast("double"))
                == F.min(F.col("value").cast("double")),
                F.lit(1.0),
            ).otherwise(
                (
                    F.max(F.col("value").cast("double"))
                    - F.min(F.col("value").cast("double"))
                )
                / _HIST_BINS
            )
        ).alias("_w"),
    )
    exact_long = None
    for i, p in enumerate(_HIST_PROBS):
        part = exact.select(
            F.lit(p).alias("p"),
            F.col(f"_x{i}").alias("exact"),
            F.col("_w").alias("_w"),
        )
        exact_long = part if exact_long is None else exact_long.unionByName(part)
    return (
        est.join(F.broadcast(exact_long), "p")
        .select(
            "p",
            "est",
            "exact",
            (F.abs(F.col("est") - F.col("exact")) <= F.col("_w")).alias(
                "within_bound"
            ),
        )
    )


def _profile_leg_sql(col: str, kind: str) -> str:
    base = (
        f"SELECT '{col}' AS column, CAST(count(*) AS BIGINT) AS n,\n"
        f"  CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_null,\n"
        f"  CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,\n"
    )
    if kind == "num":
        stats = (
            f"  CAST(min({col}) AS DOUBLE) AS min_num,\n"
            f"  CAST(max({col}) AS DOUBLE) AS max_num,\n"
            f"  round(avg({col}), 6) AS avg_num,\n"
            f"  CAST(NULL AS VARCHAR) AS min_str,\n"
            f"  CAST(NULL AS VARCHAR) AS max_str\n"
        )
    elif kind == "ts":
        stats = (
            f"  CAST(epoch_us(min({col})) AS DOUBLE) AS min_num,\n"
            f"  CAST(epoch_us(max({col})) AS DOUBLE) AS max_num,\n"
            f"  CAST(NULL AS DOUBLE) AS avg_num,\n"
            f"  CAST(NULL AS VARCHAR) AS min_str,\n"
            f"  CAST(NULL AS VARCHAR) AS max_str\n"
        )
    else:
        stats = (
            f"  CAST(NULL AS DOUBLE) AS min_num,\n"
            f"  CAST(NULL AS DOUBLE) AS max_num,\n"
            f"  CAST(NULL AS DOUBLE) AS avg_num,\n"
            f"  min({col}) AS min_str,\n"
            f"  max({col}) AS max_str\n"
        )
    return base + stats + "FROM events"


_PROFILE_SQL = "\nUNION ALL\n".join(
    _profile_leg_sql(c, k)
    for c, k in [
        ("event_id", "num"),
        ("ts", "ts"),
        ("user_id", "num"),
        ("event_type", "str"),
        ("value", "num"),
        ("props", "str"),
    ]
)


@register("profile_events", _PROFILE_SQL)
def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile (operators/profiling.profile_columns):
    per-column row counts, null counts, EXACT distinct counts, and
    typed extremes (numerics as doubles, timestamps as epoch
    microseconds, strings as strings) — the DESCRIBE-grade landing-
    table summary run before heavier curation. One corpus pass (the
    multi-distinct agg plans as a single Expand scan); the one-row wide
    aggregate is checkpointed so the per-column unpivot doesn't re-run
    it. The oracle recomputes each column's leg independently."""
    from tugas_2_big_data_spark.operators import profiling

    return profiling.profile_columns(load_table(spark, "events", sf_dir))


_TRIGRAM_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
    lead(event_type, 1) OVER w AS e2,
    lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tri AS (
  SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
    count(*) AS n
  FROM seq WHERE e3 IS NOT NULL
  GROUP BY 1
)
SELECT path, CAST(n AS BIGINT) AS n
FROM tri ORDER BY n DESC, path LIMIT 20
"""


@register("evt_top_event_trigrams", _TRIGRAM_SQL)
def evt_top_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-event behavioral paths: per-user event streams
    ordered by (ts, event_id — the total order that makes window
    results deterministic on both engines), sliding trigrams via two
    leads over ONE window spec (one shuffle by user_id, both leads in
    a single Window node), then a global count + TakeOrdered top-20.
    The path-mining primitive behind funnel discovery — where
    evt_funnel_conversion checks a KNOWN path, this surfaces the paths
    worth checking."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


_OOV_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+'))
    AS term
  FROM documents
),
vocab AS (
  SELECT term FROM (
    SELECT term, count(*) AS cnt FROM toks GROUP BY 1
    ORDER BY cnt DESC, term LIMIT 24
  )
),
scored AS (
  SELECT t.doc_id,
    count(*) AS n_tokens,
    sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM toks t LEFT JOIN vocab v USING (term)
  GROUP BY 1
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(n_oov AS BIGINT) AS n_oov,
  round(n_oov / n_tokens, 6) AS oov_rate
FROM scored
"""


@register("txt_oov_rate", _OOV_SQL)
def txt_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-24 word vocabulary — the tokenizer-coverage quality signal
    (docs full of words a fixed vocab can't represent cost tokens and
    carry noise). Vocabulary = deterministic TopK of the word counts
    (count desc, term asc), broadcast into a left join on the exploded
    token relation; one token-count shuffle + one per-doc aggregate.
    At 100 TB the vocab build amortizes across batches (freeze it in
    an artifact like the ANN indexes); the per-doc scoring is map-side
    against the broadcast vocab."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("term"),
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "term")
        .limit(24)
        .select("term", F.lit(True).alias("_inv"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias(
                "oov_rate"
            ),
        )
    )


def _hll_by_type_sql() -> str:
    from tugas_2_big_data_spark.functions.hashing import hexn_sql

    h = hexn_sql("md5(CAST(user_id AS VARCHAR))", 15)
    return f"""
WITH reg AS (
  SELECT event_type, h % {_HLL_M} AS idx,
    max(CASE WHEN (h // {_HLL_M}) = 0 THEN 53
        ELSE 53 - length(bin(h // {_HLL_M})) END) AS r
  FROM (SELECT event_type, ({h}) AS h FROM events
        WHERE user_id IS NOT NULL)
  GROUP BY 1, 2
),
agg AS (
  SELECT event_type, sum(power(2.0, -r)) AS s, count(*) AS present
  FROM reg GROUP BY 1
),
est AS (SELECT event_type, {_HLL_EST_SQL} AS estimate FROM agg),
exact AS (
  SELECT event_type,
    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT est.event_type, est.estimate, exact.exact_distinct,
  abs(est.estimate - exact.exact_distinct) / exact.exact_distinct
    <= {_HLL_BOUND!r} AS within_bound
FROM est JOIN exact USING (event_type)
"""


@register("sketch_hll_by_type", _hll_by_type_sql())
def sketch_hll_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped portable HLL (sketches.hll_registers_by_group /
    hll_estimates_by_group): per-event-type distinct users from ONE
    (type, idx) register aggregate — the production shape of the
    portable sketch (per-tenant/day/type cardinalities at <= 256 rows
    per group), fully value-replayed by the oracle where the built-in
    per-group HLL++ (`sketch_distinct_users`) can only pin a bound
    flag. Exact counts ride along as the oracle contract."""
    ev = load_table(spark, "events", sf_dir)
    reg = sketches.hll_registers_by_group(ev, "user_id", ["event_type"])
    est = sketches.hll_estimates_by_group(reg, ["event_type"])
    exact = ev.filter(F.col("user_id").isNotNull()).groupBy(
        "event_type"
    ).agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    return est.join(exact, "event_type").select(
        "event_type",
        "estimate",
        "exact_distinct",
        (
            F.abs(F.col("estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= _HLL_BOUND
        ).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# key-skew profiling, Markov transitions, SCD2 snapshot merge
# ---------------------------------------------------------------------------

_KEY_SKEW_SQL = """
WITH pk AS (
  SELECT user_id AS key, count(*) AS cnt FROM events GROUP BY 1
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
    CAST(sum(cnt) AS DOUBLE) AS total,
    CAST(max(cnt) AS DOUBLE) / (CAST(sum(cnt) AS DOUBLE) / count(*))
      AS skew,
    log2(CAST(sum(cnt) AS DOUBLE))
      - sum(cnt * log2(CAST(cnt AS DOUBLE))) / sum(cnt) AS entropy
  FROM pk
)
SELECT key, CAST(cnt AS BIGINT) AS cnt,
  round(cnt / st.total, 9) AS share,
  rk, st.n_keys,
  round(st.skew, 9) AS skew_ratio,
  round(st.entropy, 9) AS key_entropy
FROM (
  SELECT key, cnt,
    CAST(row_number() OVER (ORDER BY cnt DESC, key) AS BIGINT) AS rk
  FROM pk
) t CROSS JOIN st
WHERE rk <= 20
"""


@register("profile_key_skew", _KEY_SKEW_SQL)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic (profiling.key_skew_profile): top-20
    heaviest user_ids with row share, plus n_keys / skew_ratio
    (max over mean key count) / Shannon key entropy repeated per row —
    the measurement run BEFORE choosing salting or AQE skew-join at
    100 TB (operators/skew.py is the mitigation this feeds). One hash
    aggregate over the corpus, then sketch-sized stats + TakeOrdered
    top-k; the corpus is scanned once and never re-shuffled."""
    from tugas_2_big_data_spark.operators import profiling

    return profiling.key_skew_profile(
        load_table(spark, "events", sf_dir), "user_id", top_k=20
    )


_MARKOV_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
    lead(event_type) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
    ) AS next_type
  FROM events
),
c AS (
  SELECT event_type AS from_type, next_type AS to_type,
    count(*) AS cnt
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, CAST(cnt AS BIGINT) AS cnt,
  round(CAST(cnt AS DOUBLE)
    / sum(cnt) OVER (PARTITION BY from_type), 9) AS p
FROM c
"""


@register("evt_markov_transitions", _MARKOV_SQL)
def evt_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) — the behavioral model
    behind session simulation and next-event prediction baselines.
    Plan: ONE user_id shuffle carries the lead() window (deterministic
    (ts, event_id) order), then a (from, to) hash aggregate whose
    output is |types|² rows whatever the corpus size; the
    normalization window runs over those bounded rows only."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wn = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "cnt",
        F.round(
            F.col("cnt").cast("double") / F.sum("cnt").over(wn), 9
        ).alias("p"),
    )


# Two deterministic snapshots derived from the customer dim on both
# engines: the new snapshot updates acctbal for every 10th key, drops
# every 17th, and inserts a +900000-shifted copy of every 25th.
_SCD2_SQL = """
WITH snap_old AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
),
snap_new AS (
  SELECT c_custkey, c_name,
    CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
         ELSE c_acctbal END AS c_acctbal,
    c_mktsegment
  FROM customer WHERE c_custkey % 17 <> 0
  UNION ALL
  SELECT c_custkey + 900000, c_name, c_acctbal + 1.0, c_mktsegment
  FROM customer WHERE c_custkey % 25 = 0
),
j AS (
  SELECT o.c_custkey AS ko, n.c_custkey AS kn,
    o.c_name AS o_name, o.c_acctbal AS o_bal, o.c_mktsegment AS o_seg,
    n.c_name AS n_name, n.c_acctbal AS n_bal, n.c_mktsegment AS n_seg,
    CASE
      WHEN o.c_custkey IS NOT NULL AND n.c_custkey IS NOT NULL
        AND o.c_name = n.c_name AND o.c_acctbal = n.c_acctbal
        AND o.c_mktsegment = n.c_mktsegment THEN 'unchanged'
      WHEN o.c_custkey IS NOT NULL AND n.c_custkey IS NOT NULL
        THEN 'changed'
      WHEN o.c_custkey IS NOT NULL THEN 'deleted'
      ELSE 'inserted'
    END AS change
  FROM snap_old o FULL OUTER JOIN snap_new n
    ON o.c_custkey = n.c_custkey
)
SELECT coalesce(ko, kn) AS c_custkey,
  CASE WHEN change = 'unchanged' THEN o_name ELSE n_name END AS c_name,
  CASE WHEN change = 'unchanged' THEN o_bal ELSE n_bal END AS c_acctbal,
  CASE WHEN change = 'unchanged' THEN o_seg ELSE n_seg END
    AS c_mktsegment,
  CASE WHEN change = 'unchanged' THEN '2026-01-01'
       ELSE '2026-02-01' END AS valid_from,
  CAST(NULL AS VARCHAR) AS valid_to,
  true AS is_current, change
FROM j WHERE change <> 'deleted'
UNION ALL
SELECT ko, o_name, o_bal, o_seg,
  '2026-01-01' AS valid_from, '2026-02-01' AS valid_to,
  false AS is_current, change
FROM j WHERE change IN ('changed', 'deleted')
"""


@register("dim_scd2_customers", _SCD2_SQL)
def dim_scd2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 derivation from two full dimension snapshots
    (snapshots.scd2_merge): per key — unchanged carries the open row,
    changed closes the old version and opens the new, deleted closes,
    inserted opens; `change` records the classification. This is the
    history-keeping upgrade of the reference's drop-and-replace sink
    (SURVEY.md §2.2 K2): same full-dump input, AS-OF queryable output.
    ONE full-outer join keyed on the dim key feeding two unioned
    projections; at 100 TB both snapshots live bucketed by key and the
    join plans exchange-free."""
    from tugas_2_big_data_spark.operators import snapshots

    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    snap_new = cust.filter(F.col("c_custkey") % 17 != 0).select(
        "c_custkey",
        "c_name",
        F.when(
            F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 100.0
        ).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        "c_mktsegment",
    ).unionByName(
        cust.filter(F.col("c_custkey") % 25 == 0).select(
            (F.col("c_custkey") + 900000).alias("c_custkey"),
            "c_name",
            (F.col("c_acctbal") + 1.0).alias("c_acctbal"),
            "c_mktsegment",
        )
    )
    return snapshots.scd2_merge(
        cust,
        snap_new,
        key_cols=["c_custkey"],
        tracked_cols=["c_name", "c_acctbal", "c_mktsegment"],
        old_ts="2026-01-01",
        new_ts="2026-02-01",
    )


# ---------------------------------------------------------------------------
# CDC changelog apply, mutual information, hour-of-day seasonal z-score
# ---------------------------------------------------------------------------

# Deterministic changelog derived from orders on both engines: one
# event per order keyed by customer, ordered by (o_orderdate,
# o_orderkey); every 50th F-status order is a delete of that
# customer's profile row, everything else an upsert carrying the
# order's totalprice.
_CDC_SQL = """
WITH changelog AS (
  SELECT o_custkey AS k, o_orderdate AS ts, o_orderkey AS seq,
    CASE WHEN o_orderstatus = 'F' AND o_orderkey % 50 = 0
         THEN 'D' ELSE 'U' END AS op,
    o_totalprice AS val
  FROM orders
),
latest AS (
  SELECT k, ts, seq, op, val,
    row_number() OVER (
      PARTITION BY k ORDER BY seq DESC, op DESC
    ) AS rn
  FROM changelog
)
SELECT k AS o_custkey, CAST(ts AS TIMESTAMP) AS ts,
  seq AS o_orderkey, op, val AS o_totalprice
FROM latest WHERE rn = 1 AND op <> 'D'
"""


@register("cdc_apply_changelog", _CDC_SQL)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction (snapshots.cdc_apply): collapse an
    append-only insert/update/delete stream to final table state —
    latest event per key wins, keys whose latest event is a delete
    disappear. The batch half of a CDC ingest (the foreachBatch
    streaming fold shares the logic); pairs with dim_scd2_customers
    as the two standard warehouse-maintenance derivations. One window
    keyed on the key — a single shuffle, exchange-free when the
    changelog lands bucketed by key."""
    from tugas_2_big_data_spark.operators import snapshots

    o = load_table(spark, "orders", sf_dir)
    changelog = o.select(
        F.col("o_custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey"),
        F.when(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_orderkey") % 50 == 0),
            F.lit("D"),
        )
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("o_totalprice"),
    )
    return snapshots.cdc_apply(
        changelog, key_cols=["o_custkey"], seq_col="o_orderkey"
    )


_MI_SQL = """
WITH joint AS (
  SELECT event_type AS a, user_id % 10 AS b,
    CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
),
cells AS (
  SELECT c,
    sum(c) OVER (PARTITION BY a) AS ca,
    sum(c) OVER (PARTITION BY b) AS cb,
    sum(c) OVER () AS n
  FROM joint
)
SELECT
  round(sum((c / n) * log2((c * n) / (ca * cb))), 9) AS mi_bits,
  round(-sum((c / n) * log2(ca / n)), 9) AS h_a_bits,
  round(-sum((c / n) * log2(cb / n)), 9) AS h_b_bits,
  CAST(max(n) AS BIGINT) AS n
FROM cells
"""


@register("profile_mutual_info", _MI_SQL)
def profile_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event_type and a user bucket
    (profiling.mutual_information): the dependence screen that finds
    redundant columns (MI ~ min(H): one determines the other) and
    useless partition keys (MI ~ 0 against the filter column). ONE
    (a, b) hash aggregate over the corpus; marginals and the MI sum
    are window arithmetic over the |A| x |B| cells."""
    from tugas_2_big_data_spark.operators import profiling

    ev = load_table(spark, "events", sf_dir).select(
        "event_type", (F.col("user_id") % 10).alias("user_bucket")
    )
    return profiling.mutual_information(ev, "event_type", "user_bucket")


_SEASONAL_SQL = """
WITH hourly AS (
  SELECT event_id, event_type, value,
    CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS INT) AS hr
  FROM events WHERE value IS NOT NULL
),
profile AS (
  SELECT event_type, hr, avg(value) AS mu,
    nullif(stddev_samp(value), 0) AS sigma,
    CAST(count(*) AS BIGINT) AS n
  FROM hourly GROUP BY 1, 2
)
SELECT h.event_id, h.event_type, h.hr, h.value,
  round((h.value - p.mu) / p.sigma, 9) + 0.0 AS seasonal_z
FROM hourly h JOIN profile p USING (event_type, hr)
WHERE p.sigma IS NOT NULL AND abs((h.value - p.mu) / p.sigma) > 2.5
"""


@register("evt_hourly_seasonal", _SEASONAL_SQL)
def evt_hourly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly flags: z-scores against the
    (event_type, hour-of-day) profile instead of the global per-type
    stats (evt_value_zscore) — the deseasonalized upgrade that stops
    flagging every nightly batch spike. The profile is |types| x 24
    rows, broadcast back onto the single corpus scan; signed-zero
    fold on the rounded z (emb_covariance lesson)."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("value").isNotNull()
    )
    hourly = ev.select(
        "event_id",
        "event_type",
        "value",
        F.hour("ts").cast("int").alias("hr"),
    )
    profile = hourly.groupBy("event_type", "hr").agg(
        F.avg("value").alias("mu"),
        F.nullif(F.stddev_samp("value"), F.lit(0.0)).alias("sigma"),
    ).filter(F.col("sigma").isNotNull())
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        hourly.join(F.broadcast(profile), ["event_type", "hr"])
        .filter(F.abs(z) > 2.5)
        .select(
            "event_id",
            "event_type",
            "hr",
            "value",
            (F.round(z, 9) + F.lit(0.0)).alias("seasonal_z"),
        )
    )


_INTERARRIVAL_SQL = """
WITH seq AS (
  SELECT event_type,
    epoch_us(CAST(ts AS TIMESTAMP))
      - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
        ) AS gap_us
  FROM events
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_gaps,
  round(avg(gap_us / 1e6), 6) AS mean_gap_s,
  round(stddev_samp(gap_us / 1e6), 6) AS std_gap_s,
  round(stddev_samp(gap_us / 1e6) / avg(gap_us / 1e6), 6)
    AS burstiness_cv
FROM seq WHERE gap_us IS NOT NULL
GROUP BY event_type
"""


@register("evt_interarrival_stats", _INTERARRIVAL_SQL)
def evt_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time statistics per event type: mean/std gap and
    the coefficient of variation (CV > 1 = bursty, CV ≈ 1 = Poisson,
    CV < 1 = regular) — the traffic-shape profile behind capacity
    planning and bot detection. One user_id window shuffle (gaps are
    within each user's stream, attributed to the ARRIVING event's
    type), then a |types|-row aggregate. Gap arithmetic in epoch
    MICROSECONDS (exact integers on both engines) converted to
    seconds only inside the rounded statistics."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    seq = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    g = F.col("gap_us") / 1e6
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.round(F.avg(g), 6).alias("mean_gap_s"),
        F.round(F.stddev_samp(g), 6).alias("std_gap_s"),
        F.round(F.stddev_samp(g) / F.avg(g), 6).alias("burstiness_cv"),
    )


# ---------------------------------------------------------------------------
# Entity resolution: blocking -> fuzzy match -> survivorship over a
# deterministically dirtied customer registry. The customer table has
# no natural duplicates, so both sides build the same dirty twins:
# a letter-dropped typo copy (custkey%5==0 -> d_id=custkey*10+1) and
# a suffix alias (custkey%7==0 -> d_id=custkey*10+2). The *10+variant
# encoding is collision-free on ANY custkey space (additive offsets
# like +100000 silently merge a typo twin with an alias twin once
# custkeys pass 100k, and collide dirty ids with real custkeys in the
# survivorship rec-id space); base records enter survivorship as
# variant 0 (custkey*10), so the three populations share one
# unambiguous id space. Blocking normalizes the name to
# its digit stream (corruption-invariant), so blocks stay <=10 rows
# per key at ANY table size and the match never goes all-pairs.
# ---------------------------------------------------------------------------

_ER_BASE_SQL = """
  SELECT c_custkey, c_name, c_acctbal,
         substr(regexp_replace(c_name, '[^0-9]', '', 'g'), 1, 8) AS block
  FROM customer
"""

_ER_DIRTY_SQL = """
  SELECT d_id, d_name, d_acctbal,
         substr(regexp_replace(d_name, '[^0-9]', '', 'g'), 1, 8) AS block
  FROM (
    SELECT c_custkey * 10 + 1 AS d_id,
           substr(c_name, 1, 4) || substr(c_name, 6) AS d_name,
           c_acctbal + 1.5 AS d_acctbal
    FROM customer WHERE c_custkey % 5 = 0
    UNION ALL
    SELECT c_custkey * 10 + 2 AS d_id,
           c_name || ' jr' AS d_name,
           c_acctbal - 2.0 AS d_acctbal
    FROM customer WHERE c_custkey % 7 = 0
  )
"""

_ER_CAND_SQL = f"""
  SELECT d.d_id, d.d_name, d.d_acctbal, d.block,
         b.c_custkey, b.c_name,
         levenshtein(d.d_name, b.c_name) AS dist
  FROM ({_ER_DIRTY_SQL}) d JOIN ({_ER_BASE_SQL}) b USING (block)
"""

_ER_MATCH_SQL = f"""
  SELECT d_id, c_custkey AS matched_key, dist, d_acctbal
  FROM (
    SELECT d_id, c_custkey, dist, d_acctbal,
           row_number() OVER (
             PARTITION BY d_id ORDER BY dist, c_custkey
           ) AS rn
    FROM ({_ER_CAND_SQL}) WHERE dist <= 3
  ) WHERE rn = 1
"""


def _er_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    return cust.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        entity_resolution.digits_block_key(F.col("c_name")).alias("block"),
    )


def _er_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    typo = cust.filter(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") * 10 + 1).alias("d_id"),
        F.concat(
            F.substring("c_name", 1, 4), F.expr("substring(c_name, 6)")
        ).alias("d_name"),
        (F.col("c_acctbal") + 1.5).alias("d_acctbal"),
    )
    alias = cust.filter(F.col("c_custkey") % 7 == 0).select(
        (F.col("c_custkey") * 10 + 2).alias("d_id"),
        F.concat(F.col("c_name"), F.lit(" jr")).alias("d_name"),
        (F.col("c_acctbal") - 2.0).alias("d_acctbal"),
    )
    dirty = typo.unionByName(alias)
    return dirty.withColumn(
        "block", entity_resolution.digits_block_key(F.col("d_name"))
    )


_ER_BLOCKING_SQL = f"""
SELECT
  CAST((SELECT count(*) FROM ({_ER_CAND_SQL})) AS BIGINT) AS n_candidates,
  CAST((SELECT count(DISTINCT block) FROM ({_ER_CAND_SQL})) AS BIGINT)
    AS n_blocks,
  CAST((SELECT count(*) FROM ({_ER_DIRTY_SQL}))
       * (SELECT count(*) FROM customer) AS BIGINT) AS naive_pairs
"""


@register("er_blocked_candidates", _ER_BLOCKING_SQL)
def er_blocked_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking efficiency audit: candidate pairs actually compared
    (equi-join on the digit-stream block key) vs the naive |dirty| x
    |base| cross product the blocking avoided. One row; the candidate
    relation is the SAME equi-join the match query consumes, so the
    number it reports is the number the pipeline pays. At 100 TB the
    naive count is ~1e16 and the blocked count stays ~10x |dirty| —
    this query is the proof the match below never goes quadratic."""
    cand = entity_resolution.blocked_candidates(
        _er_dirty(spark, sf_dir), _er_base(spark, sf_dir)
    )
    stats = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.countDistinct("block").cast("long").alias("n_blocks"),
    )
    naive = (
        _er_dirty(spark, sf_dir)
        .agg(F.count(F.lit(1)).alias("nd"))
        .crossJoin(
            load_table(spark, "customer", sf_dir).agg(
                F.count(F.lit(1)).alias("nb")
            )
        )
        .select((F.col("nd") * F.col("nb")).cast("long").alias("naive_pairs"))
    )
    return stats.crossJoin(naive)


@register("er_salted_candidates", _ER_BLOCKING_SQL)
def er_salted_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-resilient candidate generator
    (entity_resolution.blocked_candidates_salted — dirty side salted
    by hash(d_id) % 8, base side replicated 8x so a hot block's pairs
    spread over 8 shuffle partitions instead of one straggler task)
    value-proven equivalent to the plain block join: this query runs
    the SALTED path and shares er_blocked_candidates' oracle verbatim
    — identical candidate count, block count, and naive-pairs bound,
    because each dirty row carries one salt and meets exactly the one
    base replica with that salt. The balance story is measured in
    ER_SKEW_PROBE.json (planted 1%-hot-block fixture: max-partition
    share vs plain SMJ and vs AQE skew-split)."""
    cand = entity_resolution.blocked_candidates_salted(
        _er_dirty(spark, sf_dir), _er_base(spark, sf_dir), salt=8
    )
    stats = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.countDistinct("block").cast("long").alias("n_blocks"),
    )
    naive = (
        _er_dirty(spark, sf_dir)
        .agg(F.count(F.lit(1)).alias("nd"))
        .crossJoin(
            load_table(spark, "customer", sf_dir).agg(
                F.count(F.lit(1)).alias("nb")
            )
        )
        .select((F.col("nd") * F.col("nb")).cast("long").alias("naive_pairs"))
    )
    return stats.crossJoin(naive)


_ER_MATCH_OUT_SQL = f"""
SELECT CAST(d_id AS BIGINT) AS d_id,
       CAST(matched_key AS BIGINT) AS matched_key,
       CAST(dist AS BIGINT) AS dist
FROM ({_ER_MATCH_SQL})
"""


@register("er_match_pairs", _ER_MATCH_OUT_SQL)
def er_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy match: block-join candidates filtered to levenshtein <= 3
    (JVM built-in, whole-stage codegen — no Python in the verify step),
    then each dirty record keeps its closest base record (ties to the
    smaller key). The typo twin sits at distance 1 from its parent but
    distance 2 from block siblings, the suffix alias at 3 vs 4 — so
    ranking recovers the true parent for every twin, which is what the
    oracle value-checks. One block-key shuffle + one per-record
    window; output is at most one row per dirty record."""
    cand = entity_resolution.blocked_candidates(
        _er_dirty(spark, sf_dir), _er_base(spark, sf_dir)
    )
    m = entity_resolution.best_match(cand, max_dist=3)
    return m.select(
        F.col("d_id").cast("long").alias("d_id"),
        F.col("c_custkey").cast("long").alias("matched_key"),
        F.col("dist").cast("long").alias("dist"),
    )


_ER_SURVIVOR_SQL = f"""
WITH rows_all AS (
  SELECT c_custkey AS cluster_key, c_custkey * 10 AS rec_id,
         c_acctbal AS acctbal
  FROM customer
  UNION ALL
  SELECT matched_key AS cluster_key, d_id AS rec_id, d_acctbal AS acctbal
  FROM ({_ER_MATCH_SQL})
),
ranked AS (
  SELECT cluster_key, rec_id, acctbal,
         count(*) OVER (PARTITION BY cluster_key) AS n_records,
         row_number() OVER (
           PARTITION BY cluster_key ORDER BY acctbal DESC, rec_id
         ) AS rn
  FROM rows_all
)
SELECT CAST(cluster_key AS BIGINT) AS cluster_key,
       CAST(n_records AS BIGINT) AS n_records,
       CAST(rec_id AS BIGINT) AS survivor_id,
       acctbal AS survivor_acctbal
FROM ranked WHERE rn = 1 AND n_records >= 2
"""


@register("er_survivorship", _ER_SURVIVOR_SQL)
def er_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship: every matched cluster (base record + its resolved
    twins) collapses to one row — max account balance wins, ties to
    the smaller record id, cluster size kept for audit. Because
    best-match makes the cluster assignment functional (one parent per
    dirty record), this is a single groupBy on the cluster key with an
    argmax struct — no iteration, no component closure. The golden
    record a warehouse would serve after ER. Record ids share one
    collision-free space: base = custkey*10, typo twin = custkey*10+1,
    alias twin = custkey*10+2 (survivor_id decodes as id/10 → custkey,
    id%10 → variant) — additive offsets would alias populations on
    large custkey spaces."""
    base = _er_base(spark, sf_dir)
    cand = entity_resolution.blocked_candidates(_er_dirty(spark, sf_dir), base)
    m = entity_resolution.best_match(cand, max_dist=3)
    return entity_resolution.survivorship(
        m, base, base_rec_id=F.col("c_custkey") * 10
    )


# ---------------------------------------------------------------------------
# Z-order layout audit: Morton-interleave (custkey, order-day) and
# compare per-bucket min/max tightness vs a linear sort-by-custkey
# layout — the file-skipping decision behind OPTIMIZE ... ZORDER BY.
# ---------------------------------------------------------------------------

def _zorder_sql(n: int = 64, bits: int = layout.MORTON_BITS) -> str:
    mask = (1 << bits) - 1
    z = layout.morton_sql("x", "y", bits)
    return f"""
WITH pts AS (
  SELECT (o_custkey & {mask}) AS x,
         (datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
            & {mask}) AS y
  FROM orders
),
m AS (SELECT x, y, CAST({z} AS BIGINT) AS z FROM pts),
ext AS (
  SELECT min(x) AS minx, max(x) AS maxx, min(y) AS miny, max(y) AS maxy,
         min(z) AS minz, max(z) AS maxz FROM m
),
b AS (
  SELECT 'zorder' AS layout,
         CAST(floor(CAST(z - minz AS DOUBLE) * {n}.0
                    / CAST(maxz - minz + 1 AS DOUBLE)) AS BIGINT) AS bucket,
         x, y
  FROM m, ext
  UNION ALL
  SELECT 'linear',
         CAST(floor(CAST(x - minx AS DOUBLE) * {n}.0
                    / CAST(maxx - minx + 1 AS DOUBLE)) AS BIGINT),
         x, y
  FROM m, ext
),
stats AS (
  SELECT layout, bucket,
         min(x) AS bminx, max(x) AS bmaxx,
         min(y) AS bminy, max(y) AS bmaxy
  FROM b GROUP BY 1, 2
)
SELECT layout,
  CAST(count(*) AS BIGINT) AS n_buckets,
  round(avg(CAST(bmaxx - bminx + 1 AS DOUBLE) / (maxx - minx + 1)), 6)
    AS avg_x_span_frac,
  round(avg(CAST(bmaxy - bminy + 1 AS DOUBLE) / (maxy - miny + 1)), 6)
    AS avg_y_span_frac,
  CAST(sum(CASE WHEN CAST(floor((minx + maxx) / 2.0) AS BIGINT)
                  BETWEEN bminx AND bmaxx THEN 1 ELSE 0 END) AS BIGINT)
    AS x_probe_buckets,
  CAST(sum(CASE WHEN CAST(floor((miny + maxy) / 2.0) AS BIGINT)
                  BETWEEN bminy AND bmaxy THEN 1 ELSE 0 END) AS BIGINT)
    AS y_probe_buckets
FROM stats, ext
GROUP BY layout
"""


@register("layout_zorder_vs_linear", _zorder_sql())
def layout_zorder_vs_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear layout audit (operators/layout.py): Morton-
    interleave (o_custkey, days-since-1992-01-01 — an epoch at or
    below the minimum orderdate so y is non-negative and contiguous;
    a mid-range epoch would wrap negative offsets to the top of the
    bit domain and distort every span measurement) and bucket
    equal-width on
    the code, vs equal-width on custkey alone; per bucket take the
    [min,max] a parquet footer would carry and report span tightness
    plus how many buckets a mid-domain point predicate on EACH
    dimension must scan. Linear serves x and nothing else (every
    bucket spans the full date domain); Z-order bounds both — the
    measured justification for writing 100 TB fact tables
    repartitionByRange(morton) instead of sorted by one key. Map-only
    bit interleave, one broadcast extent row, no global sort or
    window anywhere (the plan a 1000-executor write can run)."""
    mask = (1 << layout.MORTON_BITS) - 1
    orders = load_table(spark, "orders", sf_dir)
    pts = orders.select(
        F.col("o_custkey").bitwiseAND(F.lit(mask)).alias("x"),
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
        ).bitwiseAND(F.lit(mask)).alias("y"),
    )
    return layout.layout_audit(pts, n_buckets=64)


# ---------------------------------------------------------------------------
# Join-size estimation: price |view-events >< purchase-events on user|
# from two Count-Min sketches without running the join.
# ---------------------------------------------------------------------------

def _join_size_sql(depth: int = _CM_DEPTH, width: int = _CM_WIDTH) -> str:
    from tugas_2_big_data_spark.functions.hashing import hexn_sql

    def legs(src: str) -> str:
        out = []
        for r in range(depth):
            h = hexn_sql(f"md5('cm{r}:' || CAST(item AS VARCHAR))", 15)
            out.append(
                f"SELECT item, cnt, {r} AS r, ({h}) % {width} AS c FROM {src}"
            )
        return "\nUNION ALL ".join(out)

    return f"""
WITH ia AS (
  SELECT user_id AS item, count(*) AS cnt FROM events
  WHERE event_type = 'view' GROUP BY 1
),
ib AS (
  SELECT user_id AS item, count(*) AS cnt FROM events
  WHERE event_type = 'purchase' GROUP BY 1
),
pa AS ({legs('ia')}),
pb AS ({legs('ib')}),
ca AS (SELECT r, c, sum(cnt) AS cell FROM pa GROUP BY 1, 2),
cb AS (SELECT r, c, sum(cnt) AS cell FROM pb GROUP BY 1, 2),
ip AS (
  SELECT a.r, sum(a.cell * b.cell) AS ip
  FROM ca a JOIN cb b ON a.r = b.r AND a.c = b.c GROUP BY 1
),
ex AS (
  SELECT COALESCE(sum(a.cnt * b.cnt), 0) AS exact_size
  FROM ia a JOIN ib b ON a.item = b.item
),
est AS (
  SELECT CASE WHEN count(*) = {depth} THEN min(ip) ELSE 0 END AS cm_est
  FROM ip
)
SELECT CAST(exact_size AS BIGINT) AS exact_size,
       CAST(cm_est AS BIGINT) AS cm_est,
       CAST(cm_est - exact_size AS BIGINT) AS over_est,
       (cm_est >= exact_size) AS within_bound
FROM ex, est
"""


@register("sketch_join_size_estimate", _join_size_sql())
def sketch_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation by Count-Min inner product
    (sketches.count_min_join_size): the many-to-many size of
    view-events >< purchase-events on user_id, estimated from two
    4x512 counter tables sharing one hash family — min-over-rows of
    the cell-wise inner product is a CERTAIN upper bound (collision
    cross terms only add), value-checked next to the exact size. The
    pre-join costing an optimizer needs before choosing shuffle vs
    broadcast vs skew-split on 100 TB facts: sketch build is each
    side's per-key count agg (map-side partial), the estimate itself
    is constant-size work, and the counter tables merge cell-wise so
    per-partition sketches fold without co-shuffling the sides."""
    ev = load_table(spark, "events", sf_dir)
    a = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.col("user_id").alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cm_a = sketches.count_min_counters(a, _CM_DEPTH, _CM_WIDTH)
    cm_b = sketches.count_min_counters(b, _CM_DEPTH, _CM_WIDTH)
    est = sketches.count_min_join_size(cm_a, cm_b)
    exact = (
        a.alias("a")
        .join(b.alias("b"), "item")
        .agg(
            F.coalesce(F.sum(F.col("a.cnt") * F.col("b.cnt")), F.lit(0))
            .cast("long")
            .alias("exact_size")
        )
    )
    return exact.crossJoin(est).select(
        "exact_size",
        "cm_est",
        (F.col("cm_est") - F.col("exact_size")).cast("long").alias("over_est"),
        (F.col("cm_est") >= F.col("exact_size")).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# Data-quality expectations: the publish gate run before promoting a
# batch — one single-pass aggregate + referential-integrity anti-join.
# ---------------------------------------------------------------------------

_DQ_ORDERS_SQL = """
WITH wide AS (
  SELECT
    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS pk_not_null,
    CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
      AS pk_unique,
    CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS totalprice_nonneg,
    CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1990-01-01'
                    OR CAST(o_orderdate AS DATE) >= DATE '2005-01-01'
                  THEN 1 ELSE 0 END) AS BIGINT) AS orderdate_in_range,
    CAST(sum(CASE WHEN o_orderpriority IS NULL
                    OR o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
                       '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
                  THEN 1 ELSE 0 END) AS BIGINT) AS priority_in_set
  FROM orders
),
fk AS (
  SELECT CAST(count(*) AS BIGINT) AS observed
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
)
SELECT check_name, observed, (observed = 0) AS passed FROM (
  SELECT 'pk_not_null' AS check_name, pk_not_null AS observed FROM wide
  UNION ALL SELECT 'pk_unique', pk_unique FROM wide
  UNION ALL SELECT 'totalprice_nonneg', totalprice_nonneg FROM wide
  UNION ALL SELECT 'orderdate_in_range', orderdate_in_range FROM wide
  UNION ALL SELECT 'priority_in_set', priority_in_set FROM wide
  UNION ALL SELECT 'fk_customer_exists', observed FROM fk
)
"""


@register("dq_expectations_orders", _DQ_ORDERS_SQL)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality publish gate (profiling.expectations_report):
    six declarative expectations over the orders batch — primary-key
    completeness and uniqueness, non-negative totals, date-range
    sanity, priority domain membership, and customer referential
    integrity — emitted as (check, observed violation count, passed).
    The five aggregate checks fold into ONE single-pass scan (map-side
    partial); the FK probe is one left-anti join whose parent side
    broadcasts at dim scale. The Deequ-shaped verification a 100 TB
    pipeline runs before promoting a batch, persisted as the audit
    record."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    return profiling.expectations_report(
        orders,
        _orders_dq_checks(),
        fk_checks=[("fk_customer_exists", cust, "o_custkey", "c_custkey")],
    )


def _orders_dq_checks() -> list:
    """The orders expectation set, shared by the batch gate above and
    the streaming drain (queries_streaming.stream_dq_gate) so both
    enforce the identical contract."""
    date = F.to_date("o_orderdate")
    prio_domain = [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ]
    return [
        ("pk_not_null", F.sum(F.col("o_orderkey").isNull().cast("long"))),
        (
            # duplicates among NON-NULL keys (nullness is pk_not_null's
            # job; count(col) and count(DISTINCT col) both skip nulls)
            "pk_unique",
            F.count("o_orderkey") - F.countDistinct("o_orderkey"),
        ),
        (
            "totalprice_nonneg",
            F.sum(
                (
                    F.col("o_totalprice").isNull()
                    | (F.col("o_totalprice") < 0)
                ).cast("long")
            ),
        ),
        (
            "orderdate_in_range",
            F.sum(
                (
                    (date < F.lit("1990-01-01").cast("date"))
                    | (date >= F.lit("2005-01-01").cast("date"))
                ).cast("long")
            ),
        ),
        (
            "priority_in_set",
            F.sum(
                (
                    F.col("o_orderpriority").isNull()
                    | ~F.col("o_orderpriority").isin(prio_domain)
                ).cast("long")
            ),
        ),
    ]


# ---------------------------------------------------------------------------
# Benford first-digit audit: the forensic-accounting screen over a
# monetary column — observed first-significant-digit shares vs
# Benford's log10(1 + 1/d) with per-digit chi-square contributions.
# ---------------------------------------------------------------------------

_BENFORD_SQL = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                     1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
tot AS (SELECT sum(n) AS total FROM obs)
SELECT digit, n,
  round(CAST(n AS DOUBLE) / total, 6) AS observed_share,
  round(log10(1.0 + 1.0 / digit), 6) AS benford_share,
  round(total * pow(CAST(n AS DOUBLE) / total - log10(1.0 + 1.0 / digit), 2)
          / log10(1.0 + 1.0 / digit), 6) AS chi2_term
FROM obs, tot
"""


@register("dq_benford_totalprice", _BENFORD_SQL)
def dq_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals: observed
    first-significant-digit shares next to Benford's log10(1+1/d)
    expectation, with per-digit chi-square contributions — the
    forensic screen for fabricated or truncated monetary data, run as
    part of the same publish gate as dq_expectations_orders. The
    digit comes from the INTEGER PART's decimal string (floor → cast
    → substr), never from log10-of-value, whose float boundary at
    exact powers of ten is engine-dependent. One map-only projection,
    one ≤9-row aggregate, one-row total broadcast back."""
    orders = load_table(spark, "orders", sf_dir)
    digit = (
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        ).cast("long")
    )
    obs = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("total"))
    exp_share = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    obs_share = F.col("n").cast("double") / F.col("total")
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(obs_share, 6).alias("observed_share"),
        F.round(exp_share, 6).alias("benford_share"),
        F.round(
            F.col("total") * F.pow(obs_share - exp_share, 2) / exp_share, 6
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# Population stability index: distribution drift of the language mix
# between two ingest halves — the monitoring number that says the
# corpus composition moved.
# ---------------------------------------------------------------------------

_PSI_SQL = """
WITH c AS (
  SELECT lang,
    sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
    sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS nb
  FROM documents GROUP BY 1
),
t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM c)
SELECT lang,
  round(pa, 6) AS share_a,
  round(pb, 6) AS share_b,
  round((pa - pb) * ln(pa / pb), 6) AS psi_term
FROM (
  SELECT lang,
    greatest(CAST(na AS DOUBLE) / ta, 1e-6) AS pa,
    greatest(CAST(nb AS DOUBLE) / tb, 1e-6) AS pb
  FROM c, t
)
"""


@register("profile_psi_lang", _PSI_SQL)
def profile_psi_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the language mix between two
    ingest halves (doc_id parity stands in for before/after): per-lang
    (share_a, share_b, (pa−pb)·ln(pa/pb)) — the standard drift monitor
    (PSI < 0.1 stable, > 0.25 shifted) a 100 TB pipeline computes per
    ingest window to catch composition moves before they reach
    training mixes. Shares clipped at 1e-6 on both engines (the PSI
    convention for empty cells). One |langs|-row aggregate + one-row
    totals broadcast back — nothing data-sized past the scan."""
    docs = load_table(spark, "documents", sf_dir)
    c = docs.groupBy("lang").agg(
        F.sum((F.col("doc_id") % 2 == 0).cast("long")).alias("na"),
        F.sum((F.col("doc_id") % 2 == 1).cast("long")).alias("nb"),
    )
    t = c.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    pa = F.greatest(F.col("na").cast("double") / F.col("ta"), F.lit(1e-6))
    pb = F.greatest(F.col("nb").cast("double") / F.col("tb"), F.lit(1e-6))
    return c.crossJoin(F.broadcast(t)).select(
        "lang",
        F.round(pa, 6).alias("share_a"),
        F.round(pb, 6).alias("share_b"),
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
    )
