"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE compact JSON line: {"metric": ..., "value": total_sec,
"unit": "sec", "queries": {name: sec}, "sf": ...}. The driver records
this per-round as BENCH_r{N}.json against BASELINE.md.

The driver captures only a bounded TAIL of stdout (round 2's 104-entry
line outgrew it and parsed as null), so the stdout line keeps "queries"
to the SLOWEST_N slowest queries — the perf-relevant ones — and the
full per-query map is written to BENCH_FULL.json next to this script
("queries_file" in the summary). "value" is still the total over ALL
benched queries.

Each query is materialized by hash-aggregating EVERY output column
(sum of xxhash64 over all columns): a bare count() would let Catalyst
prune computed projections out of the plan entirely, silently
benchmarking just the scan.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from tugas_2_big_data_spark.session import get_spark  # noqa: E402
from tugas_2_big_data_spark import queries as q  # noqa: E402

# Headline set: spine + reference-parity signature queries. Extend as
# operators land; keep total runtime < ~5 min at sf0.1.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "yf_agg_day",
    "yf_agg_month",
    "yf_multi_grain",
    "idx_flatten_ratios",
    "fin_customer_ratios",
    "win_topk_orders_per_customer",
    "win_rolling_avg",
    "win_lag_delta",
    "evt_tumbling_5min",
    "evt_asof_last_purchase",
    "evt_sessionize_30min",
    "region_nation_rollup",
    "segment_pivot",
    "customers_without_orders",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_prefix",
    "dedup_ngram_jaccard_exact_baseline",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_simhash",
    "dedup_embedding_near_dup",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_seed_topk",
    "txt_token_stats",
    "txt_quality",
    "txt_langid",
    "mm_binary_meta",
    "iqplus_summarize_stub",
    "pipeline_clean_corpus",
    "txt_tfidf_topk",
    "split_stratified",
    "pack_shards",
    "stats_quantiles_by_lang",
    "ann_kmeans_assign",
    "ann_ivf_kmeans_topk",
    "tpch_q7_volume_shipping",
    "tpch_q9_profit",
    "tpch_q13_order_distribution",
    "tpch_q17_small_qty",
    "tpch_q18_large_orders",
    "tpch_q21_sole_fault",
    "evt_range_join_30min",
    "evt_hypertable_rollup",
    "evt_gapfill_5min",
    "evt_json_props",
    "mm_frame_sample",
    "win_balance_distribution",
    "sketch_distinct_users",
    "sketch_value_quantiles",
    "txt_chunk_windows",
    "curate_top_by_source",
    "txt_normalize",
    "dedup_incremental_batch",
    "dedup_semantic_clusters",
    "iqplus_summarize_longdoc",
    "txt_contamination",
    "mix_language_budget",
    "dedup_embedding_components",
    # full batch surface — every remaining registered non-streaming
    # query. Streaming drains are excluded: their wall time measures
    # the micro-batch drain loop (processAllAvailable), not plan cost.
    "tpch_q2_min_cost",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_priority_lines",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q19_disjunctive",
    "tpch_q20_promo_suppliers",
    "tpch_q22_wealthy_inactive",
    "unpivot_lineitem_totals",
    "grouping_sets_pricing",
    "skew_salted_user_totals",
    "evt_ohlc_bars_5min",
    "evt_value_histogram",
    "evt_trend_by_type",
    "evt_mode_per_type",
    "txt_repetition",
    "txt_pii_scrub",
    "mm_resize_dims",
    "sample_weighted_by_length",
    "yf_agg_year",
    "order_priority_semijoin",
    "win_rownum_events",
    "set_ops_users",
    "distinct_user_stats",
    "region_priority_cube",
    "sql_surface_pricing",
    "dedup_minhash_signature",
    "txt_canonical_fingerprint",
    "split_hash",
    "txt_rolling_fingerprints",
    "ann_lsh_near_dup",
    "txt_unigram_logprob",
    "txt_boilerplate_sentences",
    "evt_value_zscore",
    "evt_funnel_conversion",
    "evt_retention_cohorts",
    "sample_exact_n_per_lang",
    "txt_bigram_counts",
    "txt_bpe_merges",
    "txt_hash_embed_topk",
]


# Cap on per-query entries in the stdout summary line (slowest first);
# 25 entries ≈ 700 bytes keeps the line inside the tail window.
SLOWEST_N = 25

# The slowest-25 membership is nearly static round over round, so the
# driver-archived BENCH_r{N}.json lines never showcase the other ~190
# benched queries (they ARE all timed and regression-gated via
# BENCH_FULL.json — this is about per-round artifact visibility,
# VERDICT r9 #7). Each round the stdout line therefore also carries a
# ROTATE_N-query window that walks the sorted registry, advanced by
# the round number, so successive BENCH_r artifacts cycle through the
# whole benched set.
ROTATE_N = 5


def _current_round() -> int:
    """Round number = newest driver CORRECTNESS artifact + 1 (same
    convention as tools/freeze_baseline.current_round)."""
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO_DIR, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def rotation_window(names: list[str], exclude: set[str], rnd: int) -> list[str]:
    """Deterministic per-round pick of ROTATE_N benched queries not in
    `exclude` (the slowest-N set): a window into the FULL sorted name
    list starting at an offset that advances ROTATE_N per round, with
    excluded names skipped FORWARD rather than compacted out. The
    offset must anchor to the full registry order — stable across
    runs — because the exclude set is the run-dependent slowest-N: the
    compacted-pool form shifted the window with every exclude-set
    change, and round 11 re-picked 4 of round 10's names instead of
    rotating on."""
    ordered = sorted(names)
    if not ordered:
        return []
    offset = (rnd * ROTATE_N) % len(ordered)
    rotated = ordered[offset:] + ordered[:offset]
    return [n for n in rotated if n not in exclude][:ROTATE_N]


def _materialize(df) -> int:
    """Force FULL computation of every output column without collecting
    rows to the driver: COLLECT the value of sum(xxhash64(all columns)).

    The value must be collected, not counted: `select(sum(hash)).count()`
    lets Catalyst prune the unused sum — and transitively every computed
    column — down to `ReadSchema: struct<>` (an empty-schema scan), so
    map-only queries time as almost nothing. Rounds 1-2 measured that
    pruned form; the round-3 totals are larger because they are the
    first HONEST ones for projection-heavy queries, not because the
    engine got slower."""
    from pyspark.sql import functions as F

    [(h,)] = df.select(
        F.sum(F.xxhash64(*[F.col(c) for c in df.columns]))
    ).collect()
    return h


def _calibrate(spark) -> float:
    """Fixed synthetic calibration job — hash-agg over a generated
    range, no IO, no shuffle — timed as a pure host-throughput anchor.
    Two rounds of bench triage established that this box drifts a
    uniform 1.3-1.4x with concurrent load; normalizing per-query
    regression checks by (calibration_now / calibration_baseline)
    makes the flags fire on PLAN regressions, not host mood. min-of-2
    after one warmup, same steady-state policy as the queries."""
    from pyspark.sql import functions as F

    def run() -> float:
        t0 = time.perf_counter()
        spark.range(0, 12_000_000_000, 1, 32).select(
            F.sum(F.xxhash64("id"))
        ).collect()
        return time.perf_counter() - t0

    run()  # warmup (codegen compile)
    return round(min(run(), run()), 3)


# interleaved host sampling: a START/END-only calibration under-corrects
# BURSTY co-tenant load (round 5's end-of-round driver run tripped 10
# false flags on plans the same code measured at ~1x hours earlier).
# Every CAL_EVERY queries a SHORT calibration sample (1/8 of the anchor
# job, ~0.2 s) is taken, and each query's regression check normalizes by
# the host factor of its NEAREST sample instead of the run-wide mean.
CAL_EVERY = 15
_SHORT_CAL_ROWS = 1_500_000_000


def _calibrate_short(spark) -> float:
    """The interleaved sample: same job shape as `_calibrate` at 1/8
    the rows. min-of-2 (the anchor's warmup already compiled the shape;
    a single sample on a 0.2 s job is itself noise)."""
    from pyspark.sql import functions as F

    def run() -> float:
        t0 = time.perf_counter()
        spark.range(0, _SHORT_CAL_ROWS, 1, 32).select(
            F.sum(F.xxhash64("id"))
        ).collect()
        return time.perf_counter() - t0

    return round(min(run(), run()), 3)


def host_ratio(
    sample_s: float | None,
    sample0_s: float | None,
    cal_start: float | None,
    cal_base: float | None,
) -> float:
    """Host slowdown factor vs the frozen baseline at the moment a
    short sample was taken: (cal_start / cal_base) anchors this run's
    start to the baseline host speed via the simultaneous long+short
    pair, (sample / sample0) tracks drift SINCE start. Clamped at 1.0 —
    a faster-than-baseline host never tightens the bar (same policy as
    the round-5 run-wide ratio). Degrades to the anchor-only ratio when
    samples are missing, and to 1.0 with no baseline at all."""
    ratio = 1.0
    if cal_base and cal_start:
        ratio = cal_start / cal_base
        if sample0_s and sample_s:
            ratio *= sample_s / sample0_s
    return max(ratio, 1.0)


def is_flagged(t: float, baseline_s: float, ratio: float) -> bool:
    """>1.5x beyond what the host factor explains, with a 1.0 s
    absolute MATERIALITY floor. Sub-second multi-stage queries on
    local[32] flicker by 0.4-1.4 s (page-cache/JIT state the pure-CPU
    calibration job cannot see) even on quiet hosts — measured on
    txt_char_entropy/txt_nb_langid/txt_bm25_topk with host_ratio 1.0 —
    while every REAL plan regression this harness has caught moved a
    query by multiple seconds (a lost broadcast or exchange reuse
    does not cost 0.4 s). A sub-second drift below the floor is also
    immaterial to the ~200 s total the bar defends."""
    bn = baseline_s * ratio
    return t > 1.5 * bn and t - bn > 1.0


def nearest_sample(
    samples: list[tuple[int, float]], query_idx: int
) -> float | None:
    """The short-calibration sample taken closest (by query position)
    to query_idx; None when no samples exist."""
    if not samples:
        return None
    return min(samples, key=lambda s: abs(s[0] - query_idx))[1]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")
    cal_start = _calibrate(spark)
    registry = q.queries()
    timings: dict[str, float] = {}
    names = [n for n in HEADLINE if n in registry]
    # self-extending: any registered batch query not yet listed above is
    # benched too (appended last), so a new operator can never silently
    # miss the bench. Streaming drains stay excluded — their wall time
    # measures the micro-batch drain loop, not plan cost.
    names += sorted(
        n
        for n in registry
        if n not in names and not n.startswith("stream_")
    )
    # JVM/codegen warmup on the flagship so steady-state numbers dominate
    _materialize(registry[names[0]](spark, sf_dir))
    # (query_position, short_sample_s): sample 0 anchors the short job's
    # scale to cal_start (taken back-to-back), later samples track load
    # drift through the run for the nearest-sample flag normalization.
    cal_samples: list[tuple[int, float]] = [(0, _calibrate_short(spark))]
    query_pos: dict[str, int] = {}
    for idx, name in enumerate(names):
        # two timed runs, min reported: the first run of each query pays
        # its one-time codegen compile + JIT (measured swings of 0.6 s ↔
        # 7 s on identical plans); min-of-2 reports the steady-state the
        # plan actually delivers. Total = sum of per-query minima.
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _materialize(registry[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        query_pos[name] = idx
        # progress to stderr only: stdout must stay a single JSON line
        print(f"[bench] {name}: {timings[name]:.3f}s", file=sys.stderr)
        if (idx + 1) % CAL_EVERY == 0:
            cal_samples.append((idx, _calibrate_short(spark)))
    total = round(sum(timings.values()), 3)
    sf_num = float(sf) if sf.replace(".", "").isdigit() else sf
    cal_end = _calibrate(spark)
    cal_now = round((cal_start + cal_end) / 2, 3)
    # Per-query regression gate vs the frozen round-3 honest baseline
    # (BENCH_BASELINE.json — the first run after the materializer fix,
    # so deltas against it are real slowdowns, not measurement drift).
    # The per-query bar is normalized by the host-calibration ratio
    # (this run's synthetic-anchor time / the baseline's) so uniform
    # machine drift — which tripped every flag in rounds 3-4 — no
    # longer fires; what's left is >1.5× beyond what the host explains,
    # with an absolute floor of 0.3 s (local[32] noise on sub-0.5 s
    # queries routinely exceeds 1.5× ratio-only). A query that trips
    # the bar gets ONE confirmation re-run, recorded SEPARATELY as
    # rerun_s: published timings/total stay uniform min-of-2 for every
    # query (mixing best-of-3 for flagged entries quietly improved the
    # total on any run that tripped a flag).
    regressions: dict[str, dict[str, float]] = {}
    # Relative-only drift report (ADVICE r6): the 1.0 s materiality
    # floor deliberately hides sub-second drifts from the FLAG path; a
    # genuine sub-second plan regression (e.g. a lost broadcast on a
    # small query) would otherwise be invisible. drifts_vs_baseline
    # records every >1.5x-beyond-host-ratio entry REGARDLESS of the
    # floor, flag-free, so BENCH_FULL.json diffs keep them visible.
    drifts: dict[str, dict[str, float]] = {}
    cal_base = None
    sample0 = cal_samples[0][1] if cal_samples else None
    base_path = os.path.join(REPO_DIR, "BENCH_BASELINE.json")
    try:
        with open(base_path) as f:
            baseline = json.load(f)
        base_q = baseline.get("queries", {})
        cal_base = baseline.get("calibration_s")
        if baseline.get("sf") == sf_num:
            for name, t in sorted(timings.items()):
                b = base_q.get(name)
                if b is None:
                    continue
                # the query's own moment: nearest interleaved sample
                r_then = host_ratio(
                    nearest_sample(cal_samples, query_pos[name]),
                    sample0,
                    cal_start,
                    cal_base,
                )
                if t > 1.5 * b * r_then:
                    drifts[name] = {
                        "baseline_s": b,
                        "run_s": t,
                        "host_ratio": round(r_then, 3),
                    }
                if not is_flagged(t, b, r_then):
                    continue
                # confirmation re-run with a FRESH sample taken
                # immediately before it — a burst that inflated the
                # first measurement and is still present inflates the
                # fresh sample identically, so the re-run judges the
                # plan, not the burst
                fresh = _calibrate_short(spark)
                t0 = time.perf_counter()
                _materialize(registry[name](spark, sf_dir))
                rerun = round(time.perf_counter() - t0, 3)
                r_rerun = host_ratio(fresh, sample0, cal_start, cal_base)
                if is_flagged(rerun, b, r_rerun):
                    regressions[name] = {
                        "baseline_s": b,
                        "run_s": t,
                        "rerun_s": rerun,
                        "host_ratio_run": round(r_then, 3),
                        "host_ratio_rerun": round(r_rerun, 3),
                    }
                else:
                    print(
                        f"[bench] {name}: flag cleared on re-run "
                        f"({rerun:.3f}s, host x{r_rerun:.2f})",
                        file=sys.stderr,
                    )
    except (OSError, ValueError):
        pass
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "regressions_vs_baseline": regressions,
        "drifts_vs_baseline": drifts,
        "calibration_s": cal_now,
        "calibration_start_s": cal_start,
        "calibration_end_s": cal_end,
        "calibration_baseline_s": cal_base,
        "calibration_samples": [
            {"after_query": i, "short_s": s} for i, s in cal_samples
        ],
        "sf": sf_num,
    }
    full_path = os.path.join(REPO_DIR, "BENCH_FULL.json")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    # stdout line: slowest-N queries only, so the line stays well under
    # the driver's tail-capture window (~2 KB) and always parses.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:SLOWEST_N]
    )
    rnd = _current_round()
    # rotation picks ride a SEPARATE key: folding them into 'queries'
    # (documented as the slowest-N set) would let a fast rotated query
    # read as a slowest-N member
    rotation = {
        name: timings[name]
        for name in rotation_window(list(timings), set(slowest), rnd)
    }
    summary = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "rotation_queries": rotation,
        "queries_total_count": len(timings),
        "rotation_round": rnd,
        "queries_file": "BENCH_FULL.json",
        "regressions_vs_baseline": regressions,
        "calibration_s": cal_now,
        "calibration_baseline_s": cal_base,
        "sf": sf_num,
    }
    print(json.dumps(summary, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
