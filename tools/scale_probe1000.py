"""1000× scale probe: the dedup/text/ANN production paths at 5M docs /
2M vectors, measured as the 100×→1000× STEP.

The 100× probe (scale_probe100.py) answered "would it survive 100×";
this one measures one more decade on the highest-traffic families so
the extrapolation to a 100 TB corpus rests on two measured steps, not
one. The corpus is the 100× corpus replicated 10× with a SECOND-level
per-copy perturbation (same construction discipline: every word gets a
copy tag so intra-copy dup/near-dup structure is preserved exactly and
cross-copy Jaccard ~0 — true pairs grow linearly, the realistic shape;
embeddings get a per-copy epsilon on component 0 and shifted ids).

Verdict line per row: ratio vs the 100× tier ≈ data growth (≤~10) =
linear; ≫10 = super-linear, the plan would not survive the next
decade. Families probed are the per-document production paths (exact/
fingerprint dedup, minhash signatures, banded LSH pairs, token stats,
the composite quality gate, PQ ANN serve) plus — round 11 — the
remaining heavy families: graph (pagerank, component reps), the
embedding eigen pass, skew-salted ER blocking (over a 1000× customer
registry), and the durable evolving-dedup stream drain (batch files
pre-staged untimed, same policy as scale_probe100). Index-BUILD-fused
and output-quadratic-by-construction families keep their 100×
coverage — their scaling mechanism doesn't change at another decade,
only the constant.

Usage: python tools/scale_probe1000.py [--rebuild] [--only a,b]
(writes SCALEPROBE1000.json; stdout carries JVM noise, keep it off the
artifact path)
"""

from __future__ import annotations

import gc
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from tugas_2_big_data_spark.session import get_spark  # noqa: E402
from tugas_2_big_data_spark import queries as q  # noqa: E402

# tiers: the 100× corpus (built by scale_probe100) is the BASE here
BASE = os.path.join(REPO, ".scratch", "sf10x")
DST = os.path.join(REPO, ".scratch", "sf1000x")
COPIES = 10
# DST doc_ids from the 100x build are < 100 * 10_000_000 = 1e9;
# a 1e10 stride keeps every second-level copy's id space disjoint
KEY_OFFSET = 10_000_000_000

PROBE = [
    "dedup_exact",             # hash-groupBy, the workhorse
    "dedup_fingerprint",       # normalized-hash variant
    "dedup_minhash_signature", # k hash passes per doc, map-only
    "dedup_minhash_lsh_pairs", # banded LSH -> candidates -> verify
    "txt_token_stats",         # regex-count projection
    "txt_quality_gate",        # composite gate, zero exchanges
    "ann_pq_topk",             # PQ encode + ADC serve at 2M vectors
    "dedup_simhash",           # 16-bit contrib agg + bucket pairs
    "dedup_incremental_near_dup",       # batch bands vs seen state
    "dedup_repeated_spans_keep_first",  # span family, merge rejoin
    # artifact-SERVING paths: run min-of-2 even at the 1000x tier —
    # the first invocation builds + persists the index (train +
    # assignment pass + parquet write), the second serves from it, so
    # the min is the steady-state serving number a deployment cares
    # about (same policy as scale_probe100)
    "ann_ivf_topk_prebuilt",
    "ann_ivfpq_topk_prebuilt",
    # round-11 widening (VERDICT r10 #3): the remaining heavy families
    "graph_pagerank",                    # 5 fixed iters over LSH edges
    "graph_component_representatives",   # pointer-jumping CC + window
    "graph_component_density",           # pair-component join + aggs
    "emb_top_eigen",                     # corpus pass + power iters
    "er_salted_candidates",              # skew-salted blocking (1000x
    #                                      customer registry, see below)
    "stream_incremental_two_batches_durable",  # durable evolving drain
    "stream_er_match_durable",           # crash-safe ER drain (customer
    #                                      registry only — stageable)
]
MIN_OF_2_AT_1000X = {"ann_ivf_topk_prebuilt", "ann_ivfpq_topk_prebuilt"}

# er_salted_candidates runs over the RELATIONAL corpus: its 100x tier
# is the tpch100 build (scale_probe100), and the 1000x tier replicates
# ONLY the customer registry 10x (15M customers) — the other five
# tables would cost ~600M lineitems for no probed query. Key shifts
# follow the tpch100 discipline: shift by max(c_custkey) per copy so
# the key space stays dense, and c_name is rewritten from the shifted
# key so the registry keeps one name per entity (identical names would
# make every block quadratic — a corpus artifact, not an operator
# property).
TPCH_BASE = os.path.join(REPO, ".scratch", "tpch100")
RELATIONAL_BASE_BY_QUERY = {
    "er_salted_candidates": TPCH_BASE,
    "stream_er_match_durable": TPCH_BASE,
}


def build_customer_1000x(spark) -> None:
    cust = spark.read.parquet(f"{TPCH_BASE}/customer.parquet")
    off = int(cust.agg(F.max("c_custkey")).collect()[0][0])
    parts = []
    for c in range(COPIES):
        parts.append(
            cust.withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(c * off)
            ).withColumn(
                "c_name",
                F.concat(
                    F.lit("Customer#"),
                    F.lpad(F.col("c_custkey").cast("string"), 9, "0"),
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(
        f"{DST}/customer.parquet"
    )
    print("  sf1000x customer written", file=sys.stderr)


def build(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    doc_parts, emb_parts = [], []
    for c in range(COPIES):
        tag = f"r{c}"
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(c * KEY_OFFSET)).alias("doc_id"),
                # second-level per-word tag: intra-copy shingle
                # structure identical, cross-copy Jaccard ~0 (same
                # rationale as the 100x build)
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1{tag}").alias(
                    "text"
                ),
                "lang",
                "source",
                "n_chars",
            )
        )
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(c * KEY_OFFSET)).alias("vec_id"),
                F.transform(
                    F.col("embedding"),
                    lambda x, i: F.when(i == 0, x + F.lit(c * 1e-3)).otherwise(x),
                )
                .cast("array<float>")
                .alias("embedding"),
                "label",
            )
        )
    for name, parts in (("documents", doc_parts), ("embeddings", emb_parts)):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(128).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )
        print(f"  sf1000x {name} written", file=sys.stderr)


# Streaming-drain probe (same policy as scale_probe100): the ingest
# batch files are PRE-STAGED outside the timed region — the registered
# query's per-batch coalesce(1) single-file writes are arrival
# simulation, not drain work. The corpus-state bootstrap (shingle sets
# + band keys of the full seen corpus) STAYS timed: it is distributed
# Spark work a production loop performs to open its state.
_STAGED: dict[str, str] = {}


def _stage_incr(spark, sf_dir: str) -> str:
    if sf_dir in _STAGED:
        return _STAGED[sf_dir]
    import tempfile

    from tugas_2_big_data_spark import queries_streaming as qs
    from tugas_2_big_data_spark.streaming import events as se

    work = tempfile.mkdtemp(prefix="probe1000_incr_")
    b1, b2, _, _ = qs._evolving_two_batch_fixture(spark, sf_dir)
    se.write_ingest_batches([b1, b2], f"{work}/batches")
    print(f"  staged incr batches for {sf_dir}", file=sys.stderr)
    _STAGED[sf_dir] = work
    return work


def _probe_incr_durable(spark, sf_dir):
    import tempfile

    from tugas_2_big_data_spark import queries_streaming as qs
    from tugas_2_big_data_spark.streaming import events as se

    work = _stage_incr(spark, sf_dir)
    _, _, seen_bands, seen_sets = qs._evolving_two_batch_fixture(
        spark, sf_dir
    )
    run = tempfile.mkdtemp(prefix="probe1000_incr_run_")
    return se.run_evolving_near_dup(
        spark,
        f"{work}/batches",
        seen_bands,
        seen_sets,
        checkpoint_dir=f"{run}/ckpt",
        state_dir=f"{run}/state",
    )


def _stage_er(spark, sf_dir: str) -> str:
    key = f"er:{sf_dir}"
    if key in _STAGED:
        return _STAGED[key]
    import tempfile

    from tugas_2_big_data_spark import queries_streaming as qs
    from tugas_2_big_data_spark.streaming import events as se

    work = tempfile.mkdtemp(prefix="probe1000_er_")
    dirty = qs._er_stream_dirty(spark, sf_dir)
    se.write_ingest_batches(
        [
            dirty.filter(F.col("d_id") % 2 == 0),
            dirty.filter(F.col("d_id") % 2 == 1),
        ],
        f"{work}/batches",
    )
    print(f"  staged er batches for {sf_dir}", file=sys.stderr)
    _STAGED[key] = work
    return work


def _probe_stream_er_durable(spark, sf_dir):
    import tempfile

    from tugas_2_big_data_spark import queries_streaming as qs
    from tugas_2_big_data_spark.streaming import events as se

    work = _stage_er(spark, sf_dir)
    run = tempfile.mkdtemp(prefix="probe1000_er_run_")
    return se.run_streaming_er(
        spark,
        f"{work}/batches",
        f"{run}/ckpt",
        qs._er_stream_base(spark, sf_dir),
        state_dir=f"{run}/state",
    )


CUSTOM_PROBES = {
    "stream_incremental_two_batches_durable": _probe_incr_durable,
    "stream_er_match_durable": _probe_stream_er_durable,
}


def _materialize(mk, runs: int = 2):
    """count + full-column hash in one aggregate; min-of-`runs` (the
    1000× tier uses runs=1 — the JVM and codegen are warm from the
    100×-tier run of the SAME plan immediately before, and a second
    multi-minute run buys noise reduction this decade-step comparison
    doesn't need)."""
    import time

    n = 0

    def run() -> float:
        nonlocal n
        t0 = time.perf_counter()
        df = mk()
        [(n, _)] = df.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])),
        ).collect()
        return time.perf_counter() - t0

    t = min(run() for _ in range(runs))
    return n, t


def main() -> None:
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    pats = only.split(",") if only is not None else None

    def _want(n: str) -> bool:
        return pats is None or any(p in n for p in pats)

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(app_name="scale_probe1000")
    if not os.path.exists(f"{BASE}/documents.parquet"):
        raise SystemExit(
            "100x corpus missing — run tools/scale_probe100.py first"
        )
    if not os.path.exists(f"{DST}/documents.parquet") or "--rebuild" in sys.argv:
        print("building 1000x corpus ...", file=sys.stderr)
        build(spark)
    wanted = [n for n in PROBE if _want(n)]
    if any(n in RELATIONAL_BASE_BY_QUERY for n in wanted):
        if not os.path.exists(f"{TPCH_BASE}/customer.parquet"):
            raise SystemExit(
                "tpch100 corpus missing — run tools/scale_probe100.py first"
            )
        if (
            not os.path.exists(f"{DST}/customer.parquet")
            or "--rebuild" in sys.argv
        ):
            print("building 1000x customer registry ...", file=sys.stderr)
            build_customer_1000x(spark)
    reg = q.queries()
    results = {}
    for name in wanted:
        fn = CUSTOM_PROBES.get(name, reg.get(name))
        base_dir = RELATIONAL_BASE_BY_QUERY.get(name, BASE)
        try:
            n_100, t_100 = _materialize(lambda: fn(spark, base_dir))
            n_1000, t_1000 = _materialize(
                lambda: fn(spark, DST),
                runs=2 if name in MIN_OF_2_AT_1000X else 1,
            )
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).split("\n")[0][:200]
            results[name] = {"error": msg}
            print(f"{name}: ERROR {msg}", file=sys.stderr)
            continue
        ratio = round(t_1000 / t_100, 2) if t_100 > 0 else None
        results[name] = {
            "t_100x": round(t_100, 3),
            "t_1000x": round(t_1000, 3),
            "step_ratio_vs_10x_data": ratio,
            "rows_100x": n_100,
            "rows_1000x": n_1000,
        }
        print(
            f"{name}: {t_100:.2f}s -> {t_1000:.2f}s (x{ratio} for 10x "
            f"data) rows {n_100} -> {n_1000}",
            file=sys.stderr,
        )
        gc.collect()
    out = os.path.join(REPO, "SCALEPROBE1000.json")
    if only is not None and os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    with open(out, "w") as f:
        json.dump(results, f)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
