"""100× scale probe for the production dedup/text/ANN paths.

The 10× probe (scale_probe.py) established the trend; this answers the
brief's "would it survive a 100× scale-up" question with a measurement:
documents and embeddings are scaled 100× (500k docs / 200k vectors from
the sf0.1 tables) and the PRODUCTION plans are re-timed against their
sf0.1 wall time.

Corpus construction differs from the 10× probe deliberately: a corpus
that is literally 100 copies of itself makes every pairwise operator
OUTPUT-quadratic (each bucket holds 100 clones of every member → true
pairs grow 10,000×), which measures the data pathology, not the
algorithm. Here each copy is PERTURBED — a per-copy token appended to
every document, a per-copy epsilon added to every embedding's first
component — so the duplicate/near-dup rate stays constant per copy and
true output grows ~linearly, the realistic shape of a corpus growing
100×.

Verdict line: ratio ≈ data growth (≤~100, usually far less since fixed
overhead amortizes) = linear; ratio ≫ 100 = super-linear, the plan
would not survive.

Usage: python tools/scale_probe100.py [--rebuild]  (writes
SCALEPROBE100.json directly — the JVM emits gc,alloc warnings on
STDOUT under memory pressure, so stdout redirection corrupts the JSON)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from tugas_2_big_data_spark.session import get_spark  # noqa: E402
from tugas_2_big_data_spark import queries as q  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".scratch", "sf10x")
COPIES = 100
KEY_OFFSET = 10_000_000

# production plans over documents/embeddings only (the 100× build
# scales just those two tables; queries touching other tables keep
# their 10× coverage in scale_probe.py)
PROBE = [
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_simhash",
    "dedup_minhash_signature",
    "dedup_minhash_lsh_pairs",      # LSH candidates + exact verify
    "dedup_incremental_batch",
    "txt_rolling_fingerprints",
    "txt_token_stats",
    "ann_ivf_topk",                 # √N cell policy under 100× corpus
    "dedup_containment_prefix",     # one-sided prefix filter
    "txt_quality_logreg",           # map-only linear classifier
    "sample_weighted_reservoir",    # A-ES top-n heaps
    "ann_pq_topk",                  # PQ encode + ADC at 100× corpus
    "ann_ivfpq_topk",               # composed cells × codes index
    # artifact-SERVING paths: the first _materialize run builds the
    # persisted index (train + parquet write), the second serves from
    # it — min-of-2 therefore reports the steady-state serving-only
    # number a 100-TB deployment cares about (vs the build+serve-fused
    # ratio the non-prebuilt rows measure)
    "ann_ivf_topk_prebuilt",
    "ann_pq_topk_prebuilt",
    "ann_ivfpq_topk_prebuilt",
    "dedup_repeated_spans",         # k-gram hash buckets, text verify
    "dedup_repeated_spans_excise",  # in-row span cut, full corpus out
    "dedup_repeated_spans_keep_first",  # lowest-id occurrence exempt
    "dedup_incremental_near_dup",   # batch bands vs seen LSH state
    "pipeline_span_clean",          # exact dedup ∘ keep-first excision
    "ann_incremental_near_dup",     # batch buckets vs seen LSH state
    "decontaminate_spans",          # training grams vs benchmark set
    "decontaminate_excise",         # cleaned corpus w/ leaks cut
    "dedup_incremental_two_batches",            # check+merge+check loop
    "dedup_incremental_near_dup_two_batches",   # LSH loop, state evolved
    "ann_incremental_two_batches",              # bucket loop, state evolved
    "ann_ivfpq_rerank_topk",        # ADC serve + k*r exact rerank
    "dedup_incremental_bloom",      # broadcast bloom probe routes batch
    "dedup_incremental_bloom_two_batches",  # bloom loop, sketch merged
    "dedup_incremental_compacted",  # appends -> bucketed compaction -> gate
    "ann_sq_topk",                  # SQ8 bounds+encode+ADC at 100x corpus
    "ann_sq_topk_prebuilt",         # SQ8 served from bounds+codes artifact
    "txt_nb_langid",                # NB train pass + broadcast-scored test
    "ann_ivfsq_topk",               # cells x SQ8 codes, in-query build
    "ann_ivfsq_topk_prebuilt",      # served from cell-partitioned codes
    # txt_bm25_topk is NOT probed: the 100x corpus suffixes every word
    # with a per-copy tag, so the fixed query terms match nothing and
    # the measurement would time an empty result (rows 15 -> 0)
    "emb_covariance",               # in-row d(d+1)/2 explode, zero joins
    "emb_centroid_drift",           # bounded (label x half x dim) agg
    "txt_bigram_perplexity",        # bigram LM: 2 model aggs + stream joins
    "txt_oov_rate",                 # topk vocab broadcast, map-side score
    "curate_near_dup_keep_best",    # LSH+verify pairs -> domination anti
    "txt_gopher_ngrams",            # in-row n-gram char fracs, map-only
    "txt_quality_gate",             # composite gate, zero exchanges
    "txt_postings",                 # posexplode + one (word,doc) agg
    "graph_pagerank",               # 5 fixed iters over near-dup edges
    "graph_khop_reach",             # 3-hop frontier expansion
    "emb_top_eigen",                # corpus pass + sketch-sized matvecs
    "mix_upsample_epochs",          # broadcast factors + posexplode
    "split_leakage_check",          # near-dup pairs x broadcast splits
    "txt_vocab_growth",             # explode + (gram) agg, 10-row window
    "split_grouped_leakage",        # component closure + grouped split
    "txt_bpe_encode",               # trained-merge replay, map-only
    "graph_component_representatives",  # pagerank + closure + window
    "curate_near_dup_keep_central",  # reps -> corpus anti-join
    "txt_bpe_fertility",            # encode + |langs|-row agg
    "mix_token_budget",             # one lang-keyed window + filter
    "emb_standardized_norms",       # d-row stats broadcast, in-row z
    # txt_bm25_from_postings is NOT probed for the same reason as
    # txt_bm25_topk: the 100x corpus's per-copy word suffixes make the
    # fixed query terms match nothing (rows 15 -> 0, times an empty
    # serve). Its scale story is the pushed term filter, plan-pinned.
    "pack_shards_bpe",              # encode + lang-keyed pack window
    # txt_bm25_stale_drift shares the bm25 exclusion (fixed query
    # terms match nothing on the suffixed 100x corpus)
    "graph_component_density",      # pair-component join + 2 aggs
    # round-8 session additions
    "txt_ppl_band_filter",          # percentile reduce over LM scores
    "ann_kmeans_health",            # centroid broadcast + k-row agg
    "emb_hard_negatives",           # broadcast queries, 2 argmax windows
    "profile_psi_lang",             # |langs|-row agg + one-row totals
    "txt_source_kl",                # tokenize + (source,word) agg + joins
    "txt_langid_confusion",         # broadcast votes + (true,pred) agg
]

# Zipfian-vocabulary corpus variant: the prefix-filter dedups claim
# good selectivity on heavy-tailed real text and poor on the
# small-vocabulary synthetic corpus; the main probe only measured the
# latter. These two run on BOTH corpus shapes.
ZIPF_PROBE = [
    "dedup_ngram_jaccard_prefix",
    "dedup_containment_prefix",
]
# Boilerplate-heavy corpus variant: every document carries the SAME
# trailing sentence (one hot k-gram in ~every doc — the cookie-banner /
# terms-of-service shape real crawls have). The span family's candidate
# rejoin inherits the hot gram's full occurrence list and the verify
# groupBy lands that gram's every occurrence on one key — this probes
# that skew shape (the main 100x corpus has no corpus-wide hot gram).
# Map-side partial min/max aggregation and the linear (occurrences x 1)
# keep-first join are the mechanisms that should keep it linear.
BOILER_PROBE = [
    "dedup_repeated_spans",
    "dedup_repeated_spans_keep_first",
]
BOILER_SMALL = os.path.join(REPO, ".scratch", "boiler_small")
BOILER_BIG = os.path.join(REPO, ".scratch", "boiler_big")
BOILER_SUFFIX = (
    " the standard terms of service apply to all content on this site"
)
ZIPF_SMALL = os.path.join(REPO, ".scratch", "zipf_small")
ZIPF_BIG = os.path.join(REPO, ".scratch", "zipf_big")

# 100x relational corpus (VERDICT r8 #5): the round-8 audit batch runs
# over customer/orders/lineitem/part/events, which the documents-only
# 100x build does not scale. Keys shift per copy by the PARENT key's
# max value (not a fixed 10M stride): dense key spaces stay dense —
# rec_negative_samples' hash%n+1 draw requires contiguous partkeys
# (ADVICE r8: a band-sparse probe build makes most drawn negatives
# phantom keys and the positives anti-join vacuous, so the probe would
# time the wrong workload) — and FK families shift together so joins
# stay consistent within each copy.
TPCH_BIG = os.path.join(REPO, ".scratch", "tpch100")
TPCH_COPIES = 100
# key families: every column in a family shifts by the family's
# max(parent key) per copy
TPCH_FAMILIES: dict[str, list[tuple[str, str]]] = {
    # family anchor (table, column) -> members [(table, column)]
    "customer.c_custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orders.o_orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "part.p_partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "supplier.s_suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "events.event_id": [("events", "event_id")],
    "events.user_id": [("events", "user_id")],
}
TPCH_TABLES = ["customer", "supplier", "part", "orders", "lineitem", "events"]
TPCH_COPY_AS_IS = ["region", "nation", "documents", "embeddings"]
TPCH_PROBE = [
    "er_match_pairs",               # blocked fuzzy match, never all-pairs
    "er_survivorship",              # one union + one cluster-key agg
    "er_salted_candidates",         # skew-salted blocking, r9 addition
    "dq_expectations_orders",       # one-pass gate + FK anti-join
    "dq_benford_totalprice",        # map-only digit projection
    "layout_zorder_vs_linear",      # map-only morton + bounded buckets
    "sketch_join_size_estimate",    # per-key aggs + constant sketch work
    "rec_negative_samples",         # per-user draws + one anti-join
    # streaming drains run through CUSTOM thunks (below): the ingest
    # batch files are PRE-STAGED outside the timed region — the
    # registered queries' per-batch coalesce(1) single-file writes are
    # arrival simulation, and at the 100x tier they dominated the row
    # (r9's 16.7x measured the harness, not the gate plan — VERDICT
    # r9 #4). What stays timed is the drain itself: per-batch fold
    # plans, state writes (durable twins), and the final assembly.
    "stream_dq_gate",               # streaming fold of the DQ gate
    "stream_dq_gate_durable",       # + batch-keyed persisted counters
    "stream_er_match_durable",      # crash-safe ER drain, r9 addition
]
# documents-corpus streaming probe (r9 addition): the evolving
# near-dup drain's durable twin — staged like the TPCH drains
DOCS_STREAM_PROBE = ["stream_incremental_two_batches_durable"]
ZIPF_VOCAB = 50_000
ZIPF_WORDS = 120
ZIPF_SMALL_DOCS = 500   # ≈ the sf0.1 documents row count
ZIPF_FACTOR = 100


def build_tpch100(spark, dst: str = TPCH_BIG) -> None:
    """100x relational corpus with DENSE per-family key shifts (see
    TPCH_FAMILIES note). customer.c_name is rewritten from the shifted
    key so the ER registry keeps one name per entity — 100 copies of
    an identical name would make every block quadratic, a corpus
    artifact, not an operator property (same rationale as the 10x
    build)."""
    os.makedirs(dst, exist_ok=True)
    for t in TPCH_COPY_AS_IS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
    # per-family offsets = max(anchor key) in the base corpus
    offsets: dict[tuple[str, str], int] = {}
    for anchor, members in TPCH_FAMILIES.items():
        at, ac = anchor.split(".")
        m = (
            spark.read.parquet(f"{SRC}/{at}.parquet")
            .agg(F.max(ac))
            .collect()[0][0]
        )
        for member in members:
            offsets[member] = int(m)
    for t in TPCH_TABLES:
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        shifted_cols = [
            (col, off) for (tt, col), off in offsets.items() if tt == t
        ]
        parts = []
        for c in range(TPCH_COPIES):
            df = base
            for col, off in shifted_cols:
                df = df.withColumn(col, F.col(col) + F.lit(c * off))
            if t == "customer":
                df = df.withColumn(
                    "c_name",
                    F.concat(
                        F.lit("Customer#"),
                        F.lpad(F.col("c_custkey").cast("string"), 9, "0"),
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(64).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"  tpch100 {t} written", file=sys.stderr)


def build_zipf(spark, dst: str, n_docs: int) -> None:
    """Deterministic Zipf(≈1)-vocabulary corpus: every token is drawn
    by inverse-CDF log-uniform sampling (rank = floor(V^u), pdf ∝ 1/r)
    from a V=50k vocabulary, seeded by (doc_id, position) md5 — rerun-
    stable, no RNG. Every 10th doc gets an exact-duplicate twin
    (doc_id + 500_000), so the true-pair rate is constant and output
    grows linearly with corpus size, isolating the prefix filter's
    candidate-pruning behavior on a heavy-tailed token distribution.

    doc_ids are SPARSE (i·1_000_000; twins ≡ 500_000 mod 1e6): the
    probed queries run through `corpus()`, which injects +10_000 and
    +100_000 copy ids — dense 1..N ids at the 100× tier would collide
    with those offsets (~N/7 doc_ids appearing twice with different
    texts), corrupting exactly the measurement this corpus exists to
    make. With the sparse layout every id class (base ≡0, twin
    ≡500_000, corpus() copies ≡10_000/100_000/510_000/600_000 mod 1e6)
    is disjoint."""
    os.makedirs(dst, exist_ok=True)
    base = spark.range(1, n_docs + 1).select(
        (F.col("id") * 1_000_000).alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(ZIPF_WORDS)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.floor(
                        F.pow(
                            F.lit(float(ZIPF_VOCAB)),
                            (
                                F.conv(
                                    F.substring(
                                        F.md5(
                                            F.concat_ws(
                                                ":",
                                                F.col("id").cast("string"),
                                                i.cast("string"),
                                                F.lit("zipf"),
                                            )
                                        ),
                                        1,
                                        6,
                                    ),
                                    16,
                                    10,
                                ).cast("double")
                                + F.lit(0.5)
                            )
                            / F.lit(16777216.0),
                        )
                    ).cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    )
    twins = base.filter(F.col("doc_id") % 10_000_000 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(500_000)
    )
    docs = base.unionByName(twins).select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("zipf").alias("source"),
        F.length("text").cast("int").alias("n_chars"),
    )
    docs.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )


def build_boiler(spark, src_dir: str, dst: str) -> None:
    """Suffix every document of an existing probe corpus with the same
    boilerplate sentence (ids and everything else unchanged)."""
    os.makedirs(dst, exist_ok=True)
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(BOILER_SUFFIX))
    ).withColumn("n_chars", F.length("text").cast("int")).repartition(
        32
    ).write.mode("overwrite").parquet(f"{dst}/documents.parquet")


def build(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    doc_parts, emb_parts = [], []
    for c in range(COPIES):
        tag = f"q{c}"
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(c * KEY_OFFSET)).alias("doc_id"),
                # suffix EVERY word with the copy tag: token count and
                # intra-copy dup/near-dup structure are preserved
                # exactly (all shingles transform identically within a
                # copy), while across copies every shingle differs —
                # cross-copy Jaccard ~0, so true pairs grow linearly
                # with the copies (a single appended token left
                # cross-copy Jaccard ≈ (S−2)/(S+2) > any threshold and
                # made the output quadratic again)
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
                    lambda x, i: F.when(i == 0, x + F.lit(c * 1e-4)).otherwise(x),
                )
                # keep the catalog schema: float, not the promoted double
                .cast("array<float>")
                .alias("embedding"),
                "label",
            )
        )
    for name, parts in (("documents", doc_parts), ("embeddings", emb_parts)):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )


# ---------------------------------------------------------------------------
# Streaming-drain probes (VERDICT r9 #4/#8): the registered streaming
# queries write their own ingest batch files with per-batch coalesce(1)
# — harness arrival simulation that dominated stream_dq_gate's r9 row
# at the 100x tier. These thunks PRE-STAGE the batch files once per
# corpus (untimed) and give every timed invocation a FRESH checkpoint/
# state dir, so the measurement is the drain: per-batch fold plans,
# batch-keyed state writes (durable twins), final assembly.
# ---------------------------------------------------------------------------

_STAGED: dict[tuple[str, str], str] = {}


def _stage(kind: str, sf_dir: str, spark) -> str:
    key = (kind, sf_dir)
    if key in _STAGED:
        return _STAGED[key]
    import tempfile

    from tugas_2_big_data_spark import queries_streaming as qs
    from tugas_2_big_data_spark.streaming import events as se
    from tugas_2_big_data_spark.sources.catalog import load_table

    work = tempfile.mkdtemp(prefix=f"probe100_{kind}_")
    if kind == "dq":
        orders = load_table(spark, "orders", sf_dir)
        se.write_ingest_batches(
            [
                orders.filter(F.col("o_orderkey") % 2 == 0),
                orders.filter(F.col("o_orderkey") % 2 == 1),
            ],
            f"{work}/batches",
        )
    elif kind == "er":
        dirty = qs._er_stream_dirty(spark, sf_dir)
        se.write_ingest_batches(
            [
                dirty.filter(F.col("d_id") % 2 == 0),
                dirty.filter(F.col("d_id") % 2 == 1),
            ],
            f"{work}/batches",
        )
    elif kind == "incr":
        b1, b2, _, _ = qs._evolving_two_batch_fixture(spark, sf_dir)
        se.write_ingest_batches([b1, b2], f"{work}/batches")
    else:
        raise ValueError(kind)
    print(f"  staged {kind} batches for {sf_dir}", file=sys.stderr)
    _STAGED[key] = work
    return work


def _probe_stream_dq(durable: bool):
    def fn(spark, sf_dir):
        import tempfile

        from tugas_2_big_data_spark.queries_analytics import (
            _orders_dq_checks,
        )
        from tugas_2_big_data_spark.streaming import events as se
        from tugas_2_big_data_spark.sources.catalog import load_table

        work = _stage("dq", sf_dir, spark)
        run = tempfile.mkdtemp(prefix="probe100_dq_run_")
        kw = {"state_dir": f"{run}/state"} if durable else {}
        return se.run_streaming_dq(
            spark,
            f"{work}/batches",
            f"{run}/ckpt",
            load_table(spark, "customer", sf_dir),
            _orders_dq_checks(),
            **kw,
        )

    return fn


def _probe_stream_er_durable(spark, sf_dir):
    import tempfile

    from tugas_2_big_data_spark import queries_streaming as qs
    from tugas_2_big_data_spark.streaming import events as se

    work = _stage("er", sf_dir, spark)
    run = tempfile.mkdtemp(prefix="probe100_er_run_")
    return se.run_streaming_er(
        spark,
        f"{work}/batches",
        f"{run}/ckpt",
        qs._er_stream_base(spark, sf_dir),
        state_dir=f"{run}/state",
    )


def _probe_incr_durable(spark, sf_dir):
    import tempfile

    from tugas_2_big_data_spark import queries_streaming as qs
    from tugas_2_big_data_spark.streaming import events as se

    work = _stage("incr", sf_dir, spark)
    # the corpus-state bootstrap (shingle sets + band keys of the full
    # corpus) STAYS inside the timed region — it is distributed Spark
    # work a production loop performs to open its state, unlike the
    # single-file arrival simulation
    _, _, seen_bands, seen_sets = qs._evolving_two_batch_fixture(
        spark, sf_dir
    )
    run = tempfile.mkdtemp(prefix="probe100_incr_run_")
    return se.run_evolving_near_dup(
        spark,
        f"{work}/batches",
        seen_bands,
        seen_sets,
        checkpoint_dir=f"{run}/ckpt",
        state_dir=f"{run}/state",
    )


# name -> (stage kinds to pre-stage untimed, probe callable)
CUSTOM_PROBES = {
    "stream_dq_gate": (("dq",), _probe_stream_dq(durable=False)),
    "stream_dq_gate_durable": (("dq",), _probe_stream_dq(durable=True)),
    "stream_er_match_durable": (("er",), _probe_stream_er_durable),
    "stream_incremental_two_batches_durable": (
        ("incr",),
        _probe_incr_durable,
    ),
}


def _materialize(mk) -> tuple[int, float]:
    # count + full-column hash in ONE aggregate: the row count rides the
    # timed job instead of a third full recomputation of the plan.
    # mk is a THUNK (query constructor), re-invoked inside the timed
    # region: iterative operators (pagerank, power iteration, k-hop)
    # run their per-iteration work EAGERLY via localCheckpoint at
    # construction time, so timing only a prebuilt DataFrame would
    # exclude the actual computation (seen live: pagerank measured
    # 0.09 s while its iterations ran untimed).
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

    t = min(run(), run())
    return n, t


def main() -> None:
    only = None
    if "--only" in sys.argv:  # probe a subset, merge into existing JSON
        only = sys.argv[sys.argv.index("--only") + 1]
    pats = only.split(",") if only is not None else None

    def _want(n: str) -> bool:
        return pats is None or any(p in n for p in pats)

    # One JVM runs ~30 queries at the 100x tier in sequence; the
    # materialize=True families localCheckpoint corpus-sized token/gram
    # relations (MEMORY_AND_DISK) and the blocks are only unpersisted
    # after driver GC drops the RDD refs. The 16g default heap died at
    # the span queries (executor threads OOMed, blockmgr torn down
    # mid-probe); give the probe headroom and nudge GC between queries
    # so the ContextCleaner can actually free prior queries' blocks.
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(app_name="scale_probe100")
    if not os.path.exists(f"{DST}/documents.parquet") or "--rebuild" in sys.argv:
        print("building 100x corpus ...", file=sys.stderr)
        build(spark)
    reg = q.queries()
    results = {}
    for name in [n for n in PROBE if _want(n)]:
        fn = reg[name]
        # per-query isolation: one failing plan (OOM, broadcast build)
        # records an error row instead of losing the whole probe run
        try:
            n_small, t_small = _materialize(lambda: fn(spark, SRC))
            n_big, t_big = _materialize(lambda: fn(spark, DST))
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).split("\n")[0][:200]
            results[name] = {"error": msg}
            print(f"{name}: ERROR {msg}", file=sys.stderr)
            continue
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        results[name] = {
            "t_base": round(t_small, 3),
            "t_100x": round(t_big, 3),
            "ratio": ratio,
            "rows_base": n_small,
            "rows_100x": n_big,
        }
        print(
            f"{name}: {t_small:.2f}s -> {t_big:.2f}s (x{ratio}) "
            f"rows {n_small} -> {n_big}",
            file=sys.stderr,
        )
        gc.collect()
    if (
        not os.path.exists(f"{ZIPF_BIG}/documents.parquet")
        or "--rebuild" in sys.argv
    ):
        print("building zipf corpora ...", file=sys.stderr)
        build_zipf(spark, ZIPF_SMALL, ZIPF_SMALL_DOCS)
        build_zipf(spark, ZIPF_BIG, ZIPF_SMALL_DOCS * ZIPF_FACTOR)
    for name in [n for n in ZIPF_PROBE if _want(n)]:
        fn = reg[name]
        try:
            n_small, t_small = _materialize(lambda: fn(spark, ZIPF_SMALL))
            n_big, t_big = _materialize(lambda: fn(spark, ZIPF_BIG))
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).split("\n")[0][:200]
            results[f"{name}@zipf"] = {"error": msg}
            print(f"{name}@zipf: ERROR {msg}", file=sys.stderr)
            continue
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        results[f"{name}@zipf"] = {
            "t_base": round(t_small, 3),
            "t_100x": round(t_big, 3),
            "ratio": ratio,
            "rows_base": n_small,
            "rows_100x": n_big,
        }
        print(
            f"{name}@zipf: {t_small:.2f}s -> {t_big:.2f}s (x{ratio}) "
            f"rows {n_small} -> {n_big}",
            file=sys.stderr,
        )
        gc.collect()
    if (
        not os.path.exists(f"{BOILER_BIG}/documents.parquet")
        or "--rebuild" in sys.argv
    ):
        print("building boilerplate corpora ...", file=sys.stderr)
        build_boiler(spark, SRC, BOILER_SMALL)
        build_boiler(spark, DST, BOILER_BIG)
    for name in [n for n in BOILER_PROBE if _want(n)]:
        fn = reg[name]
        try:
            n_small, t_small = _materialize(lambda: fn(spark, BOILER_SMALL))
            n_big, t_big = _materialize(lambda: fn(spark, BOILER_BIG))
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).split("\n")[0][:200]
            results[f"{name}@boiler"] = {"error": msg}
            print(f"{name}@boiler: ERROR {msg}", file=sys.stderr)
            continue
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        results[f"{name}@boiler"] = {
            "t_base": round(t_small, 3),
            "t_100x": round(t_big, 3),
            "ratio": ratio,
            "rows_base": n_small,
            "rows_100x": n_big,
        }
        print(
            f"{name}@boiler: {t_small:.2f}s -> {t_big:.2f}s (x{ratio}) "
            f"rows {n_small} -> {n_big}",
            file=sys.stderr,
        )
        gc.collect()
    if any(_want(n) for n in TPCH_PROBE):
        if (
            not os.path.exists(f"{TPCH_BIG}/lineitem.parquet")
            or "--rebuild" in sys.argv
        ):
            print("building tpch100 corpus ...", file=sys.stderr)
            build_tpch100(spark)
        for name in [n for n in TPCH_PROBE if _want(n)]:
            if name in CUSTOM_PROBES:
                kinds, fn = CUSTOM_PROBES[name]
                for kind in kinds:  # stage OUTSIDE the timed region
                    _stage(kind, SRC, spark)
                    _stage(kind, TPCH_BIG, spark)
            else:
                fn = reg[name]
            try:
                n_small, t_small = _materialize(lambda: fn(spark, SRC))
                n_big, t_big = _materialize(lambda: fn(spark, TPCH_BIG))
            except Exception as exc:  # noqa: BLE001
                msg = str(exc).split("\n")[0][:200]
                results[name] = {"error": msg}
                print(f"{name}: ERROR {msg}", file=sys.stderr)
                continue
            ratio = round(t_big / t_small, 2) if t_small > 0 else None
            results[name] = {
                "t_base": round(t_small, 3),
                "t_100x": round(t_big, 3),
                "ratio": ratio,
                "rows_base": n_small,
                "rows_100x": n_big,
            }
            print(
                f"{name}: {t_small:.2f}s -> {t_big:.2f}s (x{ratio}) "
                f"rows {n_small} -> {n_big}",
                file=sys.stderr,
            )
            gc.collect()
    for name in [n for n in DOCS_STREAM_PROBE if _want(n)]:
        kinds, fn = CUSTOM_PROBES[name]
        for kind in kinds:  # stage OUTSIDE the timed region
            _stage(kind, SRC, spark)
            _stage(kind, DST, spark)
        try:
            n_small, t_small = _materialize(lambda: fn(spark, SRC))
            n_big, t_big = _materialize(lambda: fn(spark, DST))
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).split("\n")[0][:200]
            results[name] = {"error": msg}
            print(f"{name}: ERROR {msg}", file=sys.stderr)
            continue
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        results[name] = {
            "t_base": round(t_small, 3),
            "t_100x": round(t_big, 3),
            "ratio": ratio,
            "rows_base": n_small,
            "rows_100x": n_big,
        }
        print(
            f"{name}: {t_small:.2f}s -> {t_big:.2f}s (x{ratio}) "
            f"rows {n_small} -> {n_big}",
            file=sys.stderr,
        )
        gc.collect()
    out = os.path.join(REPO, "SCALEPROBE100.json")
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
