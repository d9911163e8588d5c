"""State-size probe for the incremental-ingest gates: is per-batch
cost independent of how much corpus the state already covers?

The 100x corpus probe (scale_probe100.py) scales state AND batch
together; this one holds the BATCH fixed and grows only the STATE
100x, timing the check phase of all three incremental gates
(fingerprint anti-join, text LSH near-dup, embedding bucket near-dup)
against PERSISTED state artifacts:

- the state is written once as BUCKETED tables (sources/bucketing.py)
  on the join keys — fingerprints by fp, band state by (band_id, key),
  shingle sets by doc_id, embedding bucket state by bucket — so the
  per-batch join shuffles ONLY the batch into the state's bucket
  layout; the state side is never reshuffled. Proof recorded per row:
  with broadcast disabled (the plan shape a 2 TB state forces — it
  can never ride a broadcast), the bucketed-state check plans fewer
  Exchanges than the same check over a spec-less parquet read of the
  very same files. Under default settings the optimizer broadcasts
  the locally-small sides instead, which is the right LOCAL plan and
  still never reshuffles the state;
- state BUILD time is excluded: building is per-ingest-history work
  (each batch's merge is an append — see dedup.merge_fingerprint_state
  / merge_near_dup_state / similarity.merge_bucket_state), not
  per-batch-check work.

Each tier's batch is derived from that tier's copy-0 documents (same
row count, same per-doc match rate at both tiers), so state size is
the only variable. The remaining state-sized term is the bucket SCAN
of matching buckets — at 100 TB that is the piece a deployment prunes
further (key-range partitioning / bloom prefilters on top of the
bucket layout); the shuffle, the usual scale killer, is already gone.

Usage: python tools/probe_incremental_state.py [--rebuild]
(writes INCR_STATE_PROBE.json directly — JVM gc warnings corrupt
redirected stdout).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from tugas_2_big_data_spark.session import get_spark  # noqa: E402
from tugas_2_big_data_spark.operators import dedup, similarity  # noqa: E402
from tugas_2_big_data_spark.sources import bucketing  # noqa: E402
from tugas_2_big_data_spark.plans import inspect as pi  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".scratch", "sf10x")  # built by scale_probe100
STATE_DIR = os.path.join(REPO, ".scratch", "incr_state")
BUCKETS = 32


def _docs(spark, tier_dir: str):
    d = spark.read.parquet(f"{tier_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return d


def _emb(spark, tier_dir: str):
    return spark.read.parquet(f"{tier_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _copy0(df, id_col: str):
    """The tier's copy-0 slice: the full table at 1x, the first copy at
    100x (scale_probe100 offsets copies by 10M ids) — a fixed-size
    batch source at every tier."""
    return df.filter(F.col(id_col) < 10_000_000)


def build_states(spark, tier: str, tier_dir: str) -> None:
    docs = _docs(spark, tier_dir)
    emb = _emb(spark, tier_dir)
    fp = dedup.fingerprint_groups(docs).select("fp")
    bucketing.write_bucketed(
        fp,
        f"incr_fp_state_{tier}",
        ["fp"],
        BUCKETS,
        path=os.path.join(STATE_DIR, tier, "fp"),
    )
    sets = dedup.shingle_sets(docs).localCheckpoint()
    bands = dedup.lsh_band_keys(dedup.minhash_signatures_from_sets(sets))
    # bucket by BOTH join keys: Spark co-locates only when the join
    # keys cover ALL cluster keys (requireAllClusterKeysForCoPartition)
    bucketing.write_bucketed(
        bands,
        f"incr_nd_bands_{tier}",
        ["band_id", "key"],
        BUCKETS,
        path=os.path.join(STATE_DIR, tier, "bands"),
    )
    bucketing.write_bucketed(
        sets,
        f"incr_nd_sets_{tier}",
        ["doc_id"],
        BUCKETS,
        path=os.path.join(STATE_DIR, tier, "sets"),
    )
    est = similarity.lsh_bucket_state(emb)
    bucketing.write_bucketed(
        est,
        f"incr_emb_state_{tier}",
        ["bucket"],
        BUCKETS,
        path=os.path.join(STATE_DIR, tier, "emb"),
    )
    # persisted blocked-Bloom sketch over the fp state (production
    # n_blocks): the prebuilt-gate row reads THIS table instead of
    # deriving the sketch from the state in-query
    from tugas_2_big_data_spark.sources import sinks

    sinks.write_parquet(
        dedup.bloom_state(fp, n_blocks=4096),
        os.path.join(STATE_DIR, tier, "bloom"),
    )
    # persisted IVF index artifact over the tier corpus (the growing
    # index the fixed batch is appended to); build time is per-ingest-
    # history work like every other state build here
    similarity.ivf_build_index(emb, os.path.join(STATE_DIR, tier, "ivf"))


def _checks(spark, tier: str, tier_dir: str, bucketed: bool):
    """The three per-batch check DataFrames for a tier. `bucketed`
    reads state through the catalog (bucket spec attached); False
    re-reads the same files spec-less, as the co-location contrast."""
    docs0 = _copy0(_docs(spark, tier_dir), "doc_id")
    emb0 = _copy0(_emb(spark, tier_dir), "vec_id")

    def state(name: str, sub: str):
        if bucketed:
            return bucketing.read_bucketed(spark, name)
        return spark.read.parquet(os.path.join(STATE_DIR, tier, sub))

    # exact: copies of copy-0 docs (rejected) + suffixed fresh docs
    b_exact = (
        docs0.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 20_000_000).alias("doc_id"), "text")
        .unionByName(
            docs0.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 30_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" fresh batch")).alias("text"),
            )
        )
    )
    exact = dedup.incremental_new_docs(
        b_exact, state(f"incr_fp_state_{tier}", "fp")
    ).select("doc_id")

    # near-dup text: suffix-extended copies of copy-0 docs
    b_nd = docs0.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 30_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz qqq")).alias("text"),
    )
    nd = dedup.incremental_near_dup(
        dedup.shingle_sets(b_nd),
        state(f"incr_nd_sets_{tier}", "sets"),
        threshold=0.5,
        seen_bands=state(f"incr_nd_bands_{tier}", "bands"),
    )

    # embedding: rescaled copies of copy-0 vectors
    b_emb = emb0.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 20_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x * 2.0
        ).alias("embedding"),
    )
    ann = similarity.incremental_embedding_near_dup(
        b_emb, state(f"incr_emb_state_{tier}", "emb"), threshold=0.999
    )

    # bloom-prebuilt gate: probe the PERSISTED sketch table (n_blocks
    # rows, broadcast), then only the hit slice joins the fp state —
    # the bloom itself is never derived from the state at gate time
    bloom = spark.read.parquet(os.path.join(STATE_DIR, tier, "bloom"))
    bloomed = dedup.route_batch_bloom(
        b_exact, bloom, state(f"incr_fp_state_{tier}", "fp"), n_blocks=4096
    )
    return {
        "incr_exact": exact,
        "incr_near_dup": nd,
        "incr_embedding": ann,
        "incr_bloom_prebuilt": bloomed,
    }


def _materialize(df) -> tuple[int, float]:
    n = 0

    def run() -> float:
        nonlocal n
        t0 = time.perf_counter()
        [(n, _)] = df.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])),
        ).collect()
        return time.perf_counter() - t0

    t = min(run(), run())
    return n, t


def probe_ivf_append(spark) -> dict:
    """Fixed-batch / growing-INDEX row for the ANN maintenance loop:
    per-batch append cost (assign under the artifact's frozen
    centroids + cid-partitioned parquet append) and serve-after-append
    cost, at 1x and 100x index size. The honest scale shape: the √N
    cell-count policy grows the broadcast centroid table 10x at 100x,
    so batch assignment is O(batch · √N) — sublinear in index size,
    never index-sized; serving stays O(nprobe · cell) reads. Append
    timing runs against scratch twins sharing the FROZEN centroids
    (where the appended files land does not change the work), min-of-2
    like every other row; the real index then takes one actual append
    and serves from it."""
    import shutil

    row: dict = {}
    for tier, tier_dir in (("1x", SRC), ("100x", DST)):
        emb0 = _copy0(_emb(spark, tier_dir), "vec_id")
        batch = emb0.filter(F.col("vec_id") % 20 == 0).select(
            (F.col("vec_id") + 20_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"), lambda x: x * 2.0
            ).alias("embedding"),
        )
        state_ivf = os.path.join(STATE_DIR, tier, "ivf")
        times = []
        for i in (1, 2):
            scratch = os.path.join(STATE_DIR, tier, f"ivf_append_scratch{i}")
            shutil.rmtree(scratch, ignore_errors=True)
            shutil.copytree(
                os.path.join(state_ivf, "centroids"),
                os.path.join(scratch, "centroids"),
            )
            t0 = time.perf_counter()
            similarity.ivf_append_to_index(spark, scratch, batch)
            times.append(time.perf_counter() - t0)
        row[f"t_append_state{tier}"] = round(min(times), 3)
        similarity.ivf_append_to_index(spark, state_ivf, batch)
        q = emb0.filter(F.col("vec_id") < 5)
        served = similarity.ivf_topk_from_index(
            spark, state_ivf, q, nprobe=2, k=5
        )
        n, t = _materialize(served)
        row[f"t_serve_state{tier}"] = round(t, 3)
        row[f"rows_serve_state{tier}"] = n
    row["ratio"] = round(row["t_append_state100x"] / row["t_append_state1x"], 2)
    row["serve_ratio"] = round(
        row["t_serve_state100x"] / row["t_serve_state1x"], 2
    )
    return row


def main() -> None:
    spark = get_spark(app_name="probe_incremental_state")
    if not os.path.exists(f"{DST}/documents.parquet"):
        print(
            "100x corpus missing - run tools/scale_probe100.py first",
            file=sys.stderr,
        )
        sys.exit(1)
    # states are rebuilt every run: the bucket SPEC lives in the
    # session's in-memory catalog (no persistent metastore in this
    # container), so a fresh session cannot reattach it to the files —
    # ~35 s total, acceptable for a probe. On a cluster the spec lives
    # in the metastore and the build runs once per ingest history.
    for tier, tier_dir in (("1x", SRC), ("100x", DST)):
        print(f"building {tier} state tables ...", file=sys.stderr)
        t0 = time.perf_counter()
        build_states(spark, tier, tier_dir)
        print(
            f"built {tier} in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    results: dict[str, dict] = {}
    for name in (
        "incr_exact",
        "incr_near_dup",
        "incr_embedding",
        "incr_bloom_prebuilt",
    ):
        row: dict = {}
        for tier, tier_dir in (("1x", SRC), ("100x", DST)):
            df = _checks(spark, tier, tier_dir, bucketed=True)[name]
            n, t = _materialize(df)
            row[f"t_state{tier}"] = round(t, 3)
            row[f"rows_state{tier}"] = n
        # Plan-shape contrast at the shapes a 100-TB deployment plans:
        # with broadcast off (a 2 TB state never fits a broadcast, so
        # size-based planning picks shuffle joins there), the bucketed
        # state must join with NO Exchange above its scan, while the
        # same files read spec-less reshuffle the whole state per
        # batch. Exchange counts come from the formatted plan (each
        # node appears in tree + details; the DELTA is what matters).
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            for label, bucketed in (("bucketed", True), ("specless", False)):
                df = _checks(spark, "100x", DST, bucketed=bucketed)[name]
                row[f"exchanges_{label}_nobroadcast"] = pi.explain_formatted(
                    df
                ).count("Exchange")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        plain = _checks(spark, "100x", DST, bucketed=False)[name]
        n, t = _materialize(plain)
        row["t_state100x_specless"] = round(t, 3)
        row["ratio"] = (
            round(row["t_state100x"] / row["t_state1x"], 2)
            if row["t_state1x"] > 0
            else None
        )
        results[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    results["incr_ivf_append"] = probe_ivf_append(spark)
    print(f"incr_ivf_append: {results['incr_ivf_append']}", file=sys.stderr)
    out = os.path.join(REPO, "INCR_STATE_PROBE.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
