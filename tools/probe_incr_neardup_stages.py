"""Stage attribution for `dedup_incremental_near_dup`'s 1000× step
(VERDICT r10 #2: the 13.48× wall for 10× data is the worst row in
SCALEPROBE1000 — mildly super-linear; attribute it before fixing it).

The registered query times four distinguishable stages:

  A. corpus-state bootstrap: shingle_sets(docs) + localCheckpoint over
     the full seen corpus — BY DESIGN inside the timed region (a
     production loop opens its state once, but the registered query
     IS the open-state-then-gate path);
  B. seen-band derivation: minhash signatures + band keys over the
     whole corpus state (the `seen_bands=None` convenience path);
  C. batch-side build: batch shingle sets + localCheckpoint;
  D. gate: band bucket join + MERGE-hinted exact-Jaccard verify,
     with seen_bands PRE-materialized so only the candidate/verify
     plan is timed.

Each stage is forced with the same count+hash aggregate the scale
probes use. Run on a quiet host at the 100× and 1000× tiers (the
corpora scale_probe100/1000 built); writes INCR_NEARDUP_STAGES.json
with per-stage step ratios so the super-linear share is attributable
to a stage, not guessed.

Usage: python tools/probe_incr_neardup_stages.py
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
from tugas_2_big_data_spark.operators import dedup  # noqa: E402
from tugas_2_big_data_spark.sources.catalog import load_table  # noqa: E402

TIERS = {
    "100x": os.path.join(REPO, ".scratch", "sf10x"),
    "1000x": os.path.join(REPO, ".scratch", "sf1000x"),
}


def _force(df) -> int:
    [(n, _)] = df.agg(
        F.count(F.lit(1)),
        F.sum(F.xxhash64(*[F.col(c) for c in df.columns])),
    ).collect()
    return n


def _batch(docs):
    return (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 10000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zzz qqq")).alias("text"),
            )
        )
    )


def run_tier(spark, sf_dir: str) -> dict:
    out: dict[str, float] = {}
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")

    t0 = time.perf_counter()
    seen_sets = dedup.shingle_sets(docs).localCheckpoint()
    out["A_bootstrap_shingle_sets_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    seen_bands = dedup.lsh_band_keys(
        dedup.minhash_signatures_from_sets(seen_sets), 8, 4
    ).localCheckpoint()
    out["B_seen_bands_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    batch_sets = dedup.shingle_sets(_batch(docs)).localCheckpoint()
    out["C_batch_sets_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n = _force(
        dedup.incremental_near_dup(
            batch_sets, seen_sets, threshold=0.5, seen_bands=seen_bands
        )
    )
    out["D_gate_candidates_verify_s"] = round(time.perf_counter() - t0, 3)
    out["rows"] = n
    out["total_s"] = round(
        sum(v for k, v in out.items() if k.endswith("_s")), 3
    )
    return out


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(app_name="probe_incr_neardup_stages")
    results: dict[str, dict] = {}
    for tier, path in TIERS.items():
        if not os.path.exists(f"{path}/documents.parquet"):
            raise SystemExit(f"{tier} corpus missing at {path}")
        print(f"tier {tier} ...", file=sys.stderr)
        results[tier] = run_tier(spark, path)
        print(f"  {results[tier]}", file=sys.stderr)
    a, b = results["100x"], results["1000x"]
    results["step_ratios"] = {
        k: round(b[k] / a[k], 2)
        for k in a
        if k.endswith("_s") and a[k] > 0
    }
    out = os.path.join(REPO, "INCR_NEARDUP_STAGES.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
