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
]


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


def _materialize(df) -> tuple[int, float]:
    # count + full-column hash in ONE aggregate: the row count rides the
    # timed job instead of a third full recomputation of the plan
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


def main() -> None:
    spark = get_spark(app_name="scale_probe100")
    if not os.path.exists(f"{DST}/documents.parquet") or "--rebuild" in sys.argv:
        print("building 100x corpus ...", file=sys.stderr)
        build(spark)
    reg = q.queries()
    results = {}
    for name in PROBE:
        fn = reg[name]
        # per-query isolation: one failing plan (OOM, broadcast build)
        # records an error row instead of losing the whole probe run
        try:
            n_small, t_small = _materialize(fn(spark, SRC))
            n_big, t_big = _materialize(fn(spark, DST))
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
    out = os.path.join(REPO, "SCALEPROBE100.json")
    with open(out, "w") as f:
        json.dump(results, f)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
