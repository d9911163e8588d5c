"""End-to-end training-corpus hygiene pipeline (extension surface —
the composition the individual dedup / text-analysis operators exist
for): exact dedup → near-dup removal → quality + language filters →
token accounting.

Stage order is part of the contract (the oracle mirrors it exactly):

1. EXACT dedup on the normalized-text fingerprint — keep the smallest
   doc_id per fingerprint. Cheapest first: hash-groupBy, removes
   byte-identical copies before any pairwise work.
2. NEAR-DUP removal on the survivors — minhash/LSH candidate pairs,
   exact-Jaccard verified (≥ threshold); every doc appearing as the
   LARGER id of a verified pair is dropped (one-hop canonical keep).
3. QUALITY + LANGUAGE filters — heuristic score and stopword-vote
   language ID (pure expressions / broadcast join).
4. TOKEN ACCOUNTING — whitespace + BPE-ish counts for budget tracking.

Scale: stages 1/3/4 are map-only or single-shuffle; stage 2 is the LSH
plan (band equi-join, frequency-independent verify). Nothing pairwise
ever leaves a key-equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tugas_2_big_data_spark.operators import dedup, text_analysis


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.55,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Returns the cleaned corpus: one row per surviving doc with
    (doc_id, text, lang_pred, quality_score, n_tokens_ws, n_tokens_bpe).
    """
    # 1. exact dedup (min id per normalized fingerprint)
    fp = docs.withColumn("_fp", F.md5(dedup.normalized(text_col)))
    keep_exact = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    survivors = fp.join(keep_exact, [id_col, "_fp"], "left_semi").drop("_fp")

    # 2. near-dup removal among survivors (LSH + verified Jaccard)
    sets = dedup.shingle_sets(survivors, text_col, id_col)
    sig = dedup.minhash_signatures_from_sets(sets, k=8, id_col=id_col)
    cand = dedup.lsh_candidate_pairs(sig, k=8, bands=4, id_col=id_col)
    pairs = dedup.jaccard_verify_sets(
        sets, cand, threshold=jaccard_threshold, id_col=id_col
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    deduped = survivors.join(losers, id_col, "left_anti")

    # 3. quality + language filters
    quality = text_analysis.quality_scores(deduped, text_col, id_col).select(
        id_col, "quality_score"
    )
    lang = text_analysis.lang_id(deduped, text_col, id_col).select(
        id_col, "lang_pred"
    )
    enriched = (
        deduped.join(quality, id_col)
        .join(lang, id_col)
        .filter(
            (F.col("quality_score") >= min_quality)
            & F.col("lang_pred").isin(*langs)
        )
    )

    # 4. token accounting
    tokens = text_analysis.token_stats(enriched, text_col, id_col).select(
        id_col, "n_tokens_ws", "n_tokens_bpe"
    )
    return enriched.join(tokens, id_col).select(
        id_col,
        text_col,
        "lang_pred",
        "quality_score",
        "n_tokens_ws",
        "n_tokens_bpe",
    )
