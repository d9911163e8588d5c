"""Deduplication operators for training-data pipelines (extension surface;
BASELINE.json north-star — not present in the reference, which has no
dedup of any kind).

Five strategies, all declarative DataFrame plans:

- exact:        hash-groupBy on the raw text (one shuffle)
- fingerprint:  hash-groupBy on normalized text (case/whitespace folded)
- minhash+LSH:  shingle → k seeded-md5 minhashes → band buckets →
                candidate pairs → exact-Jaccard verification
- n-gram Jaccard: inverted shingle index self-join (no O(n²) cross join)
- simhash:      16-bit signature from per-word md5 bit votes

Scale design: every pairwise step goes through a key-equi-join
(band bucket or shingle), never a cross join; signatures are one
explode + hash-agg; at 1000 executors all stages are shuffle-parallel.
The md5-based hash families keep every value reproducible in the DuckDB
oracle (see tugas_2_big_data_spark/functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tugas_2_big_data_spark.functions import hashing


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct text: canonical (min) id + duplicate count."""
    return df.groupBy(text_col).agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("canonical_id", "n_copies")


def normalized(text_col: str = "text") -> F.Column:
    """Case-folded, whitespace-collapsed text."""
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def fingerprint_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Dedup groups keyed by md5 of normalized text."""
    return (
        df.withColumn("fp", F.md5(normalized(text_col)))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def doc_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) pairs, DISTINCT per doc (set semantics for Jaccard).

    Repartitions to full parallelism BEFORE the explode: shingling
    amplifies rows ~50× and the upstream scan may have few input splits
    (locally a single parquet file = 1 partition) — exploding on a
    handful of tasks serializes the expensive part. The pre-explode
    shuffle moves only the small un-exploded rows.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(par, id_col)
        .select(
            F.col(id_col),
            F.explode(hashing.word_shingles(hashing.words(text_col), n)).alias(
                "shingle"
            ),
        )
        .distinct()
    )


def minhash_signatures(
    shingled: DataFrame, k: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """k minhash values per doc from the (id, shingle) relation."""
    aggs = [
        hashing.minhash_agg(F.col("shingle"), seed).alias(f"h{seed}")
        for seed in range(k)
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, k: int = 8, bands: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Docs sharing any band of minhashes → candidate pairs (id_a < id_b).

    Banding: k hashes split into `bands` groups of k/bands; band key is
    the concatenation. Self-join on (band_id, band_key) replaces the
    O(n²) signature comparison with an equi-join Spark shuffles by key.
    """
    rows_per_band = k // bands
    band_exprs = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + i}") for i in range(rows_per_band)]
        band_exprs.append(
            F.struct(F.lit(b).alias("band_id"), F.concat_ws("|", *cols).alias("key"))
        )
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_exprs)).alias("band")
    ).select(id_col, "band.band_id", "band.key")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    shingled: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for pairs sharing ≥1 shingle.

    Inverted-index self-join on the shingle; |A∩B| = per-pair match
    count, |A∪B| = |A| + |B| − |A∩B|. If `candidates` (id_a, id_b) is
    given, only those pairs are scored (LSH verification path).
    """
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def simhash16(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """16-bit simhash over the doc's DISTINCT words.

    Bit i of the signature is the sign of the sum over words of the
    (+1/−1) vote derived from bit i of md5(word). Ties (sum == 0) → 0.
    """
    doc_words = (
        df.select(
            F.col(id_col), F.explode(hashing.words(text_col)).alias("word")
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    votes = [
        F.sum(hashing.simhash_bit_contrib(F.col("word"), i)).alias(f"s{i}")
        for i in range(16)
    ]
    summed = doc_words.groupBy(id_col).agg(*votes)
    sig = None
    for i in range(16):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return summed.select(F.col(id_col), sig.cast("long").alias("simhash"))
