"""Portable hashing / shingling expression builders.

Everything here is built so the SAME values are computable in ANSI-ish
SQL on another engine (the DuckDB oracle): md5 hex digests are the hash
primitive (fixed 32-char lowercase hex → lexicographic min == numeric
min, so MIN(md5(...)) is a valid minhash), and nibble parsing uses
strpos/instr arithmetic instead of engine-specific hex-to-int functions.

Scale: every expression is a built-in Column op — codegen'd JVM-side,
no Python. Minhash/LSH over 100 TB is explode → hash-agg, i.e. one
shuffle per signature build, and band-bucket joins replace the O(n²)
pairwise compare.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(text_col: str | Column) -> Column:
    """Whitespace tokenization of trimmed text (empty text → [''])."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(col), r"\s+")


def word_shingles(words_col: Column, n: int = 3) -> Column:
    """Overlapping n-word shingles; fewer than n words → empty array.

    The CASE guard matters: sequence(1, 0) in Spark yields a DESCENDING
    [1, 0], not an empty array.

    PERF: pass a *materialized column reference* (project the words
    array with .alias() in a prior select), not the split expression
    itself. Higher-order lambdas re-evaluate outer expressions per
    element, so an inline regex split turns O(words) into O(words²)
    regex calls per doc. element_at on a column ref is an attribute
    read.
    """
    w = words_col
    return (
        F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(w, i + k) for k in range(n)]
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
    )


def seeded_md5(col: Column, seed: int | str) -> Column:
    """md5 of a seed-prefixed value — k independent hash families from
    one md5 primitive (seed goes INSIDE the hash)."""
    return F.md5(F.concat(F.lit(f"{seed}:"), col))


def minhash_agg(shingle_col: Column, seed: int) -> Column:
    """MIN over seeded md5 hex strings == minhash for hash family `seed`
    (lexicographic min of fixed-length hex is numeric min)."""
    return F.min(seeded_md5(shingle_col, seed))


def simhash_bit_contrib(word_col: Column, bit: int) -> Column:
    """Per-word contribution (+1/-1) of one simhash bit (0..15).

    Bit `bit` = bit (bit % 4) of hex nibble (bit // 4) of md5(word),
    parsed portably via instr('0123456789abcdef', ch) - 1.
    """
    return simhash_bit_contrib_from_md5(F.md5(word_col), bit)


def simhash_bit_contrib_from_md5(md5_col: Column, bit: int) -> Column:
    """Same contribution, from an already-computed md5 hex digest —
    lets callers hash each word ONCE and extract all 16 bits from it."""
    nibble_idx = bit // 4  # 1-based position nibble_idx+1 in the hex string
    bit_in_nibble = bit % 4
    nibble = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(md5_col, nibble_idx + 1, 1),
        )
        - 1
    )
    b = F.floor(nibble / F.lit(2**bit_in_nibble)) % 2
    return (b * 2 - 1).cast("long")


def hex24_sql(expr: str) -> str:
    """DuckDB integer value of the first 6 hex chars of `expr` — the
    oracle-SQL twin of sampling.hash_unit24 (and of any seeded-md5
    draw). Lives here, not in a query module, so every query module
    can use it without import-order coupling."""
    return hexn_sql(expr, 6)


def hexn_sql(expr: str, n: int) -> str:
    """DuckDB integer value of the first `n` hex chars of `expr`
    (n <= 15 keeps the polynomial inside BIGINT). General form of
    `hex24_sql`; n=15 is the 60-bit shingle hash used by the hashed
    dedup paths."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {i}, 1)) - 1)"
        f" * {16 ** (n - i)}"
        for i in range(1, n + 1)
    )


def hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT — the Spark twin
    of `hexn_sql(expr, 15)`. Used to replace heavy string payloads
    (shingles) with fixed-width ints before join/shuffle stages:
    collision probability for millions of distinct values is ~n²/2^61
    (negligible), and any collision is REPRODUCED by the oracle, which
    applies the identical hash."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
