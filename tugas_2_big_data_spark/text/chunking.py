"""Sentence segmentation + greedy token-bounded chunk packing.

Parity with the reference's split_text (iqplus_market_transform.py:28-47,
identical in iqplus_stock_transform.py). The naive '.'-split and the
greedy packing rules — INCLUDING the quirk that a leading sentence
larger than max_tokens flushes an EMPTY chunk first (current_chunk is
empty when the overflow check fires) — are the specified behavior, not
bugs to fix. The 1024/512/30/250/50 length parameters are part of the
spec (SURVEY.md §7).

These are plain-Python helpers: they run INSIDE the Arrow-batched
pandas UDF (tugas_2_big_data_spark/text/summarize.py), never as
row-at-a-time driver code like the reference.
"""

from __future__ import annotations

from collections.abc import Callable

TokenCounter = Callable[[str], int]


def whitespace_token_count(text: str) -> int:
    """Deterministic test tokenizer: whitespace word count (SURVEY.md §5.4
    — the real BART tokenizer is injected the same way)."""
    return len(text.split())


def naive_sentences(text: str) -> list[str]:
    """Split on '.', strip, re-append '.' — iqplus_market_transform.py:30."""
    return [s.strip() + "." for s in text.split(".") if s.strip()]


def pack_chunks(
    text: str,
    count_tokens: TokenCounter,
    max_tokens: int = 1024,
) -> list[str]:
    """Greedy sentence packing into ≤max_tokens chunks
    (iqplus_market_transform.py:28-47)."""
    sentences = naive_sentences(text)
    chunks: list[str] = []
    current: list[str] = []
    current_tokens = 0
    for sentence in sentences:
        n = count_tokens(sentence)
        if current_tokens + n > max_tokens:
            chunks.append(" ".join(current))
            current = [sentence]
            current_tokens = n
        else:
            current.append(sentence)
            current_tokens += n
    if current:
        chunks.append(" ".join(current))
    return chunks
