"""Hierarchical split-merge summarization as an injectable, Arrow-batched
Spark operator.

The reference runs BART summarization driver-side, one document at a
time (iqplus_market_transform.py:91-144 — no Spark at all). Here the
SAME split-merge control flow (:49-89) runs inside a pandas UDF:
executor-parallel, model loaded lazily once per worker, Arrow batch
transfer. The model is an injected backend because:
- tests need determinism (BART is non-hermetic, SURVEY.md §5.4);
- this container has no transformers/torch — the HF path is gated
  behind an import-try and raises a clear error if unavailable.

Error absorption parity: any backend exception → summary "" for that
row (iqplus_market_transform.py:87-89); the row is still emitted.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

from tugas_2_big_data_spark.text.chunking import (
    TokenCounter,
    pack_chunks,
    whitespace_token_count,
)

# backend(text, max_length, min_length) -> summary
Backend = Callable[[str, int, int], str]


def extractive_stub_backend(text: str, max_length: int, min_length: int) -> str:
    """Deterministic extractive 'summarizer': first max_length//5
    whitespace words. Same call signature and length-param plumbing as
    the BART backend; output is reproducible in SQL for the oracle."""
    words = text.split()
    return " ".join(words[: max_length // 5])


def bart_backend() -> Backend:
    """Real facebook/bart-large-cnn backend (iqplus_market_transform.py:26).
    Requires transformers+torch — not installed in the build container."""
    try:
        from transformers import pipeline  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "transformers/torch not available in this environment; "
            "inject a custom Backend or use extractive_stub_backend"
        ) from e
    summarizer = pipeline(
        "summarization", model="facebook/bart-large-cnn", device=-1
    )

    def run(text: str, max_length: int, min_length: int) -> str:  # pragma: no cover
        return summarizer(
            text, max_length=max_length, min_length=min_length, truncation=True
        )[0]["summary_text"]

    return run


def summarize_long_text(
    text: str,
    backend: Backend,
    count_tokens: TokenCounter = whitespace_token_count,
    max_length: int = 250,
    min_length: int = 50,
    chunk_tokens: int = 1024,
    chunk_max_length: int = 512,
    chunk_min_length: int = 30,
) -> str:
    """Split-merge summarization, control-flow parity with
    iqplus_market_transform.py:49-89 (params are the spec)."""
    try:
        if count_tokens(text) <= chunk_tokens:
            return backend(text, max_length, min_length)
        chunk_summaries = [
            backend(chunk, chunk_max_length, chunk_min_length)
            for chunk in pack_chunks(text, count_tokens, chunk_tokens)
        ]
        merged = " ".join(chunk_summaries)
        return backend(merged, max_length, min_length)
    except Exception:
        return ""


def summarize_udf(
    backend_factory: Callable[[], Backend] = lambda: extractive_stub_backend,
    count_tokens_factory: Callable[[], TokenCounter] = lambda: whitespace_token_count,
    max_length: int = 250,
    min_length: int = 50,
    chunk_tokens: int = 1024,
) -> Callable[[Column], Column]:
    """Build a pandas UDF column transform: konten → rangkuman.

    Factories (not instances) are serialized so heavyweight backends
    (BART ≈ 1.6 GB) initialize lazily ONCE PER EXECUTOR PROCESS, not per
    row and not on the driver.
    """
    state: dict = {}

    @F.pandas_udf(T.StringType())
    def _summarize(texts: pd.Series) -> pd.Series:
        if "backend" not in state:
            state["backend"] = backend_factory()
            state["count"] = count_tokens_factory()
        backend, count = state["backend"], state["count"]

        def one(text) -> str:
            text = (text or "").strip()
            if not text:
                # empty konten short-circuits to "" without calling the
                # model (iqplus_market_transform.py:114-115)
                return ""
            return summarize_long_text(
                text,
                backend,
                count,
                max_length=max_length,
                min_length=min_length,
                chunk_tokens=chunk_tokens,
            )

        return texts.map(one)

    return _summarize
