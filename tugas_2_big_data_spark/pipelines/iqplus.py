"""IQPLUS news summarization pipeline (Spark-first re-expression of
iqplus_market_transform.py / iqplus_stock_transform.py — the twin
scripts are byte-identical except collection names, so this ONE module
parameterizes what they copy-pasted).

Reference shape: sequential Mongo cursor → per-doc BART → insert_one
(:91-144). Engine shape: DataFrame scan → pandas-UDF summarize
(executor-parallel) → row_number index over an EXPLICIT sort key → sink.
The reference's index order was Mongo natural order (non-deterministic,
SURVEY.md §7) — callers must name the sort key.

Output contract: {index, judul, konten, rangkuman, waktu,
tanggal_artikel} (iqplus_market_transform.py:118-125).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from tugas_2_big_data_spark.text.summarize import Backend, summarize_udf


def summarize_news(
    df: DataFrame,
    order_by: Sequence[str],
    text_col: str = "konten",
    backend_factory: Callable[[], Backend] | None = None,
    max_length: int = 250,
    min_length: int = 50,
    chunk_tokens: int = 1024,
    index_partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Add `rangkuman` (summary) and a gapless 1..N `index` column.

    The default global row_number mirrors the reference's driver
    counter (iqplus_market_transform.py:95,131) — a single-partition
    sort, acceptable at reference scale because the expensive stage
    (the model UDF) is fully parallel BEFORE the window.

    ``index_partition_by`` is the scale path: the counter restarts at
    1 within each named group (e.g. the source collection or a date
    column), so the window shuffles on the group key and sorts each
    group independently — no ``Exchange SinglePartition`` anywhere in
    the plan, and the index stays a deterministic gapless sequence
    per group. This is the variant to use on a real cluster; the
    global default exists only for reference parity (SURVEY.md §2.7
    W2).
    """
    kwargs = {} if backend_factory is None else {"backend_factory": backend_factory}
    udf = summarize_udf(
        max_length=max_length, min_length=min_length, chunk_tokens=chunk_tokens, **kwargs
    )
    if index_partition_by:
        w = Window.partitionBy(*index_partition_by).orderBy(*order_by)
    else:
        w = Window.orderBy(*order_by)
    summarized = df.withColumn("rangkuman", udf(F.col(text_col)))
    out_cols = [c for c in df.columns if c != "rangkuman"]
    return (
        summarized.withColumn("index", F.row_number().over(w).cast("long"))
        .select("index", *out_cols, "rangkuman")
    )
