"""Testdata catalog: explicit schemas + loaders for the driver parquet tables.

The reference infers every schema (mongo-spark sampling at
``yfinance_transform.py:113-115``, pandas inference at
``idx_transform.py:306-309``). Our engine declares schemas explicitly —
inference at 100 TB means an extra sampling pass over the data and
unstable types between runs. ``load_table`` passes the explicit schema to
the parquet reader so mismatches fail fast, and column pruning/predicate
pushdown still apply (schemas here mirror the physical parquet types).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_L = T.LongType()
_I = T.IntegerType()
_D = T.DoubleType()
_S = T.StringType()
_TS = T.TimestampType()


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


TABLES: dict[str, T.StructType] = {
    "region": _st(("r_regionkey", _I), ("r_name", _S)),
    "nation": _st(("n_nationkey", _I), ("n_name", _S), ("n_regionkey", _I)),
    "customer": _st(
        ("c_custkey", _L), ("c_name", _S), ("c_nationkey", _I),
        ("c_acctbal", _D), ("c_mktsegment", _S),
    ),
    "supplier": _st(
        ("s_suppkey", _L), ("s_name", _S), ("s_nationkey", _I), ("s_acctbal", _D),
    ),
    "part": _st(
        ("p_partkey", _L), ("p_name", _S), ("p_brand", _S), ("p_type", _S),
        ("p_size", _I), ("p_retailprice", _D),
    ),
    "orders": _st(
        ("o_orderkey", _L), ("o_custkey", _L), ("o_orderstatus", _S),
        ("o_totalprice", _D), ("o_orderdate", _TS), ("o_orderpriority", _S),
    ),
    "lineitem": _st(
        ("l_orderkey", _L), ("l_partkey", _L), ("l_suppkey", _L),
        ("l_linenumber", _I), ("l_quantity", _D), ("l_extendedprice", _D),
        ("l_discount", _D), ("l_tax", _D), ("l_returnflag", _S),
        ("l_linestatus", _S), ("l_shipdate", _TS),
    ),
    # ts is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) at every
    # scale factor (verified via parquet metadata). With the session
    # timezone pinned to UTC, reading it as TimestampType yields the
    # same wall-clock instants DuckDB sees, so oracles stay exact.
    "events": _st(
        ("event_id", _L), ("ts", _TS), ("user_id", _L),
        ("event_type", _S), ("value", _D), ("props", _S),
    ),
    "documents": _st(
        ("doc_id", _L), ("text", _S), ("lang", _S), ("source", _S), ("n_chars", _L),
    ),
    "embeddings": _st(
        ("vec_id", _L), ("embedding", T.ArrayType(T.FloatType())), ("label", _I),
    ),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one testdata table with its explicit schema."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return spark.read.schema(TABLES[name]).parquet(path)


def schema_for(name: str) -> T.StructType:
    return TABLES[name]


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view (SQL surface)."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
