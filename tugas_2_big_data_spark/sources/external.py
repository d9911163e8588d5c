"""External sources beyond the parquet catalog (SURVEY.md §2.1 parity).

Reference source surface → engine equivalent:

- S1/S2 MongoDB scan (``yfinance_transform.py:113-115``,
  ``idx_transform.py:297-309``): ``read_mongo`` via the official
  mongo-spark connector 10.x when its jar is on the classpath. The
  reference's S2 variant collected every document through the driver
  (find() → list → pandas → createDataFrame); the connector read keeps
  the scan distributed and schema explicit. The connector is OPTIONAL —
  this container ships no Mongo, so the call is gated behind a clear
  error and the same pipelines run on parquet/JSON document sources.
- S3 CSV metadata read (``yfinance_transform.py:23-30``): ``read_csv_dim``
  — spark.read.csv with header + explicit schema instead of
  csv.DictReader on the driver.
- S4 row-at-a-time cursor (``IQ*:108``): replaced by DataFrame scans
  everywhere; no equivalent needed.
- S5/S6 existence probes (``idx_transform.py:290-292``,
  ``yfinance_transform.py:117``): ``table_exists`` / ``has_column``.

``read_json_docs`` is the hermetic stand-in for the reference's
document model: Mongo collections are BSON document sets; JSON-lines
files round-trip the same nested shape (e.g. the financial reports'
``data.*`` struct) without a live cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_dim(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """Small-dimension CSV read (S3). With no schema, columns are read
    as strings (NOT inferSchema — inference is an extra pass and
    unstable types; dims are small enough to cast explicitly)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json_docs(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    """JSON-lines document scan — the hermetic equivalent of a Mongo
    collection scan (one JSON object per line ≈ one BSON doc).

    Explicit schema by default; ``infer=True`` mirrors the reference's
    schema-sampling behavior (mongo-spark inferred schemas at
    ``yfinance_transform.py:113-115``) for raw/unknown input.
    """
    if schema is None and not infer:
        raise ValueError(
            "read_json_docs requires a schema unless infer=True "
            "(explicit schemas are the engine default; see catalog.py)"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


_MONGO_FORMAT = "mongodb"  # mongo-spark connector 10.x


def read_mongo(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Distributed Mongo collection scan (S1) via mongo-spark 10.x.

    Requires the connector jar (``org.mongodb.spark:mongo-spark-
    connector`` on spark.jars.packages). Raises a clear error when
    absent — this container has neither the jar nor a Mongo server;
    pipelines accept any DataFrame source, so parquet/JSON stand in.
    """
    reader = spark.read.format(_MONGO_FORMAT)
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return (
            reader.option("connection.uri", uri)
            .option("database", database)
            .option("collection", collection)
            .load()
        )
    except Exception as e:  # ClassNotFoundException surfaces as AnalysisException
        raise RuntimeError(
            "mongo-spark connector not available on this classpath; add "
            "org.mongodb.spark:mongo-spark-connector_2.13:10.x to "
            "spark.jars.packages or use read_json_docs/parquet sources"
        ) from e


def write_mongo(
    df: DataFrame,
    uri: str,
    database: str,
    collection: str,
    mode: str = "append",
) -> None:
    """Mongo sink (K1 parity) via the same optional connector."""
    try:
        (
            df.write.format(_MONGO_FORMAT)
            .option("connection.uri", uri)
            .option("database", database)
            .option("collection", collection)
            .mode(mode)
            .save()
        )
    except Exception as e:
        raise RuntimeError(
            "mongo-spark connector not available on this classpath; add "
            "org.mongodb.spark:mongo-spark-connector_2.13:10.x to "
            "spark.jars.packages or use the parquet sinks"
        ) from e


def table_exists(sf_dir: str, name: str) -> bool:
    """Collection-existence probe (S5): skip absent inputs instead of
    failing the run (``idx_transform.py:290-292``)."""
    return os.path.exists(os.path.join(sf_dir, f"{name}.parquet"))


def has_column(df: DataFrame, name: str) -> bool:
    """Column-existence probe (S6): process only frames carrying the
    expected column (``yfinance_transform.py:117,144``)."""
    return name in df.columns
