"""External-source tests: CSV dim read + broadcast enrichment, JSON
document scan feeding the financial flatten, probes, Mongo gating."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tugas_2_big_data_spark.sources import external


def test_read_csv_dim_roundtrip(spark, tmp_path):
    p = tmp_path / "Daftar_Saham.csv"
    p.write_text("Kode,Nama Perusahaan\nBBCA,Bank Central Asia\nTLKM,Telkom\n")
    dim = external.read_csv_dim(spark, str(p))
    rows = {r["Kode"]: r["Nama Perusahaan"] for r in dim.collect()}
    assert rows == {"BBCA": "Bank Central Asia", "TLKM": "Telkom"}
    # no-schema read is all-strings (no silent inference)
    assert dict(dim.dtypes) == {"Kode": "string", "Nama Perusahaan": "string"}


def test_csv_dim_broadcast_enrichment(spark, tmp_path):
    from tugas_2_big_data_spark.pipelines import yfinance

    p = tmp_path / "dim.csv"
    p.write_text("Kode,Nama Perusahaan\nAAA,Alpha\nBBB,Beta\n")
    dim = external.read_csv_dim(spark, str(p))
    facts = spark.createDataFrame(
        [("AAA", 1.0), ("BBB", 2.0), ("CCC", 3.0)], ["ticker", "close"]
    )
    out = yfinance.enrich_with_dimension(facts, dim)
    got = {r["ticker"]: r["Nama Perusahaan"] for r in out.collect()}
    assert got == {"AAA": "Alpha", "BBB": "Beta", "CCC": None}
    # the dimension side must be broadcast — no shuffle join for a dim
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_read_json_docs_nested(spark, tmp_path):
    """JSON-lines docs with the financial reports' nested data shape."""
    docs = [
        {
            "company_code": "BBCA",
            "year": 2024,
            "data": {"EntityName": "Bank Central Asia", "SalesAndRevenue": "100.5"},
        },
        {
            "company_code": "TLKM",
            "year": 2024,
            "data": {"EntityName": "Telkom", "SalesAndRevenue": "not-a-number"},
        },
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in docs))
    schema = T.StructType(
        [
            T.StructField("company_code", T.StringType()),
            T.StructField("year", T.LongType()),
            T.StructField(
                "data",
                T.StructType(
                    [
                        T.StructField("EntityName", T.StringType()),
                        T.StructField("SalesAndRevenue", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    df = external.read_json_docs(spark, str(p), schema)
    out = df.select(
        "company_code",
        F.col("data.EntityName").alias("company_name"),
        F.col("data.SalesAndRevenue").cast("double").alias("revenue"),
    ).collect()
    got = {r["company_code"]: (r["company_name"], r["revenue"]) for r in out}
    # unparseable numeric strings cast to NULL (non-ANSI reference semantics)
    assert got == {
        "BBCA": ("Bank Central Asia", 100.5),
        "TLKM": ("Telkom", None),
    }


def test_read_json_requires_schema_or_infer(spark):
    with pytest.raises(ValueError, match="schema"):
        external.read_json_docs(spark, "/nonexistent.jsonl")


def test_mongo_gated_with_clear_error(spark):
    with pytest.raises(RuntimeError, match="mongo-spark connector"):
        external.read_mongo(spark, "mongodb://localhost", "db", "coll").collect()


class _FakeReader:
    """Duck-typed DataFrameReader that records the exact invocation
    chain read_mongo builds — format string, connector option keys,
    schema pass-through — so a connector-API typo can't hide behind
    the import gate (the sandbox has no mongod/jar, so the live path
    never executes here)."""

    def __init__(self, log: dict):
        self.log = log

    def format(self, fmt):
        self.log["format"] = fmt
        return self

    def schema(self, s):
        self.log["schema"] = s
        return self

    def option(self, k, v):
        self.log.setdefault("options", {})[k] = v
        return self

    def load(self):
        self.log["loaded"] = True
        return "SENTINEL_DF"


class _FakeSpark:
    def __init__(self, log: dict):
        self._log = log

    @property
    def read(self):
        return _FakeReader(self._log)


class _FakeWriter:
    def __init__(self, log: dict):
        self.log = log

    def format(self, fmt):
        self.log["format"] = fmt
        return self

    def option(self, k, v):
        self.log.setdefault("options", {})[k] = v
        return self

    def mode(self, m):
        self.log["mode"] = m
        return self

    def save(self):
        self.log["saved"] = True


class _FakeDF:
    def __init__(self, log: dict):
        self._log = log

    @property
    def write(self):
        return _FakeWriter(self._log)


def test_read_mongo_invocation_contract():
    """Option-for-option pin of the mongo-spark 10.x reader chain:
    format 'mongodb' (NOT the 3.x 'mongo'/'com.mongodb.spark.sql'),
    options 'connection.uri'/'database'/'collection' (10.x renamed
    'uri' and 'spark.mongodb.input.*'), explicit schema forwarded,
    and the result of load() returned unwrapped."""
    log: dict = {}
    schema = T.StructType([T.StructField("Ticker", T.StringType())])
    out = external.read_mongo(
        _FakeSpark(log),
        "mongodb://host:27017",
        "yfinance_db",
        "saham_raw",
        schema=schema,
    )
    assert out == "SENTINEL_DF"
    assert log["format"] == "mongodb"
    assert log["schema"] is schema
    assert log["options"] == {
        "connection.uri": "mongodb://host:27017",
        "database": "yfinance_db",
        "collection": "saham_raw",
    }
    assert log["loaded"]


def test_read_mongo_schema_optional():
    """No schema → the .schema() call must be SKIPPED entirely (the
    connector then samples/infers, the reference's S1 behavior at
    yfinance_transform.py:113-115), not called with None."""
    log: dict = {}
    external.read_mongo(_FakeSpark(log), "mongodb://h", "db", "coll")
    assert "schema" not in log
    assert log["loaded"]


def test_write_mongo_invocation_contract():
    """Writer chain pin: same 10.x format + option names, save mode
    forwarded verbatim (default 'append' = the reference's K1 insert
    sink; 'overwrite' = K2 drop-and-replace)."""
    log: dict = {}
    external.write_mongo(
        _FakeDF(log), "mongodb://host:27017", "iqplus", "berita_summary"
    )
    assert log["format"] == "mongodb"
    assert log["mode"] == "append"
    assert log["options"] == {
        "connection.uri": "mongodb://host:27017",
        "database": "iqplus",
        "collection": "berita_summary",
    }
    assert log["saved"]

    log2: dict = {}
    external.write_mongo(
        _FakeDF(log2), "mongodb://h", "db", "c", mode="overwrite"
    )
    assert log2["mode"] == "overwrite"


def test_existence_probes(spark):
    assert external.table_exists("/root/testdata/sf0.001", "orders")
    assert not external.table_exists("/root/testdata/sf0.001", "nope")
    df = spark.range(1).withColumnRenamed("id", "Date")
    assert external.has_column(df, "Date")
    assert not external.has_column(df, "Close")
