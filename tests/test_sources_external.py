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


def test_existence_probes(spark):
    assert external.table_exists("/root/testdata/sf0.001", "orders")
    assert not external.table_exists("/root/testdata/sf0.001", "nope")
    df = spark.range(1).withColumnRenamed("id", "Date")
    assert external.has_column(df, "Date")
    assert not external.has_column(df, "Close")
