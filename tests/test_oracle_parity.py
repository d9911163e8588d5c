"""Run every registered query against its DuckDB oracle at sf0.001.

This is the local mirror of the driver's t2 correctness gate (which runs
at sf0.01 — use SPARK_GRAFT_ORACLE_SF=sf0.01 env to run the full tier).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from tests.helpers import compare, duckdb_connection
from tugas_2_big_data_spark import queries as q

SF_DIR = os.path.join(
    "/root/testdata", os.environ.get("SPARK_GRAFT_ORACLE_SF", "sf0.001")
)

_QUERIES = q.queries()
_ORACLES = q.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = _QUERIES[name](spark, SF_DIR)
    oracle = _ORACLES.get(name)
    if oracle is None:
        # rows-only check (non-SQL-expressible operator)
        n = sdf.count()
        assert n >= 0
        return
    compare(sdf, duck, oracle, name=name)


def test_no_registered_query_emits_complex_types(spark):
    """Driver-portability guard: the harness canonicalizes query output
    through pandas sort_values, which raises on array/map/struct cells
    (unhashable numpy arrays) — txt_postings shipped a permanently-red
    CORRECTNESS row in round 7 this way. Every registered query must
    emit only atomic columns; operators may still RETURN complex types
    (postings keeps its positions array), the registered query is the
    layer that serializes them."""
    from pyspark.sql import types as T

    bad = {}
    for name in sorted(_QUERIES):
        schema = _QUERIES[name](spark, SF_DIR).schema
        complex_cols = [
            f.name
            for f in schema.fields
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            )
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, (
        f"queries emitting complex-typed columns (driver canonicalizer "
        f"cannot sort these): {bad}"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    pdf = df.toPandas()
    assert isinstance(pdf, pd.DataFrame)
    assert len(pdf) > 0
