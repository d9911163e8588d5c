"""DuckDB-oracle comparison harness.

Mimics the driver's t2 check: run the Spark query and the oracle SQL on
the same parquet tables, sort columns by name, compare row counts and
(order-insensitively) values with float tolerance. Used by
tests/test_oracle_parity.py so every registered query is validated
locally before the driver sees it.
"""

from __future__ import annotations

import math
import os

import duckdb

from tugas_2_big_data_spark.sources.catalog import TABLES

REL_TOL = 1e-6
ABS_TOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    # list-valued cells: Spark hands Python lists, DuckDB numpy arrays —
    # normalize both to tuples so equality and the row sort work
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 9 significant digits so last-bit fp differences don't
        # reorder rows between engines in the sort below
        return float(f"{v:.9g}")
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return v


def _sorted_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def _values_close(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=REL_TOL, abs_tol=ABS_TOL)
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=REL_TOL, abs_tol=ABS_TOL)
        except (TypeError, ValueError):
            return False
    return a == b


def compare(spark_df, con, oracle_sql: str, name: str = "query") -> None:
    sdf = spark_df.toPandas()
    odf = con.execute(oracle_sql).fetchdf()

    s_cols = sorted(str(c) for c in sdf.columns)
    o_cols = sorted(str(c) for c in odf.columns)
    assert s_cols == o_cols, f"{name}: column mismatch\n spark={s_cols}\n oracle={o_cols}"

    s_rows = _sorted_rows(list(sdf.columns), sdf.itertuples(index=False, name=None))
    o_rows = _sorted_rows(list(odf.columns), odf.itertuples(index=False, name=None))
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} oracle={len(o_rows)}"
    )

    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        for j, (a, b) in enumerate(zip(sr, orow)):
            assert _values_close(a, b), (
                f"{name}: value mismatch at row {i} col {s_cols[j]}: "
                f"spark={a!r} oracle={b!r}\n spark_row={sr}\n oracle_row={orow}"
            )
