"""Physical-plan inspection: the feedback loop for scale hygiene.

Every operator's plan should be CHECKED, not assumed: filters reach the
parquet scan (PushedFilters), projections prune the read schema
(ReadSchema), small dims broadcast, no accidental cartesian products,
expressions stay inside WholeStageCodegen. tests/test_plans.py pins
these properties for the headline queries so a regression (e.g. a UDF
sneaking into a hot path and breaking codegen) fails CI, not the
100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans."""
    plan = explain_formatted(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame, table_hint: str | None = None) -> set[str]:
    """Union of columns actually read from parquet scans (pruning check).
    With table_hint, only scans whose Location mentions the hint count."""
    plan = explain_formatted(df)
    cols: set[str] = set()
    for scan in re.finditer(
        r"Location: .*?(\S*parquet\S*).*?ReadSchema: struct<([^>]*)>",
        plan,
        re.DOTALL,
    ):
        loc, schema = scan.group(1), scan.group(2)
        if table_hint and table_hint not in loc:
            continue
        for field in schema.split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_formatted(df) or (
        "BroadcastNestedLoopJoin" in explain_formatted(df)
    )


def uses_cartesian_or_bnl(df: DataFrame) -> bool:
    """True if the plan contains a cartesian product or a NON-broadcast
    nested loop — the joins that do not scale."""
    plan = explain_formatted(df)
    return "CartesianProduct" in plan


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the EXECUTED plan (AQE hides
    codegen annotation until runtime, so this runs the plan via the noop
    sink). Zero means nothing is codegen'd — a hot path fell back to
    interpreted eval (e.g. a UDF crept in)."""
    # collect() executes THIS Dataset's QueryExecution so the AQE final
    # plan (with its *(n) codegen markers) lands on df itself — a
    # noop-sink write would execute a separate QueryExecution
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", executed)))
