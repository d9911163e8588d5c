from tugas_2_big_data_spark.plans.inspect import (
    explain_formatted,
    pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
    uses_cartesian_or_bnl,
    wholestage_codegen_ids,
)

__all__ = [
    "explain_formatted",
    "pushed_filters",
    "read_schema_columns",
    "uses_broadcast_join",
    "uses_cartesian_or_bnl",
    "wholestage_codegen_ids",
]
