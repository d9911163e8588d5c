from tugas_2_big_data_spark.functions.expressions import (
    metric_stat_aggs,
    null_safe_div,
    period_key,
    ratio_pct,
)

__all__ = ["metric_stat_aggs", "null_safe_div", "period_key", "ratio_pct"]
