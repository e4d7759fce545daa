from osprey_spark.plans.analytics import (
    approx_distinct,
    entity_label_summary,
    event_by_id,
    event_counts_by_feature,
    scan,
    timeseries,
    topn,
)
from osprey_spark.plans.query_filter import compile_query_filter

__all__ = [
    "compile_query_filter",
    "timeseries",
    "topn",
    "approx_distinct",
    "scan",
    "event_by_id",
    "entity_label_summary",
    "event_counts_by_feature",
]
