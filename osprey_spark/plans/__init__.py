from osprey_spark.plans.query_filter import compile_query_filter
from osprey_spark.plans.analytics import timeseries, topn, approx_distinct, scan

__all__ = ["compile_query_filter", "timeseries", "topn", "approx_distinct", "scan"]
