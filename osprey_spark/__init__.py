"""osprey_spark — a PySpark-native safety-rules analytics engine.

A from-scratch re-implementation of the query & data-processing
capabilities of roostorg/osprey (a per-event Python rules engine) as an
idiomatic Apache Spark stack:

- ``osprey_spark.sml``       — SML rule-language front-end (parse / validate)
  compiled to vectorized ``pyspark.sql.Column`` expression plans.
- ``osprey_spark.exprs``     — the None-calculus expression helpers that
  reproduce the reference's null semantics on top of Spark SQL.
- ``osprey_spark.operators`` — velocity windows, sessionization, CEP,
  dedup, similarity search, text analytics.
- ``osprey_spark.plans``     — the analytics query surface (query-filter
  compiler + timeseries / topN / approx-distinct / scan).
- ``osprey_spark.streaming`` — Structured Streaming pipeline, label state,
  exactly-once sink.
- ``osprey_spark.sources``   — deterministic synthetic transcript generator
  and table registry.
"""

__version__ = "0.1.0"
