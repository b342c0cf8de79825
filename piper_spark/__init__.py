"""piper_spark — a PySpark-native analytics & data-pipeline engine.

A from-scratch re-expression of the capabilities of the reference
pipeline (Hevagog/piper, see SURVEY.md) as an idiomatic Spark
DataFrame/SQL engine, plus the LLM-data-pipeline operator families
(dedup, similarity search, text analysis, multimodal columns) that a
100 TB training-data pipeline needs.

Layout:
  session.py    — SparkSession bootstrap (UTC, AQE) + table catalog
  registry.py   — query/oracle registry backing __spark_entry__.py
  operators/    — relational operator library (scans, joins, aggs, windows…)
  functions/    — LLM-pipeline functions (text, dedup, similarity, sessions)
  sources/      — multimodal (binary) column plumbing
  streaming/    — Structured Streaming twins of the batch event ops
"""

__version__ = "0.1.0"
