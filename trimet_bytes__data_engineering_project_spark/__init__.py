"""PySpark-native analytics engine with the query and data-processing
capabilities of the TriMet "Trimet-Bytes" data-engineering project.

Built from scratch on idiomatic Spark (DataFrame API / Spark SQL /
Structured Streaming).  The reference's semantics (see SURVEY.md) carry
over; its pandas/Pub-Sub/PostgreSQL substrate does not.

Modules
-------
session    SparkSession factory (AQE, UTC, non-ANSI coerce semantics)
schemas    explicit StructTypes for every table shape
sources    S1-S9 landing readers (json/csv/html-parse/jdbc)
functions  F1-F15 scalar exprs + W1-W3 window builders
operators  P/A/U transform + validation + scale extensions
plans      query corpus (queries + DuckDB oracle twins) + warehouse views
streaming  T1-T5 availableNow pipeline + foreachBatch upsert
"""

__version__ = "0.1.0"
