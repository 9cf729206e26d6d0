"""PySpark-native analytics engine with the query and data-processing
capabilities of fhueske/flink-training-exercises.

Brand-new Spark-first implementation (DataFrame / Spark SQL / Structured
Streaming); NOT a port of the reference's record-at-a-time dataflow.
The reference (read-only at /root/reference/) defines WHAT is computed:
operators, query semantics, data model -- see SURVEY.md for the full
inventory this package implements.

Layout:
    session     SparkSession factory (UTC, AQE, local tuning)
    schemas     StructTypes for the reference's record types + testdata
    sources     batch loaders: parquet tables, taxi CSV, multi-char-delimited
                text (mbox-style), edge lists
    functions   scalar Column-expression library (geo grid, text, time,
                cross-engine deterministic hashing)
    operators   relational / windowed / graph / dedup / similarity /
                text-stats / stateful operators over DataFrames
    streaming   Structured Streaming variants: watermarks, replay feed,
                stateful processing, sinks
    plans       the registered query catalog (queries + DuckDB oracles)
"""

__version__ = "0.1.0"
