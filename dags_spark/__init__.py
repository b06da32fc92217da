"""dags_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
dataflow/ETL library (kvh/dags lineage) on Apache Spark: declarative
DataFrame/SQL plans optimized by Catalyst, plus the LLM-scale data
operators (dedup, similarity search, text analysis, multimodal
columns) a 100 TB training-data pipeline needs.

Layout
------
- ``session``    : tuned SparkSession factory.
- ``io``         : table loading / fixture access.
- ``registry``   : the query registry backing ``__spark_entry__``.
- ``queries/``   : one module per SURVEY.md §2 section.
- ``operators/`` : composed operators Spark lacks natively
                   (as-of join, minhash dedup, cosine top-k, ...).
- ``graph/``     : the node/DAG orchestration layer (the reference's
                   core identity) with incremental-run ledger.
- ``streaming/`` : bounded-stream runner for Structured Streaming ops.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
