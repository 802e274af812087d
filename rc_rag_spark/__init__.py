"""rc_rag_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ict-bigdatalab/RC-RAG (EMNLP Findings
2024), re-expressed Spark-first for 100 TB scale.

Layout:
    session     SparkSession factory (AQE, Arrow, tuned shuffle)
    sources     table registry over the driver parquet fixtures
    functions   scalar/array function library (text metrics, parsers,
                prompts, vectors) — reference semantics, Catalyst exprs
    operators   relational/dedup/similarity/text-analysis operators
    pipeline    RAG decision pipeline (annotate→counterfactual→fuse→eval)
                with a pluggable (mock / OpenAI-compatible) LLM operator
    streaming   Structured Streaming surface over the events table
    queries     the declared query corpus (name → Spark fn + DuckDB oracle)
"""

__version__ = "0.1.0"
