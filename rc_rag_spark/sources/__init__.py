from rc_rag_spark.sources.registry import TABLES, load_tables, table

__all__ = ["TABLES", "load_tables", "table"]
