from rc_rag_spark.sources.registry import (
    BROADCAST_DIMS,
    TABLES,
    load_tables,
    read_csv,
    read_jsonl,
    read_orc,
    table,
    wide_table,
    write_csv,
    write_jsonl,
    write_orc,
    write_partitioned,
)

__all__ = [
    "BROADCAST_DIMS",
    "TABLES",
    "load_tables",
    "read_csv",
    "read_jsonl",
    "read_orc",
    "table",
    "wide_table",
    "write_csv",
    "write_jsonl",
    "write_orc",
    "write_partitioned",
]
