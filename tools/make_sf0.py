"""Build the sf0 fixture: every testdata table, SAME parquet schema,
ZERO rows.

    python tools/make_sf0.py [out_dir]      # default /tmp/rc_rag_sf0

At 100 TB the empty case is not hypothetical — a day partition with
no events, a source with every doc filtered upstream, a fresh table
before the first load. Every operator must plan and execute against
it without crashing (tests/test_empty_inputs.py sweeps the whole
registry; `tools/parity_report.py --sf0` hash-checks empty-input
SEMANTICS against DuckDB — global aggregates over zero rows must
agree on their one-row NULL/0 answers, grouped ones on zero rows).

Schemas are cloned from /root/testdata/sf0.001 with pyarrow (no
Spark session needed), so the fixture can never drift from the real
tables.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

SRC = os.environ.get("RC_RAG_SF0_SRC", "/root/testdata/sf0.001")
DEFAULT_OUT = "/tmp/rc_rag_sf0"


def make_sf0(out_dir: str = DEFAULT_OUT, src_dir: str = SRC) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for fn in sorted(os.listdir(src_dir)):
        if not fn.endswith(".parquet"):
            continue
        schema = pq.read_schema(os.path.join(src_dir, fn))
        pq.write_table(schema.empty_table(), os.path.join(out_dir, fn))
    return out_dir


if __name__ == "__main__":
    out = make_sf0(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT)
    print(f"wrote empty tables to {out}")
