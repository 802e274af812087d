"""Build the sf0 fixture: every testdata table, SAME parquet schema,
ZERO rows — and, with --rows N, the sfTINY degenerate fixture (first
N rows per table: single-row groups, windows over one row, k-means
with fewer points than centroids, joins whose FK side is missing).

    python tools/make_sf0.py [out_dir]           # default /tmp/rc_rag_sf0
    python tools/make_sf0.py --rows 1 [out_dir]  # default /tmp/rc_rag_sftiny

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


def make_sf0(
    out_dir: str = DEFAULT_OUT, src_dir: str = SRC, n_rows: int = 0
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for fn in sorted(os.listdir(src_dir)):
        if not fn.endswith(".parquet"):
            continue
        src = os.path.join(src_dir, fn)
        if n_rows == 0:
            t = pq.read_schema(src).empty_table()
        else:
            t = pq.read_table(src).slice(0, n_rows)
        pq.write_table(t, os.path.join(out_dir, fn))
    return out_dir


if __name__ == "__main__":
    args = sys.argv[1:]
    n_rows = 0
    if args[:1] == ["--rows"]:
        n_rows = int(args[1])
        args = args[2:]
    default = DEFAULT_OUT if n_rows == 0 else "/tmp/rc_rag_sftiny"
    out = make_sf0(args[0] if args else default, n_rows=n_rows)
    print(f"wrote {n_rows}-row tables to {out}")
