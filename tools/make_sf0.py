"""Build the sf0 fixture: every testdata table, SAME parquet schema,
ZERO rows — and, with --rows N, the sfTINY degenerate fixture (first
N rows per table: single-row groups, windows over one row, k-means
with fewer points than centroids, joins whose FK side is missing).
--nulls appends one all-NULL row per table (every nullable column
NULL; an integer first column keeps a distinct id so the row is
addressable) — the third degenerate shape: NULL text through
tokenizers, NULL embeddings through similarity, NULL payloads
through decoders.

    python tools/make_sf0.py [out_dir]           # default /tmp/rc_rag_sf0
    python tools/make_sf0.py --rows 1 [out_dir]  # default /tmp/rc_rag_sftiny
    python tools/make_sf0.py --rows 1 --nulls [out_dir]  # /tmp/rc_rag_sfnulls

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


def _null_row(table):
    """One all-NULL row matching `table`'s schema; an integer first
    column gets first-value + 9e14 so the row keeps a distinct,
    addressable id. The offset is deliberately ENORMOUS: several
    queries derive synthetic ids by adding 1e5-1e6 to fixture ids
    (q136's mutated twins, q175's scaled copies), and a small
    sentinel collided with them — two distinct rows sharing one id,
    which no real table has (caught via q136 in the r13 sfnulls
    gate)."""
    import pyarrow as pa

    cols = []
    for i, f in enumerate(table.schema):
        if i == 0 and pa.types.is_integer(f.type) and len(table):
            v = table.column(i)[0].as_py()
            off = (
                900_000_000_000_000
                if f.type.bit_width >= 64
                else 1_000_000_000  # int32 dims: fits, still huge
            )
            cols.append(pa.array([v + off], type=f.type))
        else:
            cols.append(pa.array([None], type=f.type))
    return pa.table(dict(zip(table.schema.names, cols)), schema=table.schema)


def make_sf0(
    out_dir: str = DEFAULT_OUT,
    src_dir: str = SRC,
    n_rows: int = 0,
    null_row: bool = False,
) -> str:
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    for fn in sorted(os.listdir(src_dir)):
        if not fn.endswith(".parquet"):
            continue
        src = os.path.join(src_dir, fn)
        if n_rows == 0:
            t = pq.read_schema(src).empty_table()
        else:
            t = pq.read_table(src).slice(0, n_rows)
        if null_row:
            t = pa.concat_tables([t, _null_row(t)])
        pq.write_table(t, os.path.join(out_dir, fn))
    return out_dir


if __name__ == "__main__":
    args = sys.argv[1:]
    n_rows = 0
    null_row = False
    while args and args[0].startswith("--"):
        if args[0] == "--rows":
            n_rows = int(args[1])
            args = args[2:]
        elif args[0] == "--nulls":
            null_row = True
            args = args[1:]
        else:
            sys.exit(f"unknown flag {args[0]}")
    default = DEFAULT_OUT
    if null_row:
        default = "/tmp/rc_rag_sfnulls"
    elif n_rows:
        default = "/tmp/rc_rag_sftiny"
    out = make_sf0(args[0] if args else default, n_rows=n_rows,
                   null_row=null_row)
    print(f"wrote {n_rows}-row{' +null-row' if null_row else ''} "
          f"tables to {out}")
