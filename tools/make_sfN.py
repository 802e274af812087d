"""Synthesize an sf(0.1 x N)-scale dataset for decade scaling probes.

Round-15 generalization of make_sf1.py (VERDICT r14 item 1): the
north star is 100 TB, measured scaling stopped at sf1 (10x the bench
SF). This tool makes the fifth and sixth decades locally affordable:
N=10 -> sf1, N=100 -> sf10 (~1.9 GB), N=1000 -> sf100 (~19 GB on a
79 GB-free box).

Derivation (deterministic, RNG-free) from sf0.1 by N key-shifted
replicas — same invariants as make_sf1.py and for the same reasons:

- facts (documents, embeddings, orders+lineitem, events) replicate
  with primary keys shifted by k * (max_key + 1), k = 0..N-1;
- documents' TEXT is mutated per replica (every word suffixed with
  the replica number, k=0 kept verbatim) so replicas share no
  shingles — without this every dedup/near-dup workload would see
  N-way exact-duplicate clusters and blow up quadratically in a way
  real Nx corpora do not; n_chars is recomputed from mutated text;
- embeddings rotate each vector by k % dim positions AND negate the
  first (k // dim) elements (both norm-preserving). Plain rotation
  repeats every `dim` replicas (k=0 and k=64 would be exact
  duplicates at N=1000, distorting SemDeDup rates); the sign stripe
  keeps all k < dim*(dim+1) replicas pairwise distinct;
- events get fresh user_ids per replica — an Nx service has more
  users, not Nx-duplicated ones;
- dims (region, nation, supplier, customer, part) copy unchanged —
  dimension tables grow sublinearly in real warehouses, and the
  orders/lineitem foreign keys stay within the original domains so
  join fan-outs scale like a genuinely larger market.

Usage:
    python tools/make_sfN.py DST --replicas N [--tables t1,t2,...]

`--tables` limits generation (the decade probe only scans what its
anchors read); dims are always copied so every fixture dir is a
complete, self-consistent database.
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"
DIMS = ("region", "nation", "supplier", "customer", "part")
FACTS = ("documents", "embeddings", "orders", "lineitem", "events")


def generate(
    dst: str,
    replicas: int,
    tables: set[str] | None = None,
    src: str = SRC,
) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")  # stream big COPYs

    def copy_sql(select: str, name: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{dst}/{name}.parquet' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows", flush=True)

    want = set(FACTS) if tables is None else set(tables)

    for dim in DIMS:
        copy_sql(f"SELECT * FROM read_parquet('{src}/{dim}.parquet')", dim)

    rep = f"CROSS JOIN range({replicas}) r(k)"

    if "documents" in want:
        copy_sql(
            f"""
            WITH src AS (
                SELECT * FROM read_parquet('{src}/documents.parquet')),
            m AS (SELECT MAX(doc_id) + 1 AS d FROM src),
            x AS (
                SELECT doc_id + k * m.d AS doc_id,
                       CASE WHEN k = 0 THEN text
                            ELSE regexp_replace(
                                text, '(\\S+)',
                                '\\1' || CAST(k AS STRING), 'g')
                       END AS text,
                       lang, source
                FROM src, m {rep})
            SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM x
            """,
            "documents",
        )

    if "embeddings" in want:
        dim_n = con.execute(
            f"SELECT len(embedding) FROM "
            f"read_parquet('{src}/embeddings.parquet') LIMIT 1"
        ).fetchone()[0]
        copy_sql(
            f"""
            WITH src AS (
                SELECT * FROM read_parquet('{src}/embeddings.parquet')),
            m AS (SELECT MAX(vec_id) + 1 AS d FROM src),
            rot AS (
                SELECT vec_id + k * m.d AS vec_id,
                       k // {dim_n} AS flips,
                       CASE WHEN k % {dim_n} = 0 THEN embedding
                            ELSE embedding[(k % {dim_n}) + 1:]
                                 || embedding[1:(k % {dim_n})]
                       END AS e,
                       label
                FROM src, m {rep})
            SELECT vec_id,
                   CASE WHEN flips = 0 THEN e
                        ELSE list_transform(
                            e, (x, i) -> CASE WHEN i <= flips
                                              THEN -x ELSE x END)
                   END AS embedding,
                   label
            FROM rot
            """,
            "embeddings",
        )

    if "orders" in want:
        copy_sql(
            f"""
            WITH src AS (
                SELECT * FROM read_parquet('{src}/orders.parquet')),
            m AS (SELECT MAX(o_orderkey) + 1 AS d FROM src)
            SELECT * REPLACE (o_orderkey + k * m.d AS o_orderkey)
            FROM src, m {rep}
            """,
            "orders",
        )
    if "lineitem" in want:
        copy_sql(
            f"""
            WITH src AS (
                SELECT * FROM read_parquet('{src}/lineitem.parquet')),
            m AS (SELECT MAX(o_orderkey) + 1 AS d
                  FROM read_parquet('{src}/orders.parquet'))
            SELECT * REPLACE (l_orderkey + k * m.d AS l_orderkey)
            FROM src, m {rep}
            """,
            "lineitem",
        )

    if "events" in want:
        copy_sql(
            f"""
            WITH src AS (
                SELECT * FROM read_parquet('{src}/events.parquet')),
            m AS (SELECT MAX(event_id) + 1 AS d, MAX(user_id) + 1 AS u
                  FROM src)
            SELECT * REPLACE (event_id + k * m.d AS event_id,
                              user_id + k * m.u AS user_id)
            FROM src, m {rep}
            """,
            "events",
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dst")
    ap.add_argument("--replicas", type=int, required=True)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated fact tables to generate (default: all); "
        "dims are always copied",
    )
    args = ap.parse_args()
    tables = set(args.tables.split(",")) if args.tables else None
    generate(args.dst, args.replicas, tables)


if __name__ == "__main__":
    main()
