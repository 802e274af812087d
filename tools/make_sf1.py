"""Synthesize an sf1-scale dataset (10x sf0.1) for bench anchoring.

The driver provides sf0.001/0.01/0.1 only; the sf1 anchor in SCALE.md
needs one more decade. Derivation (deterministic, RNG-free) from
sf0.1 by 10 key-shifted replicas:

- facts (documents, embeddings, orders+lineitem, events) replicate
  with primary keys shifted by k * (max_key + 1), k = 0..9;
- documents' TEXT is mutated per replica (every word suffixed with
  the replica digit, k=0 kept verbatim) so replicas share no shingles
  — without this, every dedup/near-dup workload would see 10-way
  exact-duplicate clusters and blow up quadratically in a way real
  10x corpora do not; n_chars is recomputed from the mutated text;
- embeddings rotate each vector by k positions (norm-preserving, but
  cosine structure across replicas decorrelates) for the same reason;
- events get fresh user_ids per replica (user_id shift) — a 10x
  service has more users, not 10x-duplicated ones;
- dims (region, nation, supplier, customer, part) copy unchanged —
  dimension tables grow sublinearly in real warehouses, and the
  orders/lineitem foreign keys stay within the original domains so
  join fan-outs scale like a genuinely larger market.

Usage: python tools/make_sf1.py [dst_dir]   (default /tmp/rc_rag_sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rc_rag_sf1"
REPLICAS = 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    def copy_sql(select: str, name: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{DST}/{name}.parquet' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{DST}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    for dim in ("region", "nation", "supplier", "customer", "part"):
        copy_sql(
            f"SELECT * FROM read_parquet('{SRC}/{dim}.parquet')", dim
        )

    rep = f"CROSS JOIN range({REPLICAS}) r(k)"

    copy_sql(
        f"""
        WITH src AS (SELECT * FROM read_parquet('{SRC}/documents.parquet')),
        m AS (SELECT MAX(doc_id) + 1 AS d FROM src),
        x AS (
            SELECT doc_id + k * m.d AS doc_id,
                   CASE WHEN k = 0 THEN text
                        ELSE regexp_replace(
                            text, '(\\S+)', '\\1' || CAST(k AS STRING), 'g')
                   END AS text,
                   lang, source
            FROM src, m {rep})
        SELECT doc_id, text, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM x
        """,
        "documents",
    )

    copy_sql(
        f"""
        WITH src AS (SELECT * FROM read_parquet('{SRC}/embeddings.parquet')),
        m AS (SELECT MAX(vec_id) + 1 AS d FROM src)
        SELECT vec_id + k * m.d AS vec_id,
               CASE WHEN k = 0 THEN embedding
                    ELSE embedding[k + 1:] || embedding[1:k]
               END AS embedding,
               label
        FROM src, m {rep}
        """,
        "embeddings",
    )

    copy_sql(
        f"""
        WITH src AS (SELECT * FROM read_parquet('{SRC}/orders.parquet')),
        m AS (SELECT MAX(o_orderkey) + 1 AS d FROM src)
        SELECT * REPLACE (o_orderkey + k * m.d AS o_orderkey)
        FROM src, m {rep}
        """,
        "orders",
    )
    copy_sql(
        f"""
        WITH src AS (SELECT * FROM read_parquet('{SRC}/lineitem.parquet')),
        m AS (SELECT MAX(o_orderkey) + 1 AS d
              FROM read_parquet('{SRC}/orders.parquet'))
        SELECT * REPLACE (l_orderkey + k * m.d AS l_orderkey)
        FROM src, m {rep}
        """,
        "lineitem",
    )

    copy_sql(
        f"""
        WITH src AS (SELECT * FROM read_parquet('{SRC}/events.parquet')),
        m AS (SELECT MAX(event_id) + 1 AS d, MAX(user_id) + 1 AS u
              FROM src)
        SELECT * REPLACE (event_id + k * m.d AS event_id,
                          user_id + k * m.u AS user_id)
        FROM src, m {rep}
        """,
        "events",
    )


if __name__ == "__main__":
    main()
