"""Beyond-fixture stress check for q253's claim: two-level bitmap
aggregation computes EXACT per-group distinct counts with a
fixed-size-per-bucket shuffle, and beats the COUNT(DISTINCT) expand
as rows/duplication grow.

Synthesizes a 40M-row event stream (5 event types, 2M dense user ids,
20x average duplication — the shape where distinct-expand pays for
every raw row while bitmaps pay per 32k-id bucket), then times:

  a) groupBy(type).agg(countDistinct(user_id))   — expand path
  b) groupBy(type, bucket).bitmap_construct_agg  — q253's two-level path

and asserts the counts agree exactly.

    python tools/stress_bitmap.py [n_rows_millions]

Appends a results section to SCALING.md.
"""

from __future__ import annotations

import datetime
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_m = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    from pyspark.sql import functions as F

    from rc_rag_spark.session import build_session

    spark = build_session(app_name="rc-rag-stress-bitmap")
    spark.sparkContext.setLogLevel("ERROR")

    n = n_m * 1_000_000
    ev = (
        spark.range(n)
        .select(
            (F.xxhash64(F.col("id")) % 5).alias("tmod"),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(2_000_000))).alias(
                "user_id"
            ),
        )
        .select(
            F.concat(F.lit("t"), F.pmod("tmod", F.lit(5)).cast("string")).alias(
                "event_type"
            ),
            "user_id",
        )
        .localCheckpoint(eager=True)
    )

    def timed(fn):
        best = float("inf")
        out = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_expand, r_expand = timed(
        lambda: {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
    )

    def bitmap_path():
        buckets = ev.groupBy(
            "event_type", F.expr("bitmap_bucket_number(user_id)").alias("b")
        ).agg(
            F.bitmap_construct_agg(F.expr("bitmap_bit_position(user_id)")).alias(
                "bm"
            )
        )
        return {
            r["event_type"]: r["n"]
            for r in buckets.groupBy("event_type")
            .agg(F.sum(F.bitmap_count("bm")).alias("n"))
            .collect()
        }

    t_bitmap, r_bitmap = timed(bitmap_path)

    assert r_expand == r_bitmap, (r_expand, r_bitmap)
    speedup = t_expand / t_bitmap

    stamp = f"{datetime.datetime.now(datetime.timezone.utc):%Y-%m-%d %H:%M}"
    section = f"""
## Bitmap exact-distinct stress — {n:,} rows, 2M dense ids, 5 groups — {stamp} UTC

q253's two-level bitmap aggregation vs the COUNT(DISTINCT) expand on
the same {n_m}M-row stream (warm best-of-3, results asserted equal):

| path | warm time | speedup |
|---|---|---|
| countDistinct (expand) | {t_expand:.2f} s | 1.00x |
| bitmap two-level (q253) | {t_bitmap:.2f} s | {speedup:.2f}x |

Why: the expand path shuffles one row per surviving (group, id) pair
after partial dedup; the bitmap path's map-side partials OR into at
most |groups| x 62 fixed 4 KB bitmaps regardless of row count, so the
exchange is metadata-sized and the gap widens with duplication factor.
"""
    with open(os.path.join(REPO, "SCALING.md"), "a") as fh:
        fh.write(section)
    print(section)


if __name__ == "__main__":
    main()
