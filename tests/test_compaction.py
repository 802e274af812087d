"""Small-file compaction mechanics (rc_rag_spark/operators/
compaction.py): the _metadata file census, the per-partition plan,
and the executed rewrite's file counts — content preservation is
hash-pinned by q285's oracle parity."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from rc_rag_spark.operators.compaction import audit_files, compact
from rc_rag_spark.sources import table


def _parquet_files(path):
    return [
        p
        for p in glob.glob(os.path.join(path, "**", "*.parquet"),
                           recursive=True)
        if os.path.basename(p).startswith("part-")
    ]


def test_audit_census_matches_filesystem(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="rc_rag_compact_audit_")
    try:
        (
            table(spark, sf_dir, "events")
            .repartition(9)
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(d)
        )
        audit = {r["partition"]: r for r in audit_files(spark, d).collect()}
        for part_dir in glob.glob(os.path.join(d, "event_type=*")):
            part = os.path.basename(part_dir)
            files = _parquet_files(part_dir)
            assert audit[part]["n_files"] == len(files), part
            assert audit[part]["total_bytes"] == sum(
                os.path.getsize(f) for f in files
            ), part
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compact_reduces_files_and_preserves_content(spark, sf_dir):
    """17 fragments per partition -> planned width per partition;
    every partition's output file count equals the plan, total files
    drop, and the full content (id-keyed) survives exactly."""
    frag = tempfile.mkdtemp(prefix="rc_rag_compact_frag_")
    out = tempfile.mkdtemp(prefix="rc_rag_compact_out_")
    try:
        ev = table(spark, sf_dir, "events")
        ev.repartition(17).write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(frag)
        plan = compact(spark, frag, out, target_bytes=8 * 1024 * 1024)
        assert plan, "no partitions planned"
        for row in plan:
            part_dir = os.path.join(out, row["partition"])
            got_files = len(_parquet_files(part_dir))
            assert got_files == row["n_files_planned"], row
            assert row["n_files_before"] == 17, row
        assert len(_parquet_files(out)) < len(_parquet_files(frag))
        # content identical, id-keyed (partition col re-derives from dirs)
        want = {
            r["event_id"]: (r["event_type"], r["user_id"], r["value"])
            for r in ev.collect()
        }
        got = {
            r["event_id"]: (r["event_type"], r["user_id"], r["value"])
            for r in spark.read.parquet(out).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(frag, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_compact_respects_target_bytes(spark, sf_dir):
    """A tiny target must yield MORE output files (finer packing), a
    huge target exactly one file per partition."""
    frag = tempfile.mkdtemp(prefix="rc_rag_compact_tb_")
    fine = tempfile.mkdtemp(prefix="rc_rag_compact_fine_")
    one = tempfile.mkdtemp(prefix="rc_rag_compact_one_")
    try:
        table(spark, sf_dir, "events").repartition(5).write.mode(
            "overwrite"
        ).parquet(frag)
        total = sum(os.path.getsize(f) for f in _parquet_files(frag))
        # fine target = a third of the data => at least 3 planned files
        plan_fine = compact(spark, frag, fine, target_bytes=max(1, total // 3))
        plan_one = compact(spark, frag, one, target_bytes=1 << 40)
        assert plan_one[0]["n_files_planned"] == 1
        assert len(_parquet_files(one)) == 1
        assert (
            plan_fine[0]["n_files_planned"] > plan_one[0]["n_files_planned"]
        )
        assert len(_parquet_files(fine)) == plan_fine[0]["n_files_planned"]
        # unpartitioned layout reports the '' partition
        assert plan_one[0]["partition"] == ""
    finally:
        for d in (frag, fine, one):
            shutil.rmtree(d, ignore_errors=True)


def test_compact_concurrency_levels_agree(spark, sf_dir):
    """The thread-pooled rewrite is a pure parallelization: plans and
    output content at max_concurrency=1 and =8 must be identical
    (plan order is sorted by partition, so the returned list is
    deterministic regardless of completion order)."""
    frag = tempfile.mkdtemp(prefix="rc_rag_compact_cc_frag_")
    seq = tempfile.mkdtemp(prefix="rc_rag_compact_cc_seq_")
    par = tempfile.mkdtemp(prefix="rc_rag_compact_cc_par_")
    try:
        table(spark, sf_dir, "events").repartition(7).write.mode(
            "overwrite"
        ).partitionBy("event_type").parquet(frag)
        plan_seq = compact(
            spark, frag, seq, target_bytes=1 << 20, max_concurrency=1
        )
        plan_par = compact(
            spark, frag, par, target_bytes=1 << 20, max_concurrency=8
        )
        assert plan_seq == plan_par and len(plan_seq) >= 2
        key = lambda d: sorted(
            (r["event_id"], r["user_id"]) for r in
            spark.read.parquet(d).collect()
        )
        assert key(seq) == key(par)
    finally:
        for d in (frag, seq, par):
            shutil.rmtree(d, ignore_errors=True)


# --- in-place compaction: manifest-published atomic swap ------------------


def _fragmented_events(spark, sf_dir, prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    (
        table(spark, sf_dir, "events")
        .repartition(9)
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(d)
    )
    return d


def _content(spark, path):
    from rc_rag_spark.operators.compaction import read_manifested

    return sorted(
        map(
            tuple,
            read_manifested(spark, path)
            .select("event_id", "event_type", "value")
            .collect(),
        )
    )


def test_in_place_compaction_swaps_atomically(spark, sf_dir):
    """compact_in_place must reduce the committed file count, bump the
    generation, and preserve content EXACTLY — all through the
    manifest reader contract."""
    from rc_rag_spark.operators.compaction import (
        compact_in_place,
        ensure_manifest,
        vacuum_manifested,
    )

    d = _fragmented_events(spark, sf_dir, "rc_rag_inplace_")
    try:
        before = _content(spark, d)
        m0 = ensure_manifest(d)
        n_before = len(m0["files"])
        res = compact_in_place(spark, d, target_bytes=64 * 1024 * 1024)
        assert res["generation"] == m0["generation"] + 1
        m1 = ensure_manifest(d)
        assert m1["generation"] == res["generation"]
        assert len(m1["files"]) < n_before
        assert _content(spark, d) == before
        # superseded generation-0 files linger until vacuum (the
        # time-travel window), then are reclaimed; committed set stays
        on_disk = len(_parquet_files(d)) + len(
            glob.glob(os.path.join(d, "**", "gen-*.parquet"),
                      recursive=True)
        )
        assert on_disk > len(m1["files"])
        deleted = vacuum_manifested(d, retention_sec=0.0)
        assert len(deleted) == n_before
        assert _content(spark, d) == before
        # idempotent: a second pass finds nothing fragmented
        res2 = compact_in_place(spark, d, target_bytes=64 * 1024 * 1024)
        assert res2["rewritten"] == []
        assert _content(spark, d) == before
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_in_place_crash_window_old_files_still_serve(spark, sf_dir):
    """Kill between rewrite and publish: the manifest still lists the
    old generation, so readers resolve the OLD bytes; the retry then
    completes the swap, and vacuum reclaims both the superseded
    originals and the crashed attempt's stranded files."""
    from rc_rag_spark.operators.compaction import (
        compact_in_place,
        ensure_manifest,
        vacuum_manifested,
    )

    d = _fragmented_events(spark, sf_dir, "rc_rag_inplace_crash_")
    try:
        before = _content(spark, d)
        m0 = ensure_manifest(d)

        class Killed(RuntimeError):
            pass

        def kill():
            raise Killed()

        import pytest

        with pytest.raises(Killed):
            compact_in_place(
                spark, d, target_bytes=64 * 1024 * 1024, publish_hook=kill
            )
        # crash window: manifest unmoved, old bytes serve, even though
        # the new generation's files already sit in the live dirs
        m_after_crash = ensure_manifest(d)
        assert m_after_crash == m0
        assert _content(spark, d) == before
        stranded = glob.glob(
            os.path.join(d, "**", "gen-000001-*.parquet"), recursive=True
        )
        assert stranded  # the crashed attempt really left debris

        # retry completes; content identical; generation advances
        res = compact_in_place(spark, d, target_bytes=64 * 1024 * 1024)
        assert res["generation"] == m0["generation"] + 1
        assert _content(spark, d) == before

        # vacuum reclaims originals + first-attempt debris, keeps the
        # committed set, and the table still reads identically
        vacuum_manifested(d, retention_sec=0.0)
        m2 = ensure_manifest(d)
        remaining = set()
        for root, dirs, files in os.walk(d):
            dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
            for fn in files:
                if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                    remaining.add(
                        os.path.relpath(os.path.join(root, fn), d)
                    )
        assert remaining == set(m2["files"])
        assert _content(spark, d) == before
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_in_place_crash_during_manifest_write_is_invisible(spark, sf_dir):
    """A truncated manifest can never be published: the writer goes
    through a temp file + os.replace, so a crash mid-serialization
    leaves only hidden debris and the committed manifest intact."""
    import json

    from rc_rag_spark.operators import compaction as C

    d = _fragmented_events(spark, sf_dir, "rc_rag_inplace_trunc_")
    try:
        before = _content(spark, d)
        m0 = C.ensure_manifest(d)
        # simulate the kill inside the atomic publish: mkstemp happens,
        # the replace never does
        real_replace = os.replace

        def dying_replace(src, dst):
            if os.path.basename(dst) == "_MANIFEST":
                raise OSError("killed mid-publish")
            return real_replace(src, dst)

        os.replace = dying_replace
        try:
            import pytest

            with pytest.raises(OSError, match="killed mid-publish"):
                C.compact_in_place(spark, d, target_bytes=64 * 1024 * 1024)
        finally:
            os.replace = real_replace
        with open(os.path.join(d, "_MANIFEST")) as f:
            assert json.load(f) == m0  # committed pointer untouched
        assert _content(spark, d) == before
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_read_manifested_empty_manifest_is_a_clear_error(spark):
    """A manifest listing zero files must raise a clear ValueError,
    not spark.read.parquet()'s unhelpful zero-path AnalysisException
    (ADVICE r11)."""
    import pytest

    from rc_rag_spark.operators import compaction as C

    d = tempfile.mkdtemp(prefix="rc_rag_empty_manifest_")
    try:
        m = C.ensure_manifest(d)  # empty dir -> generation 0, no files
        assert m["files"] == []
        with pytest.raises(ValueError, match="zero data files"):
            C.read_manifested(spark, d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_vacuum_never_touches_an_in_flight_generation(spark, sf_dir):
    """vacuum_manifested racing a concurrent compact_in_place: the
    in-flight attempt's moved-but-unpublished gen-(N+1) files and its
    live _staging_gen-(N+1) dir must survive even retention_sec=0.0
    (ADVICE r11 — the old behavior deleted both, corrupting the
    in-flight publish), while a same-or-older-generation orphan is
    still reclaimed. Once a newer manifest commits, the debris
    becomes reclaimable."""
    import json

    from rc_rag_spark.operators import compaction as C

    d = _fragmented_events(spark, sf_dir, "rc_rag_vacuum_race_")
    try:
        m0 = C.ensure_manifest(d)  # committed generation 0
        # simulate an in-flight gen-1 attempt mid-step-3/4: a moved
        # output file in a live partition dir plus its staging dir
        live_dir = glob.glob(os.path.join(d, "event_type=*"))[0]
        inflight = os.path.join(
            live_dir, "gen-000001-00000-deadbeef.parquet"
        )
        with open(inflight, "wb") as f:
            f.write(b"x")
        staging = os.path.join(d, "_staging_gen-000001-deadbeef")
        os.makedirs(staging)
        # and a reclaimable orphan: an untagged file no manifest lists
        orphan = os.path.join(live_dir, "orphan-not-in-manifest.parquet")
        with open(orphan, "wb") as f:
            f.write(b"x")
        old = time.time() - 3600
        for p in (inflight, staging, orphan):
            os.utime(p, (old, old))

        deleted = C.vacuum_manifested(d, retention_sec=0.0)
        assert os.path.exists(inflight), "in-flight gen-1 file deleted"
        assert os.path.isdir(staging), "live staging dir deleted"
        assert not os.path.exists(orphan)
        assert all("gen-000001" not in p for p in deleted)

        # default retention (24 h) reclaims nothing fresh: plant a new
        # orphan with current mtime and vacuum with defaults
        fresh = os.path.join(live_dir, "fresh-orphan.parquet")
        with open(fresh, "wb") as f:
            f.write(b"x")
        assert C.vacuum_manifested(d) == []
        assert os.path.exists(fresh)
        os.unlink(fresh)

        # publish generation 1 (same committed file set): the crashed
        # attempt's gen-1 debris is no longer newer than the manifest
        C._publish_manifest(d, {"generation": 1, "files": m0["files"]})
        deleted = C.vacuum_manifested(d, retention_sec=0.0)
        assert not os.path.exists(inflight)
        assert not os.path.isdir(staging)
        with open(os.path.join(d, "_MANIFEST")) as f:
            assert json.load(f)["generation"] == 1
        assert _content(spark, d) is not None  # committed set intact
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_vacuum_racing_live_compaction_window(spark, sf_dir):
    """VERDICT r12 item 5: actually RACE vacuum against a LIVE
    compact_in_place, not just against planted debris. The
    publish_hook seam runs vacuum_manifested (retention 0 AND the
    default) exactly inside the widest race window — after step 3
    moved the gen-1 files into live partition dirs, before step 5
    publishes the manifest — while a concurrent reader checks the old
    generation still serves. The in-flight generation must survive
    both vacuums, and the publish must then commit intact."""
    from rc_rag_spark.operators import compaction as C

    d = _fragmented_events(spark, sf_dir, "rc_rag_live_race_")
    try:
        before = _content(spark, d)
        seen = {}

        def racing_vacuum():
            # oldest possible mtimes can't exist mid-run, but
            # retention 0 removes the time guard entirely — only the
            # generation guard protects the in-flight files here
            seen["deleted_r0"] = C.vacuum_manifested(d, retention_sec=0.0)
            seen["deleted_default"] = C.vacuum_manifested(d)
            seen["mid_read"] = _content(spark, d)
            with open(os.path.join(d, "_MANIFEST")) as f:
                import json

                seen["mid_gen"] = json.load(f)["generation"]
            seen["inflight_present"] = bool(
                glob.glob(os.path.join(d, "**", "gen-000001-*.parquet"),
                          recursive=True)
            )

        res = C.compact_in_place(
            spark, d, target_bytes=64 * 1024 * 1024,
            publish_hook=racing_vacuum,
        )
        assert res["generation"] == 1
        # inside the window: old generation served, in-flight files
        # survived both vacuum flavors
        assert seen["mid_gen"] == 0
        assert seen["mid_read"] == before
        assert seen["inflight_present"], (
            f"racing vacuum deleted in-flight files: {seen}"
        )
        assert all("gen-000001" not in p for p in seen["deleted_r0"])
        assert all("gen-000001" not in p for p in seen["deleted_default"])
        # after publish: gen 1 serves the same rows
        assert _content(spark, d) == before
        import json

        with open(os.path.join(d, "_MANIFEST")) as f:
            assert json.load(f)["generation"] == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_vacuum_reclaims_stale_inflight_debris(spark, sf_dir):
    """ADVICE r12: an 'in-flight' generation OLDER than
    inflight_max_age_sec is the debris of a crashed, never-retried
    compaction — without the ceiling it leaks forever on tables that
    stop being compacted. Fresh in-flight debris still survives."""
    from rc_rag_spark.operators import compaction as C

    d = _fragmented_events(spark, sf_dir, "rc_rag_stale_inflight_")
    try:
        C.ensure_manifest(d)  # committed generation 0
        live_dir = glob.glob(os.path.join(d, "event_type=*"))[0]
        stale = os.path.join(live_dir, "gen-000007-00000-aaaaaaaa.parquet")
        fresh = os.path.join(live_dir, "gen-000008-00000-bbbbbbbb.parquet")
        stale_dir = os.path.join(d, "_staging_gen-000007-aaaaaaaa")
        for p in (stale, fresh):
            with open(p, "wb") as f:
                f.write(b"x")
        os.makedirs(stale_dir)
        eight_days = time.time() - 8 * 24 * 3600
        for p in (stale, stale_dir):
            os.utime(p, (eight_days, eight_days))

        deleted = C.vacuum_manifested(d)  # defaults: 24h / 7d ceiling
        assert not os.path.exists(stale), "stale in-flight debris leaked"
        assert not os.path.isdir(stale_dir)
        assert os.path.exists(fresh), "fresh in-flight file reclaimed"
        assert any("gen-000007" in p for p in deleted)

        # inf ceiling restores never-reclaim for gen-tagged debris
        os.makedirs(stale_dir)
        with open(stale, "wb") as f:
            f.write(b"x")
        for p in (stale, stale_dir):
            os.utime(p, (eight_days, eight_days))
        C.vacuum_manifested(d, inflight_max_age_sec=float("inf"))
        assert os.path.exists(stale) and os.path.isdir(stale_dir)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_publish_aborts_when_staged_files_were_reclaimed(spark, sf_dir):
    """ADVICE r13 (medium): a compaction that stalls past vacuum's
    inflight_max_age_sec ceiling can have its moved-but-unpublished
    generation reclaimed. Publishing anyway would commit a manifest
    of deleted files — the table bricks. compact_in_place must verify
    the listed files exist at publish time, abort with a RETRYABLE
    error, leave generation N serving, and succeed on retry."""
    import pytest

    from rc_rag_spark.operators import compaction as C

    d = _fragmented_events(spark, sf_dir, "rc_rag_reclaim_abort_")
    try:
        before = _content(spark, d)
        m0 = C.ensure_manifest(d)

        def reclaim_like_vacuum():
            # simulate the over-aged-inflight reclaim: vacuum deletes
            # one of the moved gen-1 files before the publish
            victim = sorted(
                glob.glob(
                    os.path.join(d, "**", "gen-000001-*.parquet"),
                    recursive=True,
                )
            )[0]
            os.unlink(victim)

        with pytest.raises(C.CompactionReclaimedError, match="retry"):
            C.compact_in_place(
                spark,
                d,
                target_bytes=64 * 1024 * 1024,
                publish_hook=reclaim_like_vacuum,
            )
        # generation N untouched and fully serving
        assert C.ensure_manifest(d) == m0
        assert _content(spark, d) == before
        # the retry completes normally and content is preserved
        res = C.compact_in_place(spark, d, target_bytes=64 * 1024 * 1024)
        assert res["generation"] >= m0["generation"] + 1
        assert _content(spark, d) == before
    finally:
        shutil.rmtree(d, ignore_errors=True)
