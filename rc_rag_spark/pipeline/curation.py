"""Composable corpus-curation pipeline — the end-to-end training-data
path assembled from the operators the query corpus hash-checks
individually (exact dedup → near-dup clustering/retention → quality
filter → benchmark decontamination), with per-step Parquet stage
tables for resume/inspect and a per-step attrition report.

This is the library counterpart of queries q60/q62/q102/q136/q68/q157:
each step IS the oracle-checked operator, so the pipeline's semantics
are pinned transitively. Stage persistence follows pipeline/stages.py
(the reference's C1 staged-recompute pattern,
/root/reference/code/run_llm_ours.py:217-275): a step whose stage
table exists is reloaded, not recomputed.

Scale posture: every step is shuffle-bounded (hash/band equi-joins,
partial aggs); stage tables give lineage barriers so no step
re-executes upstream work; nothing is ever collected to the driver —
the attrition report is computed from stage-table counts (one
metadata-cheap count per stage).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rc_rag_spark.operators import dedup as DD
from rc_rag_spark.operators import textstats as TS


def near_dup_drop_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Ids to DROP under min-id-canonical near-dup retention (the
    q136 policy): MinHash pairs → connected components → every member
    except its cluster's minimum id."""
    pairs = DD.minhash_det_pairs(
        df, id_col, text_col,
        shingle_n=shingle_n, num_hashes=num_hashes,
        jaccard_threshold=jaccard_threshold,
    )
    clusters = DD.dedup_clusters(pairs)
    return clusters.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_tokens: int = 5,
) -> DataFrame:
    """Corpus ids sharing >= 1 verbatim n-token shingle with the
    benchmark set (the q157 decontamination join)."""
    n = shingle_tokens

    def shingles(df: DataFrame) -> DataFrame:
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        return df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.when(
                    F.size(toks) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - n + 1),
                        lambda i: F.array_join(
                            F.slice(toks, i, n), " "
                        ),
                    ),
                ).otherwise(F.array())
            ).alias("_s"),
        ).distinct()

    bench_sh = F.broadcast(shingles(benchmark).select("_s").distinct())
    return (
        shingles(corpus)
        .join(bench_sh, "_s", "left_semi")
        .select(F.col("_id").alias(id_col))
        .distinct()
    )


class CurationPipeline:
    """Ordered corpus-curation steps with stage persistence.

    >>> pipe = (CurationPipeline(spark, workdir)
    ...         .exact_dedup()
    ...         .near_dedup(jaccard_threshold=0.5)
    ...         .quality_filter(min_score=0.3)
    ...         .decontaminate(benchmark_df))
    >>> curated = pipe.run(documents)
    >>> pipe.report()   # [(stage, rows_in, rows_out, dropped), ...]
    """

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.spark = spark
        self.workdir = workdir
        self.id_col = id_col
        self.text_col = text_col
        self._steps: list[tuple[str, Callable[[DataFrame], DataFrame]]] = []
        self._params: list[dict] = []
        self._report: list[tuple[str, int, int, int | None]] = []

    def _with_params(self, name: str, params: dict) -> "CurationPipeline":
        self._params.append({"step": name, **params})
        return self

    # --- step declarations (chainable) --------------------------------

    def exact_dedup(self) -> "CurationPipeline":
        """Keep one doc per exact text fingerprint (min id wins —
        deterministic, unlike dropDuplicates' first-seen row). The
        fingerprint is md5 of the RAW text (the q60 semantics) —
        NOT `operators.dedup.fingerprint`, which normalizes
        (lowercases, strips punctuation/articles) and would collapse
        distinct documents in a curation context."""

        def step(df: DataFrame) -> DataFrame:
            keep = (
                df.groupBy(F.md5(F.col(self.text_col)).alias("_fp"))
                .agg(F.min(self.id_col).alias(self.id_col))
                .select(self.id_col)
            )
            return df.join(keep, self.id_col, "left_semi")

        self._steps.append(("exact_dedup", step))
        return self._with_params("exact_dedup", {})

    def near_dedup(
        self,
        shingle_n: int = 3,
        num_hashes: int = 8,
        jaccard_threshold: float = 0.5,
    ) -> "CurationPipeline":
        """MinHash near-dup clusters; keep each cluster's min id."""

        def step(df: DataFrame) -> DataFrame:
            drop = near_dup_drop_ids(
                df, self.id_col, self.text_col,
                shingle_n=shingle_n, num_hashes=num_hashes,
                jaccard_threshold=jaccard_threshold,
            )
            return df.join(drop, self.id_col, "left_anti")

        self._steps.append(("near_dedup", step))
        return self._with_params("near_dedup", {
            "shingle_n": shingle_n, "num_hashes": num_hashes,
            "jaccard_threshold": jaccard_threshold,
        })

    def quality_filter(self, min_score: float = 0.3) -> "CurationPipeline":
        """Gopher-style composite quality score threshold
        (operators/textstats.py — the q68/q95 signal)."""

        def step(df: DataFrame) -> DataFrame:
            return df.where(
                TS.quality_score(F.col(self.text_col)) >= min_score
            )

        self._steps.append(("quality_filter", step))
        return self._with_params("quality_filter", {"min_score": min_score})

    def decontaminate(
        self, benchmark: DataFrame, shingle_tokens: int = 5
    ) -> "CurationPipeline":
        """Drop docs sharing verbatim shingles with the benchmark."""

        def step(df: DataFrame) -> DataFrame:
            bad = contaminated_ids(
                df, benchmark, self.id_col, self.text_col,
                shingle_tokens=shingle_tokens,
            )
            return df.join(bad, self.id_col, "left_anti")

        self._steps.append(("decontaminate", step))
        return self._with_params(
            "decontaminate", {"shingle_tokens": shingle_tokens}
        )

    # --- URL curation steps (the q277-q282 family as resumable stages;
    # imports are deferred so pipeline construction never drags the
    # full query registry in) ------------------------------------------

    def url_canonical_dedup(self, url_col: str = "url") -> "CurationPipeline":
        """Keep one doc per CANONICAL URL (q280 semantics: lowercase
        host, default ports stripped, one trailing slash trimmed,
        query params sorted, fragment dropped; min id wins). Expressed
        as groupBy(canonical).min(id) — membership-identical to q284's
        rn=1 window but with map-side partial aggregation, so a
        mega-site's URL variants combine before the exchange.

        Docs whose URL is NULL or unparseable (canonical_url_col's
        concat yields NULL) pass through UNCHANGED: the group key
        falls back to a per-doc sentinel (sentinel_canonical_col —
        the SAME helper q280/q284 key on, so the query corpus and
        this pipeline can never drift), so every such doc is its own
        group — without this, all NULL-canonical docs would collapse
        into one group and min(id) would silently drop all but one of
        them."""

        def step(df: DataFrame) -> DataFrame:
            from rc_rag_spark.queries.curation import (
                parse_urls,
                sentinel_canonical_col,
            )

            parsed = parse_urls(
                df.select(self.id_col, F.col(url_col).alias("url"))
            )
            key = sentinel_canonical_col(self.id_col)
            keep = (
                parsed.select(self.id_col, key)
                .groupBy("canonical")
                .agg(F.min(self.id_col).alias(self.id_col))
                .select(self.id_col)
            )
            return df.join(keep, self.id_col, "left_semi")

        self._steps.append(("url_canonical_dedup", step))
        return self._with_params("url_canonical_dedup", {"url_col": url_col})

    def url_blocklist(
        self, blocked_domains: list[str], url_col: str = "url"
    ) -> "CurationPipeline":
        """Drop docs whose registrable domain (eTLD+1, PSL
        longest-suffix match on the lowercased host) is blocklisted —
        q279's production crawl filter as a broadcast anti-join."""
        blocked = sorted(set(blocked_domains))

        def step(df: DataFrame) -> DataFrame:
            from rc_rag_spark.queries.curation import (
                _with_registrable,
                parse_urls,
            )

            reg = _with_registrable(
                parse_urls(
                    df.select(self.id_col, F.col(url_col).alias("url"))
                )
            )
            from rc_rag_spark.queries.curation import values_table

            bl = values_table(self.spark, "registrable", list(blocked))
            bad = reg.join(
                F.broadcast(bl), "registrable", "left_semi"
            ).select(self.id_col)
            return df.join(bad, self.id_col, "left_anti")

        self._steps.append(("url_blocklist", step))
        return self._with_params(
            "url_blocklist",
            {"blocked_domains": blocked, "url_col": url_col},
        )

    def domain_quota(
        self, max_per_domain: int = 3, url_col: str = "url"
    ) -> "CurationPipeline":
        """At most K docs per registrable domain (q282 semantics:
        deterministic md5(id)-ordered sample inside each domain, id
        tiebreak — crawl-order prefixes would bias toward
        homepage-adjacent pages). The literal rank<=K filter is
        WindowGroupLimit-eligible: each task forwards at most K rows
        per domain before the exchange, which is what keeps a
        mega-domain from single-tasking the window.

        Docs with no parseable host (registrable is NULL) are NOT
        subject to the quota: the partition key falls back to a
        per-doc sentinel (sentinel_registrable_col — the SAME helper
        q282/q284 key on) so each such doc ranks rn=1 and passes
        through — otherwise NULL would form ONE pseudo-domain and the
        quota K would cap every unparseable-URL doc together."""

        def step(df: DataFrame) -> DataFrame:
            from rc_rag_spark.queries.curation import (
                _with_registrable,
                parse_urls,
                sentinel_registrable_col,
            )

            reg = _with_registrable(
                parse_urls(
                    df.select(self.id_col, F.col(url_col).alias("url"))
                )
            ).withColumn(
                "registrable", sentinel_registrable_col(self.id_col)
            )
            w = Window.partitionBy("registrable").orderBy(
                F.md5(F.col(self.id_col).cast("string")), F.col(self.id_col)
            )
            keep = (
                reg.select(
                    self.id_col, F.row_number().over(w).alias("_rn")
                )
                .where(F.col("_rn") <= max_per_domain)
                .select(self.id_col)
            )
            return df.join(keep, self.id_col, "left_semi")

        self._steps.append(("domain_quota", step))
        return self._with_params(
            "domain_quota",
            {"max_per_domain": max_per_domain, "url_col": url_col},
        )

    # --- execution -----------------------------------------------------

    def _stage_path(self, idx: int, name: str) -> str:
        return os.path.join(self.workdir, f"{idx:02d}_{name}")

    def _fs(self, path: str):
        """(jvm, FileSystem, Path) for a path's Hadoop FileSystem —
        one home for the JVM dance so exists/read/write stay in sync.
        Correct for hdfs://, s3a://, file:// and bare local paths
        alike (driver-local os.path calls would silently disable
        resume on any remote filesystem)."""
        jvm = self.spark.sparkContext._jvm
        jsc = self.spark.sparkContext._jsc
        p = jvm.org.apache.hadoop.fs.Path(path)
        return jvm, p.getFileSystem(jsc.hadoopConfiguration()), p

    def _fs_exists(self, path: str) -> bool:
        _, fs, p = self._fs(path)
        return bool(fs.exists(p))

    def _stage_done(self, path: str) -> bool:
        return self._fs_exists(path + "/_SUCCESS")

    def _manifest_path(self, idx: int, name: str) -> str:
        return self._stage_path(idx, name) + "_params.json"

    def _fs_read_text(self, path: str) -> str | None:
        """Read a small text file through the path's Hadoop
        FileSystem (None if absent) — manifests must round-trip on
        remote filesystems too, or parameter-aware invalidation
        silently turns off on remote workdirs.

        UNREADABLE is treated like ABSENT: a crash mid-create can
        leave a manifest whose bytes no longer match its checksum
        sidecar (Hadoop's local/remote FS both checksum), and the
        read then throws ChecksumException rather than returning
        truncated JSON. The stage-invalidation contract (corrupt
        manifest => recompute, never crash the run) has to cover that
        window too — found by the r14 torn-manifest chaos test."""
        jvm, fs, p = self._fs(path)
        if not fs.exists(p):
            return None
        try:
            stream = fs.open(p)
            try:
                return str(
                    jvm.org.apache.commons.io.IOUtils.toString(
                        stream, "UTF-8"
                    )
                )
            finally:
                stream.close()
        except Exception as exc:  # noqa: BLE001
            # Only torn-manifest-shaped failures (checksum mismatch,
            # truncated stream) mean "treat as absent, recompute".
            # Anything else — permission denied, remote-FS outage,
            # py4j connection loss — is an infrastructure error:
            # swallowing it would silently defeat stage caching on
            # every run, so surface those loudly (ADVICE r14).
            shaped = ("ChecksumException", "EOFException")
            java_cls = ""
            je = getattr(exc, "java_exception", None)
            if je is not None:
                try:
                    java_cls = je.getClass().getName()
                except Exception:  # noqa: BLE001 — dead gateway
                    java_cls = ""
            blob = java_cls or str(exc)
            if any(s in blob for s in shaped):
                return None  # torn mid-create: recompute the stage
            raise

    def _fs_write_text(self, path: str, text: str) -> None:
        _, fs, p = self._fs(path)
        out = fs.create(p, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def run(self, df: DataFrame, force: bool = False) -> DataFrame:
        """Execute the declared steps in order. Each step's output is
        a Parquet stage table; a stage is reused (resume) only when it
        exists AND its recorded parameters match AND no upstream stage
        was recomputed this run — otherwise it and everything after it
        recompute (stale-cascade invalidation). Returns the final
        curated DataFrame (read back from its stage table — a lineage
        barrier). The attrition report's first rows_in is only
        computed when stage 0 actually executes (a fully-resumed run
        never re-evaluates the input)."""
        import json

        self._report = []
        cur = df
        rows_in: int | None = None
        upstream_recomputed = False
        if "://" not in self.workdir:
            os.makedirs(self.workdir, exist_ok=True)
        for i, (name, step) in enumerate(self._steps):
            path = self._stage_path(i, name)
            params = self._params[i]
            manifest = self._manifest_path(i, name)
            recorded = self._fs_read_text(manifest)
            # a corrupt/truncated manifest (e.g. a crash between the
            # truncating create and close) invalidates the stage —
            # recompute, never crash the whole run on it
            try:
                params_ok = (
                    recorded is not None and json.loads(recorded) == params
                )
            except ValueError:
                params_ok = False
            reuse = (
                not force
                and not upstream_recomputed
                and params_ok
                and self._stage_done(path)
            )
            if not reuse:
                if rows_in is None:
                    rows_in = cur.count()
                step(cur).write.mode("overwrite").parquet(path)
                self._fs_write_text(manifest, json.dumps(params))
                upstream_recomputed = True
            cur = self.spark.read.parquet(path)
            rows_out = cur.count()
            self._report.append((
                name, rows_in if rows_in is not None else rows_out + 0,
                rows_out,
                (rows_in - rows_out) if rows_in is not None else None,
            ))
            rows_in = rows_out
        return cur

    def report(self) -> list[tuple[str, int, int, int | None]]:
        """Per-step attrition: (stage, rows_in, rows_out, dropped).
        dropped is None for a stage whose input count was never
        evaluated (fully-resumed stage 0)."""
        return list(self._report)
