"""Dedup/similarity operator tests: LSH candidate generators verified
against exact ground truth; planted near-duplicates must be found."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import rc_rag_spark.queries as q
from rc_rag_spark.operators import dedup as DD
from rc_rag_spark.operators import similarity as SIM
from rc_rag_spark.operators import textstats as TS
from rc_rag_spark.sources import table


def test_minhash_finds_planted_dups(spark, sf_dir):
    pairs = q.REGISTRY["q62_minhash_near_dup"].fn(spark, sf_dir).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {
        (r["doc_id"], r["doc_id"] + 1_000_000)
        for r in table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id")
        .collect()
    }
    hit = planted & found
    # MinHash is probabilistic: demand high recall of planted pairs
    assert len(hit) >= 0.8 * len(planted), (len(hit), len(planted))


def test_mllib_minhash_finds_planted_dups(spark, sf_dir):
    """The MLlib MinHashLSH variant (library path for when approximate
    banding at scale matters more than oracle determinism) must also
    recall planted near-dups."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    words = F.split("text", " ")
    mutated = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.slice(words, 1, F.greatest(F.size(words) - 3, F.lit(1))), " "
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(mutated)
    pairs = DD.minhash_lsh_pairs(
        corpus, "doc_id", "text", shingle_n=3,
        num_hash_tables=8, jaccard_threshold=0.5,
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {
        (r["doc_id"], r["doc_id"] + 1_000_000)
        for r in d.where(F.col("doc_id") % 10 == 0).select("doc_id").collect()
    }
    hit = planted & found
    assert len(hit) >= 0.8 * len(planted), (len(hit), len(planted))


def test_det_minhash_band_recall(spark):
    """Deterministic md5 MinHash: identical texts collide on every
    band; disjoint texts collide on none (w.h.p. for 60-bit hashes)."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "one two three four five six seven"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.minhash_det_pairs(
            df, "doc_id", "text", jaccard_threshold=0.5
        ).collect()
    }
    assert pairs == {(0, 1): 1.0}


def test_simhash_finds_planted_dups(spark, sf_dir):
    pairs = q.REGISTRY["q63_simhash_near_dup"].fn(spark, sf_dir).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {
        (r["doc_id"], r["doc_id"] + 1_000_000)
        for r in table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id")
        .collect()
    }
    hit = planted & found
    assert len(hit) >= 0.6 * len(planted), (len(hit), len(planted))


def test_simhash_deterministic(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(50)
    a = {r["doc_id"]: r["sh"] for r in d.select("doc_id", DD.simhash64("text").alias("sh")).collect()}
    b = {r["doc_id"]: r["sh"] for r in d.select("doc_id", DD.simhash64("text").alias("sh")).collect()}
    assert a == b


def test_lsh_knn_recall_vs_bruteforce(spark, sf_dir):
    exact = q.REGISTRY["q64_knn_bruteforce"].fn(spark, sf_dir).collect()
    approx = q.REGISTRY["q65_knn_lsh"].fn(spark, sf_dir).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[qid] & approx_sets.get(qid, set())) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_embedding_near_dup_self_pairs(spark, sf_dir):
    """Planting exact duplicates (shifted ids) must yield sim≈1 pairs."""
    e = table(spark, sf_dir, "embeddings").limit(50)
    dup = e.select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label")
    corpus = e.unionByName(dup)
    pairs = SIM.embedding_near_dup(corpus, cosine_threshold=0.99)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    want = {(r["vec_id"], r["vec_id"] + 10_000) for r in e.select("vec_id").collect()}
    assert want <= found, f"missing {len(want - found)} of {len(want)}"


def test_exact_near_dup_guard_rejects_big_corpus(spark, sf_dir):
    """The ground-truth baseline materializes the corpus on the driver,
    so it must refuse oversized inputs and point at the LSH scale
    path instead of OOMing."""
    e = table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="embedding_near_dup"):
        SIM.exact_near_dup_pairs(e, max_rows=5)
    # under the ceiling the baseline still runs
    assert (
        SIM.exact_near_dup_pairs(
            e.limit(20), cosine_threshold=0.99, max_rows=20
        ).count()
        >= 0
    )


def test_language_id_markers(spark):
    rows = [
        (0, "the cat and the dog of it is you that"),
        (1, "der hund und die katze ist nicht ein"),
        (2, "el perro y la casa de los que en un"),
        (3, "le chat et les chiens est dans une que"),
        (4, "xyzzy qwerty plugh"),
    ]
    df = spark.createDataFrame(rows, "id int, txt string")
    got = {r["id"]: r["lang"] for r in df.select("id", TS.language_id("txt").alias("lang")).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "es" and got[3] == "fr"
    assert got[4] == "und"


def test_rolling_fingerprint_shift_invariance(spark):
    """Winnowing property: a doc and the same doc with one appended
    word usually share the min-window fingerprint; an unrelated doc
    doesn't."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
        (2, "completely different content with other words entirely"),
    ]
    df = spark.createDataFrame(rows, "id int, txt string")
    fp = {r["id"]: r["fp"] for r in df.select("id", TS.rolling_hash_fingerprint("txt").alias("fp")).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_exact_and_fingerprint_dedup(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(
        d.select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
    )
    assert DD.exact_dedup(doubled, ["text"]).count() == d.count()
    assert DD.fingerprint_dedup(doubled, "text").count() == d.count()


@pytest.mark.parametrize("name", ["q70_language_id", "q71_rolling_fingerprint"])
def test_rows_only_queries_run(spark, sf_dir, name):
    df = q.REGISTRY[name].fn(spark, sf_dir)
    assert df.count() > 0


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    import rc_rag_spark.queries as q

    exact = q.REGISTRY["q64_knn_bruteforce"].fn(spark, sf_dir).collect()
    approx = q.REGISTRY["q75_knn_ivf"].fn(spark, sf_dir).collect()
    es, as_ = {}, {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        as_.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(es[k] & as_.get(k, set())) / len(es[k]) for k in es]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_zscore_grouped_map_matches_native(spark, sf_dir):
    from rc_rag_spark.operators.groupstats import (
        zscore_grouped_map,
        zscore_native,
    )
    from rc_rag_spark.sources import table
    from pyspark.sql import functions as F

    d = table(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("double").alias("n_chars"),
        "doc_id",
    )
    gm = zscore_grouped_map(
        d.select("lang", "n_chars", "doc_id"), ["lang", "doc_id"], "n_chars"
    )
    # singleton groups → all zeros
    assert all(r["zscore"] == 0.0 for r in gm.collect())
    by_lang_gm = {
        (r["lang"], r["n_chars"]): round(r["zscore"], 9)
        for r in zscore_grouped_map(d.select("lang", "n_chars"), ["lang"], "n_chars").collect()
    }
    by_lang_native = {
        (r["lang"], r["n_chars"]): round(r["zscore"], 9)
        for r in zscore_native(d.select("lang", "n_chars"), ["lang"], "n_chars").collect()
    }
    assert by_lang_gm == by_lang_native


def test_simhash_band_join_is_complete(spark, sf_dir):
    """Pigeonhole completeness: for hamming distance < num_bands the
    band-bucket join must find EXACTLY the brute-force pair set."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    sh = d.select("doc_id", DD.simhash64("text").alias("sh")).cache()
    a, b = sh.alias("a"), sh.alias("b")
    brute = {
        (r["ia"], r["ib"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("ia"),
            F.col("b.doc_id").alias("ib"),
            DD.hamming64(F.col("a.sh"), F.col("b.sh")).alias("h"),
        )
        .where(F.col("h") <= 3)
        .collect()
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in DD.simhash_near_dup_pairs(
            d, "doc_id", "text", max_hamming=3, num_bands=4
        ).collect()
    }
    assert banded == brute


def test_pruned_topk_matches_bruteforce(spark, sf_dir):
    """Per-partition-pruned exact top-k must return the same neighbor
    sets as the windowed brute force."""
    e = table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.where(F.col("vec_id") >= 5).repartition(6)
    a = SIM.brute_force_topk(corpus, queries, k=5)
    b = SIM.brute_force_topk_pruned(corpus, queries, k=5)
    sa = {(r["query_id"], r["neighbor_id"]) for r in a.collect()}
    sb = {(r["query_id"], r["neighbor_id"]) for r in b.collect()}
    assert sa == sb


def test_bruteforce_topk_query_ceiling(spark):
    """The unpruned exact path scores n_queries x n_corpus rows, so an
    oversized query set must raise toward the pruned/ANN paths instead
    of silently going all-pairs."""
    import pytest

    rows = [(i, [float(i), 1.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.selectExpr("vec_id as query_id", "embedding")
    with pytest.raises(ValueError, match="max_queries"):
        SIM.brute_force_topk(df, queries, k=2, max_queries=5)
    # raising the ceiling explicitly re-enables the ground-truth run
    out = SIM.brute_force_topk(df, queries, k=2, max_queries=10)
    assert out.count() == 20


def test_pruned_topk_query_ceiling(spark):
    """The pruned exact path collects+broadcasts the query side, so an
    oversized query set must raise toward LSH/IVF instead of silently
    materializing it on the driver."""
    import pytest

    rows = [(i, [float(i), 1.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.selectExpr("vec_id as query_id", "embedding")
    with pytest.raises(ValueError, match="max_queries"):
        SIM.brute_force_topk_pruned(df, queries, k=2, max_queries=5)
    # raising the ceiling explicitly re-enables the ground-truth run
    out = SIM.brute_force_topk_pruned(df, queries, k=2, max_queries=10)
    assert out.count() == 20


def test_pruned_topk_tiebreak_on_duplicate_vectors(spark):
    """Tied similarities at the k boundary must resolve by smallest
    neighbor_id in BOTH exact variants (8 identical vectors, k=3)."""
    rows = [(10 + i, [1.0, 2.0, 3.0]) for i in range(8)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "query_id long, embedding array<float>"
    )
    a = SIM.brute_force_topk(corpus.repartition(4), queries, k=3)
    b = SIM.brute_force_topk_pruned(corpus.repartition(4), queries, k=3)
    ids_a = sorted(r["neighbor_id"] for r in a.collect())
    ids_b = sorted(r["neighbor_id"] for r in b.collect())
    assert ids_a == ids_b == [10, 11, 12]


def test_det_minhash_pairs_sound_and_complete_vs_bruteforce(spark, sf_dir):
    """Soundness: every emitted pair really has jaccard >= threshold.
    Conservative completeness: identical shingle sets collide on every
    band, so jaccard == 1 pairs are always found."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    corpus = d.select("doc_id", "text").unionByName(
        d.where(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 500).alias("doc_id"), "text"
        )
    )
    pairs = DD.minhash_det_pairs(
        corpus, "doc_id", "text", jaccard_threshold=0.5
    ).collect()
    assert all(r["jaccard"] >= 0.5 for r in pairs)
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    identical = {
        (r["doc_id"], r["doc_id"] + 500)
        for r in d.where(F.col("doc_id") % 7 == 0).select("doc_id").collect()
    }
    assert identical <= found, identical - found


def test_dedup_clusters_components(spark):
    """Min-label propagation over a chain (needs multiple rounds), a
    star, and an isolated pair — every node labeled with its
    component's min id."""
    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4), (4, 5),   # chain: all -> 1
            (10, 11), (10, 12), (10, 13),     # star: all -> 10
            (20, 21),                         # pair -> 20
        ],
        "id_a bigint, id_b bigint",
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in DD.dedup_clusters(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }
