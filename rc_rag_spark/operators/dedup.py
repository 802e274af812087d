"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (it has no corpus-level ops) — these are
the north-star extensions (SURVEY §2.2 'Dedup'), designed for 100 TB:

  exact_dedup          hash-shuffle dropDuplicates on a normalized key
  fingerprint_dedup    md5-of-normalized-text (cheap exact near-dup)
  minhash_lsh_pairs    MinHash + banded LSH via MLlib approxSimilarityJoin
                       — candidate pairs without the O(n²) cross join
  simhash              64-bit SimHash (vectorized pandas UDF); pairs by
                       band-bucketing, never all-pairs
  ngram_jaccard        exact n-gram Jaccard between candidate pairs
                       (native array ops — the verification step after
                       any LSH candidate generation)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from rc_rag_spark.functions.text import normalize_answer, simple_tokenize
from rc_rag_spark.checkpoints import ckpt as _ckpt
from rc_rag_spark.checkpoints import ckpt_lazy as _ckpt_lazy


def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact dedup on the given columns (one hash shuffle; AQE
    coalesces post-shuffle partitions)."""
    return df.dropDuplicates(cols)


def fingerprint(col: str | Column) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text."""
    return F.md5(normalize_answer(col))


def fingerprint_dedup(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("_fp", fingerprint(text_col)).dropDuplicates(["_fp"]).drop("_fp")


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """n-gram word shingles as an array of strings (native).

    PERF: the token expression is inlined n+1 times into the transform
    lambda. Higher-order functions are interpreted (no whole-stage
    codegen, no common-subexpression elimination), so if `col` is an
    *expression* the tokenizer re-runs per shingle element. Callers on
    a hot path must stage the token array as a real column first and
    pass shingles_from_tokens that attribute — see minhash_det_pairs."""
    return shingles_from_tokens(simple_tokenize(col), n)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """n-gram shingles over an already-materialized token array column
    (attribute references are cheap inside HOF lambdas)."""
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over distinct elements of two arrays (native)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    jaccard_threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash-LSH:
    shingle → HashingTF (sparse binary) → MinHashLSH →
    approxSimilarityJoin at distance ≤ 1 - threshold.

    Scale path: LSH banding turns all-pairs into an equi-join on
    band buckets — shuffle O(n·tables), never O(n²). Returns
    (id_a, id_b, jaccard_distance) with id_a < id_b.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    shingled = (
        df.select(
            F.col(id_col).alias("_id"),
            simple_tokenize(text_col).alias("_toks"),
        )
        .select(
            "_id",
            shingles_from_tokens(F.col("_toks"), shingle_n).alias(
                "_shingles"
            ),
        )
        .where(F.size("_shingles") > 0)
    )
    tf = HashingTF(
        inputCol="_shingles", outputCol="_features",
        numFeatures=num_features, binary=True,
    )
    feats = tf.transform(shingled)
    mh = MinHashLSH(
        inputCol="_features", outputCol="_hashes",
        numHashTables=num_hash_tables, seed=seed,
    )
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, 1.0 - jaccard_threshold, distCol="jaccard_distance"
    )
    return (
        pairs.select(
            F.col("datasetA._id").alias("id_a"),
            F.col("datasetB._id").alias("id_b"),
            F.col("jaccard_distance"),
        )
        .where(F.col("id_a") < F.col("id_b"))
    )


# Universal-hash family for MinHash: h_j(x) = (a_j*x + b_j) mod p over
# a 32-bit md5-prefix base hash. p = 2^31-1 (Mersenne prime); a_j*x
# stays < 2^63 so the arithmetic is exact signed-64 on both Spark and
# DuckDB — the whole construction is oracle-checkable, unlike MLlib's
# MinHashLSH whose seeded coefficients exist only JVM-side.
MINHASH_P = 2_147_483_647


def _mh_params(j: int) -> tuple[int, int]:
    return 1_000_003 * (j + 1) + 12_345, 7_919 * (j + 1) + 17


def shingle_base_hash(shingles: Column) -> Column:
    """32-bit base hash per shingle: first 8 hex chars of md5 (DuckDB:
    CAST('0x'||substr(md5(s),1,8) AS BIGINT)). md5 runs ONCE per
    shingle; the per-hash-function work is cheap arithmetic."""
    return F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )


def minhash_signature(
    shingle_hashes: Column, num_hashes: int = 8
) -> Column:
    """MinHash signature over a STAGED base-hash array column: per
    hash function j, min over (a_j*x + b_j) mod p. Native array ops —
    one projection, no shuffle.

    The hash functions are UNROLLED into num_hashes separate array
    elements instead of a transform over sequence(0, n-1): a lambda
    over the sequence references the input only once syntactically, so
    CollapseProject would inline the (expensive) upstream expression
    into the lambda and interpreted HOF eval would rebuild it once per
    hash function per row. Unrolling keeps the staged column
    materialized (n syntactic references)."""
    # single-parameter closures: F.transform infers lambda arity from
    # the Python signature, so default-arg tricks would silently bind
    # the element INDEX to the extra parameter
    def _h(a: int, b: int):
        return lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_P)

    cols = []
    for j in range(num_hashes):
        a, b = _mh_params(j)
        cols.append(F.array_min(F.transform(shingle_hashes, _h(a, b))))
    return F.array(*cols)


def _minhash_stage(
    df, id_col, text_col, shingle_n, num_hashes, rows_per_band=1
):
    """Shared staging for the deterministic MinHash family:
    (id, shingles, base hashes) checkpointed once, plus the exploded
    (id, band_idx, band_sig) band table.

    Tokens → shingles → signature are SEPARATE projections so each
    HOF lambda folds over a materialized array attribute (interpreted
    HOF eval has no common-subexpression elimination — an inlined
    tokenizer re-runs per array element; measured 50×+ slowdown). The
    emptiness filter tests size(_toks) — filtering on size(_shingles)
    would be pushed below the shingle projection and re-inline the
    shingle expression into the Filter. localCheckpoint materializes
    the shingled corpus once for its consumers (signatures + verify
    sides) — at cluster scale this is the persisted candidate table
    any LSH pipeline stages anyway.

    The signature itself is computed EXPLODE+AGG rather than through
    minhash_signature's array HOFs: explode the base-hash array and
    take num_hashes codegen'd conditional minima in ONE hash
    aggregate. Same values (the checksummed band table is identical),
    but whole-stage codegen instead of interpreted per-element lambda
    evaluation — measured 5x faster at sf1 (2.5 s -> 0.5 s for the
    50k-doc corpus signature+bands). The added (_id) exchange is
    partial-aggregated: docs are contiguous in their checkpointed
    split, so map-side combine emits one row per doc.

    Optimization round 16 (guide §6 unsplittable-scan parallelism):
    the tokenize+shingle+md5 projection ran on the scan's task count —
    2 tasks on the single-row-group local fixtures, measured 0.7-0.8 s
    of serial executor time ahead of everything else. A CONDITIONAL
    round-robin rebalance of the narrow (_id, text) projection (fires
    only when the scan yields far fewer partitions than cores — never
    on a splittable multi-file cluster layout, same contract as
    sources.wide_table) spreads the expression-dense stage; unlike the
    r15 wide_table experiment (full documents rows, measured q289
    1.56x SLOWER), only id+text bytes cross the rebalance. Measured
    same-window: q102 ~1.14x, q289 flat, q61/q95 flat-to-better.

    (Round 16 negative result, recorded per guide §1: checkpointing
    this table PRE-PARTITIONED+PRE-SORTED on _id, so the two verify
    joins could reuse the layout, was measured a net LOSS — the
    LogicalRDD a checkpoint scans DOES carry the hash partitioning,
    but under AQE EnsureRequirements re-inserts the exchange above
    ExistingRDD scans anyway (verified: the same plan keeps zero
    exchanges with AQE off), so the extra _id exchange at
    materialization bought nothing: q289 shuffle write 5.0 MB ->
    11.0 MB, q102 64.4 -> 70.3 MB. Reverted.)"""
    spark = df.sparkSession
    src = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    parallelism = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() * 2 < parallelism:
        src = src.repartition(parallelism)
    sh = (
        src.select("_id", simple_tokenize("_txt").alias("_toks"))
        .where(F.size("_toks") >= shingle_n)
        .select(
            "_id",
            F.array_distinct(
                shingles_from_tokens(F.col("_toks"), shingle_n)
            ).alias("_shingles"),
        )
        .select(
            "_id", "_shingles",
            shingle_base_hash(F.col("_shingles")).alias("_hs"),
        )
        .transform(_ckpt)
    )
    e = sh.select("_id", F.explode("_hs").alias("_h"))
    aggs = []
    for j in range(num_hashes):
        a, b = _mh_params(j)
        aggs.append(
            F.min(
                (F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MINHASH_P)
            ).alias(f"_s{j}")
        )
    wide = e.groupBy("_id").agg(*aggs)
    if rows_per_band <= 1:
        stack = ", ".join(f"{j}, _s{j}" for j in range(num_hashes))
        bands = wide.selectExpr(
            "_id",
            f"stack({num_hashes}, {stack}) as (_band_idx, _band_sig)",
        )
        return sh, bands
    # AND-composition: each band's signature is the concatenation of
    # its rows_per_band minima — a candidate needs ALL of them equal,
    # so P(collide) = J^r per band instead of J. This is the knob that
    # keeps candidate volume linear on corpora where raw single-hash
    # bands collide at J-sized rates (the round-15 sf100 probe measured
    # q102's r=1 candidates growing ~n^2 * p).
    n_bands = num_hashes // rows_per_band
    entries = []
    for b in range(n_bands):
        cols = ", ".join(
            f"_s{b * rows_per_band + r}" for r in range(rows_per_band)
        )
        entries.append(f"{b}, concat_ws('|', {cols})")
    bands = wide.selectExpr(
        "_id",
        f"stack({n_bands}, {', '.join(entries)}) "
        "as (_band_idx, _band_sig)",
    )
    return sh, bands


def minhash_det_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 8,
    jaccard_threshold: float = 0.5,
    rows_per_band: int = 1,
) -> DataFrame:
    """Deterministic MinHash-LSH near-duplicate pairs, fully
    oracle-checkable: shingle → md5-minhash signature → band join →
    exact-Jaccard verify.

    Scale shape: the candidate join is an equi-join on
    (band_idx, signature_value) — shuffle O(n·num_hashes), never the
    O(n²) cross product; the verify re-joins shingle arrays by id so
    the band shuffle moves only (id, band, sig) triples.

    ``rows_per_band`` is the LSH S-curve knob. r=1 (default, the q62
    contract) is pure OR-construction: recall-max, but every band
    collides at rate J — on corpora where unrelated docs share any
    shingles, candidates grow ~n²·J̄ (the round-15 sf100 probe
    measured q102's candidate set super-linear for exactly this
    reason). r>1 ANDs r minima inside each of num_hashes/r bands:
    P(candidate) = 1-(1-J^r)^b, which crushes the unrelated-pair rate
    (J=0.2, r=4: 3e-3 -> per-band 1.6e-3) while keeping near-dup
    recall high (J=0.8: 0.74 per band) — the shape that holds
    candidate volume ~linear at 100 TB.

    Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= jaccard_threshold, for pairs colliding on >= 1 band.
    """
    sh, bands = _minhash_stage(
        df, id_col, text_col, shingle_n, num_hashes, rows_per_band
    )
    a, b = bands.alias("a"), bands.alias("b")
    # One exchange for dedup + first verify join (round 16, guide
    # §2.4): hash-repartitioning the raw band collisions by id_a
    # satisfies the dedup aggregate's (id_a, id_b) clustering (same
    # pair always lands in one partition) AND the id_a verify join's
    # distribution, so the pair set crosses the network once instead
    # of twice. Map-side combine lost on the dedup is no loss: a
    # pair's duplicate collisions come from DIFFERENT bands, which
    # hash to different band-join partitions anyway.
    cand = (
        a.join(
            b,
            (F.col("a._band_idx") == F.col("b._band_idx"))
            & (F.col("a._band_sig") == F.col("b._band_sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .repartition("id_a")
        .dropDuplicates(["id_a", "id_b"])
    )
    # verify joins are HINTED sort-merge: the shingle-array side must
    # never be broadcast (heavy rows; Catalyst's size estimate for the
    # checkpointed relation undercounts it — at sf1 the misestimated
    # BHJ cost 34.5 s), and the build side must never be an IN-MEMORY
    # hash map either: the sf100 decade probe (round 15) killed the
    # former shuffle_hash hint with "Can't acquire 268435456 bytes to
    # build hash relation" — a per-task hash build over heavy shingle
    # rows cannot spill, while SMJ sorts on the narrow id key and
    # spills gracefully at any corpus size. Same shuffle_join plan
    # class, so the plan guard sees no shape change.
    sa = sh.select(
        F.col("_id").alias("id_a"), F.col("_shingles").alias("_sha")
    ).hint("merge")
    sb = sh.select(
        F.col("_id").alias("id_b"), F.col("_shingles").alias("_shb")
    ).hint("merge")
    # Exact Jaccard with ONE set operation (round 16, guide step-2
    # per-task work): _shingles is array_distinct by construction, so
    # |union| = |a| + |b| - |intersect| — array_union's second
    # hash-set build over every candidate pair is pure waste. Values
    # are identical on distinct inputs (the only inputs this path
    # ever joins); the oracle comparison is unchanged.
    inter = F.size(F.array_intersect(F.col("_sha"), F.col("_shb")))
    union = F.size("_sha") + F.size("_shb") - inter
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.when(union == 0, F.lit(0.0))
            .otherwise(inter.cast("double") / union)
            .alias("jaccard"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate PAIR graph — the step
    that turns candidate pairs (minhash/simhash/embedding) into dedup
    GROUPS. Returns (id, cluster_id) where cluster_id is the minimum
    member id of the component, for every id appearing in a pair.

    Algorithm: iterative min-label propagation — each round every node
    takes the min of its own label and its neighbors' labels; converges
    in O(component diameter) rounds (near-dup graphs are shallow:
    mostly stars around a canonical doc). Each round is two equi-joins
    + a groupBy, all hash-partitioned on node id — no driver-side graph,
    no quadratic step; localCheckpoint bounds lineage across rounds
    (the same loop shape as the reference-free D3 counterfactual loop).
    """
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .transform(_ckpt)
    )
    # Seed with round 1's RESULT instead of the identity labelling
    # (round 16, guide §2.6 job fusion): with labels == id, the first
    # round's nbr_min is just min(dst), so least(id, min(dst)) from
    # ONE aggregation over the checkpointed edges replaces both the
    # old identity-label distinct AND the first join round — same
    # fixpoint, one fewer join+count round every run. (Every node
    # appears as src because edges are bidirectional.)
    labels = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("_mn"))
        .select("id", F.least(F.col("id"), F.col("_mn")).alias("label"))
        .transform(_ckpt)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        # carry the did-it-change flag in the same row so convergence is
        # read off the checkpointed blocks — no second join of new-vs-old
        # labels (one fewer shuffle per round)
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                labels["id"].alias("id"),
                F.least(
                    labels["label"],
                    F.coalesce(F.col("nbr_min"), labels["label"]),
                ).alias("label"),
                F.coalesce(
                    F.col("nbr_min") < labels["label"], F.lit(False)
                ).alias("_changed"),
            )
            .transform(_ckpt_lazy)
        )
        # LAZY checkpoint + count in one action (r15): the count is the
        # materializing action, so each round runs ONE job instead of
        # two (eager-checkpoint job + count job) — the count scans the
        # checkpoint node's child once and pins its blocks, identical
        # durability to the eager form for every later reader.
        changed = new_labels.where("_changed").count()
        # dropping the reference releases the superseded checkpoint
        # blocks via the ContextCleaner once GC runs — storage stays
        # O(2 copies), not O(rounds)
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_clusters: not converged after {max_iter} rounds "
            f"({changed} labels still changing) — a component's diameter "
            "exceeds max_iter; raise max_iter"
        )
    return labels.select("id", F.col("label").alias("cluster_id"))


_simhash_udf = None


def simhash64(col: str | Column) -> Column:
    """64-bit SimHash of the token stream (md5-based token hashes —
    deterministic across workers; Arrow-batched)."""
    global _simhash_udf
    if _simhash_udf is None:

        @pandas_udf("long")
        def _udf(texts: pd.Series) -> pd.Series:
            import hashlib

            from rc_rag_spark.faultinject import maybe_inject_fault

            maybe_inject_fault("simhash64")

            def sh(text):
                if text is None:
                    return None
                acc = [0] * 64
                for tok in (text.lower().split()):
                    h = int.from_bytes(
                        hashlib.md5(tok.encode()).digest()[:8], "big"
                    )
                    for b in range(64):
                        acc[b] += 1 if (h >> b) & 1 else -1
                out = 0
                for b in range(64):
                    if acc[b] > 0:
                        out |= 1 << b
                # interpret as signed 64-bit for LongType
                return out - (1 << 64) if out >= (1 << 63) else out

            return texts.map(sh)

        _simhash_udf = _udf
    c = F.col(col) if isinstance(col, str) else col
    return _simhash_udf(c)


def simhash_bands(sim_col: str | Column, num_bands: int = 4) -> list[Column]:
    """Split a 64-bit simhash into equal bands; near-dups (small
    Hamming distance) collide on ≥1 band — join per band, verify with
    hamming distance (pigeonhole: dist < num_bands ⇒ some band equal)."""
    c = F.col(sim_col) if isinstance(sim_col, str) else sim_col
    width = 64 // num_bands
    mask = (1 << width) - 1
    return [
        F.shiftright(c, i * width).bitwiseAND(F.lit(mask)).alias(f"band_{i}")
        for i in range(num_bands)
    ]


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str,
    max_hamming: int = 3, num_bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: band-bucket join (shuffle on band keys,
    O(n) per band) + exact Hamming verify. Requires
    max_hamming < num_bands for completeness (pigeonhole)."""
    sh = df.select(
        F.col(id_col).alias("_id"), simhash64(text_col).alias("_sh")
    ).transform(_ckpt)  # simhash UDF runs once
    out = None
    for i, band in enumerate(simhash_bands("_sh", num_bands)):
        banded = sh.withColumn("_band", band)
        a = banded.alias("a")
        b = banded.alias("b")
        cand = a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._id") < F.col("b._id")),
        ).select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming64(F.col("a._sh"), F.col("b._sh")).alias("hamming"),
        )
        out = cand if out is None else out.unionByName(cand)
    return (
        out.where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_incremental_pairs(
    index_df: DataFrame,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Incremental near-dup detection: probe a NEW batch against an
    existing corpus index — the daily-increment production shape,
    where re-running all-corpus dedup for every arriving batch would
    redo O(n_index) signature work and an O(n_index·bands) self-join
    per day.

    Here the candidate join is new-bands ⋈ index-bands ONLY (never
    index × index): shuffle O((n_new + n_index)·bands) of slim
    (id, band, sig) triples, with the quadratic-ish verify bounded by
    actual collisions. At cluster scale the index band table and
    shingle table are written once (bucketed by band_sig) and only the
    increment's signatures are computed per batch — this function is
    the per-batch probe.

    Returns (new_id, index_id, jaccard) for colliding pairs with
    jaccard >= threshold. A new row with NO output pair is novel and
    would be admitted into the corpus (and its signatures appended to
    the index)."""
    sh_i, bands_i = _minhash_stage(
        index_df, id_col, text_col, shingle_n, num_hashes
    )
    sh_n, bands_n = _minhash_stage(
        new_df, id_col, text_col, shingle_n, num_hashes
    )
    cand = (
        bands_n.alias("n")
        .join(
            bands_i.alias("i"),
            (F.col("n._band_idx") == F.col("i._band_idx"))
            & (F.col("n._band_sig") == F.col("i._band_sig")),
        )
        .select(
            F.col("n._id").alias("new_id"),
            F.col("i._id").alias("index_id"),
        )
        .dropDuplicates(["new_id", "index_id"])
    )
    # same discipline as minhash_det_pairs' verify: the shingle-array
    # sides must never be broadcast NOR hash-built in task memory
    # (sf100 probe finding — see that comment); SMJ spills
    sn = sh_n.select(
        F.col("_id").alias("new_id"), F.col("_shingles").alias("_sha")
    ).hint("merge")
    si = sh_i.select(
        F.col("_id").alias("index_id"), F.col("_shingles").alias("_shb")
    ).hint("merge")
    inter = F.size(F.array_intersect("_sha", "_shb"))
    union = F.size(F.array_union("_sha", "_shb"))
    return (
        cand.join(sn, "new_id")
        .join(si, "index_id")
        .withColumn(
            "jaccard",
            F.when(union == 0, F.lit(0.0)).otherwise(
                inter.cast("double") / union
            ),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("new_id", "index_id", "jaccard")
    )
