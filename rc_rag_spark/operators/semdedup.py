"""Parameterized, scale-shaped SemDeDup (Abbas et al. 2023, public):
k-means partition of the embedding space, then cosine near-dup removal
ONLY within clusters — with the two knobs the fixed-k query variant
(queries/semdedup.py q175) lacks:

  k auto-sizing          k = ceil(n / target_cluster_size), so the
                         EXPECTED cluster stays constant as the corpus
                         grows — the pairwise stage cost Σ|cluster|²
                         tracks n·target instead of n²/k_fixed.
  cluster-size cap       clusters that still balloon past
                         max_cluster_size (skewed data always finds a
                         way) are SPLIT by a deterministic hash salt
                         before the pair stage, hard-bounding the
                         largest quadratic block. Pairs across salt
                         sub-buckets of the same cluster are NOT
                         compared — the documented SemDeDup-at-scale
                         recall trade (a mega-cluster is near-uniform
                         by construction, so per-bucket dedup removes
                         the same mass).

Physical shape (the 100 TB answer): centroids broadcast (k·d doubles),
assignment is one Arrow-batched pass (no shuffle), sizes are a k-row
agg, and the pair stage is applyInPandas over (cid, salt) — each
group's block is ≤ max_cluster_size rows, so the per-task matmul is
bounded at cap²·8 bytes no matter how skewed the data. Nothing
all-pairs ever shuffles.

Determinism: seeds are the k ids with the smallest md5(id) hex (a
total order both engines can state), assignment distances and pair
cosines use per-term round-at-1e-12 + exact int64 sums (identical
values in DuckDB DECIMAL arithmetic — the queries/core.py discipline),
and the salt is md5-derived. bit_exact=False swaps the rounded-int
kernels for plain float64 matmuls when oracle parity isn't needed.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 10**12  # per-term quantizer: round(x, 12) * 1e12 as int64


def choose_k(n: int, target_cluster_size: int) -> int:
    """k = ceil(n / target): expected cluster size stays ~target as
    the corpus grows, keeping the pair stage's Σ|cluster|² ≈ n·target."""
    if target_cluster_size <= 0:
        raise ValueError("target_cluster_size must be positive")
    return max(1, math.ceil(n / target_cluster_size))


def _exact_sq_dists(X, C, bit_exact: bool):
    """n×k squared distances; bit_exact sums round(term, 12) in int64
    (order-independent, engine-reproducible), else plain float64."""
    import numpy as np

    n, k = X.shape[0], C.shape[0]
    out = np.empty((n, k), dtype=np.int64 if bit_exact else np.float64)
    for j in range(k):
        d2 = (X - C[j]) ** 2
        if bit_exact:
            out[:, j] = (
                np.round(d2, 12) * _SCALE
            ).round().astype(np.int64).sum(axis=1)
        else:
            out[:, j] = d2.sum(axis=1)
    return out


def _exact_argmin(X, C, bit_exact, chunk_elems: int = 1 << 25):
    """Assigned-centroid argmin with the kernel's exact quantized
    tie-break semantics, at BLAS speed (round 15 — the sf10/sf100
    decade probe measured the original full-matrix quantized kernel
    at exponent ~1.5 on q212: n*k*d per-element np.round passes, with
    k = ceil(n/target) growing alongside n).

    Screen-then-verify: one float64 GEMM expansion gives every
    centroid distance with error <= ~1e-13, while the quantized
    distance differs from the true one by <= dim * 0.5e-12 (~3.2e-11
    at d=64). Any centroid whose float distance exceeds the row
    minimum by 1e-6 therefore CANNOT be the quantized argmin, so the
    exact int64 kernel only runs on the rare ambiguous rows (exact
    duplicates / planted copies) — identical output, and assignment
    cost drops from k rounding passes over X to one GEMM.
    The n*k term itself is inherent to exact k-means assignment
    (cost model: Θ(n*k*d) = Θ(n²d/target) when k auto-scales);
    at 100 TB use semdedup_hierarchical (the n*m super-level is
    /super_factor cheaper) or a fixed k.
    """
    import numpy as np

    n, k = X.shape[0], C.shape[0]
    out = np.empty(n, dtype=np.int32)
    rows = max(1, chunk_elems // max(k, 1))
    Cn = (C * C).sum(axis=1)
    for s in range(0, n, rows):
        Xc = X[s : s + rows]
        d2f = (
            (Xc * Xc).sum(axis=1)[:, None]
            - 2.0 * (Xc @ C.T)
            + Cn[None, :]
        )
        sel = d2f.argmin(axis=1).astype(np.int32)
        if bit_exact:
            cand = d2f <= (d2f.min(axis=1) + 1e-6)[:, None]
            for i in np.nonzero(cand.sum(axis=1) > 1)[0]:
                js = np.nonzero(cand[i])[0]
                dq = _exact_sq_dists(Xc[i : i + 1], C[js], True)[0]
                # first-occurrence argmin over ascending js = the
                # smallest seed rank among exact ties
                sel[i] = js[int(dq.argmin())]
        out[s : s + rows] = sel
    return out


def semdedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    k: int | None = None,
    target_cluster_size: int = 512,
    max_cluster_size: int | None = None,
    bit_exact: bool = True,
    max_seed_broadcast_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Cluster-then-dedup over an embedding column.

    Returns (id_col, cid, salt, kept): cid = assigned cluster (rank of
    the seed in md5-of-id order), salt = sub-bucket after the size cap
    (0 when the cluster fits), kept = 0 iff a smaller-id member of the
    SAME (cid, salt) bucket has cosine >= threshold.

    Seed-broadcast budget: k = ceil(n/target) seeds are collect()ed to
    the driver and broadcast as one dense k·d float64 matrix — the
    standard broadcast-centroid k-means shape, but it grows with the
    corpus (n=10⁹, target=512, d=768 → ~2 M × 768 × 8 B ≈ 12 GB, which
    no driver should ship). The k·d·8-byte cost is checked against
    `max_seed_broadcast_bytes` (default 256 MB ≈ 43k seeds at d=768)
    BEFORE collecting, and exceeding it raises with the two standard
    escapes: raise `target_cluster_size` (k shrinks proportionally) or
    seed hierarchically — run semdedup on an md5-sampled ~1/m subset
    first and reuse its centroids per shard, which keeps every
    broadcast under budget/m while preserving the cluster structure.
    """
    import numpy as np

    if max_cluster_size is None:
        max_cluster_size = 4 * target_cluster_size
    spark = corpus.sparkSession
    src = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).where(
        # NULL embeddings have no position in the space: they can
        # neither seed nor join a cluster (np.asarray(None) would
        # kill both the seed collect and the assign kernel)
        F.col("_v").isNotNull()
    )

    # one job for corpus size + dimension (round 16, guide §2.6: the
    # count() and first() probes were separate jobs over the same
    # checkpointed corpus; the budget guard needs only (n, any row's
    # dim))
    head = src.agg(
        F.count("*").alias("n"),
        F.first(F.size("_v"), ignorenulls=True).alias("d"),
    ).first()
    n = head["n"]
    k_eff = k if k is not None else choose_k(n, target_cluster_size)

    dim = int(head["d"]) if head["d"] is not None else 0
    seed_bytes = k_eff * dim * 8
    if seed_bytes > max_seed_broadcast_bytes:
        raise ValueError(
            f"semdedup would collect+broadcast k={k_eff} seed centroids "
            f"of dim {dim} (~{seed_bytes / 1e6:.0f} MB), over the "
            f"max_seed_broadcast_bytes={max_seed_broadcast_bytes} "
            f"budget. Raise target_cluster_size (k = ceil(n/target)), "
            f"or seed hierarchically: semdedup an md5-sampled subset "
            f"first and reuse its centroids per shard, or raise the "
            f"budget explicitly if the driver/executors can hold it."
        )

    # Seeds: the k ids with the smallest md5(id) hex — a deterministic
    # pseudo-random draw both engines can reproduce (md5 hex collation
    # is plain ASCII on both).
    seeds = (
        src.withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h", "_id")
        .limit(k_eff)
        .collect()
    )
    C = np.array([list(r["_v"]) for r in seeds], dtype=np.float64)
    bc = spark.sparkContext.broadcast((C, bit_exact))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("semdedup_assign")
        C_b, exact_b = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v) for v in pdf["_v"]], dtype=np.float64)
            # screened argmin, exact tie -> smallest seed rank
            cid = _exact_argmin(X, C_b, exact_b)
            yield pd.DataFrame(
                {"_id": pdf["_id"], "_v": pdf["_v"], "cid": cid}
            )

    id_type = dict(src.dtypes)["_id"]
    assigned = src.mapInPandas(
        assign, schema=f"_id {id_type}, _v array<double>, cid int"
    )

    # Size cap: clusters past max_cluster_size split into
    # ceil(size/cap) hash-salted sub-buckets before the pair stage.
    salted = _salt_split(assigned, ["cid"], max_cluster_size, "salt")

    out = _pair_dedup(salted, ["cid", "salt"], id_type, threshold, bit_exact)
    return out.select(
        F.col("_id").alias(id_col), "cid", "salt", "kept"
    )


def _salt_split(
    df: DataFrame, keys: list[str], cap: int, salt_col: str
) -> DataFrame:
    """Append a deterministic md5-derived sub-bucket column that
    splits any `keys`-group past `cap` members into ceil(size/cap)
    buckets (0 when the group fits). The size table is one row per
    group — broadcast (group-count rows of (keys, count), a few bytes
    each; ~24 MB even at 2M clusters)."""
    sizes = df.groupBy(*keys).agg(F.count("*").alias("_n"))
    n_buckets = F.ceil(F.col("_n") / F.lit(cap)).cast("int")
    salt_src = (
        F.conv(F.substring(F.md5(F.col("_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
    )
    return df.join(F.broadcast(sizes), keys).select(
        *[c for c in df.columns],
        F.when(n_buckets <= 1, F.lit(0))
        .otherwise((salt_src % n_buckets).cast("int"))
        .alias(salt_col),
    )


def _pair_dedup(
    salted: DataFrame,
    group_cols: list[str],
    id_type: str,
    threshold: float,
    bit_exact: bool,
) -> DataFrame:
    """Shared pair stage: within each group (the salted cluster
    bucket), remove every member with a smaller-id neighbor at cosine
    >= threshold. applyInPandas per group — block size is bounded by
    the caller's size cap, so the per-task matmul is bounded at
    cap²·8 bytes no matter how skewed the data."""
    import numpy as np

    thr = float(threshold)

    def dedup_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("semdedup_pair_dedup")
        g = len(pdf)
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        X = np.array([np.asarray(v) for v in pdf["_v"]], dtype=np.float64)
        if bit_exact:
            # exact int64 dot/norm terms -> identical float cosine on
            # any engine that states the same rounding
            NI = (
                (np.round(X * X, 12) * _SCALE).round().astype(np.int64).sum(axis=1)
            )
            norms = np.sqrt(NI.astype(np.float64) / _SCALE)
            kept = np.ones(g, dtype=bool)
            for i in range(1, g):
                P = np.round(X[:i] * X[i], 12)
                dots = (P * _SCALE).round().astype(np.int64).sum(axis=1)
                cos = (dots.astype(np.float64) / _SCALE) / (norms[:i] * norms[i])
                if (np.round(cos, 9) >= thr).any():
                    kept[i] = False
        else:
            norms = np.linalg.norm(X, axis=1)
            S = (X @ X.T) / np.outer(norms, norms)
            kept = np.ones(g, dtype=bool)
            for i in range(1, g):
                if (S[i, :i] >= thr).any():
                    kept[i] = False
        out = {"_id": pdf["_id"]}
        for c in group_cols:
            out[c] = pdf[c]
        out["kept"] = kept.astype(np.int32)
        return pd.DataFrame(out)

    schema = (
        f"_id {id_type}, "
        + ", ".join(f"{c} int" for c in group_cols)
        + ", kept int"
    )
    return salted.groupBy(*group_cols).applyInPandas(
        dedup_group, schema=schema
    )


def semdedup_hierarchical(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    target_cluster_size: int = 512,
    max_cluster_size: int | None = None,
    super_factor: int = 64,
    max_super_size: int | None = None,
    bit_exact: bool = True,
    max_seed_broadcast_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Two-level SemDeDup — the hierarchical-seeding escape hatch the
    flat operator's broadcast-budget guard points at, implemented for
    real rather than documented.

    The flat operator must collect+broadcast k = ceil(n/target) seed
    centroids; at n = 10⁹, target = 512, d = 768 that is ~12 GB
    through the driver. Here only m = ceil(n / (super_factor·target))
    SUPER-seeds are ever collected (super_factor=64 cuts the broadcast
    64×; raise it further for bigger corpora), and every other stage
    stays fully distributed:

      level 1   m md5-ordered super-seeds, broadcast (budget-checked
                at m·d·8 bytes), one Arrow argmin pass -> scell;
                cells past max_super_size split by md5 salt -> ssalt.
      level 2   per (scell, ssalt): the ceil(size/target) smallest-md5
                members are that bucket's seeds — a WINDOW RANK, no
                collect, no broadcast — computed in-task from the
                bucket's own members inside ONE applyInPandas that
                also assigns them, so each task holds
                ≤ max_super_size points.
      pair      identical to the flat operator: cluster-size cap salt,
                then within-(scell, ssalt, cid, salt) greedy min-id
                removal, every block ≤ max_cluster_size.

    Returns (id_col, scell, ssalt, cid, salt, kept): cid is the seed's
    md5 rank WITHIN its (scell, ssalt) bucket. Same determinism
    discipline as the flat operator (md5 orderings, per-term
    round-at-1e-12 + exact int64 sums), so a SQL oracle can replay
    every stage. Recall trade vs flat: near-dups split across
    super-cells (or ssalt sub-buckets) are not compared — the same
    documented SemDeDup-at-scale trade the flat cap already makes.
    """
    import numpy as np

    if max_cluster_size is None:
        max_cluster_size = 4 * target_cluster_size
    target_super = super_factor * target_cluster_size
    if max_super_size is None:
        max_super_size = 4 * target_super
    spark = corpus.sparkSession
    src = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).where(F.col("_v").isNotNull())  # see semdedup: NULL vec has no
    # position in the space
    n = src.count()
    m = max(1, math.ceil(n / target_super))

    first = src.select(F.size("_v").alias("d")).first()
    dim = int(first["d"]) if first is not None and first["d"] is not None else 0
    seed_bytes = m * dim * 8
    if seed_bytes > max_seed_broadcast_bytes:
        raise ValueError(
            f"semdedup_hierarchical would broadcast m={m} super-seeds "
            f"of dim {dim} (~{seed_bytes / 1e6:.0f} MB), over the "
            f"max_seed_broadcast_bytes={max_seed_broadcast_bytes} "
            f"budget. Raise super_factor (m = ceil(n / "
            f"(super_factor*target))), or raise the budget explicitly."
        )

    seeds = (
        src.withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h", "_id")
        .limit(m)
        .collect()
    )
    C = np.array([list(r["_v"]) for r in seeds], dtype=np.float64)
    bc = spark.sparkContext.broadcast((C, bit_exact))

    def assign_super(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("semdedup_assign_super")
        C_b, exact_b = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v) for v in pdf["_v"]], dtype=np.float64)
            yield pd.DataFrame(
                {
                    "_id": pdf["_id"],
                    "_v": pdf["_v"],
                    "scell": _exact_argmin(X, C_b, exact_b),
                }
            )

    id_type = dict(src.dtypes)["_id"]
    assigned1 = src.mapInPandas(
        assign_super, schema=f"_id {id_type}, _v array<double>, scell int"
    )
    ssalted = _salt_split(assigned1, ["scell"], max_super_size, "ssalt")

    # Level-2 seeding + assignment in ONE applyInPandas per
    # (scell, ssalt) bucket: the group already holds every member, so
    # its ceil(size/target) smallest-md5 ids are computed in-task
    # (hashlib.md5 of str(id) == F.md5(cast string) == DuckDB
    # md5(CAST .. AS VARCHAR) — same UTF-8 bytes) and every member is
    # assigned to its argmin seed. No window, no cogroup, no second
    # shuffle — seeds never exist as a separate distributed relation,
    # and per-task memory stays <= max_super_size rows x d doubles.
    def assign_l2(pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("semdedup_assign_l2")

        k_g = max(1, math.ceil(len(pdf) / target_cluster_size))
        order = sorted(
            range(len(pdf)),
            key=lambda i: (
                hashlib.md5(str(pdf["_id"].iat[i]).encode()).hexdigest(),
                pdf["_id"].iat[i],
            ),
        )
        seed_rows = order[:k_g]
        X = np.array([np.asarray(v) for v in pdf["_v"]], dtype=np.float64)
        Cg = X[seed_rows]
        # screened argmin, first-occurrence over rank order = smallest cid
        return pd.DataFrame(
            {
                "_id": pdf["_id"],
                "_v": pdf["_v"],
                "scell": pdf["scell"],
                "ssalt": pdf["ssalt"],
                "cid": _exact_argmin(X, Cg, bit_exact),
            }
        )

    assigned2 = ssalted.groupBy("scell", "ssalt").applyInPandas(
        assign_l2,
        schema=(
            f"_id {id_type}, _v array<double>, scell int, ssalt int, cid int"
        ),
    )

    salted = _salt_split(
        assigned2, ["scell", "ssalt", "cid"], max_cluster_size, "salt"
    )
    out = _pair_dedup(
        salted, ["scell", "ssalt", "cid", "salt"], id_type, threshold,
        bit_exact,
    )
    return out.select(
        F.col("_id").alias(id_col), "scell", "ssalt", "cid", "salt", "kept"
    )
