"""Similarity search over an embedding column (array<float>).

Replaces the reference's FAISS IndexFlatIP (SURVEY.md J7/J8,
dynamic_entity_resolution.py:10-215) with Spark-native strategies:

- brute_force_topk: exact top-k cosine — crossJoin with a BROADCAST
  query side + window top-k. The baseline; correct at any scale where
  |queries| is broadcastable.
- sign_lsh_buckets / bucketed_topk: random-hyperplane LSH (axis-sign
  buckets, oracle-portable) so the join only explores same-bucket
  candidates — the 100 TB path. Bucket cardinality SCALES WITH N
  (n_bits=None derives ceil(log2(N / target_bucket_rows)) so the
  within-bucket self-join stays ~quadratic-in-constant, not in N);
  recall < 1 by construction, recovered by multi-probe over
  Hamming-adjacent buckets (probe_hamming=1 probes n_bits+1 buckets).
- ivf_*: coarse-quantized inverted-file search. Centroids are a
  deterministic hash-ordered sample (scale-safe TakeOrdered, oracle-
  portable) optionally refined by Lloyd iterations (ivf_centroids;
  float-sum order makes refined centroids run-deterministic only up to
  ulp, so the oracle checks the sampled variant and pytest checks
  refined recall). n_cells=None derives N / target_cell_rows; queries
  probe their nprobe nearest cells.
- block_topk_applyinpandas: per-block NumPy matmul top-k — the direct
  analog of the reference's blocked `E_block @ E.T` kernel
  (dynamic_entity_resolution.py:161-215), but per blocking key inside
  applyInPandas, never a global driver matrix.
- pq_*: product quantization (Jégou et al. TPAMI'11) — vectors
  compressed to m one-byte codes, asymmetric-distance search via
  broadcast lookup tables, optional exact rerank of the ADC shortlist
  (the FAISS IVF-PQ pattern, the billion-vector scale path).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from energy_aware_entity_resolution_spark.functions.embeddings import (
    dot_col,
    norm_col,
)
from energy_aware_entity_resolution_spark.functions.portable_hash import (
    md5_hash60_col,
)


def _id_type(df: DataFrame, id_col: str) -> str:
    """Spark type string of the id column — ANN output schemas carry
    the INPUT's id type (long for the synthetic fixtures, string for
    the pipeline's natural conv_id key), so real pipeline embeddings
    flow through PQ/IVF-PQ/block_topk without a caller-side remap."""
    return df.schema[id_col].dataType.simpleString()


def _dim_of(df: DataFrame, vec_col: str) -> int | None:
    """Static vector length (one cheap head() action) — lets the
    cosine/dot expressions unroll into codegen-able arithmetic chains
    instead of interpreted higher-order folds (embeddings.dot_col).
    None on an empty table → callers fall back to the fold."""
    row = df.select(vec_col).head()
    if row is None or row[0] is None:
        return None
    return len(row[0])


def _spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin a too-few-splits input (single-file/row-group scans
    run as ONE task — guide §2.5) up to the session's parallelism so
    the per-row vector work (cast, norm, bucket bits, dots) runs wide;
    a no-op for any input that already scans with enough splits."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def _cosine(a, b, dim: int | None = None):
    # widen to double BEFORE multiplying: float*float products lose
    # bits that can flip the 6th rounded decimal vs engines that
    # accumulate in double (the DuckDB oracle does)
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    return F.round(
        dot_col(ad, bd, dim)
        / F.greatest(norm_col(ad, dim) * norm_col(bd, dim), F.lit(1e-12)),
        6,
    )


def _cosine_prenorm(ad, bd, na, nb, dim: int | None):
    """Per-pair cosine with PRE-COMPUTED double arrays and norms: the
    join sides cast + take their norm once per row (guide §2.3 "project
    before the exchange"), so each joined pair pays only the unrolled
    dot + one multiply instead of two casts + two norms + dot. Values
    are bit-identical to _cosine: the norm is the same expression over
    the same array, evaluated earlier."""
    return F.round(dot_col(ad, bd, dim) / F.greatest(na * nb, F.lit(1e-12)), 6)


def _with_vec_norm(df: DataFrame, vec_col: str, dim: int | None, prefix: str):
    """(df + <prefix>d double array + <prefix>n norm) for join sides."""
    vd = F.col(vec_col).cast("array<double>")
    return df.withColumn(f"{prefix}d", vd).withColumn(
        f"{prefix}n", norm_col(F.col(f"{prefix}d"), dim)
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against all vectors.

    queries must be small (broadcast); vectors can be arbitrarily
    large — the crossJoin is a BroadcastNestedLoopJoin, no shuffle of
    the big side.
    """
    dim = _dim_of(vectors, vec_col)
    vectors = _spread_scan(vectors)
    q = _with_vec_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "qv",
        dim,
        "_q",
    ).drop("qv")
    v = _with_vec_norm(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vv")),
        "vv",
        dim,
        "_v",
    ).drop("vv")
    scored = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine_prenorm(
                F.col("_qd"), F.col("_vd"), F.col("_qn"), F.col("_vn"), dim
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _auto_bits(n: int, target_bucket_rows: int) -> int:
    return max(1, min(24, math.ceil(math.log2(max(n / target_bucket_rows, 2)))))


def sign_lsh_buckets(
    vectors: DataFrame,
    n_bits: int | None = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket_rows: int = 4096,
    rotation_seed: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH bucket assignment.

    Default (rotation_seed=None): AXIS-ALIGNED planes — bucket = sign
    bits of the first n_bits coordinates. Deterministic and
    SQL-portable (keeps the DuckDB oracle trivial); fine for
    feature-hashed vectors whose coordinates are ~independent, but
    correlated dimensions of real embedding models skew bucket
    occupancy (most mass lands in few buckets).

    rotation_seed=K opts into GENERAL seeded hyperplanes: plane j is a
    fixed standard-normal direction (numpy RandomState(K)), and bit j =
    sign(<r_j, v>). The dot products are JVM column folds over literal
    plane arrays — no UDF, no shuffle; costs one head() action to read
    the vector dimension. Charikar's SimHash family — bucket collision
    probability depends only on the angle, immune to coordinate
    correlation.

    n_bits=None derives it from the table size so expected bucket
    occupancy ≈ target_bucket_rows — a CONSTANT n_bits makes the
    within-bucket self-join O((N/2^bits)²), quadratic in N; scaling
    bits with log2(N) keeps it linear. Costs one count() action.
    """
    if n_bits is None:
        n_bits = _auto_bits(vectors.count(), target_bucket_rows)
    vectors = _spread_scan(vectors)
    bucket = F.lit(0)
    if rotation_seed is None:
        for j in range(n_bits):
            bucket = bucket + F.when(
                F.element_at(F.col(vec_col), j + 1) > 0, F.lit(1 << j)
            ).otherwise(F.lit(0))
    else:
        if dim is None:  # callers that know the dim skip this action
            dim = _dim_of(vectors, vec_col) or 0
        planes = np.random.RandomState(rotation_seed).standard_normal(
            (n_bits, max(dim, 1))
        )
        vd = F.col(vec_col).cast("array<double>")
        for j in range(n_bits):
            plane = F.array(*[F.lit(float(x)) for x in planes[j, :dim]])
            # dim-known dot: single index-fold over the literal plane
            # array (embeddings.dot_col) — no per-row zip_with products
            # array
            bucket = bucket + F.when(
                dot_col(vd, plane, dim) > 0, F.lit(1 << j)
            ).otherwise(F.lit(0))
    return vectors.select(
        F.col(id_col), F.col(vec_col), bucket.alias("bucket")
    )


def bucketed_topk(
    vectors: DataFrame,
    k: int = 5,
    n_bits: int | None = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 0,
    target_bucket_rows: int = 4096,
    rotation_seed: int | None = None,
    max_bucket_rows: int = 16384,
    salt_buckets: int = 8,
) -> DataFrame:
    """Approximate all-pairs top-k: equi-join within LSH buckets.

    probe_hamming=1 multi-probes: each query additionally searches the
    n_bits buckets at Hamming distance 1 from its own (sign flips of
    one hyperplane — where near-boundary neighbors land), recovering
    most of the recall a single-bucket probe loses. Join stays an
    equi-join; the query side fans out ×(n_bits+1), the index side is
    untouched. rotation_seed opts into general seeded hyperplanes for
    correlated-dimension embeddings (see sign_lsh_buckets).

    SKEW DEFENSE (lsh_pairs' count-first pattern, candidates.py:93-160):
    a degenerate population concentrating mass in one bucket would
    otherwise make every probe of that bucket one uncapped join task.
    Index rows of buckets above max_bucket_rows are deterministically
    salted into salt_buckets sub-buckets; a query probing a hot bucket
    fans out over all its sub-buckets (small buckets keep salt 0, no
    fan-out), so the join key (bucket, _salt) bounds every task at
    ~max(bucket_rows/s) while each (query, neighbor) candidate still
    appears exactly once — output identical to the uncapped join. The
    hot-key set broadcasts (skew means FEW hot buckets; auto-n_bits
    keeps expected occupancy ≪ the cap)."""
    if n_bits is None:
        n_bits = _auto_bits(vectors.count(), target_bucket_rows)
    dim = _dim_of(vectors, vec_col)
    b = sign_lsh_buckets(
        vectors, n_bits, id_col, vec_col, rotation_seed=rotation_seed, dim=dim
    )
    # hot-bucket keys collected to the driver (small by construction —
    # see docstring; they were being collected into a broadcast relation
    # anyway): membership becomes an InSet filter, removing two
    # broadcast joins; with no hot bucket the salt machinery vanishes
    # from the plan entirely — identical output either way (guide §2.4)
    big = [
        r["bucket"]
        for r in b.groupBy("bucket")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > max_bucket_rows)
        .select("bucket")
        .collect()
    ]
    s = salt_buckets
    masks = [0] + ([1 << j for j in range(n_bits)] if probe_hamming >= 1 else [])
    a_side = (
        _with_vec_norm(
            b.select(
                F.col("bucket"),
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("qv"),
            ),
            "qv",
            dim,
            "_q",
        )
        .drop("qv")
        .withColumn("_m", F.explode(F.array(*[F.lit(m) for m in masks])))
        .select(
            F.col("bucket").bitwiseXOR(F.col("_m")).alias("bucket"),
            "query_id",
            "_qd",
            "_qn",
        )
    )
    b_side = _with_vec_norm(
        b.select(
            F.col("bucket"),
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("vv"),
        ),
        "vv",
        dim,
        "_v",
    ).drop("vv")
    join_keys = ["bucket"]
    if big:
        join_keys = ["bucket", "_salt"]
        a_side = a_side.withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("bucket").isin(big), F.sequence(F.lit(0), F.lit(s - 1))
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        b_side = b_side.withColumn(
            "_salt",
            F.when(
                F.col("bucket").isin(big),
                F.pmod(F.xxhash64(F.col("neighbor_id")), F.lit(s)).cast("int"),
            ).otherwise(F.lit(0)),
        )
    scored = (
        a_side.join(b_side, join_keys)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine_prenorm(
                F.col("_qd"), F.col("_vd"), F.col("_qn"), F.col("_vn"), dim
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_centroids(
    vectors: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 0,
) -> DataFrame:
    """(cell_id, cv) centroid table.

    iters=0: deterministic hash-ordered sample — the n_cells rows with
    the smallest md5-60bit(id) (a uniform pseudo-random sample any
    engine can reproduce; planned as TakeOrderedAndProject — a
    distributed top-k, never a global sort). iters>0 refines with Lloyd
    steps (assign → per-cell element-wise mean), each one broadcast
    join + one groupBy; empty cells keep their previous centroid.
    Float-mean partial-sum order makes refined centroids deterministic
    only up to ulp — use iters=0 where bit-reproducibility matters.
    """
    cents = (
        vectors.select(
            F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cv")
        )
        .orderBy(
            md5_hash60_col(F.col("cell_id").cast("string")), F.col("cell_id")
        )
        .limit(n_cells)
    )
    if iters <= 0:
        return cents
    dim = len(vectors.select(vec_col).head()[0])
    for _ in range(iters):
        assigned = ivf_assign(vectors, None, id_col, vec_col, centroids=cents)
        means = assigned.groupBy("cell_id").agg(
            F.array(
                *[
                    F.avg(F.element_at(F.col(vec_col), d + 1)).cast("float")
                    for d in range(dim)
                ]
            ).alias("mv")
        )
        cents = (
            cents.join(means, "cell_id", "left")
            .select("cell_id", F.coalesce("mv", F.col("cv")).alias("cv"))
        )
    return cents


def ivf_assign(
    vectors: DataFrame,
    n_cells: int | None = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    nprobe: int = 1,
    target_cell_rows: int = 4096,
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nprobe
    nearest centroids.

    Default centroids = ivf_centroids(iters=0) (hash-sampled,
    oracle-portable); pass a refined table for k-means cells.
    n_cells=None derives N / target_cell_rows (one count action) —
    constant cell counts make the within-cell join quadratic in N.
    The centroid set is tiny and broadcast; assignment is one
    broadcast-join + windowed argmax, no shuffle of the big side.
    """
    if centroids is None:
        if n_cells is None:
            n_cells = max(1, round(vectors.count() / target_cell_rows))
        centroids = ivf_centroids(vectors, n_cells, id_col, vec_col)
    dim = _dim_of(vectors, vec_col)
    # materialize the tiny centroid+norm table (eager localCheckpoint):
    # projecting the norm onto the sampled-centroid plan would defeat
    # the TakeOrderedAndProject pattern — the hash-ordered sample then
    # plans as a FULL global sort of the vector table (2 extra
    # exchanges, O(N log N) at scale; seen in plans/r06). The
    # checkpoint also computes shared/refined centroids exactly once
    # per assign instead of once per consumer subtree.
    cents = _with_vec_norm(centroids, "cv", dim, "_c").localCheckpoint(
        eager=True
    )
    scored = _with_vec_norm(vectors, vec_col, dim, "_v").crossJoin(
        F.broadcast(cents)
    ).select(
        id_col,
        vec_col,
        "cell_id",
        _cosine_prenorm(
            F.col("_vd"), F.col("_cd"), F.col("_vn"), F.col("_cn"), dim
        ).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cell_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select(id_col, vec_col, "cell_id", "rn")
    )


def ivf_topk(
    vectors: DataFrame,
    k: int = 3,
    n_cells: int | None = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    nprobe: int = 1,
    target_cell_rows: int = 4096,
) -> DataFrame:
    """IVF-bucketed approximate top-k: each query searches its nprobe
    nearest cells; the index side stays single-cell (a vector is OWNED
    by exactly one cell, so probed pairs are already distinct). The
    reference's FAISS flat index re-expressed as partitioned search;
    recall rises with nprobe / falls with n_cells. n_cells=None derives
    N / target_cell_rows (same contract as ivf_assign — a constant cell
    count would make the within-cell join quadratic in N)."""
    if centroids is None:
        if n_cells is None:
            n_cells = max(1, round(vectors.count() / target_cell_rows))
        centroids = ivf_centroids(vectors, n_cells, id_col, vec_col)
    dim = _dim_of(vectors, vec_col)
    owned = ivf_assign(vectors, None, id_col, vec_col, centroids=centroids)
    probes = (
        ivf_assign(vectors, None, id_col, vec_col, centroids=centroids, nprobe=nprobe)
        if nprobe > 1
        else owned
    )
    a = _with_vec_norm(
        probes.select(
            "cell_id", F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ),
        "qv",
        dim,
        "_q",
    ).drop("qv")
    b = _with_vec_norm(
        owned.select(
            "cell_id", F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vv")
        ),
        "vv",
        dim,
        "_v",
    ).drop("vv")
    scored = (
        a.join(b, "cell_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine_prenorm(
                F.col("_qd"), F.col("_vd"), F.col("_qn"), F.col("_vn"), dim
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def block_topk_applyinpandas(
    vectors: DataFrame,
    block_col: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-block exact top-k with a vectorized NumPy kernel — the
    reference's blocked matmul (topk_all_cosine) re-hosted inside
    applyInPandas so each block is one executor-local matrix."""

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        if ids.dtype == object:  # string ids: lexsort needs unicode dtype
            ids = ids.astype("U")
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        sims = unit @ unit.T
        np.fill_diagonal(sims, -np.inf)
        n = len(ids)
        kk = min(k, n - 1)
        rows = []
        if kk > 0:
            # argpartition then exact order — same partial-sort trick
            # as the reference kernel
            part = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
            for r in range(n):
                cand = part[r]
                order = np.lexsort((ids[cand], -sims[r, cand]))
                for rank, ci in enumerate(cand[order], start=1):
                    rows.append((ids[r], ids[ci], round(float(sims[r, ci]), 6), rank))
        return pd.DataFrame(
            rows, columns=["query_id", "neighbor_id", "cosine", "rank"]
        )

    idt = _id_type(vectors, id_col)
    return (
        vectors.select(F.col(block_col).alias("_blk"), id_col, vec_col)
        .groupBy("_blk")
        .applyInPandas(
            per_block,
            schema=f"query_id {idt}, neighbor_id {idt}, cosine double, rank int",
        )
    )


# ------------------------------------------------------------------ PQ
# Driver guards for pq_topk's query-side collect — same adaptivity
# principle as the remap/CC driver fast paths: the LUT build is
# driver-side by design (broadcast), so an oversized query table must
# fail fast, not OOM.
_PQ_QUERY_MAX_ROWS = 100_000
_PQ_QUERY_MAX_BYTES = 256 * 1024 * 1024


def _pq_query_luts(
    queries: DataFrame, codebooks: list, id_col: str, vec_col: str
) -> tuple[list, np.ndarray, np.ndarray] | None:
    """Guarded driver-side ADC lookup-table build shared by pq_topk and
    ivf_pq_topk: (query ids, LUT[q, j, c] = <query_q sub_j,
    codebook_j[c]>, query matrix), or None for an empty query table.
    Raises on query tables above the row/byte guards
    (broadcastable-queries contract — same fail-fast principle as the
    remap/CC driver paths). The query matrix rides along for the
    residual IVF-PQ bias term (<q, centroid_cell>)."""
    q = (
        queries.select(F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv"))
        .limit(_PQ_QUERY_MAX_ROWS + 1)
        .collect()
    )
    if len(q) > _PQ_QUERY_MAX_ROWS:
        raise ValueError(
            f"pq_topk: queries table exceeds {_PQ_QUERY_MAX_ROWS} rows — "
            "the per-query ADC LUTs are driver-built and broadcast, so "
            "the query side must be small. Split the query table into "
            "chunks or use bucketed_topk/ivf_topk for large query sets."
        )
    if not q:
        return None
    probe = q[:1000]
    avg = sum(8 * len(r["_qv"]) for r in probe) / len(probe)
    if avg * len(q) > _PQ_QUERY_MAX_BYTES:
        raise ValueError(
            f"pq_topk: queries table exceeds ~{_PQ_QUERY_MAX_BYTES} "
            "vector bytes — the driver-built LUTs would not be safely "
            "broadcastable. Split the query table into chunks."
        )
    qids = [r["_qid"] for r in q]
    qmat = np.array([r["_qv"] for r in q], dtype=np.float64)
    m = len(codebooks)
    sub = codebooks[0].shape[1]
    lut = np.stack(
        [qmat[:, j * sub : (j + 1) * sub] @ codebooks[j].T for j in range(m)],
        axis=1,
    )
    return qids, lut, qmat


def _exact_rerank(
    shortlist: DataFrame,
    queries: DataFrame,
    rerank_with: DataFrame,
    topk: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact-cosine rerank of an ADC shortlist (the FAISS refine step):
    the small shortlist joins its full vectors, query vectors broadcast
    from the small queries table, exact cosine re-orders to topk."""
    dim = _dim_of(rerank_with, vec_col)
    vecs = _with_vec_norm(
        rerank_with.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
        ),
        "_nv",
        dim,
        "_v",
    ).drop("_nv")
    qvecs = _with_vec_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        "_qv",
        dim,
        "_q",
    ).drop("_qv")
    exact = (
        shortlist.drop("rank")
        .join(vecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _cosine_prenorm(
                F.col("_qd"), F.col("_vd"), F.col("_qn"), F.col("_vn"), dim
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
    )


def pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_rows: int = 4096,
    iters: int = 10,
) -> list:
    """Product-quantization codebooks: the vector space split into m
    subspaces, each with a k-entry codebook — the standard compressed
    ANN representation for billion-vector corpora (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI'11; FAISS IVF-PQ —
    the scale successor of the reference's flat index).

    Training: a deterministic hash-ordered sample of train_rows vectors
    (same scale-safe TakeOrdered policy as ivf_centroids: never a
    global sort, reproducible at any parallelism) collects to the
    driver — train_rows * dim doubles, tiny — and each subspace runs
    `iters` Lloyd steps of numpy k-means seeded from the first k sample
    rows. Untrained codebooks (iters=0) quantize real data too coarsely
    to rank neighbors. Returns a driver-side list of m (k, sub_dim)
    numpy arrays — m*k*sub_dim floats, trivially broadcastable."""
    sample = (
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(md5_hash60_col(F.col("_id").cast("string")), F.col("_id"))
        .limit(train_rows)
        .collect()
    )
    if not sample:
        raise ValueError("pq_codebooks: empty vector table")
    mat = np.array([r["_v"] for r in sample], dtype=np.float64)
    dim = mat.shape[1]
    sub = dim // m
    assert sub * m == dim, f"dim {dim} not divisible by m={m}"
    books = []
    for j in range(m):
        d = mat[:, j * sub : (j + 1) * sub]
        cb = d[: min(k, len(d))].copy()
        for _ in range(iters):
            dist = (
                (d * d).sum(1, keepdims=True)
                - 2.0 * d @ cb.T
                + (cb * cb).sum(1)[None, :]
            )
            assign = dist.argmin(1)
            for c in range(len(cb)):
                members = d[assign == c]
                if len(members):
                    cb[c] = members.mean(0)
        books.append(cb)
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each vector compressed to m one-byte
    codes (nearest codebook entry per subspace, L2). mapInPandas with
    the broadcast codebooks — one numpy argmin per subspace per Arrow
    batch, no shuffle; at 100 TB this turns a 256-byte float64 vector
    into m bytes."""
    spark = vectors.sparkSession
    bc = spark.sparkContext.broadcast([c.tolist() for c in codebooks])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = [np.asarray(c) for c in bc.value]
        m = len(books)
        sub = books[0].shape[1]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for j, cb in enumerate(books):
                d = mat[:, j * sub : (j + 1) * sub]
                # ||x - c||² argmin via the dot-product expansion
                dist = (
                    (d * d).sum(1, keepdims=True)
                    - 2.0 * d @ cb.T
                    + (cb * cb).sum(1)[None, :]
                )
                codes[:, j] = dist.argmin(1)
            yield pd.DataFrame(
                {"_id": pdf[id_col], "codes": list(codes)}
            ).rename(columns={"_id": id_col})

    return vectors.mapInPandas(
        op, schema=f"{id_col} {_id_type(vectors, id_col)}, codes array<long>"
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_with: DataFrame | None = None,
    oversample: int = 4,
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k: each query builds
    one (m, k) lookup table of sub-space dot products against the
    codebooks; a compressed vector's approximate similarity is m table
    gathers — no decompression, no full-vector math. The query LUTs
    broadcast (|queries| * m * k floats); the big codes table streams
    through mapInPandas emitting per-batch candidates, and a window
    keeps the global top-k per query. Output: (query_id, neighbor_id,
    approx_dot, rank).

    PQ approximates the INNER PRODUCT — for cosine search feed
    unit-normalized vectors. rerank_with=the full vector table opts
    into the production shortlist pattern: ADC retrieves
    topk*oversample candidates per query, the (small) shortlist joins
    its exact vectors and exact cosine re-ranks to topk — compressed
    scan over the corpus, exact math only on the shortlist. Output
    then carries `cosine` instead of `approx_dot`.

    CONTRACT: queries must be driver-collectable — the LUTs broadcast
    from the driver (same contract as brute_force_topk's broadcast
    side). Guarded like the remap/CC driver paths: above
    _PQ_QUERY_MAX_ROWS rows or ~_PQ_QUERY_MAX_BYTES of vector bytes
    the call raises immediately instead of silently OOMing the driver;
    split the query table or use bucketed/ivf search for query sets
    that large."""
    spark = codes.sparkSession
    idt = _id_type(codes, id_col)
    luts = _pq_query_luts(queries, codebooks, id_col, vec_col)
    if luts is None:  # no queries -> empty result with the right schema
        out_schema = (
            f"query_id {idt}, neighbor_id {idt}, "
            + ("cosine double" if rerank_with is not None else "approx_dot double")
            + ", rank int"
        )
        return spark.createDataFrame([], out_schema)
    qids, lut, _ = luts
    m = len(codebooks)
    bc = spark.sparkContext.broadcast((qids, lut.tolist()))
    # each Arrow batch must surface the FULL shortlist size, not just
    # topk — per-batch truncation at topk would starve the rerank
    # shortlist whenever the codes table has few partitions
    shortlist_k = topk * oversample if rerank_with is not None else topk

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, lut_ = bc.value
        lut_ = np.asarray(lut_)  # (nq, m, k)
        nq = len(qids_)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.stack(pdf["codes"].to_numpy())  # (n, m)
            # scores[n, nq] = sum_j LUT[q, j, codes[n, j]]
            scores = np.zeros((len(pdf), nq), dtype=np.float64)
            for j in range(m):
                scores += lut_[:, j, :][:, cmat[:, j]].T
            ids = pdf[id_col].to_numpy()
            # +1: a corpus query's own row always ranks first (dot with
            # itself) and is filtered below — without the extra slot it
            # would consume one shortlist position and a single-partition
            # no-rerank search would return topk-1 neighbors
            kk = min(shortlist_k + 1, len(ids))
            rows = []
            for qi in range(nq):
                cand = np.argpartition(-scores[:, qi], kth=kk - 1)[:kk]
                for ci in cand:
                    if ids[ci] != qids_[qi]:
                        rows.append(
                            (qids_[qi], ids[ci], round(float(scores[ci, qi]), 6))
                        )
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "approx_dot"]
            )

    cand = codes.mapInPandas(
        op, schema=f"query_id {idt}, neighbor_id {idt}, approx_dot double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_dot"), F.asc("neighbor_id")
    )
    shortlist = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= shortlist_k)
    )
    if rerank_with is None:
        return shortlist
    # query vectors come from the SMALL queries table (broadcastable);
    # rerank_with is the full corpus and only serves neighbor lookups
    return _exact_rerank(shortlist, queries, rerank_with, topk, id_col, vec_col)


def _residual_vectors(
    vectors_owned: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, residual vec, cell_id): r = x - centroid(cell(x)), the
    quantity residual IVF-PQ encodes (Jégou et al. TPAMI'11 §V —
    residual energy ≪ vector energy on clustered data, so the same
    m-byte budget quantizes much finer). Pure JVM zip_with over the
    broadcast centroid join — no UDF, no shuffle of the big side."""
    return vectors_owned.join(F.broadcast(centroids), "cell_id").select(
        id_col,
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("cv").cast("array<double>"),
            lambda x, c: (x - c).cast("float"),
        ).alias(vec_col),
        "cell_id",
    )


def ivf_pq_residual_codebooks(
    vectors: DataFrame,
    centroids: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_rows: int = 4096,
    iters: int = 10,
) -> list:
    """PQ codebooks trained on IVF RESIDUALS (x - centroid(x)) — the
    production IVF-PQ layout shares ONE residual codebook set across
    cells (Jégou TPAMI'11 §V), so the ADC LUT build stays per-query,
    not per-(query, cell)."""
    owned = ivf_assign(vectors, None, id_col, vec_col, centroids=centroids)
    res = _residual_vectors(owned, centroids, id_col, vec_col)
    return pq_codebooks(
        res.select(id_col, vec_col), m, k, id_col, vec_col, train_rows, iters
    )


def ivf_pq_candidates(
    codes: DataFrame,
    owned: DataFrame,
    query_probes: DataFrame,
    id_col: str = "vec_id",
    keep_cell: bool = False,
) -> DataFrame:
    """Cell-pruned (query_id, neighbor codes) candidates — the
    inverted-list layout of FAISS IVF-PQ as an equi-join: codes gain
    their owning cell, queries fan out to their nprobe probed cells,
    and the join on cell_id IS the inverted-list lookup. Candidate
    count per query ≈ nprobe × N / n_cells instead of N — both the
    scan and the ADC compute shrink by the cell-pruning factor.
    Exposed separately so callers (and tests) can measure the scanned
    candidate count. keep_cell=True retains the candidate's OWNING
    cell_id (the residual path needs it for the <q, centroid> bias)."""
    inv = codes.join(owned.select(id_col, "cell_id"), id_col)
    qp = query_probes.select("cell_id", F.col(id_col).alias("query_id"))
    cols = ["query_id", F.col(id_col).alias("neighbor_id"), "codes"]
    if keep_cell:
        cols.append(F.col("cell_id"))
    return (
        inv.join(qp, "cell_id")
        .where(F.col("query_id") != F.col(id_col))
        .select(*cols)
    )


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: list,
    topk: int = 5,
    n_cells: int | None = None,
    nprobe: int = 1,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
    rerank_with: DataFrame | None = None,
    oversample: int = 4,
    target_cell_rows: int = 4096,
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ: the ADC scan cell-pruned to each query's nprobe nearest
    coarse cells — the actual billion-vector FAISS layout (Jégou et
    al. TPAMI'11 §V; the flat pq_topk is its n_cells=1 special case).
    Composition of the existing pieces: ivf_assign owns each vector in
    one cell and fans queries out to nprobe cells; ivf_pq_candidates
    joins compressed codes to probed queries on cell_id; the broadcast
    per-query LUTs score only those candidates; optional exact rerank
    of the topk*oversample shortlist (rerank_with). Once nprobe covers
    the cells holding the true neighbors, recall matches flat PQ at
    the same oversample with a fraction of the scanned codes (measured
    on the clustered fixture: equal recall at 47% of the scan,
    nprobe=3 of 8 cells); pruning also keeps unprobed-cell ADC-noise
    distractors out of the shortlist.

    residual=True is the PRODUCTION encoding (Jégou §V): each vector's
    codes quantize r = x - centroid(cell(x)) instead of x, so the same
    m-byte budget spends its precision on the (much smaller) residual
    — where IVF-PQ's recall at small m comes from. The approximate
    score decomposes as <q, centroid_cell> + <q, r̂>: the first term is
    a tiny (n_queries × n_cells) bias matrix (broadcast, cell_id rides
    the candidate rows), the second the usual shared-codebook LUT
    gathers. Pass codebooks trained on residuals
    (ivf_pq_residual_codebooks); codes= is ignored under residual=True
    (the encoding is centroid-relative).

    Queries must be broadcastable (same guarded contract as pq_topk);
    pass codes= to reuse a precomputed pq_encode table."""
    spark = vectors.sparkSession
    idt = _id_type(vectors, id_col)
    if centroids is None:
        if n_cells is None:
            n_cells = max(1, round(vectors.count() / target_cell_rows))
        centroids = ivf_centroids(vectors, n_cells, id_col, vec_col)
    owned = ivf_assign(vectors, None, id_col, vec_col, centroids=centroids)
    if residual:
        res = _residual_vectors(owned, centroids, id_col, vec_col)
        codes = pq_encode(res.select(id_col, vec_col), codebooks, id_col, vec_col)
    elif codes is None:
        codes = pq_encode(vectors, codebooks, id_col, vec_col)
    luts = _pq_query_luts(queries, codebooks, id_col, vec_col)
    if luts is None:
        out_schema = (
            f"query_id {idt}, neighbor_id {idt}, "
            + ("cosine double" if rerank_with is not None else "approx_dot double")
            + ", rank int"
        )
        return spark.createDataFrame([], out_schema)
    qids, lut, qmat = luts
    probes = ivf_assign(
        queries, None, id_col, vec_col, centroids=centroids, nprobe=nprobe
    )
    cand = ivf_pq_candidates(codes, owned, probes, id_col, keep_cell=residual)
    m = len(codebooks)
    qindex = {qid: i for i, qid in enumerate(qids)}
    if residual:
        # <q, centroid_c> bias: centroids are broadcastable by contract
        # (ivf_assign broadcast-joins them already) — tiny driver matrix
        cent_rows = centroids.collect()
        cell_index = {r["cell_id"]: i for i, r in enumerate(cent_rows)}
        cent_mat = np.array([r["cv"] for r in cent_rows], dtype=np.float64)
        bias = qmat @ cent_mat.T  # (nq, n_cells)
        bc = spark.sparkContext.broadcast(
            (qindex, lut.tolist(), cell_index, bias.tolist())
        )
    else:
        bc = spark.sparkContext.broadcast((qindex, lut.tolist(), None, None))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qindex_, lut_, cell_index_, bias_ = bc.value
        lut_ = np.asarray(lut_)  # (nq, m, k)
        if bias_ is not None:
            bias_ = np.asarray(bias_)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.stack(pdf["codes"].to_numpy())  # (n, m)
            qidx = pdf["query_id"].map(qindex_).to_numpy(dtype=np.int64)
            scores = np.zeros(len(pdf), dtype=np.float64)
            if bias_ is not None:
                cidx = pdf["cell_id"].map(cell_index_).to_numpy(dtype=np.int64)
                scores += bias_[qidx, cidx]
            for j in range(m):
                # row r scores against ITS query's LUT: paired fancy
                # indexing (qidx[r], j, codes[r, j]) — fully vectorized
                scores += lut_[qidx, j, cmat[:, j]]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "approx_dot": np.round(scores, 6),
                }
            )

    scored = cand.mapInPandas(
        op, schema=f"query_id {idt}, neighbor_id {idt}, approx_dot double"
    )
    shortlist_k = topk * oversample if rerank_with is not None else topk
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_dot"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= shortlist_k)
    )
    if rerank_with is None:
        return shortlist
    return _exact_rerank(shortlist, queries, rerank_with, topk, id_col, vec_col)
