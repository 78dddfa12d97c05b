"""Similarity search over an embedding column (array<float>).

Replaces the reference's FAISS IndexFlatIP (SURVEY.md J7/J8,
dynamic_entity_resolution.py:10-215) with Spark-native strategies:

- brute_force_topk: exact top-k cosine — crossJoin with a BROADCAST
  query side + window top-k. The baseline; correct at any scale where
  |queries| is broadcastable.
- sign_lsh_buckets / bucketed_topk: random-hyperplane LSH (axis-sign
  buckets, oracle-portable) so the join only explores same-bucket
  candidates — the 100 TB path; recall < 1 by construction, bounded by
  multi-probe over Hamming-adjacent buckets.
- block_topk_applyinpandas: per-block NumPy matmul top-k — the direct
  analog of the reference's blocked `E_block @ E.T` kernel
  (dynamic_entity_resolution.py:161-215), but per blocking key inside
  applyInPandas, never a global driver matrix.
"""

from __future__ import annotations

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


def _cosine(a, b):
    # widen to double BEFORE multiplying: float*float products lose
    # bits that can flip the 6th rounded decimal vs engines that
    # accumulate in double (the DuckDB oracle does)
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    return F.round(
        dot_col(ad, bd)
        / F.greatest(norm_col(ad) * norm_col(bd), F.lit(1e-12)),
        6,
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
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vv"))
    scored = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("qv"), F.col("vv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def sign_lsh_buckets(
    vectors: DataFrame,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Axis-aligned random-hyperplane LSH: bucket = sign bits of the
    first n_bits coordinates. Deterministic and SQL-portable (the
    general rotated-hyperplane variant just pre-multiplies a fixed
    rotation; axis planes keep the oracle trivial)."""
    bucket = F.lit(0)
    for j in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(F.col(vec_col), j + 1) > 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
    return vectors.select(
        F.col(id_col), F.col(vec_col), bucket.alias("bucket")
    )


def bucketed_topk(
    vectors: DataFrame,
    k: int = 5,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate all-pairs top-k: equi-join within LSH buckets."""
    b = sign_lsh_buckets(vectors, n_bits, id_col, vec_col)
    a_side = b.select(
        F.col("bucket"), F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    b_side = b.select(
        F.col("bucket"), F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vv")
    )
    scored = (
        a_side.join(b_side, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", _cosine(F.col("qv"), F.col("vv")).alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_assign(
    vectors: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest of
    n_cells centroid vectors.

    Centroids are the vectors with the n_cells smallest ids —
    deterministic, derivable by any engine (a k-means fit would be the
    production upgrade; the cell-probe structure is identical). The
    centroid set is tiny and broadcast; assignment is one
    broadcast-join + argmax, no shuffle of the big side.
    """
    cents = vectors.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cv")
    )
    scored = vectors.crossJoin(F.broadcast(cents)).select(
        id_col,
        vec_col,
        "cell_id",
        _cosine(F.col(vec_col), F.col("cv")).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cell_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, vec_col, "cell_id")
    )


def ivf_topk(
    vectors: DataFrame,
    k: int = 3,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-bucketed approximate top-k: search only within the query's
    cell (nprobe=1). The reference's FAISS flat index re-expressed as
    partitioned search; recall rises with n_probe / falls with n_cells."""
    assigned = ivf_assign(vectors, n_cells, id_col, vec_col)
    a = assigned.select(
        "cell_id", F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    b = assigned.select(
        "cell_id", F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vv")
    )
    scored = (
        a.join(b, "cell_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", _cosine(F.col("qv"), F.col("vv")).alias("cosine")
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

    return (
        vectors.select(F.col(block_col).alias("_blk"), id_col, vec_col)
        .groupBy("_blk")
        .applyInPandas(
            per_block,
            schema="query_id long, neighbor_id long, cosine double, rank int",
        )
    )
