"""ANN scale-parameterization: hash-sampled + k-means centroids,
nprobe>1 IVF probing, Hamming-1 multi-probe LSH, and the N-derived
bucket/cell cardinalities. Recall measured against brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.operators.similarity_search import (
    _auto_bits,
    brute_force_topk,
    bucketed_topk,
    ivf_centroids,
    ivf_topk,
    sign_lsh_buckets,
)

N, DIM, CENTERS, K = 400, 16, 8, 5


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(CENTERS, DIM)) * 3.0
    rows = []
    for i in range(N):
        c = i % CENTERS
        v = centers[c] + rng.normal(size=DIM) * 0.4
        rows.append((i, [float(x) for x in v.astype(np.float32)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    df.count()
    return df


def _recall(approx, exact) -> float:
    hit = approx.join(exact, ["query_id", "neighbor_id"], "inner").count()
    total = exact.count()
    return hit / total


@pytest.fixture(scope="module")
def exact_topk(clustered_vectors):
    df = brute_force_topk(clustered_vectors, clustered_vectors, k=K).cache()
    df.count()
    return df


def test_ivf_nprobe2_recall(clustered_vectors, exact_topk):
    approx = ivf_topk(clustered_vectors, k=K, n_cells=CENTERS, nprobe=2)
    assert _recall(approx, exact_topk) >= 0.9


def test_ivf_nprobe_monotone(clustered_vectors, exact_topk):
    r1 = _recall(
        ivf_topk(clustered_vectors, k=K, n_cells=CENTERS, nprobe=1), exact_topk
    )
    r2 = _recall(
        ivf_topk(clustered_vectors, k=K, n_cells=CENTERS, nprobe=2), exact_topk
    )
    assert r2 >= r1


def test_ivf_kmeans_centroids_recall(clustered_vectors, exact_topk):
    cents = ivf_centroids(clustered_vectors, CENTERS, iters=2)
    assert cents.count() == CENTERS
    approx = ivf_topk(clustered_vectors, k=K, centroids=cents, nprobe=2)
    assert _recall(approx, exact_topk) >= 0.9


def test_lsh_multiprobe_improves_recall(clustered_vectors, exact_topk):
    r0 = _recall(
        bucketed_topk(clustered_vectors, k=K, n_bits=4, probe_hamming=0),
        exact_topk,
    )
    r1 = _recall(
        bucketed_topk(clustered_vectors, k=K, n_bits=4, probe_hamming=1),
        exact_topk,
    )
    assert r1 >= r0
    assert r1 >= 0.5  # one-bit probing recovers the boundary neighbors


def test_auto_bucket_cardinality_scales_with_n():
    # constant bits would make within-bucket joins quadratic in N;
    # the derived bits track log2(N / target)
    assert _auto_bits(10_000, target_bucket_rows=1000) == 4
    assert _auto_bits(10_000_000, target_bucket_rows=1000) > _auto_bits(
        10_000, target_bucket_rows=1000
    )
    assert _auto_bits(100, target_bucket_rows=4096) == 1  # never zero buckets
    assert _auto_bits(10**12, target_bucket_rows=4096) <= 24  # clamp


def test_sign_lsh_auto_bits_runs(clustered_vectors):
    b = sign_lsh_buckets(clustered_vectors, n_bits=None, target_bucket_rows=50)
    n_buckets = b.select("bucket").distinct().count()
    assert n_buckets > 1  # 400 rows / target 50 -> 8 expected buckets
