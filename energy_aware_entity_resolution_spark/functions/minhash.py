"""MinHash signatures + LSH banding (SURVEY.md J8).

The reference accelerates nearest-neighbor candidate search with a
FAISS flat-IP index (dynamic_entity_resolution.py:10-121). An index
object on one node cannot exist at 10^12 rows; the Spark-native
replacement is MinHash-LSH: per-record k-permutation MinHash signature
(vectorized Arrow UDF), split into b bands of r hashes, hash each band
JVM-side, and self-join on (band_id, band_hash) — the "index probe"
becomes an equi-join that shuffles by band key.

Permutations are the classic universal family h_i(x) = (a_i*x + b_i)
mod P over a 61-bit token hash, with (a_i, b_i) drawn from a fixed
seeded generator so signatures are stable across runs/executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SEED = 0x5EED


def _coeffs(k: int) -> tuple[np.ndarray, np.ndarray]:
    """Odd 64-bit multipliers + offsets for multiply-shift hashing
    h_i(x) = (a_i*x + b_i) mod 2^64 (Dietzfelbinger et al.) — the mod
    wraps on every multiply, so the k functions are order-decorrelated
    (a small-coefficient LCG over a 61-bit prime is nearly monotone in
    x and makes all positions pick the same token)."""
    rng = np.random.default_rng(_SEED)
    a = rng.integers(1, 1 << 63, size=k, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 63, size=k, dtype=np.uint64)
    return a, b


def _token_hash64(tokens: pd.Series) -> dict[str, np.int64]:
    """Deterministic 61-bit hash per unique token in the Arrow batch.

    Unique-token caching mirrors the reference's lru_cache'd tokenizer
    idea (dynamic_graph.py:288-291) at batch granularity: hash each
    distinct token once, map to rows vectorized.
    """
    import hashlib

    uniq: dict[str, np.uint64] = {}
    for toks in tokens:
        if toks is None:
            continue
        for t in toks:
            if t not in uniq:
                h = hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest()
                uniq[t] = np.uint64(int.from_bytes(h, "little"))
    return uniq


def make_minhash_udf(k: int = 128):
    """Scalar pandas UDF: array<string> tokens -> array<long> signature."""
    a, b = _coeffs(k)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        with np.errstate(over="ignore"):
            for tokens in it:
                hmap = _token_hash64(tokens)
                out = []
                # deterministic filler for empty token sets
                empty = [int(x) for x in (a + b).astype(np.int64)]
                for toks in tokens:
                    if toks is None or len(toks) == 0:
                        out.append(empty)
                        continue
                    hs = np.fromiter(
                        (hmap[t] for t in toks), dtype=np.uint64, count=len(toks)
                    )
                    # (k, n): uint64 multiply-shift, wraps mod 2^64
                    sig = (a[:, None] * hs[None, :] + b[:, None]).min(axis=1)
                    out.append([int(x) for x in sig.astype(np.int64)])
                yield pd.Series(out)

    return minhash_sig


def make_minhash_embed_udf(k: int = 128, dim: int = 64):
    """Fused MinHash + pooled-embedding UDF: one Arrow transfer of the
    token column, one token-hash pass shared by both features (the two
    separate UDFs each paid their own serialization + hashing).

    Returns struct<minhash: array<long>, vec: array<float>>.
    """
    a, b = _coeffs(k)

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("minhash", T.ArrayType(T.LongType())),
                T.StructField("vec", T.ArrayType(T.FloatType())),
            ]
        )
    )
    def minhash_embed(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        with np.errstate(over="ignore"):
            for tokens in it:
                hmap = _token_hash64(tokens)
                sigs = []
                vecs = []
                empty_sig = [int(x) for x in (a + b).astype(np.int64)]
                for toks in tokens:
                    if toks is None or len(toks) == 0:
                        sigs.append(empty_sig)
                        vecs.append([0.0] * dim)
                        continue
                    hs = np.fromiter(
                        (hmap[t] for t in toks), dtype=np.uint64, count=len(toks)
                    )
                    sig = (a[:, None] * hs[None, :] + b[:, None]).min(axis=1)
                    sigs.append([int(x) for x in sig.astype(np.int64)])
                    # pooled embedding from the same 64-bit token hashes
                    idx = (hs % np.uint64(dim)).astype(np.int64)
                    sign = np.where(
                        (hs >> np.uint64(62)) & np.uint64(1), 1.0, -1.0
                    )
                    vec = np.zeros(dim, dtype=np.float64)
                    np.add.at(vec, idx, sign)
                    n = np.linalg.norm(vec)
                    if n > 0:
                        vec /= n
                    vecs.append(vec.astype(np.float32).tolist())
                yield pd.DataFrame({"minhash": sigs, "vec": vecs})

    return minhash_embed


def band_table(
    df: DataFrame,
    sig_col: str = "minhash",
    id_col: str = "conv_id",
    bands: int = 32,
    rows: int = 4,
) -> DataFrame:
    """Explode a signature into (id, band_id, band_hash).

    band_hash = xxhash64(band_id, slice) — JVM-side; collisions across
    different slices are harmless extra candidates (scoring re-checks).
    """
    slices = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda i: F.slice(F.col(sig_col), i * rows + 1, rows),
    )
    return (
        df.select(F.col(id_col), F.posexplode(slices).alias("band_id", "band_sig"))
        .select(
            id_col,
            "band_id",
            F.xxhash64("band_id", "band_sig").alias("band_hash"),
        )
    )


def minhash_jaccard_est(sig_a: Column, sig_b: Column) -> Column:
    """Estimated Jaccard = fraction of agreeing signature positions."""
    agree = F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda z: z)
    )
    return agree / F.size(sig_a)
