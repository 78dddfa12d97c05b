"""Pairwise scoring over candidate pairs (SURVEY.md §2.4).

The reference's only pipeline-1 score is cosine over walk embeddings
(dynamic_entity_resolution.py:191); formula_comparison.py adds
Levenshtein/Jaccard variants. The Spark engine scores every candidate
pair with a blend of token Jaccard (JVM), Levenshtein ratio (JVM
built-in), and pooled-embedding cosine (JVM fold over Arrow-built
vectors) — one wide projection after two hash joins that attach each
side's features.

Scale: the two feature-attach joins shuffle by conv_id; features are
pre-projected to only the columns scoring needs (column pruning by
hand at the API boundary; Catalyst prunes the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.config import PipelineConfig
from energy_aware_entity_resolution_spark.functions.embeddings import (
    cosine_col,
    dot_col,
    norm_col,
)
from energy_aware_entity_resolution_spark.functions.similarity import (
    jaccard_col,
)


def score_pairs(
    pairs: DataFrame, features: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """(conv_id_a, conv_id_b, ...) -> + per-metric and blended scores."""
    sc = cfg.scoring
    dim = sc.embedding_dim
    # score on the DF-pruned rare tokens / rare signature — corpus
    # boilerplate must not contribute similarity (see blocking.featurize).
    # Per-SIDE work is precomputed before the pair join (guide §2.3):
    # the Levenshtein inputs are capped + measured once per conversation
    # (also narrowing the string the join shuffles to <= cap chars), and
    # the portable path's vector norm is taken once per conversation —
    # each pair then pays only the unrolled dot. All per-pair arithmetic
    # is bit-identical to the previous per-pair expressions.
    lev_c = F.substring(F.col("rare_sig"), 1, sc.levenshtein_cap)
    feat = features.select(
        "conv_id",
        "rare_tokens",
        lev_c.alias("lev_sig"),
        F.length(lev_c).alias("lev_len"),
        "vec",
        "sig_hash",
        *(
            [norm_col(F.col("vec"), dim).alias("vec_norm")]
            if cfg.blocking.portable
            else []
        ),
    )
    a = feat.select(
        F.col("conv_id").alias("conv_id_a"),
        *[F.col(c).alias(f"{c}_a") for c in feat.columns if c != "conv_id"],
    )
    b = feat.select(
        F.col("conv_id").alias("conv_id_b"),
        *[F.col(c).alias(f"{c}_b") for c in feat.columns if c != "conv_id"],
    )
    lev_mx = F.greatest(F.col("lev_len_a"), F.col("lev_len_b"), F.lit(1))
    scored = (
        pairs.join(a, "conv_id_a")
        .join(b, "conv_id_b")
        .withColumn(
            "jaccard",
            jaccard_col(
                F.col("rare_tokens_a"), F.col("rare_tokens_b"), distinct_arrays=True
            ),
        )
        # equality short-circuit: exact-dup pairs (frequent — every
        # exact candidate) take an O(L) memcmp instead of the O(L²) DP;
        # equal strings have distance 0 by definition, so the value is
        # unchanged
        .withColumn(
            "lev_ratio",
            F.lit(1.0)
            - F.when(F.col("lev_sig_a") == F.col("lev_sig_b"), F.lit(0)).otherwise(
                F.levenshtein(F.col("lev_sig_a"), F.col("lev_sig_b"))
            )
            / lev_mx,
        )
        # signed feature-hash vectors can go slightly negative; a
        # negative cosine means "dissimilar", clamp for the [0,1] blend.
        # Production vecs are unit (UDF normalizes -> dot == cosine);
        # portable vecs are unnormalized integer-valued (exact across
        # engines) -> divide by the norms explicitly.
        .withColumn(
            "cosine",
            F.greatest(
                cosine_col(F.col("vec_a"), F.col("vec_b"), dim)
                if not cfg.blocking.portable
                else dot_col(F.col("vec_a"), F.col("vec_b"), dim)
                / F.greatest(
                    F.col("vec_norm_a") * F.col("vec_norm_b"),
                    F.lit(1e-12),
                ),
                F.lit(0.0),
            ),
        )
        .withColumn("exact", F.col("sig_hash_a") == F.col("sig_hash_b"))
    )
    blend = (
        F.lit(sc.w_jaccard) * F.col("jaccard")
        + F.lit(sc.w_levenshtein) * F.col("lev_ratio")
        + F.lit(sc.w_cosine) * F.col("cosine")
    )
    return scored.withColumn(
        "score", F.when(F.col("exact"), F.lit(1.0)).otherwise(blend)
    ).drop(
        "rare_tokens_a",
        "rare_tokens_b",
        "lev_sig_a",
        "lev_sig_b",
        "lev_len_a",
        "lev_len_b",
        "vec_a",
        "vec_b",
        "vec_norm_a",
        "vec_norm_b",
    )
