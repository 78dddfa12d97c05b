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
    levenshtein_ratio_col,
)


def score_pairs(
    pairs: DataFrame, features: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """(conv_id_a, conv_id_b, ...) -> + per-metric and blended scores."""
    sc = cfg.scoring
    # score on the DF-pruned rare tokens / rare signature — corpus
    # boilerplate must not contribute similarity (see blocking.featurize)
    feat = features.select("conv_id", "rare_tokens", "rare_sig", "vec", "sig_hash")
    a = feat.select(
        F.col("conv_id").alias("conv_id_a"),
        F.col("rare_tokens").alias("tokens_a"),
        F.col("rare_sig").alias("cleaned_a"),
        F.col("vec").alias("vec_a"),
        F.col("sig_hash").alias("sig_hash_a"),
    )
    b = feat.select(
        F.col("conv_id").alias("conv_id_b"),
        F.col("rare_tokens").alias("tokens_b"),
        F.col("rare_sig").alias("cleaned_b"),
        F.col("vec").alias("vec_b"),
        F.col("sig_hash").alias("sig_hash_b"),
    )
    scored = (
        pairs.join(a, "conv_id_a")
        .join(b, "conv_id_b")
        .withColumn("jaccard", jaccard_col(F.col("tokens_a"), F.col("tokens_b")))
        .withColumn(
            "lev_ratio",
            levenshtein_ratio_col(
                F.col("cleaned_a"), F.col("cleaned_b"), cap=sc.levenshtein_cap
            ),
        )
        # signed feature-hash vectors can go slightly negative; a
        # negative cosine means "dissimilar", clamp for the [0,1] blend.
        # Production vecs are unit (UDF normalizes -> dot == cosine);
        # portable vecs are unnormalized integer-valued (exact across
        # engines) -> divide by the norms explicitly.
        .withColumn(
            "cosine",
            F.greatest(
                cosine_col(F.col("vec_a"), F.col("vec_b"))
                if not cfg.blocking.portable
                else dot_col(F.col("vec_a"), F.col("vec_b"))
                / F.greatest(
                    norm_col(F.col("vec_a")) * norm_col(F.col("vec_b")),
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
    ).drop("tokens_a", "tokens_b", "cleaned_a", "cleaned_b", "vec_a", "vec_b")
