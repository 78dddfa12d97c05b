"""Portable (oracle-checkable) gate path: the documents-derived
transcripts bridge and the portable hash family in featurize.

The DuckDB er_* oracles rely on two invariants tested here:
1. assemble(transcripts_from_documents(docs)).doc == space-joined
   whitespace tokens of docs.text (the oracle skips turn assembly).
2. featurize(portable=True)'s one-pass groupBy aggregation computes
   exactly the reference fold expressions portable_minhash_col /
   portable_embed_col (same family the oracle SQL mirrors).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.config import BlockingConfig, PipelineConfig
from energy_aware_entity_resolution_spark.functions.portable_hash import (
    portable_embed_col,
    portable_minhash_col,
)
from energy_aware_entity_resolution_spark.operators.assemble import (
    assemble_conversations,
)
from energy_aware_entity_resolution_spark.operators.blocking import featurize
from energy_aware_entity_resolution_spark.sources import transcripts_from_documents

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "the quick brown fox jumps over the lazy dog today"),  # exact dup
    (2, "a quick brown fox jumped over one lazy dog yesterday"),
    (3, "due 2025-03-07 and 03/07/2025 payment of 250 dollars"),
    (4, "   spaced    out\ttokens \n here   "),
    (5, ""),  # empty text -> single empty turn
    (6, "solo"),
]


@pytest.fixture()
def docs_df(spark):  # noqa: F811
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bridge_doc_equals_joined_tokens(spark, docs_df):  # noqa: F811
    """Invariant 1: Spark's real turn assembly over the bridge equals
    the oracle's shortcut (space-joined ws tokens)."""
    t = transcripts_from_documents(docs_df, tokens_per_turn=3)
    doc = assemble_conversations(t).select("conv_id", "doc")
    expected = docs_df.select(
        F.format_string("d%08d", "doc_id").alias("conv_id"),
        F.array_join(
            F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != F.lit("")),
            " ",
        ).alias("doc"),
    )
    assert doc.exceptAll(expected).isEmpty()
    assert expected.exceptAll(doc).isEmpty()


def test_bridge_schema_and_roles(spark, docs_df):  # noqa: F811
    t = transcripts_from_documents(docs_df)
    assert t.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    roles = {r["role"] for r in t.select("role").distinct().collect()}
    assert roles <= {"user", "assistant"}
    # empty doc still yields one (empty-text) turn
    n = t.where(F.col("conv_id") == "d00000005").count()
    assert n == 1


def test_portable_featurize_matches_fold_columns(spark, docs_df):  # noqa: F811
    """Invariant 2: groupBy-agg hashing == the fold column expressions
    (k mins + dim sums over the same md5-60bit token hashes)."""
    cfg = PipelineConfig(
        blocking=BlockingConfig(portable=True, minhash_k=8, df_stopword_ratio=0.9)
    )
    feats = featurize(
        assemble_conversations(transcripts_from_documents(docs_df)), cfg
    )
    check = feats.select(
        "conv_id",
        "minhash",
        "vec",
        portable_minhash_col(F.col("rare_tokens"), 8).alias("mh_fold"),
        portable_embed_col(F.col("rare_tokens"), cfg.scoring.embedding_dim).alias(
            "vec_fold"
        ),
    )
    bad = check.where(
        (F.col("minhash") != F.col("mh_fold")) | (F.col("vec") != F.col("vec_fold"))
    )
    assert bad.count() == 0


def test_portable_pipeline_end_to_end(spark, docs_df):  # noqa: F811
    """The gate config runs the REAL run_pipeline and clusters the
    exact duplicate pair together, never merging unrelated docs."""
    from energy_aware_entity_resolution_spark.plans import run_pipeline

    cfg = PipelineConfig(blocking=BlockingConfig(portable=True), audit_enabled=False)
    res = run_pipeline(transcripts_from_documents(docs_df), cfg)
    comp = {
        r["conv_id"]: r["component_id"] for r in res.clusters.collect()
    }
    assert comp["d00000000"] == comp["d00000001"]  # exact dups merge
    assert comp["d00000006"] == "d00000006"  # solo stays singleton
    res.release()
