"""Degenerate inputs: the pipeline must produce sane empty/singleton
results, never throw — empty tables and NULL text happen constantly in
100 TB corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.config import PipelineConfig
from energy_aware_entity_resolution_spark.plans import run_pipeline
from energy_aware_entity_resolution_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
)


def test_empty_transcripts(spark):
    empty = spark.createDataFrame([], TRANSCRIPT_SCHEMA)
    res = run_pipeline(empty, PipelineConfig())
    assert res.clusters.count() == 0
    assert res.matches.count() == 0
    res.release()


def test_single_conversation_null_text(spark):
    rows = [
        ("c1", 0, "user", None, None, None),
        ("c1", 1, "assistant", None, None, None),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    res = run_pipeline(df, PipelineConfig())
    clusters = res.clusters.collect()
    assert len(clusters) == 1
    assert clusters[0]["component_id"] == "c1"  # its own singleton
    res.release()


def test_two_null_text_conversations_are_exact_dups(spark):
    """NULL text cleans to '' on every turn; two all-NULL conversations
    have equal (empty) signatures — the exact path must pair them, not
    crash on empty token arrays."""
    rows = [
        ("a", 0, "user", None, None, None),
        ("b", 0, "user", None, None, None),
        ("z", 0, "user", "totally unrelated content words here", None, None),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    res = run_pipeline(df, PipelineConfig())
    comp = {r["conv_id"]: r["component_id"] for r in res.clusters.collect()}
    assert comp["a"] == comp["b"] == "a"
    assert comp["z"] == "z"
    res.release()


def test_incremental_global_mode_empty_and_singleton(spark, tmp_path):
    """Global-decision incremental mode on degenerate inputs: a batch
    producing zero candidates must write empty add/revoke deltas and
    resolve every conversation as its own singleton cluster."""
    from energy_aware_entity_resolution_spark.config import (
        PipelineConfig,
        ScoringConfig,
    )
    from energy_aware_entity_resolution_spark.streaming.incremental import (
        run_incremental,
    )

    rows = [
        ("c1", 0, "user", "alpha beta gamma unique", None, "2026-01-01 00:00:00"),
        ("c2", 0, "user", "totally different words here", None, "2026-01-01 00:00:01"),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cfg = PipelineConfig(scoring=ScoringConfig(mutual_only=True))
    clusters = run_incremental(t, cfg, str(tmp_path / "deg"), n_batches=2)
    got = {r["conv_id"]: r["component_id"] for r in clusters.collect()}
    assert got == {"c1": "c1", "c2": "c2"}
    # 2 conversations through 5 batches: at least 3 batches carry ZERO
    # rows — the full global path (empty delta, empty affected set,
    # empty cluster-delta region) must run clean through all of them
    clusters5 = run_incremental(t, cfg, str(tmp_path / "deg5"), n_batches=5)
    got5 = {r["conv_id"]: r["component_id"] for r in clusters5.collect()}
    assert got5 == {"c1": "c1", "c2": "c2"}
