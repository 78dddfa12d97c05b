"""End-to-end batch ER pipeline (SURVEY.md §3.1-3.2 re-expressed).

Reference lifecycle (batch_driver main.py:46-115 + smatch decision
path kafkaconsumer.py:204-247): load → graph → walks → embeddings →
top-k cosine → ratio/RNN filter → similarity structure → groups.

Spark lifecycle: transcripts → assemble → featurize → blocking tables
→ candidate pairs → scores → decisions → connected components →
clusters (+ audit). Each stage is a pure DataFrame function; this
driver only sequences them and (optionally) checkpoints stage outputs
for resume.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.config import PipelineConfig
from energy_aware_entity_resolution_spark.operators.assemble import (
    assemble_conversations,
)
from energy_aware_entity_resolution_spark.operators.audit import (
    StageMetrics,
    match_state,
    partition_lineage,
)
from energy_aware_entity_resolution_spark.operators.blocking import (
    featurize,
    lsh_bands,
)
from energy_aware_entity_resolution_spark.operators.candidates import candidate_pairs
from energy_aware_entity_resolution_spark.operators.clustering import (
    connected_components,
)
from energy_aware_entity_resolution_spark.operators.decision import decide_matches
from energy_aware_entity_resolution_spark.operators.scoring import score_pairs


@dataclass
class PipelineResult:
    features: DataFrame
    candidates: DataFrame
    scored: DataFrame
    matches: DataFrame
    clusters: DataFrame
    audit: DataFrame | None
    metrics: StageMetrics

    def release(self) -> None:
        """Unpersist every stage cache this run created. Call when the
        result DataFrames are no longer needed — repeated run_pipeline
        calls in one session (tests, benches, the incremental loop)
        otherwise accumulate cached RDDs for the session lifetime."""
        for df in (self.features, self.candidates, self.scored,
                   self.matches, self.clusters):
            try:
                df.unpersist()
            except Exception:
                pass


def _release_upstream(df: DataFrame) -> None:
    """Unpersist caches featurize (or any stage) tagged onto its output
    — safe to call once the downstream materialization completed."""
    for cached in getattr(df, "_upstream_caches", []):
        cached.unpersist()


def _maybe_checkpoint(df: DataFrame, cfg: PipelineConfig, name: str) -> DataFrame:
    """Materialize a stage boundary.

    With a checkpoint_dir: durable parquet snapshot + read-back
    (north_rule: resumable from candidate-pair + component state).
    Without: persist + eager count. The count is load-bearing: a lazy
    persist lets AQE's concurrent broadcast-exchange jobs RACE to
    populate the cache, each recomputing the whole upstream tree
    (observed: five overlapping 12s jobs all running featurize).
    """
    if not cfg.checkpoint_dir:
        out = df.persist()
        out.count()
        _release_upstream(df)
        return out
    path = os.path.join(cfg.checkpoint_dir, name)
    df.write.mode("overwrite").parquet(path)
    _release_upstream(df)
    return df.sparkSession.read.parquet(path)


def run_pipeline(transcripts: DataFrame, cfg: PipelineConfig | None = None) -> PipelineResult:
    cfg = cfg or PipelineConfig()
    spark = transcripts.sparkSession
    metrics = StageMetrics(cfg.run_id, spark=spark)

    t0 = metrics.start()
    assembled = assemble_conversations(transcripts)
    features = featurize(assembled, cfg)
    features = _maybe_checkpoint(features, cfg, "features")
    metrics.record("featurize", t0)

    t0 = metrics.start()
    bands = lsh_bands(features, cfg)
    cands = candidate_pairs(features, bands, cfg)
    # single consumer (scoring) — materializing it would only add a
    # stage barrier; with a checkpoint_dir it IS persisted (resume)
    if cfg.checkpoint_dir:
        cands = _maybe_checkpoint(cands, cfg, "candidate_pairs")
    metrics.record("candidates", t0)

    t0 = metrics.start()
    scored = score_pairs(cands, features, cfg)
    if cfg.checkpoint_dir:
        scored = _maybe_checkpoint(scored, cfg, "scored_pairs")
    else:
        # LAZY persist: decide_matches's window stage populates this
        # cache and its pruned direct branch re-reads it (see the
        # decide_matches docstring for the verified plan shape), so the
        # decision stage's eager count below materializes scoring and
        # decision in ONE action, removing a stage barrier; the
        # populated cache then serves later consumers of res.scored.
        # No concurrent-population race: the direct branch is a narrow
        # child of the union INSIDE the post-window stage's map side
        # (union members join the consuming stage), and that stage
        # depends on the window's shuffle stage — so the only LEAF
        # stage scanning scored is the window branch; the direct
        # branch's scan runs strictly after the cache is populated.
        scored = scored.persist()
    metrics.record("scoring", t0)

    t0 = metrics.start()
    matches = decide_matches(scored, cfg)
    matches = _maybe_checkpoint(matches, cfg, "matches")
    metrics.record("decision", t0)

    t0 = metrics.start()
    edges = matches.select(
        F.col("conv_id_a").alias("src"), F.col("conv_id_b").alias("dst")
    )
    cc_dir = (
        os.path.join(cfg.checkpoint_dir, "cc") if cfg.checkpoint_dir else None
    )
    comp = connected_components(
        edges, max_iterations=cfg.cluster.max_iterations, checkpoint_dir=cc_dir
    )
    # singletons: every conversation is its own component unless matched
    all_ids = features.select("conv_id")
    clusters = (
        all_ids.join(comp, "conv_id", "left")
        .select(
            "conv_id",
            F.coalesce("component_id", F.col("conv_id")).alias("component_id"),
        )
    )
    if cfg.checkpoint_dir:
        clusters = _maybe_checkpoint(clusters, cfg, "clusters")
    else:
        # LAZY persist: connected_components already materialized the
        # heavy work eagerly (driver fast path collect, or the
        # localCheckpointed star loop); the remaining singleton join
        # reads the cached features + the materialized components, so
        # an eager count here would only add one full pass. The first
        # consumer's action populates the cache.
        clusters = clusters.persist()
    metrics.record("clustering", t0)

    audit = None
    if cfg.audit_enabled:
        audit = match_state(matches, stage="CM", run_id=cfg.run_id).drop("run_id")
        audit = audit.withColumn("run_id", F.lit(cfg.run_id))
        lineage = partition_lineage(matches, "matches", cfg.run_id)
        if cfg.checkpoint_dir:
            audit.write.mode("overwrite").parquet(
                os.path.join(cfg.checkpoint_dir, "audit")
            )
            lineage.write.mode("overwrite").parquet(
                os.path.join(cfg.checkpoint_dir, "lineage")
            )

    return PipelineResult(
        features=features,
        candidates=cands,
        scored=scored,
        matches=matches,
        clusters=clusters,
        audit=audit,
        metrics=metrics,
    )
