"""Incremental / micro-batched ER (SURVEY.md §2.10 W1/W4, C4).

The reference consumes Kafka in count windows (window_count records,
kafkaconsumer.py:511-524), matches each window against accumulated
state (exact-match inc, `_em_inc` kafkaconsumer.py:549-620), refits the
index incrementally and re-emits per-round similarity snapshots.

Structured Streaming has no count-based windows, so (SURVEY.md §7.3)
this module keeps the semantics as a deterministic chunked batch loop
over the same stage functions:

- batch membership = pmod(xxhash64(conv_id), n_batches) — stable at
  any parallelism, no arrival-order dependence (the reference's rid
  assignment IS arrival-order; ours must be replayable);
- per batch: featurize new convs → candidates = new×new ∪ new×STATE
  (stream-static join analog) → score → decide → union into match
  state → incremental connected components over all match edges;
- all state lives in parquet dirs under state_dir, one snapshot per
  batch with a terminal _DONE marker → a killed run resumes from the
  last complete batch and converges to the same final clusters as a
  single-shot batch run (tested in tests/test_incremental.py).

Per-batch round snapshots of scored pairs (the reference's
`sim_changement-*.csv`, W5) append under scored_rounds/round=N.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.config import PipelineConfig
from energy_aware_entity_resolution_spark.operators.assemble import (
    assemble_conversations,
)
from energy_aware_entity_resolution_spark.operators.blocking import (
    cap_blocks,
    featurize,
    lsh_bands,
)
from energy_aware_entity_resolution_spark.operators.clustering import (
    connected_components,
)
from energy_aware_entity_resolution_spark.operators.decision import decide_matches
from energy_aware_entity_resolution_spark.operators.scoring import score_pairs

_FEATURE_COLS = [
    "conv_id", "sig", "sig_hash", "bitmask", "rare_tokens", "rare_sig",
    "sn_key", "minhash", "vec", "tokens", "cleaned", "doc", "n_turns",
]


def _batch_dir(state_dir: str, b: int) -> str:
    return os.path.join(state_dir, f"batch_{b:04d}")


def _done(state_dir: str, b: int) -> str:
    return os.path.join(_batch_dir(state_dir, b), "_DONE")


def last_complete_batch(state_dir: str) -> int:
    best = -1
    if os.path.isdir(state_dir):
        for name in os.listdir(state_dir):
            if name.startswith("batch_") and os.path.exists(
                os.path.join(state_dir, name, "_DONE")
            ):
                best = max(best, int(name.split("_")[1]))
    return best


def _incremental_candidates(
    feats_new: DataFrame, all_feats: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """Stream-static candidate generation (J4): NEW records join
    against the full state on the blocking keys — old×old pairs were
    decided in earlier rounds and are never re-explored.

    Exact: (bitmask, sig_hash) equi-join with signature guard.
    LSH: new band keys × all band keys, capped on the state side.
    (Sorted-neighborhood is a global-order construct and is skipped in
    incremental mode — LSH+exact carry recall; documented deviation.)
    """
    new_keys = feats_new.select("conv_id", "bitmask", "sig_hash", "sig")
    all_keys = all_feats.select(
        F.col("conv_id").alias("conv_id_s"),
        "bitmask",
        "sig_hash",
        F.col("sig").alias("sig_s"),
    )
    exact = (
        new_keys.join(all_keys, ["bitmask", "sig_hash"])
        .where(F.col("conv_id") != F.col("conv_id_s"))
        .where(F.col("sig") == F.col("sig_s"))
        .select(
            F.least("conv_id", "conv_id_s").alias("conv_id_a"),
            F.greatest("conv_id", "conv_id_s").alias("conv_id_b"),
        )
    )
    bands_all = cap_blocks(
        lsh_bands(all_feats, cfg), ["band_id", "band_hash"],
        cfg.blocking.max_block_size,
    )
    bands_new = lsh_bands(feats_new, cfg).withColumnRenamed("conv_id", "conv_id_n")
    lsh = (
        bands_new.join(bands_all, ["band_id", "band_hash"])
        .where(F.col("conv_id_n") != F.col("conv_id"))
        .select(
            F.least("conv_id_n", "conv_id").alias("conv_id_a"),
            F.greatest("conv_id_n", "conv_id").alias("conv_id_b"),
        )
    )
    return (
        exact.unionByName(lsh)
        .dropDuplicates(["conv_id_a", "conv_id_b"])
        .withColumn("sources", F.array(F.lit("inc")))
    )


def run_incremental(
    transcripts: DataFrame,
    cfg: PipelineConfig,
    state_dir: str,
    n_batches: int = 4,
    resume: bool = False,
) -> DataFrame:
    """Process transcripts in n_batches deterministic chunks,
    maintaining feature/match state; returns final clusters.

    With resume=True, continues after the last batch that wrote its
    _DONE marker (kill/resume converges to the single-shot result).
    """
    spark = transcripts.sparkSession
    start = last_complete_batch(state_dir) + 1 if resume else 0

    batched = transcripts.withColumn(
        "_batch", F.pmod(F.xxhash64("conv_id"), F.lit(n_batches))
    )

    for b in range(start, n_batches):
        new = batched.where(F.col("_batch") == b).drop("_batch")
        feats_new = featurize(assemble_conversations(new), cfg)

        bdir = _batch_dir(state_dir, b)
        os.makedirs(bdir, exist_ok=True)

        if b == 0:
            state_feats = None
            prev_matches = None
        else:
            prev = _batch_dir(state_dir, b - 1)
            state_feats = spark.read.parquet(os.path.join(prev, "features"))
            prev_matches = spark.read.parquet(os.path.join(prev, "matches"))

        # union of state + new features = the entity table this round
        all_feats = (
            feats_new.select(*_FEATURE_COLS)
            if state_feats is None
            else state_feats.unionByName(feats_new.select(*_FEATURE_COLS))
        )
        all_feats.write.mode("overwrite").parquet(os.path.join(bdir, "features"))
        all_feats = spark.read.parquet(os.path.join(bdir, "features"))

        cands = _incremental_candidates(feats_new, all_feats, cfg)
        scored = score_pairs(cands, all_feats, cfg)
        # deterministic per-round partition path + overwrite: a batch
        # replayed after a crash between this write and _DONE
        # overwrites its own snapshot instead of duplicating rows
        scored.write.mode("overwrite").parquet(
            os.path.join(state_dir, "scored_rounds", f"round={b}")
        )
        new_matches = decide_matches(scored, cfg)

        all_matches = (
            new_matches
            if prev_matches is None
            else prev_matches.unionByName(new_matches)
            .groupBy("conv_id_a", "conv_id_b")
            .agg(F.max("score").alias("score"), F.min("decision").alias("decision"))
        )
        all_matches.write.mode("overwrite").parquet(os.path.join(bdir, "matches"))
        all_matches = spark.read.parquet(os.path.join(bdir, "matches"))

        comp = connected_components(
            all_matches.select(
                F.col("conv_id_a").alias("src"), F.col("conv_id_b").alias("dst")
            ),
            max_iterations=cfg.cluster.max_iterations,
        )
        all_ids = all_feats.select("conv_id")
        clusters = all_ids.join(comp, "conv_id", "left").select(
            "conv_id",
            F.coalesce("component_id", F.col("conv_id")).alias("component_id"),
        )
        clusters.write.mode("overwrite").parquet(os.path.join(bdir, "clusters"))

        with open(_done(state_dir, b), "w") as f:
            f.write("ok")

    final = _batch_dir(state_dir, n_batches - 1)
    return spark.read.parquet(os.path.join(final, "clusters"))
