"""Hard-linkage robustness gate: dblp-scholar-STYLE corruption
(abbreviations, typos, token drops, acronymized venues, shared-token
distractors) — materially harder than the clean golden fixtures. The
reference reports F1 = 0.58 on real dblp-scholar (README.md:58); this
planted analog records the engine's honest floor so regressions in
fuzzy scoring/blocking surface immediately."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.config import (
    BlockingConfig,
    PipelineConfig,
)
from energy_aware_entity_resolution_spark.operators.evaluation import (
    evaluation_grid,
)
from energy_aware_entity_resolution_spark.operators.parity import (
    cross_source_filter,
)
from energy_aware_entity_resolution_spark.plans import run_pipeline
from energy_aware_entity_resolution_spark.sources.hard_linkage import (
    generate_hard_linkage,
)
from energy_aware_entity_resolution_spark.sources.linkage import (
    linkage_transcripts,
)

N_ENTITIES = 300

CFG = PipelineConfig(
    blocking=BlockingConfig(
        minhash_bands=64,
        minhash_rows=2,
        sorted_neighborhood_window=10,
        max_block_size=150,
    ),
    audit_enabled=False,
)


def _run(spark):
    ents, truth = generate_hard_linkage(spark, N_ENTITIES, seed=17)
    ents = ents.cache()
    ents.count()
    res = run_pipeline(linkage_transcripts(ents), CFG)
    scored = cross_source_filter(
        res.scored.select("conv_id_a", "conv_id_b", "score"), ents
    ).cache()
    scored.count()
    res.release()
    return ents, truth, scored


def test_hard_linkage_recall_and_f1(spark):
    ents, truth, scored = _run(spark)
    n_truth = truth.count()
    assert n_truth == N_ENTITIES
    hit = truth.join(scored, ["conv_id_a", "conv_id_b"], "left_semi").count()
    # candidate recall: corrupted twins must survive blocking (first
    # honest run: 299/300; LSH at 64x2 reaches ~Jaccard 0.12)
    assert hit >= 0.95 * n_truth, f"candidate recall {hit}/{n_truth}"

    # (1) the REFERENCE's grid protocol (either-direction rank<=k):
    # every distractor's nearest neighbor genuinely is the entity it
    # plagiarizes, so one fp per entity is structural and best-grid F1
    # caps near 2/3 — the same regime as the reference's published
    # 0.58 on real dblp-scholar. First honest run: 0.659.
    grid = evaluation_grid(scored, truth)
    best = grid.orderBy(F.desc("f1")).limit(1).collect()[0]
    assert best["f1"] >= 0.60, dict(best.asDict())

    # (2) the ENGINE's decision pipeline on the same scored pairs:
    # best-edge-per-record + threshold separates twins from
    # distractors (a's best is b, and (a,x) scores below 0.3) —
    # first honest run: precision 1.0, F1 0.974.
    from energy_aware_entity_resolution_spark.config import ScoringConfig
    from energy_aware_entity_resolution_spark.operators.decision import (
        decide_matches,
    )
    from energy_aware_entity_resolution_spark.operators.evaluation import (
        pairwise_metrics,
    )

    dcfg = PipelineConfig(scoring=ScoringConfig(match_threshold=0.3))
    m = decide_matches(scored, dcfg).select("conv_id_a", "conv_id_b")
    pm = pairwise_metrics(m, truth.withColumn("label", F.lit(1)))
    assert pm["f1"] >= 0.90, pm
    assert pm["precision"] >= 0.99, pm
    ents.unpersist()
    scored.unpersist()
