"""Validation on the reference's SECOND golden dataset: pi_test —
the id-less variant of the restaurant linkage fixture
(Data_example/pi_test-tableA.csv has no id/class columns — and one
extra trailing tableB record + its labeled match, 111 total — so rids come
from FILE ROW ORDER, the reference's main.py:56-59 ``idx__{row index}``
path that load_linkage_tables_noid reproduces; ground-truth parse
semantics dataprocessing/evaluation.py:15-29).

Exercises the adapters' row-index rid path end-to-end against the
published 111 labeled matches. Skipped when the reference data
directory is absent (the repo stays standalone).
"""

from __future__ import annotations

import os

import pytest
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
    load_ground_truth_csv,
)
from energy_aware_entity_resolution_spark.plans import run_pipeline
from energy_aware_entity_resolution_spark.sources.linkage import (
    linkage_transcripts,
    load_linkage_tables_noid,
)

BASE = "/root/reference/Data_example/pi_test"

pytestmark = pytest.mark.skipif(
    not os.path.exists(BASE + "-tableA.csv"),
    reason="reference golden data not available",
)

# same recall-oriented linkage config the fodors_zagats suite measured
# (64 bands x 2 rows, SN window 10) — pi_test is the same restaurant
# corpus minus the id/class columns.
LINKAGE_CFG = PipelineConfig(
    blocking=BlockingConfig(
        minhash_bands=64,
        minhash_rows=2,
        sorted_neighborhood_window=10,
        max_block_size=120,
    ),
    audit_enabled=False,
)


@pytest.fixture(scope="module")
def pi_test(spark):
    ents = load_linkage_tables_noid(
        spark, BASE + "-tableA.csv", BASE + "-tableB.csv"
    ).cache()
    ents.count()
    truth = load_ground_truth_csv(spark, BASE + "-matches.txt").cache()
    res = run_pipeline(linkage_transcripts(ents), LINKAGE_CFG)
    scored = cross_source_filter(
        res.scored.select("conv_id_a", "conv_id_b", "score"), ents
    ).cache()
    scored.count()
    res.release()
    return ents, truth, scored


def test_tables_parsed_rowwise(pi_test):
    """533 A-rows then 332 B-rows (pi_test-tableB carries one extra
    trailing record vs the fodors variant), rids dense over the
    concatenation."""
    ents, truth, _ = pi_test
    assert ents.count() == 533 + 332
    assert ents.where(F.col("conv_id") == "idx__0").count() == 1
    assert ents.where(F.col("conv_id") == "idx__533").select(
        "source"
    ).collect()[0]["source"] == "B"
    assert truth.count() == 111  # fodors' 110 + the extra trailing B record's pair


def test_candidate_recall_complete(pi_test):
    """Blocking must surface every labeled pair as a scored candidate."""
    _, truth, scored = pi_test
    hit = truth.join(scored, ["conv_id_a", "conv_id_b"], "left_semi").count()
    assert hit == 111


def test_best_grid_f1(pi_test):
    """Reference-protocol grid search: best F1 floor on the id-less
    golden data (first honest run measured ~0.88; floor set at 0.85,
    same as the fodors_zagats gate)."""
    _, truth, scored = pi_test
    grid = evaluation_grid(scored, truth.select("conv_id_a", "conv_id_b"))
    best = grid.orderBy(F.desc("f1")).limit(1).collect()[0]
    assert best["f1"] >= 0.85, dict(best.asDict())
