"""Input-hint invariant: per-turn text equality under stable
(conv_id, turn_idx) ordering — assemble ∘ disassemble is the identity
on the transcripts table (BASELINE.json input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.operators.assemble import (
    assemble_conversations,
    disassemble_conversations,
)


def test_assemble_disassemble_roundtrip(spark, transcripts):
    assembled = assemble_conversations(transcripts)
    back = disassemble_conversations(assembled)
    orig = transcripts.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    got = back.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    assert orig.count() == got.count()
    assert orig.exceptAll(got).count() == 0
    assert got.exceptAll(orig).count() == 0


def test_turn_order_is_stable(spark, transcripts):
    assembled = assemble_conversations(transcripts)
    bad = assembled.select(
        "conv_id",
        F.transform("turns", lambda t: t["turn_idx"]).alias("idxs"),
        F.sequence(F.lit(0), F.size("turns") - 1).alias("want"),
    ).where(F.col("idxs") != F.col("want"))
    assert bad.count() == 0


def test_doc_concatenation_order(spark, transcripts):
    """doc equals texts joined in turn_idx order (window-ordered
    concatenation, north_star P9)."""
    assembled = {
        r["conv_id"]: r["doc"]
        for r in assemble_conversations(transcripts).select("conv_id", "doc").collect()
    }
    pdf = transcripts.toPandas().sort_values(["conv_id", "turn_idx"])
    want = pdf.groupby("conv_id")["text"].apply(lambda s: " ".join(s.fillna("")))
    for conv_id, doc in want.items():
        assert assembled[conv_id] == doc, conv_id


def test_assembly_shuffles_once(spark, transcripts):
    plan = assemble_conversations(transcripts)._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("exchange") <= 1
