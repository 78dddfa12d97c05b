"""Conversation assembly (SURVEY.md P9).

The reference serializes a record's columns to one compare-string
(llm/data_processing.py:5-22 concatenates `colname+value`). The
transcript analog (north_star): assemble each conversation's turns in
stable ``(conv_id, turn_idx)`` order into one document string, keeping
the per-turn array so the invariant "per-turn text equality under
stable ordering" is testable by disassembly.

Implementation note: groupBy + collect_list + array_sort(struct) — not
a Window + concat — so assembly is ONE shuffle keyed by conv_id with
map-side partial aggregation, and the sort is per-group (bounded by
conversation length), never a global sort. Survives 10^12 turns as
long as single conversations fit in memory (turn counts are bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_conversations(transcripts: DataFrame) -> DataFrame:
    """turns -> one row per conversation.

    Output: conv_id, n_turns, turns (array<struct> in turn order),
    doc (space-joined turn text), roles (array), first_ts, last_ts.
    """
    turn = F.struct(
        F.col("turn_idx"), F.col("ts"), F.col("role"), F.col("text"), F.col("tool")
    )
    agg = transcripts.groupBy("conv_id").agg(
        F.array_sort(F.collect_list(turn)).alias("turns")
    )
    return agg.select(
        "conv_id",
        F.size("turns").alias("n_turns"),
        "turns",
        F.array_join(
            F.transform("turns", lambda t: F.coalesce(t["text"], F.lit(""))), " "
        ).alias("doc"),
        F.transform("turns", lambda t: t["role"]).alias("roles"),
        F.element_at(F.col("turns"), 1)["ts"].alias("first_ts"),
        F.element_at(F.col("turns"), -1)["ts"].alias("last_ts"),
    )


def disassemble_conversations(assembled: DataFrame) -> DataFrame:
    """Inverse of assembly — explode turns back to the input schema.

    Used by the pytest invariant test: disassemble(assemble(t)) must
    equal t row-for-row (per-turn text equality, stable ordering).
    """
    return assembled.select(
        "conv_id", F.explode("turns").alias("t")
    ).select(
        "conv_id",
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.text").alias("text"),
        F.col("t.tool").alias("tool"),
        F.col("t.ts").alias("ts"),
    )
