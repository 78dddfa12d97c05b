"""Two-source record-linkage input adapters (deepmatcher-style CSVs).

The reference's batch driver reads ONE concatenated CSV and assigns
``rid = idx__{row index}`` over it (main.py:56-59); its published
ground truth (Data_example/*-matches.txt) references those rids with a
single underscore that evaluation rewrites to double
(dataprocessing/evaluation.py:15-29 — parsed by
operators.parity.load_ground_truth_csv). These adapters reproduce that
id scheme from the separate tableA/tableB files and bridge the records
into the engine's transcript shape (one single-turn conversation per
record; the pipeline's assembly/cleaning handles the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_linkage_tables(
    spark: SparkSession,
    path_a: str,
    path_b: str,
    text_cols: list[str] | None = None,
    id_col: str = "id",
) -> DataFrame:
    """(conv_id, source, text) entity table over two record CSVs.

    conv_id follows the reference rid scheme over the A++B
    concatenation: table A row i -> idx__{i}, table B row j ->
    idx__{len(A) + j}. text = space-joined compare columns (the
    reference serializes all columns to one compare string,
    llm/data_processing.py:5-22; default = every non-id column).
    """
    a = spark.read.csv(path_a, header=True)
    b = spark.read.csv(path_b, header=True)
    cols = text_cols or [c for c in a.columns if c != id_col]
    text = F.concat_ws(" ", *cols)
    n_a = a.count()
    return a.select(
        F.format_string("idx__%d", F.col(id_col).cast("long")).alias("conv_id"),
        F.lit("A").alias("source"),
        text.alias("text"),
    ).unionByName(
        b.select(
            F.format_string("idx__%d", F.col(id_col).cast("long") + n_a).alias(
                "conv_id"
            ),
            F.lit("B").alias("source"),
            text.alias("text"),
        )
    )


def load_linkage_tables_noid(
    spark: SparkSession,
    path_a: str,
    path_b: str,
    text_cols: list[str] | None = None,
) -> DataFrame:
    """(conv_id, source, text) over ID-LESS record CSVs (the
    reference's pi_test variant — Data_example/pi_test-tableA.csv has
    no id column): rid = file row order over the A++B concatenation,
    exactly main.py:56-59's ``idx__{row index}`` assignment.

    Row order is a FILE-ORDER contract, inherently sequential, so the
    tables are read driver-side (csv stdlib) and parallelized — correct
    only for golden-fixture scale; production tables carry ids and use
    load_linkage_tables."""
    import csv

    def rows(path: str) -> tuple[list[dict], list[str]]:
        with open(path, newline="", encoding="utf-8") as f:
            r = csv.DictReader(f)
            return list(r), list(r.fieldnames or [])

    rows_a, cols_a = rows(path_a)
    rows_b, _ = rows(path_b)
    cols = text_cols or cols_a
    data = [
        (f"idx__{i}", "A", " ".join(row.get(c) or "" for c in cols))
        for i, row in enumerate(rows_a)
    ] + [
        (f"idx__{len(rows_a) + j}", "B", " ".join(row.get(c) or "" for c in cols))
        for j, row in enumerate(rows_b)
    ]
    return spark.createDataFrame(
        data, "conv_id string, source string, text string"
    )


def linkage_transcripts(entities: DataFrame) -> DataFrame:
    """Bridge an entity table into the engine's transcript shape:
    one single-turn conversation per record."""
    return entities.select(
        "conv_id",
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
