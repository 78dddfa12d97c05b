"""P1-P5 cleaning/tokenization: Spark column expressions must agree
byte-for-byte with the pure-Python oracle (SURVEY.md §5 item 1)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.functions.cleaning import (
    clean_text_col,
    py_clean_text,
    py_signature,
    py_tokenize,
    signature_col,
    tokens_col,
)

SAMPLES = [
    "Book a table at Arnie Morton's for 1999-03-03",
    "BOOK A TABLE at arnie  morton's for 03/03/1999",
    "  ___ trailing __ and LEADING___",
    "nan nan nan",
    "mixed 42.5 numbers & sym#bols",
    "",
    None,
    "Unicode café naïve — em-dash",
    "2025-12-01 vs 12/01/2025 must canonicalize equal",
]


def test_clean_parity(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": SAMPLES}).astype(object))
    got = (
        df.select(clean_text_col(F.col("text")).alias("c"))
        .toPandas()["c"]
        .tolist()
    )
    want = [py_clean_text(s) for s in SAMPLES]
    assert got == want


def test_tokenize_and_signature_parity(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": SAMPLES}).astype(object))
    out = df.select(
        tokens_col(clean_text_col(F.col("text"))).alias("toks"),
        signature_col(tokens_col(clean_text_col(F.col("text")))).alias("sig"),
    ).toPandas()
    for i, s in enumerate(SAMPLES):
        cleaned = py_clean_text(s)
        assert sorted(out["toks"][i]) == sorted(py_tokenize(cleaned)), s
        assert out["sig"][i] == py_signature(py_tokenize(cleaned)), s


def test_date_canonicalization_unifies_formats(spark):
    df = spark.createDataFrame(
        [("a", "meet on 1999-03-03 ok"), ("b", "meet on 03/03/1999 ok")],
        "id string, text string",
    )
    sigs = (
        df.select(signature_col(tokens_col(clean_text_col(F.col("text")))).alias("s"))
        .toPandas()["s"]
        .tolist()
    )
    assert sigs[0] == sigs[1]


def test_nan_and_empty_tokens_dropped():
    assert py_tokenize("a__nan__b___") == ["a", "b"]
    assert py_tokenize("") == []
