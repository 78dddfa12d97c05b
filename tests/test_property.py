"""Property-based tests (hypothesis): cleaning parity on arbitrary
text, minhash estimate convergence, canonical-pair invariants."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.functions.cleaning import (
    clean_text_col,
    py_clean_text,
    py_signature,
    py_tokenize,
    signature_col,
    tokens_col,
)

TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=80,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(TEXT, min_size=1, max_size=30))
def test_clean_and_signature_parity_on_arbitrary_text(spark, texts):
    df = spark.createDataFrame(
        pd.DataFrame({"text": pd.Series(texts, dtype=object)})
    )
    out = df.select(
        clean_text_col(F.col("text")).alias("c"),
        signature_col(tokens_col(clean_text_col(F.col("text")))).alias("s"),
    ).collect()
    for t, row in zip(texts, out):
        cleaned = py_clean_text(t)
        assert row["c"] == cleaned, repr(t)
        assert row["s"] == py_signature(py_tokenize(cleaned)), repr(t)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.text(min_size=1, max_size=8), st.text(min_size=1, max_size=8)),
        min_size=1,
        max_size=25,
    )
)
def test_canonical_pairs_properties(spark, pairs):
    from energy_aware_entity_resolution_spark.operators.candidates import (
        canonical_pairs,
    )

    df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["conv_id_a", "conv_id_b"]).astype(object)
    )
    out = [
        (r["conv_id_a"], r["conv_id_b"]) for r in canonical_pairs(df).collect()
    ]
    # ordered, no self pairs, no duplicates
    assert all(a < b for a, b in out)
    assert len(out) == len(set(out))
    # set-equal to the python-side canonicalization
    want = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    assert set(out) == want


def test_minhash_estimate_tracks_true_jaccard(spark):
    """Across several set-overlap levels the k=256 estimate stays
    within 0.15 of truth (binomial concentration)."""
    from energy_aware_entity_resolution_spark.functions.minhash import (
        make_minhash_udf,
        minhash_jaccard_est,
    )

    mh = make_minhash_udf(256)
    rows = []
    for shared in (0, 10, 20, 30, 40):
        a = [f"s{i}" for i in range(shared)] + [f"a{i}" for i in range(40 - shared)]
        b = [f"s{i}" for i in range(shared)] + [f"b{i}" for i in range(40 - shared)]
        rows.append((a, b, shared / (80 - shared)))
    df = spark.createDataFrame(rows, "a array<string>, b array<string>, truth double")
    out = (
        df.select(
            "truth",
            minhash_jaccard_est(mh(F.col("a")), mh(F.col("b"))).alias("est"),
        )
        .collect()
    )
    for r in out:
        assert abs(r["est"] - r["truth"]) <= 0.15, (r["truth"], r["est"])
