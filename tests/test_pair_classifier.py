"""M7 inference skeleton: broadcast sklearn-style scorer over pair
features via an iterator pandas UDF."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.operators.pair_classifier import (
    classify_pairs,
    make_pair_scorer_udf,
    serialize_record_col,
)


def make_toy_logistic(coef, intercept):
    """Minimal sklearn-compatible scorer. Defined in LOCAL scope on
    purpose: executors cannot import the test module, so this also
    exercises the cloudpickle ship-by-value path real notebook-defined
    models need."""

    class ToyLogistic:
        def __init__(self, coef, intercept):
            self.coef = np.asarray(coef, dtype=np.float64)
            self.intercept = float(intercept)

        def predict_proba(self, x):
            z = x @ self.coef + self.intercept
            p1 = 1.0 / (1.0 + np.exp(-z))
            return np.column_stack([1.0 - p1, p1])

    return ToyLogistic(coef, intercept)


@pytest.fixture(scope="module")
def scored_pairs(spark):
    rows = [
        ("a", "b", 0.9, 0.8, 0.7),
        ("a", "c", 0.1, 0.2, 0.0),
        ("b", "c", 0.5, 0.5, 0.5),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id_a string, conv_id_b string, jaccard double, "
        "lev_ratio double, cosine double",
    )


def test_classify_pairs_matches_local_model(spark, scored_pairs):
    model = make_toy_logistic([2.0, 1.0, 1.0], -2.0)
    out = classify_pairs(scored_pairs, model, threshold=0.5)
    got = {
        (r["conv_id_a"], r["conv_id_b"]): (r["match_prob"], r["plm_match"])
        for r in out.collect()
    }
    for a, b, j, l, c in [
        ("a", "b", 0.9, 0.8, 0.7),
        ("a", "c", 0.1, 0.2, 0.0),
        ("b", "c", 0.5, 0.5, 0.5),
    ]:
        z = 2.0 * j + l + c - 2.0
        p = 1.0 / (1.0 + math.exp(-z))
        prob, dec = got[(a, b)]
        assert abs(prob - p) < 1e-12
        assert dec == int(p >= 0.5)


def test_udf_deterministic_across_runs(spark, scored_pairs):
    model = make_toy_logistic([1.0, 1.0, 1.0], 0.0)
    udf = make_pair_scorer_udf(spark, model)
    a = scored_pairs.select(
        udf(F.col("jaccard"), F.col("lev_ratio"), F.col("cosine")).alias("p")
    ).collect()
    b = scored_pairs.select(
        udf(F.col("jaccard"), F.col("lev_ratio"), F.col("cosine")).alias("p")
    ).collect()
    assert [r["p"] for r in a] == [r["p"] for r in b]


def test_serialize_record_col_reference_format(spark):
    df = spark.createDataFrame(
        [("thai", "main_st", None)], "type string, addr string, city string"
    )
    out = df.select(
        serialize_record_col(
            {"type": F.col("type"), "addr": F.col("addr"), "city": F.col("city")}
        ).alias("s")
    ).collect()[0]["s"]
    assert out == "typethaiaddrmain_stcity"


def test_sklearn_model_if_available(spark, scored_pairs):
    sklearn = pytest.importorskip("sklearn")
    from sklearn.linear_model import LogisticRegression

    x = np.array([[0.9, 0.8, 0.7], [0.1, 0.2, 0.0], [0.8, 0.9, 0.6], [0.2, 0.1, 0.1]])
    y = np.array([1, 0, 1, 0])
    mdl = LogisticRegression().fit(x, y)
    out = classify_pairs(scored_pairs, mdl)
    local = mdl.predict_proba(
        np.array([[0.9, 0.8, 0.7], [0.1, 0.2, 0.0], [0.5, 0.5, 0.5]])
    )[:, 1]
    got = [r["match_prob"] for r in out.orderBy("conv_id_a", "conv_id_b").collect()]
    assert np.allclose(sorted(got), sorted(local))
