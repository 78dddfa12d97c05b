"""M7: learned pair classification (SURVEY.md §2.4 M7, pipeline 2).

The reference's pipeline 2 fine-tunes a BERT sequence-pair classifier
(llm/or_model.py:5-24, llm/training.py:9-113) over record pairs
serialized as ``colname+value`` strings (llm/data_processing.py:5-22)
and it is the reference's best-F1 path (0.98 on dblp-scholar vs 0.58
for pipeline 1, README.md:72-73).

Spark-native inference skeleton (training is out of scope in this
environment — no torch): a broadcast, pickled, sklearn-style scorer
(anything with ``predict_proba``) applied through an ITERATOR pandas
UDF, so the model deserializes once per executor python worker, not
once per batch — the standard model-inference pattern at scale. The
same wiring hosts a torch model: swap the pickle for a state-dict load
in the iterator prologue.

``serialize_record_col`` reproduces the reference's pair text exactly
(``colname`` immediately followed by the value, concatenated in column
order) for feature parity / future PLM use.
"""

from __future__ import annotations

import pickle  # workers deserialize cloudpickle payloads with std pickle
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_FEATURES = ("jaccard", "lev_ratio", "cosine")


def serialize_record_col(columns: dict[str, Column]) -> Column:
    """colname+value concatenation in the given order (reference
    llm/data_processing.py:16-20 builds 'text1'/'text2' this way;
    NULLs render as '' rather than the reference's 'nan')."""
    parts = []
    for name, col in columns.items():
        parts.append(F.concat(F.lit(name), F.coalesce(col.cast("string"), F.lit(""))))
    return F.concat(*parts)


def make_pair_scorer_udf(spark, model):
    """Pandas UDF scoring feature rows with a broadcast pickled
    sklearn-style model (``predict_proba(X) -> (n, 2)`` or
    ``(n,)``). Iterator form: one deserialize per worker.

    cloudpickle serialization so models whose class is not importable
    on executors (notebook-defined, closure-local) ship by value."""
    from pyspark import cloudpickle

    bc = spark.sparkContext.broadcast(cloudpickle.dumps(model))

    @F.pandas_udf(T.DoubleType())
    def score(it: Iterator[tuple[pd.Series, ...]]) -> Iterator[pd.Series]:
        mdl = pickle.loads(bc.value)
        for cols in it:
            if isinstance(cols, pd.Series):  # single feature column
                cols = (cols,)
            x = np.column_stack(
                [c.to_numpy(dtype=np.float64) for c in cols]
            )
            p = np.asarray(mdl.predict_proba(x), dtype=np.float64)
            yield pd.Series(p[:, 1] if p.ndim == 2 else p)

    return score


def classify_pairs(
    scored: DataFrame,
    model,
    feature_cols: tuple[str, ...] = DEFAULT_FEATURES,
    threshold: float | None = None,
) -> DataFrame:
    """Attach ``match_prob`` (and, with a threshold, a ``plm_match``
    decision) to scored candidate pairs. The default features are the
    per-metric similarity columns score_pairs already computed — the
    classifier learns the blend the hand-tuned weights approximate."""
    udf = make_pair_scorer_udf(scored.sparkSession, model)
    out = scored.withColumn(
        "match_prob", udf(*[F.col(c) for c in feature_cols])
    )
    if threshold is not None:
        out = out.withColumn(
            "plm_match", (F.col("match_prob") >= F.lit(threshold)).cast("int")
        )
    return out
