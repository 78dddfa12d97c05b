"""Round-6 optimization measurement harness (guide §1).

Separate from the FROZEN bench.py. Three modes:

  python bench_extra.py queries [names...]   per-query noop timings
  python bench_extra.py plans  [names...]    dump explain("formatted")
  python bench_extra.py stages [n_convs]     er_pipeline stage decomposition
  python bench_extra.py micro                cosine HOF-vs-unrolled microbench

All timings use the noop sink (guide §1.4) and job descriptions
(guide §1.5). Numbers are cited in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_QUERY_REPEATS", "3"))
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "plans", "r06"
)

BENCH_QUERIES = [
    "assemble_events",
    "clean_tokens",
    "minhash_dedup_pairs",
    "topk_per_group",
    "ratio_test_orders",
    "embedding_topk",
    "simhash",
    "lang_quality",
    "sessionize_events",
    "embedding_near_dup_multipass",
    "ivf_topk",
]


def _spark():
    from energy_aware_entity_resolution_spark import get_spark

    return get_spark(
        app_name="bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_df(spark, df, label: str, reps: int = REPS) -> list[float]:
    out = []
    for _ in range(reps):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(label)
        t0 = time.monotonic()
        noop(df)
        out.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    return out


def mode_queries(names: list[str]) -> None:
    import __spark_entry__ as entrymod

    spark = _spark()
    qs = entrymod.queries()
    for name in names or BENCH_QUERIES:
        samples = []
        for _ in range(REPS):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"q:{name}")
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            noop(df)
            samples.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name:32s} median={statistics.median(samples):7.3f}  {samples}")


def mode_plans(names: list[str], suffix: str = "before") -> None:
    import __spark_entry__ as entrymod

    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = _spark()
    qs = entrymod.queries()
    for name in names or BENCH_QUERIES:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(PLAN_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


def mode_stages(n_convs: int) -> None:
    """er_pipeline decomposition: eagerly materialize each stage so the
    per-stage wall is attributable (the production pipeline keeps
    scoring/decision lazy in one action — see pipeline.py)."""
    from energy_aware_entity_resolution_spark import PipelineConfig
    from energy_aware_entity_resolution_spark.operators.assemble import (
        assemble_conversations,
    )
    from energy_aware_entity_resolution_spark.operators.blocking import (
        featurize,
        lsh_bands,
    )
    from energy_aware_entity_resolution_spark.operators.candidates import (
        candidate_pairs,
    )
    from energy_aware_entity_resolution_spark.operators.clustering import (
        connected_components,
    )
    from energy_aware_entity_resolution_spark.operators.decision import (
        decide_matches,
    )
    from energy_aware_entity_resolution_spark.operators.scoring import score_pairs
    from energy_aware_entity_resolution_spark.sources import generate_transcripts
    from pyspark.sql import functions as F

    spark = _spark()
    cfg = PipelineConfig()
    t0 = time.monotonic()
    transcripts = generate_transcripts(spark, n_convs, seed=42).persist()
    n_turns = transcripts.count()
    print(f"gen: {time.monotonic()-t0:.2f}s  ({n_turns} turns)")

    def step(label, fn):
        spark.sparkContext.setJobDescription(label)
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        spark.sparkContext.setJobDescription(None)
        print(f"{label:28s} {dt:7.2f}s")
        return out

    assembled = assemble_conversations(transcripts)
    features = step("featurize+persist+count", lambda: _eager(featurize(assembled, cfg)))
    bands = step("lsh_bands+count", lambda: _eager(lsh_bands(features, cfg)))
    cands = step(
        "candidate_pairs+count",
        lambda: _eager(candidate_pairs(features, bands, cfg)),
    )
    scored = step("score_pairs+count", lambda: _eager(score_pairs(cands, features, cfg)))
    matches = step("decide_matches+count", lambda: _eager(decide_matches(scored, cfg)))
    edges = matches.select(
        F.col("conv_id_a").alias("src"), F.col("conv_id_b").alias("dst")
    )
    comp = step("connected_components", lambda: connected_components(edges))
    clusters = step(
        "clusters join+count",
        lambda: _eager(
            features.select("conv_id")
            .join(comp, "conv_id", "left")
            .select(
                "conv_id",
                F.coalesce("component_id", F.col("conv_id")).alias("component_id"),
            )
        ),
    )
    print(
        f"counts: features={features.count()} cands={cands.count()} "
        f"scored={scored.count()} matches={matches.count()} "
        f"clusters={clusters.select('component_id').distinct().count()}"
    )


def _eager(df):
    df = df.persist()
    df.count()
    return df


def mode_micro() -> None:
    """Cosine implementations head-to-head on synthetic 64-dim vectors."""
    from pyspark.sql import functions as F

    spark = _spark()
    dim = 64
    n = 2_000_000
    vecs = spark.range(n).select(
        "id",
        F.array(
            *[
                (F.hash(F.col("id") + F.lit(d)) % 1000).cast("float") / 1000.0
                for d in range(dim)
            ]
        ).alias("v"),
    ).persist()
    vecs.count()
    from energy_aware_entity_resolution_spark.functions.embeddings import (
        dot_col,
        norm_col,
    )

    a = F.col("v").cast("array<double>")
    hof = F.round(
        dot_col(a, a) / F.greatest(norm_col(a) * norm_col(a), F.lit(1e-12)), 6
    )

    def unrolled_dot(x, y):
        acc = F.lit(0.0)
        for d in range(dim):
            acc = acc + F.element_at(x, d + 1) * F.element_at(y, d + 1)
        return acc

    def unrolled_norm(x):
        acc = F.lit(0.0)
        for d in range(dim):
            e = F.element_at(x, d + 1)
            acc = acc + e * e
        return F.sqrt(acc)

    unr = F.round(
        unrolled_dot(a, a)
        / F.greatest(unrolled_norm(a) * unrolled_norm(a), F.lit(1e-12)),
        6,
    )
    for label, expr in (("hof", hof), ("unrolled", unr)):
        ts = time_df(spark, vecs.select(expr.alias("c")), f"micro:{label}", 3)
        print(f"{label:10s} {ts}")
    # equality check
    diff = (
        vecs.select(hof.alias("h"), unr.alias("u"))
        .where(~(F.col("h") == F.col("u")))
        .count()
    )
    print(f"mismatch rows: {diff}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        mode_queries(sys.argv[2:])
    elif mode == "plans":
        suffix = os.environ.get("PLAN_SUFFIX", "before")
        mode_plans(sys.argv[2:], suffix)
    elif mode == "stages":
        mode_stages(int(sys.argv[2]) if len(sys.argv) > 2 else 240000)
    elif mode == "micro":
        mode_micro()
    else:
        raise SystemExit(f"unknown mode {mode}")
