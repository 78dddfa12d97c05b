"""Transitive clustering: distributed connected components
(SURVEY.md §2.6 C1-C4).

The reference maintains entity groups with a hand-rolled union-find
over an igraph structure, merging groups whenever a pair scores 1.0
(dataprocessing/similaritygraph.py:30-55, 88-97) and propagating
matches incrementally in streaming (kafkaconsumer.py:549-620). The
Spark-native replacement is the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14): O(log n) rounds of two groupBy-style shuffles, no
driver-side graph, converging to a star forest where every node points
at its component minimum.

Scale notes:
- node ids stay strings (conv_id); min/ordering is lexicographic.
- each round is two shuffles keyed by node id; AQE handles skew from
  high-degree hubs (a giant component's root accumulates degree — the
  small-star step bounds this because only <=-neighbors group on it).
- lineage is truncated every round via localCheckpoint; when a
  ``checkpoint_dir`` is given, each round also writes parquet state so
  a killed run resumes from the last completed round (north_rule
  resumability; analog of the reference's model/graph save-resume,
  main.py:104-153).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    """Both directions, no self loops, distinct."""
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """For each u: m = min(u ∪ N(u)); emit (v, m) for v in N(u), v > u."""
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward the smaller endpoint, then for each u with
    incoming smaller-neighbors S: m = min(S ∪ u); emit (v, m) for v in
    S ∪ {u}."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).distinct()
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    relinked = (
        oriented.join(m, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .union(m.select(F.col("u").alias("src"), F.col("m").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return relinked


def _state_path(checkpoint_dir: str, i: int) -> str:
    return os.path.join(checkpoint_dir, f"cc_iter_{i:04d}")


def _last_complete_iteration(spark: SparkSession, checkpoint_dir: str) -> int:
    """Highest round whose parquet state fully committed (_SUCCESS)."""
    best = -1
    if not os.path.isdir(checkpoint_dir):
        return best
    for name in os.listdir(checkpoint_dir):
        if name.startswith("cc_iter_"):
            p = os.path.join(checkpoint_dir, name)
            if os.path.exists(os.path.join(p, "_SUCCESS")):
                best = max(best, int(name.rsplit("_", 1)[1]))
    return best


def _driver_union_find(spark: SparkSession, edges) -> DataFrame:
    """Small-graph fast path: union-find over collected edge rows on
    the driver. Same adaptivity principle as broadcast joins — below
    the threshold the distributed loop's per-round driver barriers cost
    more than the whole graph. Produces IDENTICAL output semantics
    (component id = min member id); equality with the distributed path
    is asserted in tests."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for row in edges:
        ra, rb = find(row["src"]), find(row["dst"])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    schema = "conv_id string, component_id string"
    if not parent:
        return spark.createDataFrame([], schema)
    # hand the result back through a pandas frame: createDataFrame from
    # a list of tuples pickles row-by-row, the pandas path ships one
    # Arrow batch (guide §6 "Arrow for driver transfers") — measured
    # seconds at 10^5 components, identical values
    import pandas as pd

    ids = list(parent)
    pdf = pd.DataFrame(
        {"conv_id": ids, "component_id": [find(x) for x in ids]}
    )
    return spark.createDataFrame(pdf, schema)


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    small_graph_threshold: int = 200_000,
) -> DataFrame:
    """edges(src,dst) -> clusters(conv_id, component_id).

    component_id is the lexicographic min conv_id of the component —
    deterministic regardless of edge order or partitioning (the
    reference's merge is order-dependent; SURVEY.md §7.3 pins our
    semantics to the final transitive closure only).

    Graphs at or below small_graph_threshold edges run on the driver
    (see _driver_union_find); larger graphs run the distributed
    large-star/small-star loop. Checkpoint/resume always uses the
    distributed path. The threshold is additionally byte-guarded: if
    the collected sample exceeds ~64 MB of id bytes the distributed
    path runs even under the row threshold (long string ids would
    otherwise blow the driver heap before the row cap bites).
    """
    spark = edges.sparkSession
    if small_graph_threshold and not checkpoint_dir and not resume:
        # one action: collect up to threshold+1 rows — decides the path
        # AND supplies the fast path's input (a separate count would be
        # a second full pass over the match edges)
        sample = edges.select("src", "dst").limit(small_graph_threshold + 1).collect()
        if len(sample) <= small_graph_threshold:
            if sample:
                # the fast path's output schema and lexicographic-min
                # semantics assume string ids; any other id type runs
                # the distributed loop (whose least/greatest semantics
                # match the column type) instead of TypeError-ing here
                if not isinstance(sample[0]["src"], str) or not isinstance(
                    sample[0]["dst"], str
                ):
                    del sample
                    return _distributed_cc(
                        edges, max_iterations, checkpoint_dir, resume
                    )
                probe = sample[: 1000]
                avg_bytes = sum(
                    len(r["src"]) + len(r["dst"]) for r in probe
                ) / len(probe)
                if avg_bytes * len(sample) > 64 * 1024 * 1024:
                    del sample
                    return _distributed_cc(
                        edges, max_iterations, checkpoint_dir, resume
                    )
            return _driver_union_find(spark, sample)
    return _distributed_cc(edges, max_iterations, checkpoint_dir, resume)


def _distributed_cc(
    edges: DataFrame,
    max_iterations: int,
    checkpoint_dir: str | None,
    resume: bool,
) -> DataFrame:
    """The large-star/small-star loop (extracted so the fast-path
    byte-guard can fall through to it)."""
    spark = edges.sparkSession
    start = 0
    cur = _sym(edges).select(F.col("u").alias("src"), F.col("v").alias("dst"))
    if checkpoint_dir and resume:
        last = _last_complete_iteration(spark, checkpoint_dir)
        if last >= 0:
            cur = spark.read.parquet(_state_path(checkpoint_dir, last))
            start = last + 1
    cur = cur.localCheckpoint(eager=True)

    def _sig(df: DataFrame) -> tuple[int, int]:
        """Cheap edge-set fingerprint: (count, xor of pair hashes).
        One aggregate instead of two exceptAll shuffles per round; XOR
        is order-independent and overflow-free under ANSI mode (both
        star outputs are distinct, so set == multiset). A false
        convergence needs a 64-bit collision between successive
        rounds — negligible, and one extra round is the only cost."""
        row = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev_sig = _sig(cur)
    for i in range(start, max_iterations):
        after_large = _large_star(_sym(cur))
        after_small = _small_star(after_large)
        after_small = after_small.localCheckpoint(eager=True)
        if checkpoint_dir:
            after_small.write.mode("overwrite").parquet(_state_path(checkpoint_dir, i))
        cur_sig = _sig(after_small)
        cur = after_small
        if cur_sig == prev_sig:
            break
        prev_sig = cur_sig

    members = cur.select(
        F.col("src").alias("conv_id"), F.col("dst").alias("component_id")
    )
    roots = cur.select(F.col("dst").alias("conv_id")).distinct().select(
        "conv_id", F.col("conv_id").alias("component_id")
    )
    return members.union(roots).distinct()


def cluster_pairs(clusters: DataFrame) -> DataFrame:
    """Expand clusters back to intra-cluster pairs (C2; the reference
    expands group members at evaluation read time,
    dataprocessing/evaluation.py:90-104)."""
    a = clusters.alias("a")
    b = clusters.alias("b")
    return (
        a.join(b, on="component_id")
        .where(F.col("a.conv_id") < F.col("b.conv_id"))
        .select(
            F.col("a.conv_id").alias("conv_id_a"),
            F.col("b.conv_id").alias("conv_id_b"),
            "component_id",
        )
    )
