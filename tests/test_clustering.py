"""Connected components vs a union-find oracle + checkpoint/resume
(SURVEY.md §5 item 4; north_rule resumability)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.operators.clustering import (
    cluster_pairs,
    connected_components,
)


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _oracle(edges):
    uf = _UF()
    for a, b in edges:
        uf.union(a, b)
    return {x: uf.find(x) for x in uf.p}


def _spark_cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    # default: force the distributed large/small-star path
    kw.setdefault("small_graph_threshold", 0)
    out = connected_components(df, **kw)
    return {r["conv_id"]: r["component_id"] for r in out.collect()}


def test_driver_fast_path_equals_distributed(spark):
    rnd = random.Random(11)
    nodes = [f"p{i:03d}" for i in range(150)]
    edges = [(rnd.choice(nodes), rnd.choice(nodes)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    fast = _spark_cc(spark, edges, small_graph_threshold=10**6)
    dist = _spark_cc(spark, edges, small_graph_threshold=0)
    assert fast == dist == _oracle(edges)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_cc_matches_union_find(spark, seed):
    rnd = random.Random(seed)
    nodes = [f"n{i:04d}" for i in range(200)]
    edges = [
        (rnd.choice(nodes), rnd.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    want = _oracle(edges)
    got = _spark_cc(spark, edges)
    assert got == want


def test_cc_long_chain(spark):
    """Path graph — worst case for naive min propagation; large/small
    star must converge within the iteration budget."""
    n = 64
    edges = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(n - 1)]
    got = _spark_cc(spark, edges, max_iterations=25)
    assert set(got.values()) == {"c000"}
    assert len(got) == n


def test_cc_deterministic_component_ids(spark):
    edges = [("b", "a"), ("c", "b"), ("x", "z"), ("z", "y")]
    got = _spark_cc(spark, edges)
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


def test_cc_checkpoint_resume(spark, tmp_path):
    """Kill-after-k-iterations resume must equal the single-shot run."""
    rnd = random.Random(7)
    nodes = [f"m{i:03d}" for i in range(120)]
    edges = [(rnd.choice(nodes), rnd.choice(nodes)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    full = _spark_cc(spark, edges)

    ckpt = str(tmp_path / "cc")
    df = spark.createDataFrame(edges, "src string, dst string")
    # simulate a crash: run only 1 iteration with checkpointing
    connected_components(df, max_iterations=1, checkpoint_dir=ckpt)
    # resume from the surviving state
    resumed = connected_components(
        df, max_iterations=25, checkpoint_dir=ckpt, resume=True
    )
    got = {r["conv_id"]: r["component_id"] for r in resumed.collect()}
    assert got == full


def test_cluster_pairs_expansion(spark):
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x")],
        "conv_id string, component_id string",
    )
    pairs = {
        (r["conv_id_a"], r["conv_id_b"]) for r in cluster_pairs(clusters).collect()
    }
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}


def test_cc_integer_ids_fall_through_to_distributed(spark):
    """connected_components on a generic edges table with NON-string
    ids must not TypeError in the fast-path probe — integer ids fall
    through to the distributed loop, whose least/greatest semantics
    match the column type (min id = component id)."""
    df = spark.createDataFrame(
        [(2, 1), (3, 2), (10, 11), (7, 7)], "src int, dst int"
    )
    got = {
        r["conv_id"]: r["component_id"]
        for r in connected_components(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
