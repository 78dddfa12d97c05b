"""State-tree layout micro-benchmark: fragmented vs folded.

The 80-batch curve (BASELINE.md) shows the fold keeps walls AT PARITY
with the unfolded layout while bounding the file count — at 80 dirs the
per-file overhead is still small next to the O(accumulated-rows) scan.
This script isolates the term the folds actually remove: it writes the
SAME feature rows (real featurize schema) as (a) a 512-delta-dir tree —
what a no-fold stream leaves after 512 micro-batches, one file per dir,
the conservative case — and (b) a folded snapshot + 8 delta dirs, then
times the accumulated read (the scan every incremental batch performs,
via the engine's own reader) on both, interleaved x N reps.

Run: python scripts/bench_state_layout.py  (env: SPARK_GRAFT_LAYOUT_CONVS,
SPARK_GRAFT_LAYOUT_DIRS, SPARK_GRAFT_BENCH_REPEATS). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark import PipelineConfig, get_spark
from energy_aware_entity_resolution_spark.operators.assemble import (
    assemble_conversations,
)
from energy_aware_entity_resolution_spark.operators.blocking import featurize
from energy_aware_entity_resolution_spark.sources import generate_transcripts
from energy_aware_entity_resolution_spark.streaming import incremental as inc

N_CONVS = int(os.environ.get("SPARK_GRAFT_LAYOUT_CONVS", "40000"))
N_DIRS = int(os.environ.get("SPARK_GRAFT_LAYOUT_DIRS", "512"))
N_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
N_TAIL_DELTAS = 8  # unfolded dirs a folded stream still reads


def _scan_wall(df) -> float:
    t0 = time.monotonic()
    df.count()
    return round(time.monotonic() - t0, 3)


def main() -> None:
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    cfg = PipelineConfig()
    feats = featurize(
        assemble_conversations(generate_transcripts(spark, N_CONVS, seed=11)),
        cfg,
    ).select(*inc._FEATURE_COLS)

    root = tempfile.mkdtemp(prefix="layout_bench_")
    frag = os.path.join(root, "frag")
    fold = os.path.join(root, "fold")
    try:
        # (a) fragmented: one dir per micro-batch, 1 file per dir
        # (conservative — real streams leave several files per dir)
        feats.withColumn(
            "batch", F.pmod(F.xxhash64("conv_id"), F.lit(N_DIRS))
        ).repartition(N_DIRS, "batch").write.partitionBy("batch").mode(
            "overwrite"
        ).parquet(os.path.join(frag, "features"))

        # (b) folded: snapshot of dirs <= fold_at + tail delta dirs,
        # written through the engine's own fold sizing
        fold_at = N_DIRS - 1 - N_TAIL_DELTAS
        frag_tree = spark.read.parquet(os.path.join(frag, "features"))
        n_fold_rows = frag_tree.where(F.col("batch") <= fold_at).count()
        inc._snapshot_coalesce(
            frag_tree.where(F.col("batch") <= fold_at).drop("batch"),
            n_fold_rows,
        ).write.mode("overwrite").parquet(
            os.path.join(fold, "features_compact", f"batch={fold_at}")
        )
        for b in range(fold_at + 1, N_DIRS):
            frag_tree.where(F.col("batch") == b).drop("batch").coalesce(
                1
            ).write.mode("overwrite").parquet(
                os.path.join(fold, "features", f"batch={b}")
            )

        def frag_read():
            return (
                spark.read.parquet(os.path.join(frag, "features"))
                .where(F.col("batch") <= N_DIRS - 1)
                .drop("batch")
            )

        def fold_read():
            return inc.accumulated_features(spark, fold, N_DIRS - 1)

        assert frag_read().count() == fold_read().count()
        walls = {"frag": [], "fold": []}
        for _ in range(N_REPS):  # interleaved: noise hits both layouts
            walls["frag"].append(_scan_wall(frag_read()))
            walls["fold"].append(_scan_wall(fold_read()))
        out = {
            "metric": "state_layout_scan_wall",
            "n_rows": frag_read().count(),
            "n_dirs": N_DIRS,
            "frag_files": sum(
                len([f for f in files if f.endswith(".parquet")])
                for _, _, files in os.walk(frag)
            ),
            "fold_files": sum(
                len([f for f in files if f.endswith(".parquet")])
                for _, _, files in os.walk(fold)
            ),
            "frag_wall_s": walls["frag"],
            "fold_wall_s": walls["fold"],
            "frag_median_s": statistics.median(walls["frag"]),
            "fold_median_s": statistics.median(walls["fold"]),
            "unit": "sec",
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
