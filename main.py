"""spark-submit entry point (north_rule: ships via
`spark-submit --py-files er.zip main.py --config cfg.json --task ...`).

Mirrors the reference's task dispatch (reference main.py:218-230:
batch / smatch / evaluation) on the Spark engine:

  batch       run the full ER pipeline over a transcripts table
  incremental micro-batched run with state + resume (the smatch analog)
  evaluation  P/R/F1 grid of a scored-pairs table vs ground truth

Config is JSON (PipelineConfig.to_json shape). Input/output locations
come from --input/--output (parquet dirs or Iceberg table names via
sources/catalog.py).

Example:
  zip -r er.zip energy_aware_entity_resolution_spark
  spark-submit --py-files er.zip main.py --task batch \
      --input /data/transcripts --output /data/er_out \
      --config config.json
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["batch", "incremental", "evaluation", "demo"],
                   required=True)
    p.add_argument("--input", help="transcripts parquet dir / table")
    p.add_argument("--truth", help="labeled pairs parquet dir (evaluation)")
    p.add_argument("--output", required=True)
    p.add_argument("--config", help="PipelineConfig JSON file")
    p.add_argument("--n-batches", type=int, default=4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--demo-convs", type=int, default=2000)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv or sys.argv[1:])

    from energy_aware_entity_resolution_spark import PipelineConfig, get_spark

    spark = get_spark(app_name=f"er-{args.task}")
    if args.config:
        with open(args.config) as f:
            cfg = PipelineConfig.from_json(f.read())
    else:
        cfg = PipelineConfig()

    if args.task in ("batch", "demo"):
        from energy_aware_entity_resolution_spark.plans import run_pipeline

        if args.task == "demo" or not args.input:
            from energy_aware_entity_resolution_spark.sources import (
                generate_transcripts,
            )

            transcripts = generate_transcripts(spark, args.demo_convs, seed=42)
        else:
            transcripts = spark.read.parquet(args.input)
        res = run_pipeline(transcripts, cfg)
        res.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
        res.matches.write.mode("overwrite").parquet(f"{args.output}/matches")
        if res.audit is not None:
            res.audit.write.mode("overwrite").parquet(f"{args.output}/audit")
        print(json.dumps({
            "task": args.task,
            "clusters": res.clusters.count(),
            "matches": res.matches.count(),
            "stages": [
                {"stage": m["stage"], "wall_ms": round(m["wall_ms"], 1)}
                for m in res.metrics.rows
            ],
        }))
    elif args.task == "incremental":
        from energy_aware_entity_resolution_spark.streaming import run_incremental

        transcripts = spark.read.parquet(args.input)
        clusters = run_incremental(
            transcripts, cfg, state_dir=args.output,
            n_batches=args.n_batches, resume=args.resume,
        )
        print(json.dumps({"task": "incremental", "clusters": clusters.count()}))
    elif args.task == "evaluation":
        from energy_aware_entity_resolution_spark.operators.evaluation import (
            evaluation_grid,
        )

        scored = spark.read.parquet(args.input)
        truth = spark.read.parquet(args.truth)
        grid = evaluation_grid(
            scored.select("conv_id_a", "conv_id_b", "score"),
            truth.select("conv_id_a", "conv_id_b"),
        )
        grid.write.mode("overwrite").parquet(f"{args.output}/eval_grid")
        best = grid.orderBy(grid.f1.desc()).first()
        print(json.dumps({
            "task": "evaluation",
            "best": {k: (float(best[k]) if best[k] is not None else None)
                     for k in ("seuil", "k", "precision", "recall", "f1")},
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
