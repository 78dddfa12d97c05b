from energy_aware_entity_resolution_spark.plans.pipeline import (
    PipelineResult,
    run_pipeline,
)

__all__ = ["run_pipeline", "PipelineResult"]
