from energy_aware_entity_resolution_spark.streaming.incremental import (
    run_incremental,
)

__all__ = ["run_incremental"]
