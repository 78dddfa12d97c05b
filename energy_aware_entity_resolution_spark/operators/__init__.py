from energy_aware_entity_resolution_spark.operators.assemble import (
    assemble_conversations,
    disassemble_conversations,
)
from energy_aware_entity_resolution_spark.operators.clustering import (
    connected_components,
)

__all__ = [
    "assemble_conversations",
    "disassemble_conversations",
    "connected_components",
]
