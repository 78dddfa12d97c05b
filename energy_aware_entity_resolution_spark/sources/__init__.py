from energy_aware_entity_resolution_spark.sources.transcripts import (
    generate_labeled_pairs,
    generate_transcripts,
    transcripts_from_documents,
)

__all__ = [
    "generate_transcripts",
    "generate_labeled_pairs",
    "transcripts_from_documents",
]
