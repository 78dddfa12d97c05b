"""energy_aware_entity_resolution_spark — a from-scratch PySpark-native
entity-resolution engine with the capabilities of
Mzhongwei/Energy-Aware-Entity-Resolution (reference read-only at
/root/reference; see SURVEY.md for the file:line capability map).

Design stance (SURVEY.md §7.0): one package of pure
``DataFrame -> DataFrame`` stage functions. Everything is declarative
pyspark.sql — Catalyst/AQE pick physical strategies; Python crosses the
JVM boundary only inside Arrow-batched pandas UDFs (never per-row UDFs).

Layout:
- ``functions/``  scalar/column function library (cleaning, keys,
  minhash, similarity, embeddings, text stats)
- ``operators/``  DataFrame->DataFrame pipeline stages (assembly,
  blocking, candidates, scoring, decision, clustering, evaluation,
  dedup, similarity search, audit)
- ``sources/``    IO: catalog abstraction (parquet dir / Iceberg),
  synthetic transcript generator
- ``plans/``      end-to-end pipeline drivers (batch / evaluate)
- ``streaming/``  incremental micro-batch mode with checkpoint/resume
"""

from energy_aware_entity_resolution_spark.config import PipelineConfig
from energy_aware_entity_resolution_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark"]
__version__ = "0.1.0"
