"""Table IO abstraction: Iceberg when the catalog is configured,
parquet directories otherwise (SURVEY.md §7.3 risk: the sandbox has no
Iceberg jars; the north_rule layout targets Iceberg tables).

Every engine table goes through save_table/load_table so the physical
format is one switch. With Iceberg available, writes become
`df.writeTo(f"{catalog}.{name}").createOrReplace()` and incremental
appends `.append()` — same call sites.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.catalog.Catalog"
        )
        return True
    except Exception:
        return False


class Catalog:
    """parquet-dir catalog with the Iceberg-shaped API."""

    def __init__(self, spark: SparkSession, root: str, use_iceberg: bool | None = None):
        self.spark = spark
        self.root = root
        self.use_iceberg = (
            iceberg_available(spark) if use_iceberg is None else use_iceberg
        )

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def save(self, df: DataFrame, name: str, mode: str = "overwrite",
             partition_by: list[str] | None = None) -> None:
        if self.use_iceberg:
            writer = df.writeTo(name)
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def load(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(name)
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(name)
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))
