"""Stage-table storage: Iceberg when a catalog is configured, parquet
otherwise.

The north rule targets Iceberg tables (snapshots give atomic stage commits,
partition pruning from metadata, and time-travel for resume). The sandbox
image has no Iceberg runtime jars, so StageStore probes for a configured
Spark catalog and falls back to parquet directories with an atomic-enough
protocol (_SUCCESS marker = commit point — Spark writes it last). The
calling code is identical either way; on a real cluster set
``spark.sql.catalog.<name>`` configs and pass ``catalog=<name>``.

This mirrors the reference's stage-checkpoint pattern — it pickles fully
featurized states between the coref and linking stages (reference:
latest/export_noc_clusters.py:167-173 write, latest/run-linking.py:36-38
read) — promoted from pickle files to real tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class StageStore:
    def __init__(self, spark: SparkSession, root: str, catalog: str | None = None):
        self.spark = spark
        self.root = root
        self.catalog = catalog
        if catalog is None:
            os.makedirs(root, exist_ok=True)

    # -- parquet fallback paths ------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def write(self, df: DataFrame, name: str, partition_by: tuple[str, ...] = ()) -> None:
        if self.catalog:
            w = df.writeTo(f"{self.catalog}.{name}")
            if partition_by:
                from pyspark.sql.functions import col

                w = w.partitionedBy(*[col(c) for c in partition_by])
            w.createOrReplace()
        else:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        if self.catalog:
            tbl = f"{self.catalog}.{name}"
            if self.spark.catalog.tableExists(tbl):
                df.writeTo(tbl).append()
            else:
                df.writeTo(tbl).create()
        else:
            df.write.mode("append").parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.table(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self._path(name))

    def delete(self, name: str) -> None:
        if self.catalog:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.catalog}.{name}")
        else:
            import shutil

            shutil.rmtree(self._path(name), ignore_errors=True)
