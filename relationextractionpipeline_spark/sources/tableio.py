"""TableIO shim: Iceberg when the runtime has it, parquet otherwise.

BASELINE.json's north rule targets Iceberg tables; this sandbox ships no
Iceberg runtime jar, so the shim keeps the engine's read/write surface
Iceberg-shaped while degrading to plain parquet directories with identical
schemas.  On a cluster with ``iceberg-spark-runtime`` on the classpath and a
catalog configured, the same calls route to
``spark.read.table`` / ``writeTo(...).append()`` — no call-site changes.

Write layout is Iceberg-friendly either way: snapshot-style overwrite, and an
optional bucket column (``pmod(hash(key), n)``) for co-located downstream
joins — the parquet stand-in for Iceberg's ``bucket(n, key)`` partition
transform.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession, catalog: str = "local") -> bool:
    """True only when BOTH the Iceberg runtime class loads AND the named
    catalog is configured (py4j attribute access never raises for missing
    classes — must Class.forName)."""
    try:
        if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is None:
            return False
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


class TableIO:
    def __init__(self, spark: SparkSession, warehouse: str, catalog: str = "local"):
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        self.catalog = catalog
        self.use_iceberg = iceberg_available(spark, catalog)

    def _path(self, name: str) -> str:
        return f"{self.warehouse}/{name}"

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self._path(name))

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        bucket_by: Optional[str] = None,
        n_buckets: int = 64,
    ) -> None:
        if bucket_by is not None:
            df = df.withColumn(
                "_bucket", F.pmod(F.xxhash64(bucket_by), F.lit(n_buckets))
            ).repartition(n_buckets, "_bucket")
        if self.use_iceberg:
            w = df.writeTo(f"{self.catalog}.{name}")
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        writer = df.write.mode(mode)
        if bucket_by is not None:
            writer = writer.partitionBy("_bucket")
        writer.parquet(self._path(name))
