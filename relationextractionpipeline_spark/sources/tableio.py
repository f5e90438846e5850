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

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def upsert_by_key(
    current: DataFrame,
    updates: DataFrame,
    keys: List[str],
    version_col: str,
) -> DataFrame:
    """Latest-wins upsert — the engine-side semantics of Iceberg's
    ``MERGE INTO target USING updates ON keys WHEN MATCHED THEN UPDATE
    WHEN NOT MATCHED THEN INSERT`` (the north rule's incremental edge
    maintenance), expressed as a plan so the parquet fallback can run it as
    read → upsert → snapshot-overwrite while an Iceberg runtime would push
    the same statement to the table format:

    * one row per key survives;
    * higher ``version_col`` wins; on a version tie the UPDATE side wins
      (MERGE's WHEN MATCHED precedence).

    One shuffle on the keys; updates are typically the small side, but the
    window form stays correct at any ratio (no driver-side state)."""
    tagged = current.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("_src").desc()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


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

    def write_bucketed(
        self,
        df: DataFrame,
        name: str,
        key: str,
        n_buckets: int = 16,
        sort: bool = True,
    ) -> None:
        """CATALOG-recorded bucketing — the co-located-join layout for
        tables that join on the same key repeatedly (edges ⋈ entity key map
        on the canonical key, every incremental rewrite).  Both sides
        bucketed to the same ``n_buckets`` on the join key let Spark plan
        the equi-join with ZERO Exchange: the files ARE the shuffle output,
        paid once at write time (``sort=True`` also pre-sorts within
        buckets, removing the join's Sort at read).

        Unlike ``write(bucket_by=...)`` — a directory-partitioned stand-in
        whose layout Spark cannot *trust* — this writes through
        ``bucketBy().saveAsTable()`` so the bucket spec lands in the
        catalog and the optimizer uses it.  Data lives at the warehouse
        path (external table); metadata durability is the catalog's (HMS /
        Iceberg in production — with Iceberg this becomes the
        ``bucket(n, key)`` partition transform + storage-partitioned
        joins).  Read back with ``read_table`` (``spark.table``), not the
        path reader — a bare parquet scan forgets the bucketing."""
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        writer = (
            df.write.format("parquet")
            .mode("overwrite")
            .bucketBy(n_buckets, key)
        )
        if sort:
            writer = writer.sortBy(key)
        writer.option("path", self._path(name)).saveAsTable(name)

    def read_table(self, name: str) -> DataFrame:
        """Catalog read — REQUIRED for bucketed tables (the bucket spec
        lives in the catalog, not the files)."""
        return self.spark.table(name)

    def upsert(
        self, updates: DataFrame, name: str, keys: List[str], version_col: str
    ) -> None:
        """Table-level MERGE INTO analog: read → ``upsert_by_key`` →
        snapshot replace.  With an Iceberg runtime this is where the real
        ``MERGE INTO`` statement (or ``createOrReplace`` snapshot) goes; the
        parquet fallback writes the merged table to a staging directory and
        swaps it in — never overwriting the directory a lazy plan is still
        reading from (Spark parquet overwrite deletes the input first)."""
        merged = upsert_by_key(self.read(name), updates, keys, version_col)
        self.replace(merged, name)

    def compact(self, name: str, target_files: int = 32) -> int:
        """Rewrite ``name`` into ``target_files`` files (content unchanged)
        — the maintenance job for tables grown by per-micro-batch
        appends/merges, where thousands of small files degrade scan
        planning long before data volume does (Iceberg's
        ``rewrite_data_files``; the parquet fallback is a coalesced
        snapshot-replace).  Returns the file count before compaction."""
        import glob
        import os

        if self.use_iceberg:
            # Iceberg runtime: CALL catalog.system.rewrite_data_files(name)
            self.spark.sql(
                f"CALL {self.catalog}.system.rewrite_data_files"
                f"(table => '{name}')"
            )
            return -1
        before = len(glob.glob(os.path.join(self._path(name), "*.parquet")))
        self.replace(self.read(name).coalesce(target_files), name)
        return before

    def replace(self, df: DataFrame, name: str) -> None:
        """Snapshot-replace — the parquet analog of Iceberg's
        ``createOrReplace``: the new contents land in a staging directory
        first (so a plan that lazily reads the CURRENT table keeps working
        while the replacement computes), then swap in via two renames.  A
        kill mid-write leaves the current table intact; only the tiny
        rename window is non-atomic (Iceberg's snapshot commit closes it)."""
        if self.use_iceberg:
            df.writeTo(f"{self.catalog}.{name}").createOrReplace()
            return
        import os
        import shutil

        staging = self._path(f"{name}__staging")
        df.write.mode("overwrite").parquet(staging)
        final, old = self._path(name), self._path(f"{name}__old")
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(staging, final)
        shutil.rmtree(old, ignore_errors=True)
