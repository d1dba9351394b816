"""One writer/reader interface over Iceberg or parquet (SURVEY.md §7 M5).

The target deployment reads/writes Iceberg tables of Common-Crawl-style
pages; this sandbox ships no Iceberg catalog jar, so the interface
probes for the extension and falls back to plain parquet paths with the
same call shape. Everything downstream (builds, queries, checkpoints)
only sees DataFrames, so the swap is transparent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class TableIO:
    """read(name) / write(df, name) over Iceberg if present, else
    parquet under base_path."""

    def __init__(self, spark: SparkSession, base_path: str | None = None,
                 catalog: str = "spark_catalog"):
        self.spark = spark
        self.base_path = base_path
        self.catalog = catalog
        self.use_iceberg = iceberg_available(spark) and base_path is None

    def _path(self, name: str) -> str:
        if self.base_path is None:
            # without this, f-string interpolation would silently
            # read/write a literal './None/<name>.parquet' directory
            raise ValueError(
                "TableIO has no backend: Iceberg is not on the "
                "classpath and no base_path was given — pass "
                "base_path=<dir> for the parquet fallback")
        return f"{self.base_path}/{name}.parquet"

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.format("iceberg").load(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self._path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        """mode: 'overwrite' (create or replace) or 'append' — honored
        IDENTICALLY on both backends (the Iceberg path previously
        createOrReplace()d unconditionally, so append lost data)."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"unsupported mode {mode!r}")
        if self.use_iceberg:
            if mode == "append" and partition_by:
                # DataFrameWriterV2.partitionedBy only applies on
                # create/replace — an append silently ignores it (the
                # table's existing spec wins), which would diverge from
                # the parquet fallback that honors it; fail loud
                raise ValueError(
                    "partition_by cannot change an existing Iceberg "
                    "table's partition spec on append — create the "
                    "table with the spec (mode='overwrite') or drop "
                    "the argument")
            w = df.writeTo(f"{self.catalog}.{name}")
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            if mode == "append":
                w.append()
            else:
                w.createOrReplace()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))
