"""Table readers/writers: Iceberg when available, parquet otherwise.

The production deployment (north rule) targets Iceberg tables; this
container ships no Iceberg runtime jar, so the engine reads/writes through
a thin format abstraction and the Iceberg-specific knobs (snapshot reads,
partition transforms like `bucket(doc_id)`) are exercised only when the
catalog is configured. All engine semantics are format-agnostic —
operators take DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, path_or_table: str, fmt: str = "auto") -> DataFrame:
    """Read an input table. fmt: 'auto' | 'iceberg' | 'parquet'.

    'auto' uses Iceberg for catalog-style identifiers (db.table) when the
    runtime is present, else parquet paths.
    """
    if fmt == "iceberg" or (
        fmt == "auto" and "/" not in path_or_table and iceberg_available(spark)
    ):
        return spark.read.format("iceberg").load(path_or_table)
    return spark.read.parquet(path_or_table)


def write_table(
    df: DataFrame,
    path_or_table: str,
    fmt: str = "auto",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    spark = df.sparkSession
    if fmt == "iceberg" or (
        fmt == "auto" and "/" not in path_or_table and iceberg_available(spark)
    ):
        writer = df.writeTo(path_or_table)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path_or_table)
