"""Partitioned parquet sink with dynamic partition overwrite.

The standard warehouse write pattern: a table laid out as
``path/source=web/part-*.parquet`` so partition-pruned scans touch only
the partitions a filter names — and incremental jobs rewrite ONLY the
partitions present in the incoming batch. Spark's default overwrite mode
(``static``) would truncate the WHOLE table first; one mis-scoped daily
job deleting a year of data is the classic outage. ``dynamic`` scopes the
overwrite to partitions the batch actually contains, which is what an
idempotent daily re-run needs (same day re-processed → same partition
replaced, everything else untouched).

The mode is set per-write here (not globally in the session factory) so a
deliberate full-table rewrite stays one explicit call away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    dynamic: bool = True,
) -> None:
    """Overwrite-write ``df`` under ``path`` partitioned by
    ``partition_by``; with ``dynamic=True`` only the partitions present in
    ``df`` are replaced."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode",
        "dynamic" if dynamic else "static",
    )
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; partition columns come back typed from
    directory names (partition pruning applies to filters on them)."""
    return spark.read.parquet(path)
