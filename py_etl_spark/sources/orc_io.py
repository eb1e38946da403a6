"""ORC source/sink.

ORC is the other columnar format a warehouse-adjacent engine meets in the
wild (Hive/Trino installations, Hadoop data lakes). Spark's native orc
reader/writer gives the same scan-level machinery as parquet — predicate
pushdown to stripe/row-group indexes, column pruning, split-parallel
reads, vectorized decoding — so supporting it is a format flag, not a new
code path. Like every source here the reader is schema-explicit by
policy: inference costs an extra scan at 100 TB and drifts across
heterogeneous files.

Timestamps: ORC stores wall-clock timestamps; with the engine session
pinned to UTC (session.get_spark) a parquet→orc→read-back trip preserves
the instant. Reading foreign ORC written by a non-UTC Hive needs the
usual ``spark.sql.session.timeZone`` coordination — same caveat as CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    """Write ORC, one file per task; zstd unless told otherwise."""
    df.write.mode("overwrite").option("compression", compression).orc(path)


def read_orc(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-explicit ORC read (columns matched BY NAME, missing → NULL)."""
    return spark.read.schema(schema).orc(path)
