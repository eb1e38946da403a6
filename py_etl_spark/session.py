"""SparkSession factory with scale-appropriate defaults.

Local test posture: one JVM, ``local[N]`` threads, shuffle partitions ≈
cores. Cluster posture (the design target — 1000 executors / 100 TB): the
same builder args apply; AQE re-plans shuffle partition counts at runtime so
the static number only seeds the first stage. Session timezone is pinned to
UTC so timestamp semantics match the DuckDB correctness oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults match the driver environment: local[$SPARK_GRAFT_CPUS], 128 GiB box.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(
    app_name: str = "py_etl_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Scale notes (100 TB posture):
    - AQE on: runtime shuffle-partition coalescing, skew-join splitting,
      and broadcast demotion/promotion replace hand-tuned partition counts.
    - ``spark.sql.files.maxPartitionBytes`` stays at the 128 MB default so a
      100 TB scan fans out to ~800k input splits — fine for 1000 executors.
    - Arrow enabled for the few Pandas-UDF operators (dedup/similarity).
    """
    cpus = str(cpus if cpus is not None else _DEFAULT_CPUS)
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Production levers, measured r11 (OPTIMIZATION_r11.md "Config
        # levers"): zstd shuffle/spill compression (guide §2.3/§9) and
        # shuffled-hash-join preference (guide §3.1/§9). Local defaults
        # = Spark defaults so the driver's bench stays comparable; at
        # 100 TB (NIC-bound shuffles, §1.3 napkin math) set
        # SPARK_GRAFT_IO_CODEC=zstd — the interleaved sf10 A/B measured
        # it -12% on the spill-heavy aggregate and neutral elsewhere
        # locally, where shuffle never crosses a NIC.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "true"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Some sources write TIMESTAMP(NANOS) parquet, which Spark's reader
        # rejects; read as raw nanos long and let loaders convert to µs.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Naive-µs parquet lands as LTZ (stored micros = UTC instant), not
        # NTZ, so unix_millis()/window() work on ANY timestamp read under
        # this session — even parquet read outside schemas.load_table.
        # Session-level invariant: all timestamp ingest is naive-as-UTC.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
