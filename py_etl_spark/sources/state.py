"""Keyed-state Parquet table IO (SURVEY.md §2.1 S7/S8).

The target state (the reference's LDAP tree) lives as a Parquet table
partitioned by ``instance``: scope queries prune to one directory, and the
merge rewrite touches only changed partitions. At 100 TB, add bucketing on
the join key (``cn``) via ``writeTo(...).partitionedBy`` on a real catalog
so state⋈changes co-locates without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from py_etl_spark.schemas import STATE_SCHEMA


def write_state(state: DataFrame, path: str, mode: str = "overwrite") -> None:
    state.write.mode(mode).partitionBy("instance").parquet(path)


def read_state(spark: SparkSession, path: str) -> DataFrame:
    # select() restores canonical column order (partition col moves last on
    # disk) so unionByName/merge code sees a stable schema.
    return spark.read.schema(STATE_SCHEMA).parquet(path).select(
        *[f.name for f in STATE_SCHEMA.fields]
    )


def scope(state: DataFrame, base_dn: str) -> DataFrame:
    """Subtree scope = suffix predicate on dn (S7); combine with the
    instance partition filter for pruning."""
    inst = None
    for part in base_dn.split(","):
        if part.startswith("ou=ph"):
            inst = part[3:]
            break
    scoped = state.filter(
        (F.col("dn") == base_dn) | F.col("dn").endswith("," + base_dn)
    )
    if inst:
        scoped = scoped.filter(F.col("instance") == inst)  # partition prune
    return scoped
