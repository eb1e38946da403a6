"""JDBC source configuration (SURVEY.md §2.1 S1/S2).

The reference reads its tables over ODBC with hand-rolled keyset pagination
(sorted PKs, 1000-key range chunks — /root/reference/etl.py:428-457). The
Spark equivalent is the built-in partitioned JDBC read: Spark issues one
``WHERE partitionColumn >= lo AND < hi`` query per partition — the same
plan, parallelized and planned by the source.

No database ships in this container, so this module builds/validates the
reader configuration; `read_jdbc` wires it to ``spark.read.jdbc``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcTableConfig:
    url: str                       # jdbc:postgresql://… / jdbc:oracle:thin:…
    table: str                     # table name or "(subquery) t"
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    # keyset-partitioned scan (replaces etl.py:428-457):
    partition_column: str | None = None   # numeric/date/timestamp column
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    fetch_size: int = 10_000       # the reference's "fetchall is much
                                   # faster" concern (etl.py:461-463)
    push_down_predicate: bool = True

    def options(self) -> dict[str, str]:
        if (self.partition_column is not None) and (
            self.lower_bound is None
            or self.upper_bound is None
            or self.num_partitions is None
        ):
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and "
                "num_partitions"
            )
        opts: dict[str, str] = {
            "url": self.url,
            "dbtable": self.table,
            "fetchsize": str(self.fetch_size),
            "pushDownPredicate": str(self.push_down_predicate).lower(),
        }
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        if self.driver is not None:
            opts["driver"] = self.driver
        if self.partition_column is not None:
            opts.update(
                partitionColumn=self.partition_column,
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
                numPartitions=str(self.num_partitions),
            )
        return opts


def read_jdbc(spark: SparkSession, cfg: JdbcTableConfig) -> DataFrame:
    reader = spark.read.format("jdbc")
    for k, v in cfg.options().items():
        reader = reader.option(k, v)
    return reader.load()
