"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`py_etl_spark.queries` — the engine's operator
registry. The driver runs ``entry(spark)`` as a smoke check, then each
``queries()[name]`` at sf=0.01 against ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from py_etl_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (CDC merge pipeline) on /root/testdata/sf0.001."""
    return _q.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
