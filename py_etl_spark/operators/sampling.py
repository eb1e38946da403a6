"""Inspection / sampling helpers (reference aux-scripts).

- ``first_n_per_column``  show_col.py:8-33 — first N non-null values per
  column (P12/A6); one window pass, not one query per column.
- ``filter_by_keyset``    get_recs.py:7-16 — keep rows whose key ∈ set.
- ``single_column``       get_uid.py:8-11.
- ``export_semi_join``    aux-scripts/odbc.py:100-115 — rows matching ids
  drawn from another table, with a time filter.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_n_per_column(df: DataFrame, n: int = 10) -> DataFrame:
    """(column, value) pairs: the first ``n`` non-null values per column.

    One unpivot + one ranked window — a single shuffle on the column name,
    instead of the reference's per-column sequential scans."""
    pairs = df.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("column"), F.col(c).cast("string").alias("value"))
                for c in df.columns
            ])
        ).alias("kv")
    ).select("kv.column", "kv.value").filter(F.col("value").isNotNull())
    w = Window.partitionBy("column").orderBy(F.monotonically_increasing_id())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def filter_by_keyset(df: DataFrame, key_col: str, keys: Iterable) -> DataFrame:
    return df.filter(F.col(key_col).isin(list(keys)))


def single_column(df: DataFrame, col: str) -> DataFrame:
    return df.select(col)


def export_semi_join(
    rows: DataFrame,
    ids: DataFrame,
    key_col: str,
    id_col: str,
    since=None,
    time_col: str | None = None,
) -> DataFrame:
    """Rows whose key appears in ``ids`` (broadcast left-semi), optionally
    time-filtered — the reference's table→CSV export query."""
    if since is not None and time_col:
        ids = ids.filter(F.col(time_col) > since)
    return rows.join(
        F.broadcast(ids.select(F.col(id_col).alias(key_col)).distinct()),
        key_col,
        "left_semi",
    )
