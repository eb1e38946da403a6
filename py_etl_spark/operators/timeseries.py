"""Time-series reshaping: calendar resampling with gap fill, rolling
aggregates.

Event streams are sparse — days with zero events simply have no rows —
but downstream consumers (dashboards, anomaly baselines, training-data
mix monitors) need DENSE series: a zero IS information. These two ops
close that gap declaratively:

- :func:`resample_daily` — count events per (group, day) and join the
  result onto the full calendar grid (groups × days), zero-filling
  misses. The grid is built with ``sequence()`` + ``explode`` from the
  series bounds — |groups| · |days| rows of metadata, never a second
  pass over the events; the grid side is broadcast when small.
- :func:`rolling_mean` — a trailing k-row window per group over the
  DENSE series (gap-filled first, so "7 rows" means "7 calendar days").
  One window shuffle on the group key; Spark evaluates the frame
  incrementally, not O(k) per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_daily(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Dense per-(group, day) event counts over [start, end] (defaults:
    the data's own min/max day — two tiny aggregates). Output:
    ``(group_col, day, n)`` with ``n = 0`` for gap days."""
    day = F.date_trunc("day", F.col(ts_col))
    counts = df.groupBy(F.col(group_col), day.alias("day")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    if start is None or end is None:
        lo, hi = df.select(
            F.min(day).alias("lo"), F.max(day).alias("hi")
        ).first()
    if start is not None:
        lo = start
    if end is not None:
        hi = end
    days = F.explode(
        F.sequence(
            F.lit(lo).cast("timestamp"),
            F.lit(hi).cast("timestamp"),
            F.expr("INTERVAL 1 DAY"),
        )
    ).alias("day")
    grid = df.select(group_col).distinct().select(F.col(group_col), days)
    return (
        grid.join(counts, [group_col, "day"], "left")
        .select(
            group_col,
            "day",
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n"),
        )
    )


def rolling_mean(
    dense: DataFrame,
    group_col: str = "event_type",
    order_col: str = "day",
    value_col: str = "n",
    window_rows: int = 7,
    out_col: str = "rolling_mean",
    round_to: int = 4,
) -> DataFrame:
    """Trailing ``window_rows``-row mean per group over an already-DENSE
    series (run :func:`resample_daily` first so rows are calendar-spaced).
    Rows before a full window average what exists so far — the standard
    warm-up convention."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    return dense.withColumn(
        out_col, F.round(F.avg(value_col).over(w), round_to)
    )
