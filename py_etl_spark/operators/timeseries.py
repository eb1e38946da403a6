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
    warm-up convention.

    The ``round()`` here survives the r11 cross-engine rounding audit
    (see the exact money-aggregate idiom in queries.py) without the
    float-floor rewrite: the averaged values are integer counts summed
    exactly inside a ROWS frame, and a mean int_sum/d with d ≤
    ``window_rows`` (≤ 7) can never land exactly on a 10^-{round_to+1}
    tie (d ∈ {1,2,4,5} expansions terminate with a 0 in the tie digit;
    d ∈ {3,6,7} never terminate), so both engines' round() agree."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    return dense.withColumn(
        out_col, F.round(F.avg(value_col).over(w), round_to)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    start_col: str = "start_s",
    end_col: str = "end_s",
    bucket_seconds: int = 3600,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Interval-interval overlap join — the two-sided generalization of
    the banded point-in-interval range join (queries.
    range_join_followup_events): emit one row per (left, right) pair
    with the same ``key_col`` whose ``[start, end]`` intervals overlap
    (closed-interval semantics: ``l.start <= r.end AND r.start <=
    l.end``).

    A naive theta join is a per-key cross product. Banding fixes it:
    each interval explodes to every ``bucket_seconds`` bucket it
    touches, the join becomes an equi-join on (key, bucket) with the
    exact overlap predicate as a residual — but an overlapping pair now
    meets in EVERY shared bucket. The standard dedup trick keeps the
    plan distinct-free: accept the pair only in the bucket containing
    ``max(l.start, r.start)`` — exactly one bucket qualifies per pair
    (both intervals span it: it's inside each one's [start, end]), so no
    ``distinct()`` and no second shuffle.

    Columns: both inputs must carry ``key_col`` + integer-second
    ``start_col``/``end_col``; all other columns pass through with
    ``suffixes``. Cost: shuffle ∝ Σ interval-width/bucket; choose
    ``bucket_seconds`` near the typical interval length so most
    intervals explode to ≤2 buckets.
    """
    sl, sr = suffixes

    def banded(df: DataFrame, suf: str) -> DataFrame:
        renamed = df.select(
            F.col(key_col),
            *[
                F.col(c).alias(f"{c}{suf}")
                for c in df.columns
                if c != key_col
            ],
        )
        lo = (F.col(f"{start_col}{suf}") / bucket_seconds).cast("long")
        hi = (F.col(f"{end_col}{suf}") / bucket_seconds).cast("long")
        return renamed.withColumn(
            "__bucket", F.explode(F.sequence(lo, hi))
        )
    lb = banded(left, sl)
    rb = banded(right, sr)
    ls, le = F.col(f"{start_col}{sl}"), F.col(f"{end_col}{sl}")
    rs, re_ = F.col(f"{start_col}{sr}"), F.col(f"{end_col}{sr}")
    anchor_bucket = (
        F.greatest(ls, rs) / bucket_seconds
    ).cast("long")
    joined = lb.alias("l").join(
        rb.alias("r"),
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col("l.__bucket") == F.col("r.__bucket"))
        & (ls <= re_)
        & (rs <= le)
        & (F.col("l.__bucket") == anchor_bucket),
    )
    keep = [F.col(f"l.{key_col}").alias(key_col)]
    keep += [
        F.col(f"l.{c}{sl}").alias(f"{c}{sl}")
        for c in left.columns
        if c != key_col
    ]
    keep += [
        F.col(f"r.{c}{sr}").alias(f"{c}{sr}")
        for c in right.columns
        if c != key_col
    ]
    return joined.select(*keep)
