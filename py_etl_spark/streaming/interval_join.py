"""Watermarked stream-stream interval join — the unbounded-stream form
of the banded batch range join (queries.range_join_followup_events).

Batch banding turns point-in-interval into an equi-join on epoch-hour
buckets; on two unbounded streams Spark's stream-stream join does the
same job natively IF the join condition carries explicit event-time
bounds: with a watermark on BOTH inputs plus a two-sided time-range
predicate, the engine derives a state watermark per side and evicts
buffered rows as event time advances (SPARK-26187 semantics). State is
then bounded by (ingest rate x (join window + watermark delay)) per
side — independent of stream length, hash-partitioned by the join key
across executors. Without the time bounds the state store would grow
forever; this module makes the bounds part of the operator contract.

Late data: a probe later than ``watermark_delay`` past the anchor-side
watermark may be dropped by state eviction — the standard at-most-once
lateness trade of watermarked joins (matching the batch result exactly
for all data within the lateness bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    anchors: DataFrame,
    probes: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_seconds: int = 3600,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Join each anchor to every probe with the same ``key_col`` whose
    timestamp lies in ``(anchor_ts, anchor_ts + window_seconds]``.

    Both inputs are streaming DataFrames with an event-time ``ts_col``.
    Output (append mode): one row per qualifying pair —
    ``(key_col, anchor_id, anchor_ts, probe_id, probe_ts)``.
    """
    a = (
        anchors.withWatermark(ts_col, watermark_delay)
        .select(
            F.col(key_col),
            F.col(id_col).alias("anchor_id"),
            F.col(ts_col).alias("anchor_ts"),
        )
    )
    p = (
        probes.withWatermark(ts_col, watermark_delay)
        .select(
            F.col(key_col).alias("__pkey"),
            F.col(id_col).alias("probe_id"),
            F.col(ts_col).alias("probe_ts"),
        )
    )
    cond = (
        (F.col(key_col) == F.col("__pkey"))
        & (F.col("probe_ts") > F.col("anchor_ts"))
        & (
            F.col("probe_ts")
            <= F.col("anchor_ts") + F.expr(f"INTERVAL {window_seconds} SECONDS")
        )
    )
    return a.join(p, cond, "inner").select(
        key_col, "anchor_id", "anchor_ts", "probe_id", "probe_ts"
    )
