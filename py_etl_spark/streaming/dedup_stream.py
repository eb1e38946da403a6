"""Streaming exact deduplication (LLM-pipeline operator, streaming form).

Batch exact dedup is one hash-shuffle on a 16-byte fingerprint
(:func:`py_etl_spark.operators.dedup.exact_duplicates`). This is the same
operator over an unbounded stream: ``dropDuplicatesWithinWatermark`` keyed
by the content fingerprint.

Scale semantics:

- Dedup state lives in the executor-side state store, hash-partitioned by
  fingerprint — a 1000-executor cluster holds 1000ths of the seen-set
  each; nothing accumulates on the driver.
- The watermark bounds state size: a fingerprint is only remembered for
  the dedup horizon (``delay``) past the stream's event-time frontier,
  after which late duplicates are considered new documents. An unbounded
  seen-set at 100 TB/day is not operable; horizon-bounded dedup + a
  periodic batch :func:`exact_duplicates` sweep is the production pattern.
- First occurrence wins (arrival order), matching the at-least-once
  ingest contract; the batch sweep's min-id rule is the deterministic
  tiebreak for anything the horizon let through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_etl_spark.operators.textstats import fingerprint_md5


def exact_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop exact-duplicate documents from a stream within the watermark
    horizon. Adds the ``fingerprint`` column (md5 of normalized text) the
    batch operator uses, so downstream sinks can join the two paths."""
    return (
        stream.withColumn("fingerprint", fingerprint_md5(F.col(text_col)))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
