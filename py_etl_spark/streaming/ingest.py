"""Streaming front door of the training-data pipeline: JSONL ingest →
validity routing → quality gate → horizon-bounded exact dedup.

Composes the batch-proven operators in their streaming forms, so the same
semantics (and the same thresholds) govern both the backfill path and the
live path:

- source: schema-explicit line-delimited JSON via ``readStream`` (the
  tolerant-reader policy of :mod:`py_etl_spark.sources.jsonl_io` — text +
  ``from_json`` so malformed lines become quarantine rows, never job
  failures);
- validity routing: parse failures split to a rejected channel with a
  reason, the reference's event-validation shape (refsync.validate_events)
  applied to documents;
- quality gate: :func:`py_etl_spark.operators.textstats.quality_score` —
  a pure Column expression, so the gate is map-side in every micro-batch;
- dedup: :func:`py_etl_spark.streaming.dedup_stream.exact_dedup_stream`
  (``dropDuplicatesWithinWatermark`` on the content fingerprint; state is
  hash-partitioned across executors and bounded by the watermark horizon).

Everything before the dedup is stateless map work; the dedup is the only
stateful stage. On a 1000-executor cluster each micro-batch therefore
scales with input splits, and the only cross-executor state is the
horizon-bounded seen-set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from py_etl_spark.operators.textstats import quality_score
from py_etl_spark.streaming.dedup_stream import exact_dedup_stream

REJECT_REASON = "reject_reason"


def read_documents_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Schema-explicit streaming JSONL source with quarantine parsing:
    returns the parsed columns plus ``_raw`` (the original line) — rows
    whose parse failed have every schema column NULL and are routed by
    :func:`ingest_documents_stream`."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(path).select(F.col("value").alias("_raw"))
    parsed = raw.select(
        "_raw", F.from_json("_raw", schema).alias("_doc")
    )
    return parsed.select("_raw", "_doc.*")


def ingest_documents_stream(
    stream: DataFrame,
    min_quality: float = 0.5,
    ts_col: str = "ts",
    text_col: str = "text",
    id_col: str = "doc_id",
    dedup_delay: str = "10 minutes",
) -> tuple[DataFrame, DataFrame]:
    """Split an ingest stream into (accepted, rejected).

    Rejected rows carry ``reject_reason`` ∈ {``parse_error``,
    ``low_quality``} plus the raw line for replay; accepted rows are
    quality-gated and exact-deduped within the watermark horizon (first
    arrival wins). Duplicates are dropped silently — they are state-store
    suppressions inside the dedup operator, not rows that can be routed
    (re-ingesting them later via the batch sweep is the production
    pattern).
    """
    parse_failed = F.col(id_col).isNull() & F.col("_raw").isNotNull()
    # NULL text must route, not vanish: a NULL quality score fails BOTH a
    # `>= min` accept filter and a `< min` reject filter, which would
    # silently drop the row from both channels. Treat missing text as
    # quality 0 so it lands in the rejected channel with a reason.
    quality = F.coalesce(quality_score(F.col(text_col)), F.lit(0.0))

    rejected = (
        stream.withColumn(
            REJECT_REASON,
            F.when(parse_failed, F.lit("parse_error")).when(
                quality < min_quality, F.lit("low_quality")
            ),
        )
        .filter(F.col(REJECT_REASON).isNotNull())
        .select("_raw", id_col, REJECT_REASON)
    )
    accepted = (
        stream.filter(~parse_failed)
        .filter(quality >= min_quality)
        .drop("_raw")
    )
    accepted = exact_dedup_stream(
        accepted, text_col=text_col, ts_col=ts_col, delay=dedup_delay
    )
    return accepted, rejected
