"""JSONL (newline-delimited JSON) source/sink.

JSONL is the lingua franca of LLM training corpora (one JSON object per
line, utf-8), so a training-data engine needs it as a first-class format
alongside parquet/CSV. Spark's native json reader/writer IS
line-delimited by default and fully distributed: each 128 MB input split
parses independently (no cross-line state), writes are one file per task.

The reader here is schema-EXPLICIT by policy, same as the CSV source:
schema inference (`spark.read.json` without a schema) triggers an extra
full scan of 100 TB just to guess types, and drifts when a rare field is
absent from the sampled files. Callers always pass the expected schema;
unknown extra fields are dropped, missing fields surface as NULL — the
tolerant-reader pattern a heterogeneous corpus needs.

``mode="PERMISSIVE"`` + ``columnNameOfCorruptRecord`` routes malformed
lines to a quarantine column instead of failing the job — at corpus scale
some broken lines are a certainty, and a 100 TB job must not die on line
73 billion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write one JSON object per line; optionally gzip/zstd per file."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    quarantine: bool = False,
) -> DataFrame:
    """Schema-explicit JSONL read.

    With ``quarantine=True`` the returned frame carries a
    ``_corrupt_record`` column holding the raw text of unparseable lines
    (NULL for good rows) — filter on it to split good/bad channels, the
    same validity-routing shape as the reference's event validation.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if quarantine:
        # Spark refuses plans whose required schema is ONLY _corrupt_record
        # on a raw json scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is
        # exactly what the bad-channel count is. Reading as text +
        # from_json sidesteps the restriction with the same split-parallel
        # parse: each task parses its own lines, one scan, no caching.
        parse_schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
        raw = spark.read.text(path)
        parsed = raw.select(
            F.from_json(
                F.col("value"),
                parse_schema,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("__r")
        )
        return parsed.select("__r.*")
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(schema)
        .json(path)
        .drop(CORRUPT_COL)
    )


def route_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a quarantine-read frame into (good, bad) channels."""
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return good, bad
