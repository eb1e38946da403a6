"""CSV source/sink (SURVEY.md §2.1 S5/S6).

Reference semantics (/root/reference/testdriver.py:187-219,
/root/reference/aux-scripts/odbc.py:91-99): ``;``-delimited, header row,
utf-8, empty string ≡ NULL, timestamps ``yyyy-MM-dd HH:mm:ss``. The reference
maps columns by header *name* (csv.DictReader), so the reader here is
name-based: read everything as strings, then cast per the target schema —
robust to column reordering in the file.

CHAR(n) columns are re-padded with trailing blanks to mimic database CHAR
semantics (golden dumps preserve the padding, e.g. ``J  ``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from py_etl_spark.schemas import (
    EVENTLOG_CHAR3_COLS,
    EVENTLOG_SCHEMA,
    USERS_CHAR3_COLS,
    USERS_SCHEMA,
)

TIMESTAMP_FMT = "yyyy-MM-dd HH:mm:ss"


def read_csv_as(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ";",
    char_cols: list[str] | None = None,
    char_width: int = 3,
) -> DataFrame:
    """Read a delimited file and conform it to ``schema`` by column *name*."""
    raw = spark.read.csv(path, sep=sep, header=True, encoding="utf-8")
    cols = []
    for field in schema.fields:
        if field.name not in raw.columns:
            c = F.lit(None).cast(field.dataType)
        else:
            c = F.col(field.name)
            # Spark CSV reads empty fields as NULL already; also map
            # whitespace-only artifacts of ''-quoted empties.
            if isinstance(field.dataType, T.TimestampType):
                c = F.to_timestamp(c, TIMESTAMP_FMT)
            else:
                c = c.cast(field.dataType)
        if char_cols and field.name in char_cols:
            c = F.when(c.isNotNull(), F.rpad(c, char_width, " "))
        cols.append(c.alias(field.name))
    return raw.select(*cols)


def read_users_csv(spark: SparkSession, path: str) -> DataFrame:
    """Users fixture loader (initial_data.csv / changesetNN.csv shape)."""
    return read_csv_as(spark, path, USERS_SCHEMA, char_cols=USERS_CHAR3_COLS)


def read_eventlog_csv(spark: SparkSession, path: str) -> DataFrame:
    """Eventlog fixture loader (eventlogNN.csv shape)."""
    return read_csv_as(spark, path, EVENTLOG_SCHEMA, char_cols=EVENTLOG_CHAR3_COLS)


def write_csv(df: DataFrame, path: str, sep: str = ";", mode: str = "overwrite") -> None:
    """CSV sink: header + data, configurable delimiter (S6).

    Whitespace is part of the payload: Spark's writer TRIMS leading and
    trailing whitespace by default (``ignoreLeading/TrailingWhiteSpace``
    default true on write), which silently corrupts values like ``' a '``
    → ``'a'`` — unacceptable for a data sink, so both are pinned off
    here. Delimiters/quotes embedded in values are quote-escaped by the
    writer and round-trip; values with embedded NEWLINES also round-trip
    but require ``multiLine=True`` on the reader — which makes files
    non-splittable, so it is NOT the reader default (pass it explicitly
    for corpora known to carry newlines). Empty string ≡ NULL stays the
    reference's documented semantics on read-back.
    """
    df.write.mode(mode).csv(
        path,
        sep=sep,
        header=True,
        encoding="utf-8",
        ignoreLeadingWhiteSpace=False,
        ignoreTrailingWhiteSpace=False,
    )
