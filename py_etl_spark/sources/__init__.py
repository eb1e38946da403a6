"""Sources & sinks: CSV, Parquet state table, JDBC."""

from py_etl_spark.sources.csv_io import (  # noqa: F401
    read_csv_as,
    read_eventlog_csv,
    read_users_csv,
    write_csv,
)
