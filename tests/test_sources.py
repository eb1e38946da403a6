"""Source/sink coverage: DDL (S9), state IO (S7/S8), JDBC config (S1/S2),
CSV round-trip (S5/S6)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from py_etl_spark.operators.compare import bootstrap_tree
from py_etl_spark.sources.csv_io import read_users_csv, write_csv
from py_etl_spark.sources.jdbc import JdbcTableConfig
from py_etl_spark.sources.state import read_state, scope, write_state


def test_ddl_create_insert_drop(spark):
    """S9: idempotent CREATE/DROP TABLE via Spark SQL."""
    spark.sql("DROP TABLE IF EXISTS t_users_ddl")
    spark.sql(
        "CREATE TABLE IF NOT EXISTS t_users_ddl "
        "(pk_uniqueid DOUBLE, benutzername STRING) USING parquet"
    )
    spark.sql("CREATE TABLE IF NOT EXISTS t_users_ddl (x INT) USING parquet")  # no-op
    spark.sql("INSERT INTO t_users_ddl VALUES (1.0, 'a'), (2.0, 'b')")
    assert spark.table("t_users_ddl").count() == 2
    spark.sql("DROP TABLE IF EXISTS t_users_ddl")
    spark.sql("DROP TABLE IF EXISTS t_users_ddl")  # idempotent


def test_state_roundtrip_and_scope(spark):
    state = bootstrap_tree(spark, ["ph08", "ph15"], ["ph08"])
    path = tempfile.mkdtemp() + "/state"
    write_state(state, path)
    back = read_state(spark, path)
    assert sorted(back.columns) == sorted(state.columns)
    assert back.count() == state.count()
    scoped = scope(back, "ou=ph08,o=BMUKK")
    dns = {r.dn for r in scoped.collect()}
    assert dns == {
        "ou=ph08,o=BMUKK",
        "ou=user,ou=ph08,o=BMUKK",
        "ou=idnSync,ou=ph08,o=BMUKK",
        "ou=ETD,ou=idnSync,ou=ph08,o=BMUKK",
    }
    # partition pruning visible in the plan
    plan = scoped._jdf.queryExecution().executedPlan().toString()
    assert "instance" in plan


def test_jdbc_options_partitioned():
    cfg = JdbcTableConfig(
        url="jdbc:postgresql://db/test",
        table="benutzer_alle_dirxml_v",
        partition_column="pk_uniqueid",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=32,
    )
    o = cfg.options()
    assert o["partitionColumn"] == "pk_uniqueid"
    assert o["numPartitions"] == "32"
    assert o["fetchsize"] == "10000"


def test_jdbc_options_validation():
    cfg = JdbcTableConfig(url="jdbc:x", table="t", partition_column="k")
    with pytest.raises(ValueError, match="requires lower_bound"):
        cfg.options()


def test_csv_sink_roundtrip(spark):
    users = read_users_csv(spark, "/root/reference/testdata/initial_data.csv")
    out = tempfile.mkdtemp() + "/users_csv"
    write_csv(users.select("pk_uniqueid", "benutzername", "nachname"), out)
    back = spark.read.csv(out, sep=";", header=True)
    assert back.count() == users.count()
    assert back.filter(F.col("benutzername") == "caesar1").count() == 1


def test_jsonl_quarantine_routes_corrupt_lines(spark, tmp_path):
    import json as _json

    from py_etl_spark.sources.jsonl_io import read_jsonl, route_corrupt

    p = tmp_path / "in.jsonl"
    lines = [
        _json.dumps({"doc_id": 1, "text": "good line"}),
        '{"doc_id": 2, "text": "broken',          # truncated JSON
        _json.dumps({"doc_id": 3, "text": "quote \" and\nnewline"}),
    ]
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    df = read_jsonl(spark, str(p), "doc_id long, text string", quarantine=True)
    good, bad = route_corrupt(df)
    assert {r.doc_id for r in good.collect()} == {1, 3}
    assert bad.count() == 1
    # escaping survives: the embedded quote and newline come back intact
    assert good.filter(F.col("doc_id") == 3).first().text == 'quote " and\nnewline'


def test_factory_session_timestamp_invariant_outside_load_table(spark):
    """Session-level NTZ guard: parquet timestamps read by a BARE
    spark.read.parquet (bypassing schemas.load_table) under the factory
    session must never surface as TIMESTAMP_NTZ, and instant functions
    like unix_millis must work on them — the crash family that NTZ
    inference caused can only be prevented structurally at the session."""
    from pyspark.sql import types as T
    from tests.conftest import SF_MED

    df = spark.read.parquet(f"{SF_MED}/events.parquet")
    t = df.schema["ts"].dataType
    assert not isinstance(t, T.TimestampNTZType), t
    if isinstance(t, T.TimestampType):
        rows = df.select(F.unix_millis("ts").alias("ms")).limit(5).collect()
        assert all(r.ms is not None for r in rows)


def test_orc_roundtrip_hard_values_and_pushdown(spark):
    from py_etl_spark.sources.orc_io import read_orc, write_orc

    rows = [
        (1, "line one\nline two", "en"),
        (2, 'quotes " and \t tabs', "de"),
        (3, "unicode: émöji 軌跡 ✓", "ja"),
        (4, None, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string, lang string")
    path = tempfile.mkdtemp(prefix="orc_test_") + "/t"
    write_orc(df, path)
    back = read_orc(spark, path, "id long, text string, lang string")
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    # predicate pushdown reaches the ORC scan
    plan = (
        back.filter(F.col("id") == 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters")[1][:80]
    # schema-explicit read: a column absent from the files surfaces as NULL
    wider = read_orc(spark, path, "id long, text string, lang string, extra int")
    assert all(r.extra is None for r in wider.collect())


def test_partitioned_write_dynamic_overwrite(spark):
    from py_etl_spark.sources.partitioned import (
        read_partitioned,
        write_partitioned,
    )

    path = tempfile.mkdtemp(prefix="dynpart_") + "/t"
    day1 = spark.createDataFrame(
        [("web", 1, "a"), ("web", 2, "b"), ("books", 3, "c")],
        "source string, id long, v string",
    )
    write_partitioned(day1, path, ["source"])
    # re-run replaces ONLY the 'web' partition; 'books' must survive
    web_fixed = spark.createDataFrame(
        [("web", 1, "a2")], "source string, id long, v string"
    )
    write_partitioned(web_fixed, path, ["source"])
    back = {
        (r.source, r.id): r.v for r in read_partitioned(spark, path).collect()
    }
    assert back == {("web", 1): "a2", ("books", 3): "c"}
    # static mode truncates everything not in the batch
    write_partitioned(web_fixed, path, ["source"], dynamic=False)
    assert {
        (r.source, r.id) for r in read_partitioned(spark, path).collect()
    } == {("web", 1)}
    # partition pruning: a filter on the partition column reads one dir
    write_partitioned(day1, path, ["source"])
    plan = (
        read_partitioned(spark, path)
        .filter(F.col("source") == "books")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan and "source" in plan.split("PartitionFilters")[1][:100]
