"""Unit tests for the conversion-function registry (SURVEY.md §2.8 F1-F21)."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_etl_spark.functions import conversions as C
from py_etl_spark.functions.crypto import (
    FIXED_TEST_IV_HEX,
    aes_decrypt_from_hex,
    aes_encrypt_hex,
)

KEY = "changemetoo*****"


def _one(spark, schema, row, expr):
    return spark.createDataFrame([row], schema).select(expr.alias("v")).first().v


def test_from_db_number(spark):
    assert _one(spark, "x double", (4714.0,), C.from_db_number("x")) == "4714"
    assert _one(spark, "x double", (None,), C.from_db_number("x")) is None
    assert _one(spark, "x double", (-880406.0,), C.from_db_number("x")) == "-880406"


def test_from_db_date_trailing_dot_zero(spark):
    v = _one(
        spark,
        "x string",
        ("1983-11-21 00:00:00",),
        C.from_db_date(F.to_timestamp("x")),
    )
    assert v == "1983-11-21 00:00:00.0"
    assert _one(spark, "x timestamp", (None,), C.from_db_date("x")) is None


def test_strip_rstrip_empty_to_null(spark):
    assert _one(spark, "x string", ("  a  ",), C.from_db_rstrip("x")) == "  a"
    assert _one(spark, "x string", ("  a  ",), C.from_db_strip("x")) == "a"
    assert _one(spark, "x string", ("   ",), C.from_db_strip("x")) is None
    assert _one(spark, "x string", ("",), C.from_db_rstrip("x")) is None


def test_from_multi(spark):
    assert _one(spark, "x string", ("a;b;c",), C.from_multi("x")) == ["a", "b", "c"]
    assert _one(spark, "x string", ("solo",), C.from_multi("x")) == ["solo"]
    assert _one(spark, "x string", ("",), C.from_multi("x")) is None
    assert _one(spark, "x string", (None,), C.from_multi("x")) is None


def test_key_from_table_key(spark):
    assert _one(spark, "x string", ("pk_uniqueid=4714",), C.key_from_table_key("x")) == 4714
    assert (
        _one(spark, "x string", ("pk_uniqueid=4714.0",), C.key_from_table_key("x"))
        == 4714
    )


def test_event_type_name(spark):
    assert _one(spark, "x double", (4.0,), C.event_type_name("x")) == "delete"
    assert _one(spark, "x double", (5.0,), C.event_type_name("x")) == "insert"
    assert _one(spark, "x double", (6.0,), C.event_type_name("x")) == "update"
    assert _one(spark, "x double", (9.0,), C.event_type_name("x")) is None


def test_dn_helpers(spark):
    assert (
        _one(spark, "x string", ("caesar1",), C.dn_for_cn("x", "ou=user,ou=ph08,o=BMUKK"))
        == "cn=caesar1,ou=user,ou=ph08,o=BMUKK"
    )
    assert (
        _one(
            spark,
            "x string",
            ("cn=a,ou=user,ou=ph08,o=BMUKK",),
            C.rewrite_instance_in_dn("x", "ph15"),
        )
        == "cn=a,ou=user,ou=ph15,o=BMUKK"
    )


def test_multi_value_normalize(spark):
    assert _one(spark, "x string", ("b;a;c",), C.multi_value_normalize("x")) == "a;b;c"


def test_redact_password_hash(spark):
    assert _one(spark, "x string", ("{CRYPT}abcdef",), C.redact_password_hash("x")) == "{CRYPT}"


def test_aes_matches_reference_golden(spark):
    """Golden from /root/reference/testdata/ldap00.txt:22 (pw 'LShtnwF')."""
    ct = _one(
        spark,
        "x string",
        ("LShtnwF",),
        aes_encrypt_hex(F.col("x"), KEY, FIXED_TEST_IV_HEX),
    )
    assert ct == "000000000000000000000000000000008f2e710331fd036d0552dfe66c19b80a"
    pt = _one(spark, "x string", (ct,), aes_decrypt_from_hex(F.col("x"), KEY))
    assert pt == "LShtnwF"


def test_aes_random_iv_roundtrip(spark):
    df = spark.createDataFrame([("secret",)], "x string")
    ct = df.select(aes_encrypt_hex(F.col("x"), KEY).alias("ct"))
    out = ct.select(aes_decrypt_from_hex(F.col("ct"), KEY).alias("pt")).first()
    assert out.pt == "secret"


def test_generalized_time(spark):
    v = _one(
        spark,
        "x string",
        ("2024-05-06 07:08:09",),
        C.generalized_time(F.to_timestamp("x")),
    )
    assert v == "20240506070809Z"
