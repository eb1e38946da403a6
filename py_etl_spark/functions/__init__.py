"""Scalar function library: conversion registry, crypto, text, vectors."""

from py_etl_spark.functions.conversions import (  # noqa: F401
    CONVERSIONS,
    convert_column,
    from_db_date,
    from_db_number,
    from_db_rstrip,
    from_db_strip,
    from_multi,
    generalized_time,
    key_from_table_key,
    event_type_name,
    dn_for_cn,
    rewrite_instance_in_dn,
    multi_value_normalize,
    redact_password_hash,
)
