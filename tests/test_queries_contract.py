"""Driver-contract sanity: registry shape + flagship smoke at sf0.001."""

from __future__ import annotations

import py_etl_spark.queries as Q
from tests.conftest import SF_SMALL


def test_registry_shape():
    qs = Q.queries()
    oracles = Q.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # the vast majority must carry a SQL oracle (strong check)
    assert len(oracles) >= len(qs) - 6


def test_entry_smoke(spark):
    df = Q.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"uid", "name", "segment", "acctbal"} <= set(df.columns)


def test_each_query_runs_small(spark):
    """Every registered query executes and yields a stable schema at sf0.001."""
    failures = {}
    for name, fn in Q.queries().items():
        try:
            df = fn(spark, SF_SMALL)
            assert df.columns, "no columns"
            df.limit(5).collect()
        except Exception as e:  # noqa: BLE001
            failures[name] = str(e).splitlines()[0][:120]
    assert not failures, failures
