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
    """Every registered query executes and yields a stable schema at sf0.001.

    Also enforces the driver-canonicalizer contract: the external gate's
    pandas ``sort_values`` crashes on list-valued cells, so no registry
    query may emit ArrayType/MapType/StructType — arrays are serialized
    to canonical strings at the registry layer (queries._arr_csv).
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    failures = {}
    for name, fn in Q.queries().items():
        try:
            df = fn(spark, SF_SMALL)
            assert df.columns, "no columns"
            complex_cols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            assert not complex_cols, f"complex output columns {complex_cols}"
            df.limit(5).collect()
        except Exception as e:  # noqa: BLE001
            failures[name] = str(e).splitlines()[0][:120]
    assert not failures, failures


def test_rotation_window_exactly_fifty_and_valid():
    """The driver caps its check at the first 50 registry entries; the
    priority roster must fill that window exactly — no phantom names, no
    silent overflow pushing 'prioritized' queries out of the window."""
    from py_etl_spark.queries import _FRONT, _TAIL, REGISTRY

    assert len(_FRONT) == 50
    unknown = [n for n in _FRONT + _TAIL if n not in REGISTRY]
    assert not unknown, f"roster names not in registry: {unknown}"
    assert len(set(_FRONT)) == 50 and not set(_FRONT) & set(_TAIL)
