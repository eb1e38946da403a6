"""Property-based checks of the merge kernel (hypothesis).

Invariants that must hold for ANY change batch, not just fixtures:
- idempotence: applying the same upsert batch twice == once
- key conservation: result keys = (state ∪ inserts) − hard-deletes
- no-op suppression: re-applying current state changes nothing
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from py_etl_spark.operators.merge import (
    OP_COL,
    OP_DELETE,
    OP_UPSERT,
    MergePolicy,
    scd1_merge,
)

STATE_SCHEMA = "k long, name string, flag string, deleted string, stamp string"
CHANGE_SCHEMA = f"{STATE_SCHEMA}, {OP_COL} string"

keys = st.integers(min_value=0, max_value=6)
vals = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))


@st.composite
def batches(draw):
    state_keys = draw(st.lists(keys, unique=True, max_size=5))
    state = [(k, draw(vals), draw(vals), None, "T0") for k in state_keys]
    change_keys = draw(st.lists(keys, unique=True, max_size=5))
    changes = [
        (
            k,
            draw(vals),
            draw(vals),
            None,
            "T0",
            draw(st.sampled_from([OP_UPSERT, OP_DELETE])),
        )
        for k in change_keys
    ]
    return state, changes


def _rows(df):
    return sorted(map(str, df.collect()))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(batches())
def test_merge_idempotent_and_conserves_keys(spark, data):
    state_rows, change_rows = data
    state = spark.createDataFrame(state_rows, STATE_SCHEMA)
    changes = spark.createDataFrame(change_rows, CHANGE_SCHEMA)

    once = scd1_merge(state, changes, ["k"])
    twice = scd1_merge(once, changes, ["k"])
    assert _rows(once) == _rows(twice)  # idempotent

    state_keys = {r[0] for r in state_rows}
    upserts = {r[0] for r in change_rows if r[5] == OP_UPSERT}
    deletes = {r[0] for r in change_rows if r[5] == OP_DELETE}
    expect = (state_keys | upserts) - deletes
    assert {r.k for r in once.collect()} == expect  # key conservation


def test_noop_batch_is_identity(spark):
    from pyspark.sql import functions as F

    state = spark.createDataFrame(
        [(1, "a", "x", None, "T0"), (2, "b", "y", None, "T0")], STATE_SCHEMA
    )
    noop = state.withColumn(OP_COL, F.lit(OP_UPSERT))
    out = scd1_merge(state, noop, ["k"], MergePolicy(stamp_col="stamp", stamp_value="T9"))
    assert _rows(out) == _rows(state)  # stamps unchanged, values unchanged
