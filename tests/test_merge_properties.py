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


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=50), max_size=60),
    budget=st.integers(min_value=1, max_value=100),
)
def test_next_fit_pack_invariants(sizes, budget):
    """Property-level proof of the packing walk (no Spark): dense ids from
    0, monotone non-decreasing, every example within budget unless a
    single oversized item forms a singleton, and greedy maximality (an
    example only closes because the next item would overflow)."""
    from py_etl_spark.operators.corpus import next_fit_pack

    ids = next_fit_pack(sizes, budget)
    assert len(ids) == len(sizes)
    if not sizes:
        return
    assert ids[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(ids, ids[1:]))  # dense+monotone
    fills: dict[int, int] = {}
    members: dict[int, list[int]] = {}
    for s, ex in zip(sizes, ids):
        fills[ex] = fills.get(ex, 0) + s
        members.setdefault(ex, []).append(s)
    for ex, fill in fills.items():
        assert fill <= budget or len(members[ex]) == 1  # oversized singleton
    # greedy maximality: first item of example k+1 would have overflowed k
    firsts = {ex: m[0] for ex, m in members.items()}
    for ex in range(1, max(ids) + 1):
        assert fills[ex - 1] + firsts[ex] > budget


# ---- segment_dedup properties -------------------------------------------

word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "yy"])
texts = st.lists(word, min_size=1, max_size=17).map(" ".join)


@given(docs=st.lists(texts, min_size=1, max_size=6), w=st.integers(2, 5))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_segment_dedup_reconstruction_identity(spark, docs, w):
    """With an unreachable occurrence threshold nothing is removed: every
    document reassembles to its whitespace-normalized self, and the
    segment count is exactly ceil(tokens / w) — for ANY corpus and any
    segment width."""
    import math

    from py_etl_spark.operators.dedup import segment_dedup

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in segment_dedup(
            df, segment_words=w, max_occurrences=10**9
        ).collect()
    }
    for i, text in enumerate(docs):
        toks = text.split()
        assert out[i].text_dedup == " ".join(toks)
        assert out[i].n_segments == max(1, math.ceil(len(toks) / w))
        assert out[i].n_kept == out[i].n_segments


@given(
    log=st.lists(
        st.tuples(
            st.integers(0, 2),                      # key
            st.integers(0, 50),                     # ts offset (minutes)
            # tracked value, incl. NULL — no-op suppression must be
            # null-safe (NULL→NULL collapses, NULL→'a' versions)
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_intervals_partition_time_per_key(spark, log):
    """For ANY change log: per key, SCD2 intervals are contiguous
    (valid_to == next valid_from), versions are 1..n in order, exactly
    one row is current, and adjacent intervals never carry equal tracked
    values (no-op suppression is total)."""
    from datetime import datetime, timedelta

    from py_etl_spark.operators.merge import scd2_history

    base = datetime(2024, 1, 1)
    rows = [
        (k, base + timedelta(minutes=m), v, i)
        for i, (k, m, v) in enumerate(log)
    ]
    df = spark.createDataFrame(
        rows, "k long, ts timestamp, v string, event_id long"
    )
    hist = scd2_history(
        df, keys=["k"], ts_col="ts", tracked=["v"], tie_breakers=["event_id"]
    ).collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r.k, []).append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        assert sum(1 for r in rs if r.is_current) == 1
        assert rs[-1].is_current and rs[-1].valid_to is None
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from
            assert a.v != b.v  # no-op suppression leaves no equal neighbors


# ---- multi-batch fold: scd1_merge vs a dictionary state machine -----------

op_strs = st.sampled_from([OP_UPSERT, OP_DELETE])


@st.composite
def batch_seq(draw):
    """3 change batches, each with unique keys (duplicate-key fan-out is
    a separate documented behavior) mapping key -> (value, op)."""
    return [
        draw(
            st.dictionaries(
                keys, st.tuples(vals, op_strs), min_size=0, max_size=5
            )
        )
        for _ in range(3)
    ]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(seq=batch_seq(), start=st.dictionaries(keys, vals, max_size=5))
def test_scd1_fold_matches_dict_replay_hard_delete(spark, seq, start):
    """Folding scd1_merge over arbitrary batch sequences equals the
    obvious dictionary state machine under the hard-delete policy:
    upsert assigns, delete removes, delete-of-missing is a no-op."""
    state = spark.createDataFrame(
        [(k, v) for k, v in start.items()], "k long, name string"
    )
    model = dict(start)
    for batch in seq:
        changes = spark.createDataFrame(
            [(k, v, op) for k, (v, op) in batch.items()],
            f"k long, name string, {OP_COL} string",
        )
        state = scd1_merge(state, changes, ["k"])
        for k, (v, op) in batch.items():
            if op == OP_UPSERT:
                model[k] = v
            else:
                model.pop(k, None)
    got = {r.k: r.name for r in state.collect()}
    assert got == model


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(seq=batch_seq(), start=st.dictionaries(keys, vals, max_size=5))
def test_scd1_fold_matches_dict_replay_tombstone(spark, seq, start):
    """Same fold under the soft-delete policy: delete keeps the row's
    values and raises the tombstone (even for never-seen keys — the
    reference's delete-event-first arrival), upsert always clears it
    (resurrection, ST10)."""
    policy = MergePolicy(tombstone_col="deleted")
    state = spark.createDataFrame(
        [(k, v, None) for k, v in start.items()],
        "k long, name string, deleted string",
    )
    model = {k: (v, None) for k, v in start.items()}
    for batch in seq:
        changes = spark.createDataFrame(
            [(k, v, op) for k, (v, op) in batch.items()],
            f"k long, name string, {OP_COL} string",
        )
        state = scd1_merge(state, changes, ["k"], policy=policy)
        for k, (v, op) in batch.items():
            if op == OP_UPSERT:
                model[k] = (v, None)
            elif k in model:
                model[k] = (model[k][0], "TRUE")
            else:
                model[k] = (None, "TRUE")
    got = {r.k: (r.name, r.deleted) for r in state.collect()}
    assert got == model
