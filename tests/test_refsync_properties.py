"""Property tests for the two most intricate stateful kernels (VERDICT r06
ask #4):

1. ``sync_users_into_state`` vs a sequential dict-model of the reference's
   per-record apply loop (etl.py:923-1110) — random multi-round
   interleavings of update / rename (uid-fallback) / cn-steal /
   tombstone / resurrection / deleted-cn conflict / ambiguous-uid error /
   snapshot leftover sweep.

2. ``VersionedState`` commit/GC under RANDOM crash points (generalizing
   tests/test_streaming.py's two fixed crash windows): a crash can land
   before the manifest publish (orphan data dir, commit invisible) or
   after the publish but before GC (commit visible, GC deferred); every
   surviving handle must agree with a version-log model, time-travel
   must return bit-stable content, and orphans must be swept once the
   retention horizon passes them.

The sync model replays entries SEQUENTIALLY like the reference; the Spark
kernel is set-oriented with matches resolved against the batch-start
state + last-write-wins per target dn. Those coincide exactly when no
two batch rows touch overlapping state rows — the reference's own
operating envelope (per-user rows; duplicate-cn tolerance is pinned by
golden ldap03 and the cdc_apply order-invariance property) — so the
generator keeps each batch's affected-cn sets pairwise disjoint and
spends its randomness on the per-row state machine and on CROSS-ROUND
interleavings, where every risky transition composes.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from py_etl_spark.functions.crypto import FIXED_TEST_IV_HEX, aes_encrypt_hex
from py_etl_spark.operators.refsync import (
    USER_OBJECTCLASS,
    SyncConfig,
    base_dn_for,
    delete_uids,
    sync_users_into_state,
    users_to_entries,
)
from py_etl_spark.schemas import ACC_ACTIVE_ATTRS, ACC_STATUS_ATTRS
from py_etl_spark.schemas import STATE_COLS, STATE_SCHEMA, USERS_COLS, USERS_SCHEMA

_SETTINGS = dict(
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)

INST = "ph08"
BASE = base_dn_for(INST)
TOMB_TS = "20200101000000Z"
# (db column, target attr) payload attrs the model tracks; everything
# else stays NULL end-to-end and is asserted NULL.
PAYLOAD = [
    ("vorname", "givenName"),
    ("nachname", "sn"),
    ("emailadresse_st", "phonlineEmailStudent"),
    # an account-status attr so delete_uids' OK -> GESPERRT lock and its
    # any_change timestamp rule have mass to act on
    ("account_status_st", "phonlineAccStStudent"),
]
PW_POOL = ["pw-one", "pw-two"]

_enc_cache: dict[str, str] = {}


def _enc_map(spark, cfg: SyncConfig) -> dict[str, str]:
    """plaintext -> hex(IV||ct) under the fixed test IV, via the SAME
    Spark expression the kernel uses (the model never re-implements AES;
    determinism comes from the pinned IV)."""
    if not _enc_cache:
        df = spark.createDataFrame([(p,) for p in PW_POOL], "p string")
        for r in df.select(
            "p", aes_encrypt_hex(F.col("p"), cfg.key, cfg.iv_hex).alias("e")
        ).collect():
            _enc_cache[r.p] = r.e
    return _enc_cache


def _blank_row() -> dict:
    return {c: None for c in STATE_COLS}


def _model_match(model: dict, ent: dict):
    """The reference's match order (etl.py:946-972): cn first; a
    tombstoned cn-match with a different uid is a refusal; else uid
    fallback — ambiguous if >1, single match adopted."""
    by_cn = {r["cn"]: dn for dn, r in model.items()}
    dn = by_cn.get(ent["cn"])
    if dn is not None:
        row = model[dn]
        if row["idnDeleted"] is not None and row["phonlineUniqueId"] != ent["uid"]:
            return "err_deleted", None
        return "cn", dn
    uid_dns = sorted(
        d for d, r in model.items() if r["phonlineUniqueId"] == ent["uid"]
    )
    if len(uid_dns) > 1:
        return "err_ambig", None
    if len(uid_dns) == 1:
        return "uid", uid_dns[0]
    return "new", None


def _model_apply(model, ent, kind, key, cfg, enc, renames, errors):
    """Sequential apply of one entry (etl.py:974-1110 semantics)."""
    if kind == "err_deleted":
        errors.add((
            ent["cn"], ent["uid"],
            f"Found deleted record with same CN {ent['cn']} "
            f"but different pk_uniqueid: {ent['uid']}",
        ))
        return None
    if kind == "err_ambig":
        errors.add((
            ent["cn"], ent["uid"],
            f"Non-matching cn: {ent['cn']} and more than one record "
            f"with same pk_uniqueid: {ent['uid']}, giving up",
        ))
        return None
    pw = ent["pw"]
    if kind == "new":
        row = _blank_row()
        row.update(
            dn=f"cn={ent['cn']},{BASE}",
            instance=INST,
            cn=ent["cn"],
            phonlineUniqueId=ent["uid"],
            objectClass=list(USER_OBJECTCLASS),
            etlTimestamp=cfg.batch_ts,
            userPassword="{CRYPT}x" if pw is not None else None,
            idnDistributionPassword=enc[pw] if pw is not None else None,
            __pw_plain=pw,  # generator shadow (never compared)
        )
        for _, attr in PAYLOAD:
            row[attr] = ent[attr]
        model[row["dn"]] = row
        return row["dn"]
    row = model[key]
    stored = row["idnDistributionPassword"]
    if pw is None:
        pw_changed = stored is not None
    else:
        # all stored ciphertexts in this test carry the pinned IV, so
        # re-encrypting under the stored IV reproduces enc[pw] exactly
        pw_changed = stored is None or stored != enc[pw]
    cn_changed = ent["cn"] != row["cn"]
    resurrect = row["idnDeleted"] is not None
    attr_diff = any(ent[attr] != row[attr] for _, attr in PAYLOAD)
    uid_diff = ent["uid"] != row["phonlineUniqueId"]
    any_diff = pw_changed or cn_changed or resurrect or attr_diff or uid_diff
    row["phonlineUniqueId"] = ent["uid"]
    for _, attr in PAYLOAD:
        row[attr] = ent[attr]
    if pw_changed:
        row["userPassword"] = "{CRYPT}x"
    row["idnDistributionPassword"] = (
        None if pw is None else (enc[pw] if pw_changed else stored)
    )
    row["__pw_plain"] = pw  # generator shadow (never compared)
    row["idnDeleted"] = None
    if any_diff:
        row["etlTimestamp"] = cfg.batch_ts
    if cn_changed:
        renames.add((row["cn"], ent["cn"]))
        del model[key]
        row["cn"] = ent["cn"]
        row["dn"] = f"cn={ent['cn']},{BASE}"
        model[row["dn"]] = row
    return row["dn"]


def _users_df(spark, batch):
    rows = []
    for ent in batch:
        r = {c: None for c in USERS_COLS}
        r["benutzername"] = ent["cn"]
        r["pk_uniqueid"] = float(ent["uid"])
        r["passwort"] = ent["pw"]
        for db_col, attr in PAYLOAD:
            r[db_col] = ent[attr]
        rows.append(tuple(r[c] for c in USERS_COLS))
    return spark.createDataFrame(rows, USERS_SCHEMA)


@settings(max_examples=10, **_SETTINGS)
@given(data=st.data())
def test_sync_users_into_state_matches_sequential_reference_model(spark, data):
    cfg0 = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240101000000Z")
    enc = _enc_map(spark, cfg0)
    cn_pool = [f"cn{i}" for i in range(8)]
    uids = [str(u) for u in range(1, 5)]
    names = st.one_of(st.none(), st.sampled_from(["ann", "bob", "cat"]))
    accs = st.one_of(st.none(), st.sampled_from(["OK", "NO"]))
    attr_strats = {
        attr: (accs if attr == "phonlineAccStStudent" else names)
        for _, attr in PAYLOAD
    }
    pws = st.one_of(st.none(), st.sampled_from(PW_POOL))

    # non-user row (tree node): must pass through every round untouched
    tree = _blank_row()
    tree.update(dn=BASE, instance=INST, ou=INST)
    state_rows = [tree]
    model: dict[str, dict] = {}

    def mkdf(rows):
        return spark.createDataFrame(
            [tuple(r[c] for c in STATE_COLS) for r in rows], STATE_SCHEMA
        )

    # >= 2 rounds: tombstone/resurrection interleavings need a round
    # boundary to compose
    n_rounds = data.draw(st.integers(2, 3), label="rounds")
    for rnd in range(n_rounds):
        cfg = SyncConfig(
            iv_hex=FIXED_TEST_IV_HEX, batch_ts=f"2024010100000{rnd}Z"
        )
        # -- draw a batch whose rows touch pairwise-disjoint state rows --
        batch = []
        affected: set[str] = set()
        for uid in data.draw(
            st.permutations(uids), label=f"r{rnd}-uids"
        )[: data.draw(st.integers(1, 4), label=f"r{rnd}-n")]:
            own = sorted(
                d for d, r in model.items() if r["phonlineUniqueId"] == uid
            )
            mode = data.draw(
                st.sampled_from(["same", "fresh", "steal"]),
                label=f"r{rnd}-u{uid}-mode",
            )
            if mode == "same" and own:
                cn = model[own[0]]["cn"]
            elif mode == "steal" and model:
                cn = model[
                    data.draw(
                        st.sampled_from(sorted(model)),
                        label=f"r{rnd}-u{uid}-steal",
                    )
                ]["cn"]
            else:
                cn = data.draw(
                    st.sampled_from(cn_pool), label=f"r{rnd}-u{uid}-cn"
                )
            tmpl = model.get(own[0]) if own else None
            if (
                mode == "same"
                and tmpl is not None
                and data.draw(st.booleans(), label=f"r{rnd}-u{uid}-noop")
            ):
                # biased branch: an entry IDENTICAL to the current state
                # row — the no-op-suppression / pure-resurrection case
                # (etlTimestamp must move iff the row is tombstoned),
                # which uniform attr draws almost never produce
                ent = {"cn": cn, "uid": uid, "pw": tmpl.get("__pw_plain")}
                for _, attr in PAYLOAD:
                    ent[attr] = tmpl[attr]
            else:
                ent = {"cn": cn, "uid": uid, "pw": data.draw(pws)}
                for _, attr in PAYLOAD:
                    ent[attr] = data.draw(attr_strats[attr])
            # affected state cns for this row under the CURRENT model =
            # its cn-match target, every uid-fallback candidate, and the
            # row's own (possibly new) cn
            kind, key = _model_match(model, ent)
            row_affected = {cn}
            if key is not None:
                row_affected.add(model[key]["cn"])
            row_affected.update(
                model[d]["cn"]
                for d in model
                if model[d]["phonlineUniqueId"] == uid
            )
            if row_affected & affected:
                continue  # would overlap another row: set-vs-seq divergence
            affected |= row_affected
            batch.append(ent)
        if not batch:
            continue
        snapshot = data.draw(st.booleans(), label=f"r{rnd}-snapshot")

        # -- Spark kernel ------------------------------------------------
        entries = users_to_entries(_users_df(spark, batch), INST)
        new_state, renames_df, _, errors_df = sync_users_into_state(
            mkdf(state_rows), entries, INST, cfg, snapshot=snapshot
        )
        got_rows = [r.asDict() for r in new_state.collect()]
        got_renames = {(r.oldcn, r.newcn) for r in renames_df.collect()}
        got_errors = {(r.cn, r.uid, r.error) for r in errors_df.collect()}

        # -- sequential reference model -----------------------------------
        renames: set = set()
        errors: set = set()
        applied_dns: set = set()  # final dn of every applied (non-error) row
        for ent in batch:
            kind, key = _model_match(model, ent)
            dn = _model_apply(model, ent, kind, key, cfg, enc, renames, errors)
            if dn is not None:
                applied_dns.add(dn)
        if snapshot:
            # leftover sweep (etl.py:900-914): original-state rows no
            # applied entry touched are dropped unless tombstoned
            for dn in [d for d in model if d not in applied_dns]:
                if model[dn]["idnDeleted"] is None:
                    del model[dn]

        assert got_renames == renames
        assert got_errors == errors
        exp = {r["dn"]: r for r in list(model.values()) + [tree]}
        got = {r["dn"]: r for r in got_rows}
        assert sorted(got) == sorted(exp), (sorted(got), sorted(exp))
        for dn, er in exp.items():
            gr = got[dn]
            for c in STATE_COLS:
                assert gr[c] == er[c], (dn, c, gr[c], er[c])

        # -- carry forward; tombstone between rounds through the REAL
        # delete_uids operator (etl.py:466-574), checked against its own
        # model: idnDeleted backfills to TRUE only when absent, OK
        # account-status locks to GESPERRT, active flags force to N, and
        # etlTimestamp moves ONLY when the change set is non-empty — a
        # REPEATED delete of an already-locked tombstone must not
        # re-stamp (etl.py:503-506), which the uid redraws exercise.
        state_rows = [dict(r) for r in got_rows]
        del_uids = sorted(
            data.draw(
                st.sets(st.sampled_from(uids), max_size=2),
                label=f"r{rnd}-del",
            )
        )
        if del_uids:
            del_ts = f"2024010109000{rnd}Z"
            del_cfg = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts=del_ts)
            uid_df = spark.createDataFrame(
                [(u,) for u in del_uids], "uid string"
            )
            state_rows = [
                r.asDict()
                for r in delete_uids(
                    mkdf(state_rows), uid_df, INST, del_cfg
                ).collect()
            ]
            for r in model.values():
                if r["phonlineUniqueId"] not in del_uids:
                    continue
                any_change = (
                    r["idnDeleted"] is None
                    or any(r[a] == "OK" for a in ACC_STATUS_ATTRS)
                    or any(
                        r[a] is not None and r[a] != "N"
                        for a in ACC_ACTIVE_ATTRS
                    )
                )
                if r["idnDeleted"] is None:
                    r["idnDeleted"] = "TRUE"
                for a in ACC_STATUS_ATTRS:
                    if r[a] == "OK":
                        r[a] = "GESPERRT"
                for a in ACC_ACTIVE_ATTRS:
                    if r[a] is not None and r[a] != "N":
                        r[a] = "N"
                if any_change:
                    r["etlTimestamp"] = del_ts
            exp = {r["dn"]: r for r in list(model.values()) + [tree]}
            got = {r["dn"]: r for r in state_rows}
            assert sorted(got) == sorted(exp)
            for dn, er in exp.items():
                for c in STATE_COLS:
                    assert got[dn][c] == er[c], (dn, c, got[dn][c], er[c])


# ---------------------------------------------------------------------------
# VersionedState: random crash points in the commit/GC protocol
# ---------------------------------------------------------------------------

_crash_ops = st.lists(
    st.tuples(
        st.sampled_from(["ok", "crash_manifest", "crash_gc"]),
        st.integers(min_value=1, max_value=5),
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=10, **_SETTINGS)
@given(ops=_crash_ops, keep=st.integers(1, 3))
def test_versioned_state_random_crash_points_converge(
    spark, tmp_path_factory, ops, keep
):
    """Random crash schedule against a version-log model:

    - ``crash_manifest``: writer dies after the distributed data write,
      before the manifest append — the commit must be INVISIBLE (same
      current version, same rows), leaving only an orphan dir;
    - ``crash_gc``: writer dies after the manifest append, before GC —
      the commit must be VISIBLE (readers resolve it) with cleanup
      merely deferred;
    - every step uses a FRESH handle (process restart);
    - retained versions must always time-travel to bit-stable content;
    - after enough clean commits to push the retention horizon past
      every crash, no orphan data dir survives.
    """
    from py_etl_spark.streaming.state_store import VersionedState

    root = str(tmp_path_factory.mktemp("vsp") / "st")
    published: list[tuple[int, list]] = []  # (version, expected rows)

    def payload(step, n):
        rows = [(i, step) for i in range(n)]
        return rows, spark.createDataFrame(rows, "k long, tag long")

    def check(store):
        versions = store.versions()
        if not published:
            assert versions == []
            return
        exp_versions = [v for v, _ in published]
        # GC (when it ran) trims to keep; crash_gc leaves extras behind —
        # either way the tail must be the newest published versions
        assert versions == exp_versions[-len(versions):]
        assert len(versions) >= min(len(exp_versions), keep)
        assert store.current_version() == exp_versions[-1]
        by_v = dict(published)
        for v in versions:
            got = sorted((r.k, r.tag) for r in store.read(v).collect())
            assert got == sorted(by_v[v]), (v, got)

    for step, (mode, n) in enumerate(ops):
        store = VersionedState(
            spark, root, partition_by=(), keep_versions=keep
        )
        rows, df = payload(step, n)
        if mode == "ok":
            v = store.commit(df, {"step": step})
            published.append((v, rows))
        elif mode == "crash_manifest":
            store._write_manifest = _raise
            with pytest.raises(Exception):
                store.commit(df, {"step": step})
        else:  # crash_gc
            store._gc = _raise
            with pytest.raises(Exception):
                store.commit(df, {"step": step})
            v = (published[-1][0] + 1) if published else 0
            published.append((v, rows))
        check(VersionedState(spark, root, partition_by=(), keep_versions=keep))

    # drive the horizon past every crash prefix, then verify orphan sweep
    import os

    for extra in range(keep + 1):
        store = VersionedState(spark, root, partition_by=(), keep_versions=keep)
        rows, df = payload(1000 + extra, 2)
        v = store.commit(df, {"extra": extra})
        published.append((v, rows))
    final = VersionedState(spark, root, partition_by=(), keep_versions=keep)
    check(final)
    live = {
        os.path.basename(final._data_path(v)) for v in final.versions()
    }
    on_disk = {d for d in os.listdir(root) if d.startswith("v=")}
    assert on_disk == live, (on_disk, live)


def _raise(*a, **k):
    raise RuntimeError("simulated crash")
