"""ph15 email propagation, read-only watermark mode, status writeback."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_etl_spark.functions.crypto import FIXED_TEST_IV_HEX
from py_etl_spark.operators.compare import bootstrap_tree
from py_etl_spark.operators.refsync import (
    SyncConfig,
    apply_status_writeback,
    cdc_apply,
    events_after,
    sync_student_emails,
    sync_users_into_state,
    users_to_entries,
    watermark_advance,
)
from py_etl_spark.sources import read_eventlog_csv, read_users_csv

TD = "/root/reference/testdata"


def _m(spark):
    return lambda df: spark.createDataFrame(df.collect(), df.schema)


def _dual_state(spark, users, cfg):
    m = _m(spark)
    state = bootstrap_tree(spark, ["ph08", "ph15"], ["ph08", "ph15"])
    for inst in ("ph08", "ph15"):
        state = m(
            sync_users_into_state(
                state, users_to_entries(users, inst), inst, cfg, snapshot=True
            )[0]
        )
    return state


def test_sync_student_emails_propagates_diffs(spark):
    cfg = SyncConfig(iv_hex=FIXED_TEST_IV_HEX)
    m = _m(spark)
    users = m(read_users_csv(spark, f"{TD}/initial_data.csv"))
    state = _dual_state(spark, users, cfg)
    # skew one ph15 email so there's a diff to propagate
    state = m(
        state.withColumn(
            "phonlineEmailStudent",
            F.when(
                (F.col("instance") == "ph15") & (F.col("cn") == "caesar1"),
                "stale@old.example",
            ).otherwise(F.col("phonlineEmailStudent")),
        )
    )
    out = m(sync_student_emails(state, "ph08"))
    row = out.filter(
        (F.col("instance") == "ph15") & (F.col("cn") == "caesar1")
    ).first()
    assert row.phonlineEmailStudent == "caesar1@gmail.com"  # propagated
    # inactive students / entries without email are untouched
    diff = out.subtract(state)
    assert diff.count() == 1


def test_readonly_watermark_mode(spark):
    ev = read_eventlog_csv(spark, f"{TD}/eventlog01.csv")
    wm0 = None
    batch = events_after(ev, wm0)
    assert batch.count() == ev.count()
    wm1 = watermark_advance(batch, wm0)
    assert wm1 is not None
    # nothing new after the watermark
    assert events_after(ev, wm1).count() == 0
    # empty batch leaves the watermark unchanged
    assert watermark_advance(events_after(ev, wm1), wm1) == wm1


def test_duplicate_cn_entries_last_write_wins(spark):
    cfg = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240106000000Z")
    m = _m(spark)
    users = m(read_users_csv(spark, f"{TD}/initial_data.csv"))
    state = _dual_state(spark, users, cfg)
    # two batch rows for the same benutzername (cn) with different emails:
    # the reference applies them sequentially — last write wins, dn unique
    dup_users = users.filter(F.trim("benutzername") == "caesar1")
    dup_users = m(
        dup_users.withColumn("emailadresse_st", F.lit("first@x.example")).unionByName(
            dup_users.withColumn("emailadresse_st", F.lit("second@x.example"))
        )
    )
    new_state, _, _, errors = sync_users_into_state(
        state, users_to_entries(dup_users, "ph08"), "ph08", cfg
    )
    rows = m(new_state).filter(
        (F.col("instance") == "ph08") & (F.col("cn") == "caesar1")
    ).collect()
    assert len(rows) == 1  # no duplicate dn
    assert rows[0].phonlineEmailStudent == "second@x.example"
    assert errors.count() == 0


def test_tombstone_uid_conflict_refused_and_status_E(spark):
    cfg = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240107000000Z")
    m = _m(spark)
    users = m(read_users_csv(spark, f"{TD}/initial_data.csv"))
    state = _dual_state(spark, users, cfg)
    # tombstone caesar1 in ph08 and give it a DIFFERENT uid in state
    state = m(
        state.withColumn(
            "idnDeleted",
            F.when(
                (F.col("instance") == "ph08") & (F.col("cn") == "caesar1"), "TRUE"
            ).otherwise(F.col("idnDeleted")),
        ).withColumn(
            "phonlineUniqueId",
            F.when(
                (F.col("instance") == "ph08") & (F.col("cn") == "caesar1"), "99999"
            ).otherwise(F.col("phonlineUniqueId")),
        )
    )
    entries = users_to_entries(users.filter(F.trim("benutzername") == "caesar1"), "ph08")
    new_state, _, _, errors = sync_users_into_state(state, entries, "ph08", cfg)
    err = errors.collect()
    assert len(err) == 1 and "Found deleted record with same CN" in err[0].error
    # the tombstoned row was NOT resurrected / overwritten
    row = m(new_state).filter(
        (F.col("instance") == "ph08") & (F.col("cn") == "caesar1")
    ).first()
    assert row.idnDeleted == "TRUE" and row.phonlineUniqueId == "99999"

    # end-to-end: the event for that uid acks with status E (retry path)
    uid = users.filter(F.trim("benutzername") == "caesar1").first().pk_uniqueid
    ev = m(
        spark.createDataFrame(
            [(1.0, 20240107.0, 6.0, f"pk_uniqueid={int(uid)}",
              "benutzer_alle_dirxml_v", None, None, 0.0)],
            "record_id double, ts double, event_type double, table_key string,"
            "table_name string, status string, error_message string, attempt double",
        )
    )
    _, statuses = cdc_apply(state, users, ev, "ph08", cfg, materialize=m)
    st = statuses.first()
    assert st.status == "E" and "Found deleted record" in st.error_message


def test_ambiguous_uid_fallback_is_error_not_silent_drop(spark):
    cfg = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240108000000Z")
    m = _m(spark)
    users = m(read_users_csv(spark, f"{TD}/initial_data.csv"))
    state = _dual_state(spark, users, cfg)
    # two ph08 state rows share uid 7777; entry has a cn matching neither
    state = m(
        state.withColumn(
            "phonlineUniqueId",
            F.when(
                (F.col("instance") == "ph08")
                & F.col("cn").isin("caesar1", "caesar3"),
                "7777",
            ).otherwise(F.col("phonlineUniqueId")),
        )
    )
    probe = users.filter(F.trim("benutzername") == "caesar1").withColumn(
        "benutzername", F.lit("renamed_cn")
    ).withColumn("pk_uniqueid", F.lit(7777.0))
    _, _, _, errors = sync_users_into_state(
        state, users_to_entries(probe, "ph08"), "ph08", cfg
    )
    err = errors.collect()
    assert len(err) == 1
    assert "more than one record with same pk_uniqueid" in err[0].error


def test_repeated_delete_does_not_restamp_etl_timestamp(spark):
    from py_etl_spark.operators.refsync import delete_uids

    cfg1 = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240109000000Z")
    cfg2 = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240110000000Z")
    m = _m(spark)
    users = m(read_users_csv(spark, f"{TD}/initial_data.csv"))
    state = _dual_state(spark, users, cfg1)
    uid = state.filter(
        (F.col("instance") == "ph08") & (F.col("cn") == "caesar1")
    ).first().phonlineUniqueId
    uids = spark.createDataFrame([(uid,)], "uid string")
    s1 = m(delete_uids(state, uids, "ph08", cfg1))
    r1 = s1.filter((F.col("instance") == "ph08") & (F.col("cn") == "caesar1")).first()
    assert r1.idnDeleted == "TRUE" and r1.etlTimestamp == "20240109000000Z"
    # second delete of the already-tombstoned+locked entry: change set is
    # empty → etlTimestamp must NOT move (would re-open etd != etl)
    s2 = m(delete_uids(s1, uids, "ph08", cfg2))
    r2 = s2.filter((F.col("instance") == "ph08") & (F.col("cn") == "caesar1")).first()
    assert r2.etlTimestamp == "20240109000000Z"


def test_strict_event_key_validation(spark):
    from py_etl_spark.operators.refsync import validate_events

    ev = spark.createDataFrame(
        [
            (1.0, "pk_uniqueid=12", "benutzer_alle_dirxml_v", 6.0, 0.0),
            (2.0, "pk_uniqueid=12.5", "benutzer_alle_dirxml_v", 6.0, 0.0),
            (3.0, "pk_uniqueid=1e3", "benutzer_alle_dirxml_v", 6.0, 0.0),
            (4.0, "pk_uniqueid=a=34", "benutzer_alle_dirxml_v", 6.0, 0.0),
            (5.0, "pk_uniqueid=-7", "benutzer_alle_dirxml_v", 6.0, 0.0),
        ],
        "record_id double, table_key string, table_name string,"
        "event_type double, attempt double",
    )
    out = {r.record_id: r for r in validate_events(ev).collect()}
    assert out[1.0].validation_error is None and out[1.0].uid == "12"
    # reference split('=',1) + int() rejects all of these (etl.py:641-652)
    for rid in (2.0, 3.0, 4.0):
        assert out[rid].validation_error is not None, rid
    assert out[5.0].validation_error is None and out[5.0].uid == "-7"


def test_status_writeback_and_poison_pill(spark):
    cfg = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240105000000Z")
    m = _m(spark)
    users = m(read_users_csv(spark, f"{TD}/initial_data.csv"))
    state = _dual_state(spark, users, cfg)
    ev = m(read_eventlog_csv(spark, f"{TD}/eventlog01.csv"))
    _, statuses = cdc_apply(state, users, ev, "ph08", cfg, materialize=m)
    back = m(apply_status_writeback(ev, statuses))
    done = back.collect()
    assert all(r.status == "S  " for r in done)          # CHAR(3) padded ack
    assert all(r.read_time is not None for r in done)

    # retry accounting: an E status increments attempt; attempt>10 → F
    e_status = statuses.withColumn("status", F.lit("E"))
    ev_hot = ev.withColumn("attempt", F.lit(11.0))
    esc = m(apply_status_writeback(ev_hot, e_status)).first()
    assert esc.status == "F  " and esc.attempt == 12.0
    norm = m(apply_status_writeback(ev, e_status)).first()
    assert norm.status == "E  " and norm.attempt == ev.first().attempt + 1


def test_cdc_apply_invariant_to_event_order_and_partitioning(spark):
    """Reordering and repartitioning a micro-batch's event rows must not
    change anything observable: the CDC machine's truth is the users
    table, statuses key on record_id, and every reduction inside
    cdc_apply is order-free (min-pinned messages, distinct uid sets) —
    so a shuffled batch replays to a bit-identical state and ack set.
    The golden scenarios pin WHAT one ordering produces; this pins that
    the ordering was never load-bearing."""
    cfg = SyncConfig(iv_hex=FIXED_TEST_IV_HEX, batch_ts="20240109000000Z")
    m = _m(spark)
    users_all = m(read_users_csv(spark, f"{TD}/initial_data.csv"))
    counts: dict[int, int] = {}
    for r in users_all.select("pk_uniqueid").collect():
        counts[int(r.pk_uniqueid)] = counts.get(int(r.pk_uniqueid), 0) + 1
    # uids with a single user row: the duplicate-uid rows the fixture
    # carries for ST12 ack 'W', which is not what this test probes
    singles = sorted(u for u, n in counts.items() if n == 1)
    gone, kept = singles[0], singles[1:4]
    users = m(users_all.filter(F.col("pk_uniqueid") != float(gone)))
    state = _dual_state(spark, users_all, cfg)

    rows = [
        # updates of existing uids (S), one duplicated within the batch
        (1.0, 20240109.0, 6.0, f"pk_uniqueid={kept[0]}", "benutzer_alle_dirxml_v", None, None, 0.0),
        (2.0, 20240109.0, 6.0, f"pk_uniqueid={kept[1]}", "benutzer_alle_dirxml_v", None, None, 0.0),
        (3.0, 20240109.0, 6.0, f"pk_uniqueid={kept[0]}", "benutzer_alle_dirxml_v", None, None, 0.0),
        # delete of a uid gone from the db (real delete path)
        (4.0, 20240109.0, 4.0, f"pk_uniqueid={gone}", "benutzer_alle_dirxml_v", None, None, 0.0),
        # delete of an existing uid (W) + update of a missing uid (W)
        (5.0, 20240109.0, 4.0, f"pk_uniqueid={kept[2]}", "benutzer_alle_dirxml_v", None, None, 0.0),
        (6.0, 20240109.0, 6.0, "pk_uniqueid=999999", "benutzer_alle_dirxml_v", None, None, 0.0),
        # invalid event_type (F) + malformed key (F)
        (7.0, 20240109.0, 9.0, f"pk_uniqueid={kept[1]}", "benutzer_alle_dirxml_v", None, None, 0.0),
        (8.0, 20240109.0, 6.0, "pk_uniqueid=12.5", "benutzer_alle_dirxml_v", None, None, 0.0),
    ]
    schema = (
        "record_id double, ts double, event_type double, table_key string,"
        "table_name string, status string, error_message string, attempt double"
    )

    def run(ev_rows, nparts):
        ev = m(spark.createDataFrame(ev_rows, schema).repartition(nparts))
        st, ack = cdc_apply(state, users, ev, "ph08", cfg, materialize=m)
        st_rows = sorted(tuple(r) for r in m(st).collect())
        ack_rows = {r.record_id: (r.status, r.error_message) for r in ack.collect()}
        return st_rows, ack_rows

    st_a, ack_a = run(rows, 1)
    st_b, ack_b = run(list(reversed(rows)), 7)
    assert ack_a == ack_b
    assert st_a == st_b
    # and the decision table landed where designed
    assert {k: v[0] for k, v in ack_a.items()} == {
        1.0: "S", 2.0: "S", 3.0: "S", 4.0: "S",
        5.0: "W", 6.0: "W", 7.0: "F", 8.0: "F",
    }
