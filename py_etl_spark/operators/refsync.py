"""Reference-parity sync engine: users-DB → hierarchical keyed state.

Re-implements the reference's snapshot reconciliation + CDC apply as
set-oriented Spark plans (the reference does one network round-trip per
record; here a whole batch is a handful of joins):

- ``users_to_entries``   db row → target entry (P1-P3 ∘ F1-F6; etl.py:1199-1213)
- ``sync_users_into_state`` the shared upsert kernel (etl.py:923-1110):
  cn-first / uid-fallback match (J3), attr-level diff with no-op
  suppression (ST8), rename via dn change (ST9), resurrection (ST10),
  password IV handling (etl.py:989-992, 1009-1015), snapshot leftover
  sweep (J1, etl.py:900-914)
- ``delete_uids``        tombstone/hard-delete (ST5; etl.py:466-574)
- ``apply_ph15_writethrough`` cross-instance attr propagation (ST11;
  etl.py:1112-1165)
- ``cdc_apply``          the whole micro-batch (etl.py:576-733) incl.
  validation routing (P10) and the status machine (F20)
- ``set_etd_done`` / ``garbage_collect_state`` downstream-ack + GC
  (ST6/ST7; set_etd_done.py:22-63, etl.py:735-760)

Scale: state is partitioned by ``instance``; every operation here prunes to
one instance partition and joins on cn/uid — at 100 TB the merge rewrites
only touched partitions, and per-batch change sets are broadcast against
the (bucketed) state scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from py_etl_spark.functions.conversions import convert_column
from py_etl_spark.functions.crypto import aes_encrypt_hex
from py_etl_spark.schemas import (
    ACC_ACTIVE_ATTRS,
    ACC_STATUS_ATTRS,
    DB_TO_TARGET_FIELD,
    STATE_COLS,
    STATE_SCHEMA,
)

USER_OBJECTCLASS = ["inetOrgPerson", "phonlinePerson", "idnSyncstat"]
# Attributes NOT synced when writing directly to the paired instance
# (etl.py:334-336 not_synced_ph15).
NOT_SYNCED_PH15 = {"phonlineEmailStudent"}
# Attributes written through to the paired instance on change
# (etl.py:338 ph15_writethrough + passwort at etl.py:1044-1048).
WRITETHROUGH_ATTRS = {
    "vorname": "givenName",
    "nachname": "sn",
    "emailadresse_st": "phonlineEmailStudent",
}

TARGET_ATTRS = list(DB_TO_TARGET_FIELD.values())  # 33 mapped attrs (incl. cn)
_NON_KEY_ATTRS = [a for a in TARGET_ATTRS if a != "cn"]
# state columns never driven by the db row
_CARRIED_ATTRS = [
    "objectClass", "o", "ou", "userPassword", "idnDeleted", "idnSyncDiff",
    "etlTimestamp", "etdTimestamp",
]


@dataclass
class SyncConfig:
    key: str | bytes = "changemetoo*****"
    iv_hex: str | None = None          # fixed IV (tests) or None → random
    batch_ts: str = "19700101000000Z"  # etlTimestamp stamp for this batch


def base_dn_for(instance: str, suffix: str = "o=BMUKK") -> str:
    return f"ou=user,ou={instance},{suffix}"


def _user_scope(state: DataFrame, instance: str) -> Column:
    return (F.col("instance") == instance) & F.col("phonlineUniqueId").isNotNull()


def users_to_entries(users: DataFrame, instance: str, suffix: str = "o=BMUKK") -> DataFrame:
    """db rows → converted target entries (invalid rows dropped, as the
    reference logs-and-skips rows without benutzername/pk_uniqueid)."""
    valid = users.filter(
        F.nullif(F.trim("benutzername"), F.lit("")).isNotNull()
        & F.col("pk_uniqueid").isNotNull()
    )
    cols = [
        convert_column(db_col).alias(attr) for db_col, attr in DB_TO_TARGET_FIELD.items()
    ]
    return valid.select(
        *cols,
        F.col("passwort").alias("__pw_plain"),
        F.lit(instance).alias("instance"),
    ).withColumn("dn", F.concat(F.lit("cn="), "cn", F.lit(f",{base_dn_for(instance, suffix)}")))


def _pw_exprs(cfg: SyncConfig, stored: Column, pw_plain: Column):
    """Password diff under the *stored* IV; re-encrypt under the configured
    IV only on change (etl.py:989-992, 1009-1015)."""
    stored_iv = F.substring(stored, 1, 32)
    # encrypt under the per-row stored IV (expression form of aes_encrypt)
    cand = F.when(
        pw_plain.isNotNull() & stored.isNotNull() & (F.length(stored) > 32),
        F.lower(
            F.hex(
                F.aes_encrypt(
                    pw_plain.cast("binary"),
                    F.lit(cfg.key.encode() if isinstance(cfg.key, str) else cfg.key),
                    F.lit("CBC"),
                    F.lit("PKCS"),
                    F.unhex(stored_iv),
                )
            )
        ),
    )
    changed = F.when(pw_plain.isNull(), stored.isNotNull()).otherwise(
        stored.isNull() | (F.length(stored) <= 32) | (cand != stored)
    )
    fresh = aes_encrypt_hex(pw_plain, cfg.key, cfg.iv_hex)
    final = F.when(pw_plain.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(changed, fresh).otherwise(stored)
    )
    return changed, final


def sync_users_into_state(
    state: DataFrame,
    entries: DataFrame,
    instance: str,
    cfg: SyncConfig,
    snapshot: bool = False,
    skip_attrs: set[str] = frozenset(),
    collect_writethrough: bool = False,
):
    """The shared upsert kernel. Returns (new_state, renames_df, wt_df,
    errors_df).

    renames_df: (oldcn, newcn) pairs where a matched entry changed its key.
    wt_df (if requested): per-entry changed write-through values.
    errors_df: (cn, uid, error) entries the reference refuses to sync —
    a tombstoned cn-match holding a different pk_uniqueid
    (etl.py:950-957) and ambiguous >1 uid-fallback matches
    (etl.py:961-968); callers route these to status 'E'.
    """
    scope = state.filter(_user_scope(state, instance))
    others = state.filter(~_user_scope(state, instance))

    # input order tag: the reference applies rows sequentially so the LAST
    # row targeting a dn wins (etl.py:675-678 duplicate-cn tolerance);
    # monotonically_increasing_id preserves source order within the batch.
    e = entries.withColumn("__ord", F.monotonically_increasing_id()).alias("e")
    # -- match 1: by cn (dn is cn=<cn>,<base>, unique per instance)
    s1 = scope.alias("s1")
    m1 = e.join(s1, F.col("e.cn") == F.col("s1.cn"), "left")
    # -- match 2: by uid, only when cn missed and exactly one uid match
    uid_counts = (
        scope.groupBy("phonlineUniqueId")
        .agg(F.count(F.lit(1)).alias("__uid_n"), F.first("dn").alias("__uid_dn"))
    )
    m = m1.join(
        uid_counts.alias("u"),
        F.col("s1.dn").isNull()
        & (F.col("e.phonlineUniqueId") == F.col("u.phonlineUniqueId")),
        "left",
    )
    s2 = scope.alias("s2")
    m = m.join(
        s2,
        (F.col("u.__uid_n") == 1) & (F.col("u.__uid_dn") == F.col("s2.dn")),
        "left",
    )

    def sv(col: str) -> Column:  # matched state value (cn match wins)
        return F.when(F.col("s1.dn").isNotNull(), F.col(f"s1.{col}")).otherwise(
            F.col(f"s2.{col}")
        )

    matched = sv("dn").isNotNull()
    ambiguous = F.col("s1.dn").isNull() & (F.coalesce(F.col("u.__uid_n"), F.lit(0)) > 1)
    # A tombstoned cn-match with a DIFFERENT pk_uniqueid is an error, not a
    # resurrection — the reference refuses the sync (etl.py:950-957).
    deleted_conflict = (
        F.col("s1.dn").isNotNull()
        & F.col("s1.idnDeleted").isNotNull()
        & ~F.col("e.phonlineUniqueId").eqNullSafe(F.col("s1.phonlineUniqueId"))
    )

    # -- per-attribute result: entry value wins (None deletes the attr)
    pw_changed, pw_final = _pw_exprs(cfg, sv("idnDistributionPassword"), F.col("e.__pw_plain"))

    diffs = []
    for a in _NON_KEY_ATTRS:
        if a == "idnDistributionPassword":
            diffs.append(F.when(matched, pw_changed).otherwise(F.lit(False)))
        elif a in skip_attrs:
            continue
        else:
            diffs.append(~F.col(f"e.{a}").eqNullSafe(sv(a)))
    cn_changed = matched & (F.col("e.cn") != sv("cn"))
    resurrect = matched & sv("idnDeleted").isNotNull()
    any_diff = cn_changed | resurrect
    for d in diffs:
        any_diff = any_diff | d

    out_cols: list[Column] = []
    for c in STATE_COLS:
        if c == "dn":
            expr = F.when(
                matched & ~cn_changed, sv("dn")
            ).otherwise(F.col("e.dn"))
        elif c == "instance":
            expr = F.lit(instance)
        elif c == "cn":
            expr = F.col("e.cn")
        elif c in ("objectClass",):
            expr = F.when(matched, sv(c)).otherwise(
                F.array(*[F.lit(x) for x in USER_OBJECTCLASS])
            )
        elif c == "userPassword":
            expr = F.when(
                matched,
                F.when(pw_changed, F.lit("{CRYPT}x")).otherwise(sv(c)),
            ).otherwise(
                F.when(F.col("e.__pw_plain").isNotNull(), F.lit("{CRYPT}x"))
            )
        elif c == "idnDeleted":
            expr = F.lit(None).cast("string")  # upsert always clears (ST10)
        elif c == "idnSyncDiff":
            expr = F.when(matched, sv(c))
        elif c == "etlTimestamp":
            expr = F.when(
                matched, F.when(any_diff, F.lit(cfg.batch_ts)).otherwise(sv(c))
            ).otherwise(F.lit(cfg.batch_ts))
        elif c == "etdTimestamp":
            expr = F.when(matched, sv(c))
        elif c in ("o", "ou"):
            expr = F.when(matched, sv(c))
        elif c == "idnDistributionPassword":
            expr = F.when(matched, pw_final).otherwise(
                F.when(
                    F.col("e.__pw_plain").isNotNull(),
                    aes_encrypt_hex(F.col("e.__pw_plain"), cfg.key, cfg.iv_hex),
                )
            )
        elif c in skip_attrs:
            expr = F.when(matched, sv(c)).otherwise(F.col(f"e.{c}"))
        else:
            expr = F.col(f"e.{c}")
        out_cols.append(expr.cast(dict((f.name, f.dataType) for f in STATE_SCHEMA.fields)[c]).alias(c))

    applied = m.filter(~ambiguous & ~deleted_conflict)
    result_rows = applied.select(
        *out_cols,
        sv("dn").alias("__matched_dn"),
        cn_changed.alias("__cn_changed"),
        sv("cn").alias("__old_cn"),
        pw_changed.alias("__pw_changed"),
        F.col("e.__pw_plain").alias("__pw_plain"),
        F.col("e.__ord").alias("__ord"),
        *[
            (~F.col(f"e.{a}").eqNullSafe(sv(a))).alias(f"__diff_{a}")
            for a in WRITETHROUGH_ATTRS.values()
        ],
    )

    # last-write-wins per target dn: two batch rows hitting the same state
    # row (same cn, or same uid via fallback) must produce ONE output row —
    # the reference's sequential apply keeps the final write.
    from pyspark.sql import Window as _W

    w_dedup = _W.partitionBy(
        F.coalesce(F.col("__matched_dn"), F.col("dn"))
    ).orderBy(F.desc("__ord"))
    result_rows = (
        result_rows.withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    errors = (
        m.filter(deleted_conflict)
        .select(
            F.col("e.cn").alias("cn"),
            F.col("e.phonlineUniqueId").alias("uid"),
            F.concat(
                F.lit("Found deleted record with same CN "),
                F.col("e.cn"),
                F.lit(" but different pk_uniqueid: "),
                F.col("e.phonlineUniqueId"),
            ).alias("error"),
        )
        .unionByName(
            m.filter(ambiguous).select(
                F.col("e.cn").alias("cn"),
                F.col("e.phonlineUniqueId").alias("uid"),
                F.concat(
                    F.lit("Non-matching cn: "),
                    F.col("e.cn"),
                    F.lit(" and more than one record with same pk_uniqueid: "),
                    F.col("e.phonlineUniqueId"),
                    F.lit(", giving up"),
                ).alias("error"),
            )
        )
    )

    renames = (
        result_rows.filter(F.col("__cn_changed"))
        .select(F.col("__old_cn").alias("oldcn"), F.col("cn").alias("newcn"))
        .distinct()
    )

    wt = None
    if collect_writethrough:
        wt_cols = [F.col("cn"), F.col("phonlineUniqueId")]
        for a in WRITETHROUGH_ATTRS.values():
            wt_cols += [F.col(a).alias(f"wt_{a}"), F.col(f"__diff_{a}").alias(f"chg_{a}")]
        wt_cols += [F.col("__pw_changed").alias("chg_pw"), F.col("__pw_plain").alias("pw_plain")]
        wt = result_rows.filter(F.col("__matched_dn").isNotNull()).select(*wt_cols)

    # untouched scope rows = those not matched by any applied entry
    touched_dns = result_rows.select(F.col("__matched_dn").alias("dn")).filter(
        F.col("dn").isNotNull()
    )
    untouched = scope.join(touched_dns, "dn", "left_anti")
    if snapshot:
        # leftover sweep: delete unless tombstoned (etl.py:900-914)
        untouched = untouched.filter(F.col("idnDeleted").isNotNull())

    new_scope = untouched.unionByName(result_rows.select(*STATE_COLS))
    return others.unionByName(new_scope), renames, wt, errors


def apply_ph15_writethrough(
    state: DataFrame, wt: DataFrame, ph15_instance: str, cfg: SyncConfig
) -> DataFrame:
    """Propagate changed vorname/nachname/emailadresse_st/passwort to the
    paired instance, matched by cn; never deletes attrs (etl.py:1112-1165)."""
    scope = state.filter(_user_scope(state, ph15_instance))
    others = state.filter(~_user_scope(state, ph15_instance))
    s = scope.alias("s")
    w = wt.alias("w")
    j = s.join(w, F.col("s.cn") == F.col("w.cn"), "left")
    out = []
    for c in STATE_COLS:
        expr = F.col(f"s.{c}")
        for attr in WRITETHROUGH_ATTRS.values():
            if c == attr:
                expr = F.when(
                    F.col(f"w.chg_{attr}") & F.col(f"w.wt_{attr}").isNotNull(),
                    F.col(f"w.wt_{attr}"),
                ).otherwise(expr)
        if c == "idnDistributionPassword":
            expr = F.when(
                F.coalesce(F.col("w.chg_pw"), F.lit(False))
                & F.col("w.pw_plain").isNotNull(),
                aes_encrypt_hex(F.col("w.pw_plain"), cfg.key, cfg.iv_hex),
            ).otherwise(expr)
        out.append(expr.alias(c))
    return others.unionByName(j.select(*out))


def delete_uids(
    state: DataFrame,
    uids: DataFrame,  # single column `uid` (string form of pk_uniqueid)
    instance: str,
    cfg: SyncConfig,
    hard: bool = False,
    ph15_instance: str | None = None,
) -> DataFrame:
    """Tombstone (or hard-delete) all entries for the given uids in
    ``instance``; conditionally hard-delete the paired-instance companion
    (etl.py:466-574)."""
    scope_cond = _user_scope(state, instance)
    key = F.col("phonlineUniqueId")
    uid_set = uids.select(F.col("uid").cast("string").alias("phonlineUniqueId")).distinct()

    if hard:
        target = state.filter(scope_cond).join(uid_set, "phonlineUniqueId", "left_semi")
        state = state.join(
            target.select("dn"), "dn", "left_anti"
        )
        targeted_cns = target.select("cn")
    else:
        s = state.alias("s")
        t = uid_set.withColumnRenamed("phonlineUniqueId", "__t_uid").alias("t")
        j = s.join(
            t,
            (F.col("s.instance") == instance)
            & (F.col("s.phonlineUniqueId") == F.col("t.__t_uid")),
            "left",
        )
        hit = F.col("t.__t_uid").isNotNull()
        # etlTimestamp moves only when the change set is non-empty
        # (etl.py:503-506): a repeated delete of an already-tombstoned,
        # already-locked entry must NOT re-open etd != etl (it would block
        # garbage_collect_state and re-trigger downstream sync).
        any_change = F.col("s.idnDeleted").isNull()
        for a in ACC_STATUS_ATTRS:
            any_change = any_change | (F.col(f"s.{a}") == "OK")
        for a in ACC_ACTIVE_ATTRS:
            any_change = any_change | (
                F.col(f"s.{a}").isNotNull() & (F.col(f"s.{a}") != "N")
            )
        out = []
        for c in STATE_COLS:
            expr = F.col(f"s.{c}")
            if c == "idnDeleted":
                expr = F.when(hit, F.coalesce(expr, F.lit("TRUE"))).otherwise(expr)
            elif c in ACC_STATUS_ATTRS:
                expr = F.when(hit & (expr == "OK"), F.lit("GESPERRT")).otherwise(expr)
            elif c in ACC_ACTIVE_ATTRS:
                expr = F.when(
                    hit & expr.isNotNull() & (expr != "N"), F.lit("N")
                ).otherwise(expr)
            elif c == "etlTimestamp":
                expr = F.when(hit & any_change, F.lit(cfg.batch_ts)).otherwise(expr)
            out.append(expr.alias(c))
        targeted_cns = j.filter(hit).select(F.col("s.cn").alias("cn"))
        state = j.select(*out)

    if ph15_instance and not hard:
        # companion delete: cn appears ≤2× tree-wide, the paired entry
        # exists and has NO account-status attribute (etl.py:525-574)
        cn_counts = (
            state.filter(F.col("phonlineUniqueId").isNotNull())
            .groupBy("cn")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        cand = (
            targeted_cns.distinct()
            .join(cn_counts, "cn")
            .filter(F.col("n") <= 2)
            .select("cn")
        )
        ph15 = state.filter(_user_scope(state, ph15_instance))
        no_acc = ph15
        for a in ACC_STATUS_ATTRS:
            no_acc = no_acc.filter(F.col(a).isNull())
        doomed = no_acc.join(cand, "cn", "left_semi").select("dn")
        state = state.join(doomed, "dn", "left_anti")
    return state


def sync_student_emails(
    state: DataFrame, source_instance: str, ph15_instance: str = "ph15"
) -> DataFrame:
    """Cross-tree conditional attribute propagation (the reference's
    ph15_email.py:93-151): for every source-instance entry with
    phonlineEmailStudent set and an active student flag, write that email
    onto the same-cn entry in the paired instance when it differs.

    One filtered scan ⋈ one instance-pruned join — the reference does a
    per-entry BASE search + modify round-trip."""
    src = (
        state.filter(
            _user_scope(state, source_instance)
            & F.col("phonlineEmailStudent").isNotNull()
            & (F.trim(F.col("phonlineStudentAktiv")) == "J")
        )
        .select(F.col("cn").alias("__src_cn"), F.col("phonlineEmailStudent").alias("__src_mail"))
    )
    tgt_cond = _user_scope(state, ph15_instance)
    s = state.alias("s")
    j = s.join(
        F.broadcast(src),
        tgt_cond & (F.col("s.cn") == F.col("__src_cn")),
        "left",
    )
    out = []
    for c in STATE_COLS:
        expr = F.col(f"s.{c}")
        if c == "phonlineEmailStudent":
            expr = F.when(
                F.col("__src_mail").isNotNull() & ~F.col("__src_mail").eqNullSafe(expr),
                F.col("__src_mail"),
            ).otherwise(expr)
        out.append(expr.alias(c))
    return j.select(*out)


def watermark_advance(events: DataFrame, current) -> "object":
    """Read-only mode (ST3): no status writeback — advance the
    high-water-mark to max(event_time) seen (etl.py:579-592, 613-614,
    719-721). Returns the new watermark (a datetime) or ``current`` when
    the batch is empty."""
    row = events.agg(F.max("event_time").alias("wm")).first()
    return row.wm if row and row.wm is not None else current


def events_after(events: DataFrame, watermark) -> DataFrame:
    """The read-only mode's source filter: event_time > high-water-mark."""
    if watermark is None:
        return events
    return events.filter(F.col("event_time") > F.lit(watermark))


def set_etd_done(state: DataFrame, uniqueid: str | None = None,
                 ph15_instance: str = "ph15") -> DataFrame:
    """Simulate the downstream consumer ack: etdTimestamp := etlTimestamp
    (set_etd_done.py:22-63; ph15 entries are skipped)."""
    if uniqueid is not None:
        hit = F.col("phonlineUniqueId") == str(uniqueid)
    else:
        hit = F.col("idnDeleted").isNotNull()
    hit = hit & (F.col("instance") != ph15_instance) & F.col("etlTimestamp").isNotNull()
    return state.withColumn(
        "etdTimestamp", F.when(hit, F.col("etlTimestamp")).otherwise(F.col("etdTimestamp"))
    )


def garbage_collect_state(state: DataFrame, instance: str) -> DataFrame:
    """Drop tombstoned+acked entries (idnSyncDiff=0 ≙ etd==etl;
    etl.py:735-760)."""
    doomed = (
        F.col("instance") == instance
    ) & F.col("idnDeleted").isNotNull() & F.col("etlTimestamp").isNotNull() & (
        F.col("etdTimestamp") == F.col("etlTimestamp")
    )
    return state.filter(~F.coalesce(doomed, F.lit(False)))


# -------------------------------------------------------------------------
# CDC micro-batch (etl.py:576-733)
# -------------------------------------------------------------------------

VALID_TABLE = "benutzer_alle_dirxml_v"


def validate_events(events: DataFrame) -> DataFrame:
    """Validation routing (P10): tag each event valid/invalid with the
    reference's error messages; extract uid + verb."""
    et = F.col("event_type").cast("long")
    verb = (
        F.when(et == 4, "delete").when(et == 5, "insert").when(et == 6, "update")
    )
    key_ok = F.col("table_key").startswith("pk_uniqueid=")
    # Reference parsing (etl.py:641-652): split('=', 1) then int() — so
    # 'pk_uniqueid=a=34' yields 'a=34' and 'pk_uniqueid=12.5' raises,
    # both marked F. Strict integer regex replicates int()'s domain.
    uid = F.element_at(F.split(F.col("table_key"), "=", 2), 2)
    uid_num = F.when(uid.rlike("^-?[0-9]+$"), uid.cast("long"))
    tbl_ok = F.lower("table_name") == VALID_TABLE
    err = (
        F.when(verb.isNull(), F.concat(F.lit("Invalid event_type: "), F.col("event_type").cast("string")))
        .when(~key_ok, F.lit("Invalid table_key, expect pk_uniqueid="))
        .when(~tbl_ok, F.lit("Invalid table_name, expect " + VALID_TABLE))
        .when(uid_num.isNull(), F.concat(F.lit("Invalid table_key: "), uid, F.lit(", expect numeric id")))
    )
    return events.select(
        "record_id",
        "attempt",
        verb.alias("verb"),
        uid_num.cast("string").alias("uid"),
        err.alias("validation_error"),
    )


def cdc_apply(
    state: DataFrame,
    users: DataFrame,
    events: DataFrame,
    instance: str,
    cfg: SyncConfig,
    ph15_instance: str | None = "ph15",
    ph15_users: DataFrame | None = None,
    suffix: str = "o=BMUKK",
    materialize=None,
):
    """Apply one event micro-batch. Returns (new_state, statuses_df).

    Statuses mirror the reference machine (F20/ST2): F invalid, W dup-uid /
    delete-of-existing / update-of-missing, else S.

    ``materialize`` (optional DataFrame→DataFrame) cuts lineage between the
    four internal stages — pass ``localCheckpoint`` (or a driver collect in
    tiny tests); chained batches otherwise compound the plan.
    """
    materialize = materialize or (lambda df: df)
    ev = validate_events(events)
    valid = ev.filter(F.col("validation_error").isNull())

    user_counts = users.groupBy(
        convert_column("pk_uniqueid").alias("uid")
    ).agg(F.count(F.lit(1)).alias("n_user_rows"))
    ev_u = valid.join(user_counts, "uid", "left")
    exists = F.col("n_user_rows").isNotNull()

    sync_uids = ev_u.filter(exists).select("uid").distinct()
    del_uids = ev_u.filter(~exists).select("uid").distinct().withColumnRenamed("uid", "uid")

    # --- upserts: every user row whose uid has a (valid) event
    sync_rows = users.join(
        sync_uids, convert_column("pk_uniqueid") == F.col("uid"), "left_semi"
    )
    entries = users_to_entries(sync_rows, instance, suffix)
    state1, renames, wt, sync_errors = sync_users_into_state(
        state, entries, instance, cfg, collect_writethrough=True
    )
    state1 = materialize(state1)
    renames = materialize(renames)
    wt = materialize(wt)
    sync_errors = materialize(sync_errors)

    # --- cross-instance write-through of selected changed attrs (ST11)
    if ph15_instance and instance != ph15_instance:
        state1 = materialize(apply_ph15_writethrough(state1, wt, ph15_instance, cfg))

    # --- deletes: events whose uid vanished from the db
    state2 = materialize(
        delete_uids(
            state1,
            del_uids,
            instance,
            cfg,
            hard=(instance == ph15_instance),
            ph15_instance=ph15_instance if instance != ph15_instance else None,
        )
    )

    # --- rename replay into the paired instance (ST9; etl.py:762-781)
    if ph15_instance and instance != ph15_instance:
        replay_users = ph15_users if ph15_users is not None else users
        rn = renames.select(F.col("oldcn").alias("bn")).unionByName(
            renames.select(F.col("newcn").alias("bn"))
        )
        replay_rows = replay_users.join(
            rn, F.trim(F.col("benutzername")) == F.col("bn"), "left_semi"
        )
        replay_entries = users_to_entries(replay_rows, ph15_instance, suffix)
        state2, _, _, _ = sync_users_into_state(
            state2, replay_entries, ph15_instance, cfg,
            skip_attrs=NOT_SYNCED_PH15,
        )
        state2 = materialize(state2)

    # --- status writeback (ST2)
    # Sync refusals (tombstone/uid conflict, ambiguous uid fallback) map to
    # status 'E' so apply_status_writeback's retry counter and the >10
    # poison-pill escalation engage (reference returns the error message
    # from sync_to_ldap → status E, etl.py:692-696).
    # min, not first: if one uid ever carries two distinct refusal
    # messages in a batch, first() would report whichever partition won
    # the race — min() pins the reported message deterministically
    err_by_uid = sync_errors.groupBy("uid").agg(
        F.min("error").alias("__sync_error")
    )
    dup = F.coalesce(F.col("n_user_rows"), F.lit(0)) > 1
    sync_err = F.col("__sync_error").isNotNull()
    status = (
        F.when(F.col("validation_error").isNotNull(), "F")
        .when(sync_err, "E")
        .when(dup, "W")
        .when(exists & (F.col("verb") == "delete"), "W")
        .when(~exists & (F.col("verb") != "delete"), "W")
        .otherwise("S")
    )
    message = (
        F.when(F.col("validation_error").isNotNull(), F.col("validation_error"))
        .when(sync_err, F.col("__sync_error"))
        .when(dup, F.concat(F.lit("Duplicate pk_uniqueid: "), F.col("uid")))
        .when(exists & (F.col("verb") == "delete"),
              F.concat(F.lit("Record "), F.col("uid"), F.lit(" existing in DB")))
        .when(~exists & (F.col("verb") != "delete"),
              F.concat(F.lit("Record "), F.col("uid"), F.lit(" not existing in DB")))
    )
    statuses = ev.join(
        ev_u.select("record_id", "n_user_rows"), "record_id", "left"
    ).join(F.broadcast(err_by_uid), "uid", "left").select(
        "record_id",
        status.alias("status"),
        message.alias("error_message"),
        F.lit(cfg.batch_ts).alias("read_time"),
    )
    return state2, statuses


def apply_status_writeback(eventlog: DataFrame, statuses: DataFrame) -> DataFrame:
    """The ack protocol (ST2): write processed statuses back onto the
    event store as a join-based update. Retry accounting (ST4): an 'E'
    status increments ``attempt``; attempt > 10 escalates to 'F' (the
    poison-pill cutoff, etl.py:692-696)."""
    e = eventlog.alias("e")
    s = statuses.alias("s")
    j = e.join(s, F.col("e.record_id") == F.col("s.record_id"), "left")
    hit = F.col("s.status").isNotNull()
    is_err = hit & (F.col("s.status") == "E")
    new_attempt = F.when(
        is_err, F.coalesce(F.col("e.attempt"), F.lit(0.0)) + 1
    ).otherwise(F.col("e.attempt"))
    esc_status = F.when(
        is_err & (F.coalesce(F.col("e.attempt"), F.lit(0.0)) > 10), F.lit("F")
    ).otherwise(F.col("s.status"))
    out = []
    for c in eventlog.columns:
        expr = F.col(f"e.{c}")
        if c == "status":
            expr = F.when(hit, F.rpad(esc_status, 3, " ")).otherwise(expr)
        elif c == "error_message":
            expr = F.when(hit, F.col("s.error_message")).otherwise(expr)
        elif c == "attempt":
            expr = new_attempt
        elif c == "read_time":
            expr = F.when(
                hit, F.to_timestamp(F.col("s.read_time"), "yyyyMMddHHmmss'Z'")
            ).otherwise(expr)
        out.append(expr.alias(c))
    return j.select(*out)
