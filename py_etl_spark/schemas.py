"""Canonical schemas for the engine.

Two fixed relational schemas (the reference hard-codes them as field lists:
/root/reference/etl.py:211-264 and typed DDL /root/reference/testdriver.py:12-70),
the keyed target-state schema (the reference's LDAP tree, attribute inventory
/root/reference/ldaptest.py:12-47), and loaders for the driver's synthetic
star schema (TESTDATA.md).

Numeric keys arrive as doubles (Oracle NUMBER → ODBC float; ``4714.0``) and
are normalized to longs for join/partition keys — see
functions.conversions.from_db_number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# users table (reference: benutzer_alle_dirxml_v, 32 columns)
# Field list: /root/reference/etl.py:211-245; DDL /root/reference/testdriver.py:13-46
# --------------------------------------------------------------------------
# Declaration order matches the reference DDL / CSV header order exactly
# (positional CSV-with-schema reads depend on it).
USERS_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in [
        "person_nr_obf", "st_person_nr_obf", "org_einheiten", "emailadresse_b",
        "emailadresse_st", "bpk", "pm_sap_personalnummer", "schulkennzahlen",
        "funktionen",
    ]]
    + [T.StructField("pk_uniqueid", T.DoubleType(), True)]
    + [T.StructField(c, T.StringType(), True) for c in [
        "vorname", "nachname", "benutzername", "passwort", "benutzergruppen",
        "aktiv_st_person", "aktiv_a_person", "aktiv_b_person",
        "chipid_b", "chipid_st", "chipid_a",
        "mirfareid_b", "mirfareid_st", "mirfareid_a",
        "matrikelnummer", "account_status_b", "account_status_st",
        "account_status_a",
    ]]
    + [
        T.StructField("geburtsdatum", T.TimestampType(), True),
        T.StructField("person_nr", T.DoubleType(), True),
        T.StructField("st_person_nr", T.DoubleType(), True),
        T.StructField("ident_nr", T.DoubleType(), True),
    ]
)

USERS_COLS = [f.name for f in USERS_SCHEMA.fields]

# CHAR(3) columns: the reference DB pads these with trailing blanks, and the
# golden dumps preserve the padding ("J  "); CSV ingest must re-pad.
USERS_CHAR3_COLS = ["aktiv_st_person", "aktiv_a_person", "aktiv_b_person"]
EVENTLOG_CHAR3_COLS = ["status", "synch_online_flag", "transaction_flag", "admin_notify_flag"]

# --------------------------------------------------------------------------
# eventlog table (reference: eventlog_ph, 17 columns)
# Field list: /root/reference/etl.py:246-264; DDL /root/reference/testdriver.py:47-65
# --------------------------------------------------------------------------
EVENTLOG_SCHEMA = T.StructType([
    T.StructField("record_id", T.DoubleType(), True),       # PK, apply-order key
    T.StructField("table_key", T.StringType(), True),       # "pk_uniqueid=<n>"
    T.StructField("status", T.StringType(), True),          # N → S/W/E/F
    T.StructField("event_type", T.DoubleType(), True),      # 4=del 5=ins 6=upd
    T.StructField("event_time", T.TimestampType(), True),   # watermark column
    T.StructField("perpetrator", T.StringType(), True),
    T.StructField("table_name", T.StringType(), True),
    T.StructField("column_name", T.StringType(), True),
    T.StructField("old_value", T.StringType(), True),
    T.StructField("new_value", T.StringType(), True),
    T.StructField("synch_id", T.DoubleType(), True),
    T.StructField("synch_online_flag", T.StringType(), True),
    T.StructField("transaction_flag", T.StringType(), True),
    T.StructField("read_time", T.TimestampType(), True),
    T.StructField("error_message", T.StringType(), True),
    T.StructField("attempt", T.DoubleType(), True),         # retry counter, cap 10
    T.StructField("admin_notify_flag", T.StringType(), True),
])

EVENTLOG_COLS = [f.name for f in EVENTLOG_SCHEMA.fields]

# Decode table for event_type (/root/reference/etl.py:316-320).
EVENT_TYPES = {4: "delete", 5: "insert", 6: "update"}

# --------------------------------------------------------------------------
# db-column → target-attribute rename map (/root/reference/etl.py:266-299).
# --------------------------------------------------------------------------
DB_TO_TARGET_FIELD = {
    "account_status_a": "phonlineAccStWeiterbildung",
    "account_status_b": "phonlineAccStBediensteter",
    "account_status_st": "phonlineAccStStudent",
    "aktiv_a_person": "phonlineWeiterbildungAktiv",
    "aktiv_b_person": "phonlineBediensteterAktiv",
    "aktiv_st_person": "phonlineStudentAktiv",
    "benutzergruppen": "phonlineBenutzergruppe",
    "benutzername": "cn",
    "bpk": "phonlineBPK",
    "chipid_a": "phonlineChipIDWeiterbildung",
    "chipid_b": "phonlineChipIDBediensteter",
    "chipid_st": "phonlineChipIDStudent",
    "emailadresse_b": "phonlineEmailBediensteter",
    "emailadresse_st": "phonlineEmailStudent",
    "funktionen": "phonlineFunktionen",
    "geburtsdatum": "phonlineGebDatum",
    "ident_nr": "phonlineIdentNr",
    "matrikelnummer": "phonlineMatrikelnummer",
    "mirfareid_a": "phonlineMirfareIDWeiterbildung",
    "mirfareid_b": "phonlineMirfareIDBediensteter",
    "mirfareid_st": "phonlineMirfareIDStudent",
    "nachname": "sn",
    "org_einheiten": "phonlineOrgEinheiten",
    "passwort": "idnDistributionPassword",
    "person_nr": "phonlinePersonNr",
    "person_nr_obf": "phonlinePersonNrOBF",
    "pk_uniqueid": "phonlineUniqueId",
    "pm_sap_personalnummer": "phonlineSapPersnr",
    "schulkennzahlen": "phonlineSchulkennzahlen",
    "st_person_nr": "phonlinePersonNrStudent",
    "st_person_nr_obf": "phonlinePersonNrOBFStudent",
    "vorname": "givenName",
}

# Multi-valued target attributes (stored as array<string> in state).
# benutzergruppen/org_einheiten stay ';'-joined scalars — the reference's
# conversion registry does NOT split them (etl.py:301-315; golden dumps show
# "phonlineBenutzergruppe=B;A").
MULTI_VALUE_ATTRS = {
    "phonlineFunktionen",
    "phonlineSchulkennzahlen",
    "objectClass",
    "o",
    "ou",
}

# Account-status / active-flag attribute groups forced on tombstone
# (/root/reference/etl.py:322-332, 492-517).
ACC_STATUS_ATTRS = [
    "phonlineAccStBediensteter",
    "phonlineAccStStudent",
    "phonlineAccStWeiterbildung",
]
ACC_ACTIVE_ATTRS = [
    "phonlineWeiterbildungAktiv",
    "phonlineBediensteterAktiv",
    "phonlineStudentAktiv",
]

# --------------------------------------------------------------------------
# target state table (the reference's LDAP tree as a keyed columnar table)
# --------------------------------------------------------------------------
_STATE_SCALAR_ATTRS = [
    "phonlineUniqueId", "givenName", "sn", "idnDistributionPassword",
    "phonlineEmailBediensteter", "phonlineEmailStudent", "phonlineBPK",
    "phonlineSapPersnr", "phonlineStudentAktiv", "phonlineWeiterbildungAktiv",
    "phonlineBediensteterAktiv", "phonlineAccStBediensteter",
    "phonlineAccStStudent", "phonlineAccStWeiterbildung",
    "phonlineChipIDBediensteter", "phonlineChipIDStudent",
    "phonlineChipIDWeiterbildung", "phonlineMirfareIDBediensteter",
    "phonlineMirfareIDStudent", "phonlineMirfareIDWeiterbildung",
    "phonlineMatrikelnummer", "phonlineGebDatum", "phonlinePersonNr",
    "phonlinePersonNrStudent", "phonlineIdentNr", "phonlinePersonNrOBF",
    "phonlinePersonNrOBFStudent",
    "phonlineBenutzergruppe", "phonlineOrgEinheiten",
    "o", "ou", "userPassword",
    "idnDeleted", "idnSyncDiff", "etlTimestamp", "etdTimestamp",
]
_STATE_ARRAY_ATTRS = [
    "objectClass",
    "phonlineFunktionen", "phonlineSchulkennzahlen",
]

STATE_SCHEMA = T.StructType(
    [
        T.StructField("dn", T.StringType(), False),
        T.StructField("instance", T.StringType(), True),  # partition column
        T.StructField("cn", T.StringType(), True),
    ]
    + [T.StructField(a, T.StringType(), True) for a in _STATE_SCALAR_ATTRS]
    + [T.StructField(a, T.ArrayType(T.StringType()), True) for a in _STATE_ARRAY_ATTRS]
)

STATE_COLS = [f.name for f in STATE_SCHEMA.fields]

# --------------------------------------------------------------------------
# driver synthetic star schema (TESTDATA.md)
# --------------------------------------------------------------------------
STAR_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# Columns stored as TIMESTAMP(NANOS) in parquet; Spark (with
# legacy.parquet.nanosAsLong) surfaces them as raw-nanosecond longs, which
# loaders normalize back to TimestampType (µs).
_NANO_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic star-schema table (columnar parquet scan).

    Timestamp normalization: the generator has produced ``events.ts`` as
    TIMESTAMP(NANOS) (one round) and as naive TIMESTAMP(µs,
    isAdjustedToUTC=false) (another) — the latter surfaces as
    TIMESTAMP_NTZ under Spark 4's default inference. Every query treats
    ``ts`` as an instant (unix_millis, window(), casts), and the DuckDB
    oracle reads the same bytes as naive-UTC, so both forms normalize to
    TimestampType holding the stored value as a UTC instant.
    """
    # The caller may hand us a session built without our factory (the
    # external driver does). Timestamp rendering must match the UTC-naive
    # oracle, and TIMESTAMP(NANOS) parquet needs nanosAsLong or the scan
    # itself throws PARQUET_TYPE_ILLEGAL. All three confs are
    # runtime-settable, and all three are set UNCONDITIONALLY so schema
    # inference never depends on which table a session happened to load
    # first (the factory also sets them at build time — this is the
    # belt-and-suspenders for foreign sessions).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Naive-µs parquet must land as LTZ (stored micros = UTC instant),
    # not NTZ, so unix_millis/window() resolve and are tz-independent.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANO_TS_COLS.get(name, []):
        if c not in df.columns:
            continue
        if isinstance(df.schema[c].dataType, T.LongType):
            # integer div — float division would lose precision on ~1e18 ns
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(df.schema[c].dataType, T.TimestampNTZType):
            # Fallback if a future Spark drops the inference conf: with the
            # session tz pinned UTC above, NTZ→LTZ cast is naive-as-UTC.
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


def register_star_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every star table as a temp view for spark.sql queries."""
    for name in STAR_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
