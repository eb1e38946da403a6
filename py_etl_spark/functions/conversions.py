"""Per-column conversion expressions (the reference's scalar-function surface).

The reference dispatches per-column Python converters from a dict registry
(``data_conversion``, /root/reference/etl.py:301-315) applied row-at-a-time
(/root/reference/etl.py:1199-1204). Here every converter is a pure Spark
``Column`` expression — JVM-side, whole-stage-codegen'd, no Python in the hot
path. The registry shape (column name → expression factory) is preserved as
the engine's extension point.

Function numbering (F1..F21) follows SURVEY.md §2.8.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# F1 — timestamp → "YYYY-MM-DD HH:MM:SS.0" string (trailing literal ".0";
# reference renders str(datetime) of a second-precision value,
# /root/reference/etl.py:156-165).
def from_db_date(c: Column | str) -> Column:
    c = _col(c)
    return F.when(
        c.isNotNull(), F.concat(F.date_format(c, "yyyy-MM-dd HH:mm:ss"), F.lit(".0"))
    )


# F2 — float key → int-string ("4714.0" → "4714"), None-preserving
# (/root/reference/etl.py:167-171).
def from_db_number(c: Column | str) -> Column:
    return _col(c).cast("long").cast("string")


# F3 — rstrip; empty → NULL (/root/reference/etl.py:173-183).
def from_db_rstrip(c: Column | str) -> Column:
    return F.nullif(F.rtrim(_col(c)), F.lit(""))


# F4 — strip; empty → NULL (/root/reference/etl.py:185-195).
def from_db_strip(c: Column | str) -> Column:
    return F.nullif(F.trim(_col(c)), F.lit(""))


# F5 — ';'-separated multi-value string → array<string>; empty → NULL
# (/root/reference/etl.py:197-207).
def from_multi(c: Column | str) -> Column:
    c = _col(c)
    stripped = F.trim(c)
    return F.when(stripped != "", F.split(stripped, ";"))


# F7 — UTC LDAP GeneralizedTime "yyyyMMddHHmmssZ"
# (/root/reference/ldaptimestamp.py:29-33).
def generalized_time(c: Column | str) -> Column:
    return F.date_format(_col(c), "yyyyMMddHHmmss'Z'")


# F8 — "pk_uniqueid=<n>" → long key (/root/reference/etl.py:641-644).
def key_from_table_key(c: Column | str) -> Column:
    return F.substring_index(_col(c), "=", -1).cast("double").cast("long")


# F9 — event_type code → verb (/root/reference/etl.py:316-320).
def event_type_name(c: Column | str) -> Column:
    code = _col(c).cast("long")
    return (
        F.when(code == 4, "delete")
        .when(code == 5, "insert")
        .when(code == 6, "update")
    )


# F11 — dn construction 'cn=<cn>,<base_dn>' (/root/reference/etl.py:1095).
def dn_for_cn(cn: Column | str, base_dn: Column | str) -> Column:
    base = F.lit(base_dn) if isinstance(base_dn, str) else base_dn
    return F.concat(F.lit("cn="), _col(cn), F.lit(","), base)


# F12 — rewrite the instance RDN inside a dn (ou=phNN → ou=<target>;
# /root/reference/etl.py:1222-1227).
def rewrite_instance_in_dn(dn: Column | str, target_instance: str) -> Column:
    return F.regexp_replace(_col(dn), r"ou=ph\d+", f"ou={target_instance}")


# F16 — sort-normalize a ';'-joined multi-value string
# (/root/reference/ldaptest.py:164-166).
def multi_value_normalize(c: Column | str) -> Column:
    return F.array_join(F.array_sort(F.split(_col(c), ";")), ";")


# F21 — redact a password hash to its scheme prefix "{CRYPT}"
# (/root/reference/ldaptest.py:294-297).
def redact_password_hash(c: Column | str) -> Column:
    c = _col(c)
    return F.when(c.isNotNull(), F.regexp_extract(c, r"^\{[^}]*\}", 0))


# The registry: column → expression factory, mirroring the reference's
# data_conversion dict (/root/reference/etl.py:301-315). passwort's AES
# conversion is bound at runtime by the merge kernel (it needs key+IV config),
# exactly as the reference binds it in the connector ctor
# (/root/reference/etl.py:358-360).
CONVERSIONS: dict[str, Callable[[Column | str], Column]] = {
    "geburtsdatum": from_db_date,
    "ident_nr": from_db_number,
    "person_nr": from_db_number,
    "st_person_nr": from_db_number,
    "pk_uniqueid": from_db_number,
    "funktionen": from_multi,
    "schulkennzahlen": from_multi,
    "emailadresse_b": from_db_rstrip,
    "emailadresse_st": from_db_rstrip,
    "benutzername": from_db_strip,
    "vorname": from_db_rstrip,
    "nachname": from_db_rstrip,
    "pm_sap_personalnummer": from_db_rstrip,
}


def convert_column(name: str, c: Column | str | None = None) -> Column:
    """Apply the registered conversion for ``name`` (identity if none)."""
    expr = _col(c if c is not None else name)
    fn = CONVERSIONS.get(name)
    return fn(expr) if fn else expr
