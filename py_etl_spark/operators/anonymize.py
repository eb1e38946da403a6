"""Key-consistent pseudonymization (reference: aux-scripts/anonymize.py).

The reference replaces sensitive user fields with random-looking values
that are *consistent per (column, source value)* — the same input maps to
the same replacement across rows and files (anonymize.py:66-67, 95-104) —
while preserving structure: email domains survive (112-120), birthdates
keep their year (137-143), hex ids stay hex (52-58), bpk stays base64
(136).

Spark-first design: replacements are *derived deterministically* from a
keyed hash of the source value (sha2 over salt‖value), so consistency holds
with NO shared mapping table and no shuffle — every value is computed
map-side. (The exact reference semantics — an explicit value→replacement
dictionary — is also available via ``build_mapping`` + join for audits.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _digest(col: Column, salt: str) -> Column:
    return F.sha2(F.concat(F.lit(salt), F.lit("\x00"), col.cast("string")), 256)


def _hex_slice(col: Column, salt: str, start: int, n: int) -> Column:
    return F.substring(_digest(col, salt), start, n)


def pseudo_word(col: Column, salt: str, length: int = 8) -> Column:
    """Lowercase pseudo-word derived from the value (NULL-preserving)."""
    d = _digest(col, salt)
    chars = [
        F.element_at(
            F.split(F.lit(_ALPHA), ""),
            (F.conv(F.substring(d, 2 * i + 1, 2), 16, 10).cast("int") % 26) + 1,
        )
        for i in range(length)
    ]
    return F.when(col.isNotNull(), F.concat(*chars))


def pseudo_email(col: Column, salt: str) -> Column:
    """Replace the local part, keep the domain (F17; anonymize.py:112-120)."""
    domain = F.substring_index(col, "@", -1)
    has_at = col.contains("@")
    local = pseudo_word(col, salt + ":email", 10)
    return F.when(
        col.isNotNull() & has_at, F.concat(local, F.lit("@"), domain)
    ).otherwise(pseudo_word(col, salt + ":email", 10))


def pseudo_hex(col: Column, salt: str, length: int = 16) -> Column:
    """Hex id of fixed width (mirfare/obf ids; anonymize.py:52-58)."""
    return F.when(col.isNotNull(), F.lower(_hex_slice(col, salt + ":hex", 1, length)))


def pseudo_base64ish(col: Column, salt: str) -> Column:
    """bpk-style base64 text (anonymize.py:136)."""
    return F.when(
        col.isNotNull(),
        F.concat(F.base64(F.unhex(_hex_slice(col, salt + ":b64", 1, 40))), F.lit("=")),
    )


def pseudo_number(col: Column, salt: str, digits: int = 6) -> Column:
    """Numeric id with the same magnitude class."""
    n = F.conv(_hex_slice(col, salt + ":num", 1, 12), 16, 10).cast("long") % (
        10**digits
    )
    return F.when(col.isNotNull(), n.cast("double"))


def scramble_birthdate(col: Column, salt: str) -> Column:
    """Random month (1-12) and day (1-28), keep the year (F18;
    anonymize.py:137-143)."""
    d = _digest(col.cast("string"), salt + ":dob")
    month = (F.conv(F.substring(d, 1, 4), 16, 10).cast("int") % 12) + 1
    day = (F.conv(F.substring(d, 5, 4), 16, 10).cast("int") % 28) + 1
    return F.when(
        col.isNotNull(),
        F.make_timestamp(F.year(col), month, day, F.lit(0), F.lit(0), F.lit(0)),
    )


# column → strategy for the reference's users table (anonymize.py main map)
DEFAULT_STRATEGIES = {
    "vorname": ("word", 7),
    "nachname": ("word", 9),
    "benutzername": ("word", 10),
    "passwort": ("word", 12),
    "emailadresse_b": ("email", None),
    "emailadresse_st": ("email", None),
    "bpk": ("b64", None),
    "person_nr_obf": ("hex", 16),
    "st_person_nr_obf": ("hex", 16),
    "mirfareid_b": ("hex", 8),
    "mirfareid_st": ("hex", 8),
    "mirfareid_a": ("hex", 8),
    "chipid_b": ("num", 16),
    "chipid_st": ("num", 16),
    "chipid_a": ("num", 16),
    "matrikelnummer": ("num", 8),
    "geburtsdatum": ("dob", None),
}


def anonymize(df: DataFrame, salt: str = "s3cr3t", strategies=None) -> DataFrame:
    """Apply key-consistent pseudonymization column-wise."""
    strategies = strategies or DEFAULT_STRATEGIES
    out = []
    for c in df.columns:
        col = F.col(c)
        strat = strategies.get(c)
        if strat is None:
            out.append(col.alias(c))
            continue
        kind, arg = strat
        salt_c = f"{salt}:{c}"
        if kind == "word":
            e = pseudo_word(col, salt_c, arg or 8)
        elif kind == "email":
            e = pseudo_email(col, salt_c)
        elif kind == "hex":
            e = pseudo_hex(col, salt_c, arg or 16)
        elif kind == "b64":
            e = pseudo_base64ish(col, salt_c)
        elif kind == "num":
            e = pseudo_number(col, salt_c, arg or 6)
        elif kind == "dob":
            e = scramble_birthdate(col, salt_c)
        else:
            raise ValueError(f"unknown strategy {kind} for {c}")
        out.append(e.cast(df.schema[c].dataType).alias(c))
    return df.select(*out)


def build_mapping(df: DataFrame, column: str, salt: str = "s3cr3t") -> DataFrame:
    """Exact reference semantics: explicit distinct-value → replacement
    mapping table (joinable, auditable)."""
    strat = DEFAULT_STRATEGIES.get(column, ("word", 8))
    kind = strat[0]
    value = F.col("value")
    if kind == "email":
        repl = pseudo_email(value, f"{salt}:{column}")
    elif kind == "hex":
        repl = pseudo_hex(value, f"{salt}:{column}", strat[1] or 16)
    else:
        repl = pseudo_word(value, f"{salt}:{column}", strat[1] or 8)
    return (
        df.select(F.col(column).alias("value"))
        .filter(value.isNotNull())
        .distinct()
        .select("value", repl.alias("replacement"))
    )
