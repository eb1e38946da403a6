"""Canonical tree dump + two-tree diff (the reference's test oracle).

``dump_tree`` reproduces the reference's ``iter`` output byte-for-byte
(ldaptest.py:287-300): DFS order with children sorted case-insensitively,
attributes sorted, Python-list rendering for multi-valued attrs,
userPassword redacted to its scheme prefix, etl/etd timestamps ignored.

``compare_trees`` is the sorted-merge full-outer diff (ldaptest.py:305-351):
"Only in lhs/rhs" rows plus per-attribute value diffs with ignore-lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from py_etl_spark.schemas import STATE_SCHEMA

# ldaptest.py:191-195
ITER_IGNORE = {"patchlevel", "etlTimestamp", "etdTimestamp"}
# ldaptest.py:171-189
COMPARE_IGNORE = ITER_IGNORE | {
    "objectClass", "ACL", "DirXML-Associations", "passwordUniqueRequired",
    "DirXML-PasswordSyncStatus", "DirXML-ADContext", "passwordMinimumLength",
    "DirXML-ADAliasName", "nspmDistributionPassword", "passwordAllowChange",
    "passwordRequired", "etdTimestamp", "etlTimestamp",
    "idnDistributionPassword", "userPassword",
}

# Attributes the directory schema declares multi-valued → ldap3 renders
# them as Python lists even for single values (golden dumps).
LIST_RENDERED = {"cn", "sn", "givenName", "o", "ou", "objectClass"}

_ATTR_COLS = [f.name for f in STATE_SCHEMA.fields if f.name not in ("dn", "instance")]
_ARRAY_COLS = {
    f.name for f in STATE_SCHEMA.fields if f.dataType.typeName() == "array"
}


def _render(attr: str, v) -> str | None:
    if v is None:
        return None
    if attr == "userPassword":
        return str(v).split("}", 1)[0] + "}"
    if attr == "idnDeleted":
        # boolean LDAP syntax: 'TRUE' decodes to Python True (golden: =True)
        return str(v == "TRUE") if v in ("TRUE", "FALSE") else str(v)
    if isinstance(v, list):
        return repr(v)
    if attr in LIST_RENDERED:
        return repr([v])
    return str(v)


def entry_line(row) -> str:
    parts = [row["dn"]]
    for attr in sorted(_ATTR_COLS):
        if attr in ITER_IGNORE:
            continue
        r = _render(attr, row[attr])
        if r is not None:
            parts.append(f"{attr}={r}")
    return " ".join(parts) + " "


def _dfs_key(dn: str) -> tuple[str, ...]:
    """DFS-preorder sort key: reversed RDN components, lowercased
    (children of each node sort case-insensitively — ldaptest.py:135)."""
    return tuple(c.lower() for c in reversed(dn.split(",")))


def _scope(state: DataFrame, base_dn: str) -> DataFrame:
    return state.filter(
        (F.col("dn") == base_dn) | F.col("dn").endswith("," + base_dn)
    )


def dfs_key_col(dn_col: Column) -> Column:
    """The DFS-preorder sort key as a Column: reversed dn components,
    lowercased — array ordering in Spark is elementwise like Python's
    tuple ordering, so ``orderBy(dfs_key_col(dn))`` reproduces
    :func:`_dfs_key`'s driver-side sort exactly."""
    return F.reverse(F.split(F.lower(dn_col), ","))


def dump_tree(state: DataFrame, base_dn: str) -> list[str]:
    """Golden-format dump of the subtree rooted at ``base_dn``.

    The sort/format runs driver-side over the *scoped* subtree — a test
    oracle for bounded trees. The data-plane path is
    :func:`dump_tree_stream` (distributed range-partitioned sort +
    partition-at-a-time streaming to the sink).
    """
    rows = _scope(state, base_dn).collect()
    rows.sort(key=lambda r: _dfs_key(r["dn"]))
    lines = [entry_line(r) for r in rows]
    return lines + ["", "", f"Count: {len(rows)}"]


def dump_to_string(state: DataFrame, base_dn: str) -> str:
    return "\n".join(dump_tree(state, base_dn)) + "\n"


def dump_tree_stream(state: DataFrame, base_dn: str, out) -> int:
    """Distributed golden dump: total order via Spark's range-partitioned
    sort (each partition sorts in parallel; partitions are ordered ranges),
    then ``toLocalIterator`` renders one partition at a time into ``out`` —
    the driver holds a single partition, never the tree. Byte-identical to
    :func:`dump_tree`. Returns the entry count (caller writes no footer
    twice)."""
    ordered = (
        _scope(state, base_dn)
        .withColumn("__k", dfs_key_col(F.col("dn")))
        .orderBy("__k")
        .drop("__k")
    )
    count = 0
    for row in ordered.toLocalIterator():
        out.write(entry_line(row) + "\n")
        count += 1
    out.write(f"\n\nCount: {count}\n")
    return count


def compare_trees(
    lhs: DataFrame,
    rhs: DataFrame,
    ignore: set[str] = COMPARE_IGNORE,
) -> DataFrame:
    """Full-outer structural diff on dn: 'only_lhs' / 'only_rhs' rows and
    per-attribute mismatches for common dns. Returns
    (dn, kind, attr, lhs_value, rhs_value)."""
    attrs = [a for a in _ATTR_COLS if a not in ignore]
    l = lhs.select("dn", *attrs).alias("l")
    r = rhs.select("dn", *attrs).alias("r")
    j = l.join(r, F.col("l.dn") == F.col("r.dn"), "full_outer")
    only = j.filter(F.col("l.dn").isNull() | F.col("r.dn").isNull()).select(
        F.coalesce(F.col("l.dn"), F.col("r.dn")).alias("dn"),
        F.when(F.col("r.dn").isNull(), "only_lhs").otherwise("only_rhs").alias("kind"),
        F.lit(None).cast("string").alias("attr"),
        F.lit(None).cast("string").alias("lhs_value"),
        F.lit(None).cast("string").alias("rhs_value"),
    )
    both = j.filter(F.col("l.dn").isNotNull() & F.col("r.dn").isNotNull())
    diffs = None
    for a in attrs:
        lv, rv = F.col(f"l.{a}"), F.col(f"r.{a}")
        d = both.filter(~lv.eqNullSafe(rv)).select(
            F.col("l.dn").alias("dn"),
            F.lit("attr_diff").alias("kind"),
            F.lit(a).alias("attr"),
            lv.cast("string").alias("lhs_value"),
            rv.cast("string").alias("rhs_value"),
        )
        diffs = d if diffs is None else diffs.unionByName(d)
    return only.unionByName(diffs) if diffs is not None else only


# -------------------------------------------------------------------------
# tree bootstrap (S10; etl.py:806-851 + server seed entries)
# -------------------------------------------------------------------------

def bootstrap_tree(
    spark: SparkSession,
    instances: list[str],
    sync_instances: list[str],
    suffix: str = "o=BMUKK",
    root_objectclass: list[str] | None = None,
) -> DataFrame:
    """Materialize the initial container hierarchy as state rows:
    root + per-instance ou=phNN / ou=user (+ ou=idnSync / ou=ETD for
    instances that run the sync)."""
    root_oc = root_objectclass or ["organization", "patchlevel"]
    o_val = suffix.split("=", 1)[1]
    rows: list[dict] = [
        dict(dn=suffix, o=o_val, objectClass=root_oc),
    ]
    for inst in instances:
        rows.append(
            dict(dn=f"ou={inst},{suffix}", instance=inst, ou=inst,
                 objectClass=["organizationalUnit"])
        )
        rows.append(
            dict(dn=f"ou=user,ou={inst},{suffix}", instance=inst, ou="user",
                 objectClass=["organizationalUnit"])
        )
        if inst in sync_instances:
            rows.append(
                dict(dn=f"ou=idnSync,ou={inst},{suffix}", instance=inst,
                     ou="idnSync", objectClass=["organizationalUnit"])
            )
            rows.append(
                dict(dn=f"ou=ETD,ou=idnSync,ou={inst},{suffix}", instance=inst,
                     ou="ETD", objectClass=["organizationalUnit"])
            )
    full = [
        {f.name: r.get(f.name) for f in STATE_SCHEMA.fields} for r in rows
    ]
    return spark.createDataFrame(full, STATE_SCHEMA)


def extra_entries(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Arbitrary fixture entries (e.g. a server's bootstrap accounts)."""
    full = [{f.name: r.get(f.name) for f in STATE_SCHEMA.fields} for r in rows]
    return spark.createDataFrame(full, STATE_SCHEMA)
