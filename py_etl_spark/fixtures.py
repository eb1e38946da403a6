"""Test-fixture lifecycle helpers (the reference's testdriver.py as
DataFrame ops): changeset upsert into the users table and
delete-via-eventlog (testdriver.py:239-258, 149-161)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changeset(users: DataFrame, changeset: DataFrame) -> DataFrame:
    """Upsert changeset rows into users keyed by pk_uniqueid: existing uids
    get ALL columns replaced (empty → NULL), new uids are inserted
    (testdriver.py:update_data)."""
    cs = changeset.alias("c")
    u = users.alias("u")
    uids = changeset.select("pk_uniqueid").distinct()
    untouched = users.join(uids, "pk_uniqueid", "left_anti")
    # every existing row with the uid becomes the changeset row
    updated = (
        u.join(cs, F.col("u.pk_uniqueid") == F.col("c.pk_uniqueid"), "inner")
        .select(*[F.col(f"c.{c}").alias(c) for c in users.columns])
    )
    inserted = changeset.join(
        users.select("pk_uniqueid").distinct(), "pk_uniqueid", "left_anti"
    ).select(*users.columns)
    return untouched.unionByName(updated).unionByName(inserted)


def apply_eventlog_deletes(users: DataFrame, eventlog: DataFrame) -> DataFrame:
    """event_type=4 rows name uids to remove from the users table
    (testdriver.py:delete_records)."""
    doomed = (
        eventlog.filter(F.col("event_type").cast("long") == 4)
        .select(
            F.substring_index("table_key", "=", -1)
            .cast("double")
            .alias("pk_uniqueid")
        )
        .distinct()
    )
    return users.join(doomed, "pk_uniqueid", "left_anti")
