"""Structured-Streaming driver for the CDC sync (SURVEY.md §2.9).

The reference's ``etl`` action is a hand-rolled micro-batch loop: poll
eventlog every 20 s, ≤100 events per batch, skip the sleep while a backlog
drains, ack each event with a status column (etl.py:393-423, 576-733). Here
the same batch kernel (:func:`py_etl_spark.operators.refsync.cdc_apply`)
runs under ``foreachBatch``:

- trigger(processingTime=...)      ≙ the 20 s poll (backlog draining is
  inherent — a new micro-batch starts as soon as the previous one ends)
- maxFilesPerTrigger / limit       ≙ max_records rate cap
- checkpointLocation               ≙ the status-ack protocol's restart
  safety (exactly-once over the event source)
- withWatermark('event_time', …)   ≙ the read-only high-water-mark mode
  (ST3) — no status writeback, just a monotone cut
- StreamingQueryListener           ≙ the /tmp/liveness heartbeat (ST13)
"""

from __future__ import annotations

import json
import logging
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from py_etl_spark.operators.refsync import SyncConfig, cdc_apply
from py_etl_spark.schemas import EVENTLOG_SCHEMA
from py_etl_spark.streaming.state_store import VersionedState


@dataclass
class StreamResult:
    batches: int
    statuses: list


def _checkpoint_run_token(checkpoint: str) -> str:
    """Per-checkpoint-RUN token, persisted inside the checkpoint dir.

    Spark's batch_id counter is only meaningful relative to one
    checkpoint's WAL: wipe the dir and batch_ids restart at 0. A replay
    guard keyed on the checkpoint PATH alone would then treat the new
    run's first batches as replays of the old run's and silently skip
    them against a retained state store. Writing a uuid file on first
    use — same lifecycle as the WAL itself — ties the lineage key to
    the WAL instance: survive a plain driver restart (token file still
    there), fence a wipe-and-recreate (fresh token → fresh lineage).
    """
    token_file = os.path.join(checkpoint, "_run_token")
    try:
        with open(token_file) as fh:
            tok = fh.read().strip()
            if tok:
                return tok
    except OSError:
        pass
    os.makedirs(checkpoint, exist_ok=True)
    tok = uuid.uuid4().hex
    # Write the token to a private tmp file first, then publish with
    # os.link — an atomic create-if-absent that only ever exposes a
    # COMPLETE token. The earlier O_EXCL-open-then-write left a window
    # where a losing driver could read the winner's still-empty file and
    # return "" as its run token, defeating the replay-guard lineage key
    # (the read path above treats an empty token as invalid). link also
    # keeps the no-clobber property: exactly one creator wins; on EEXIST
    # adopt the winner's (necessarily complete) token.
    tmp_file = f"{token_file}.tmp.{tok}"
    with open(tmp_file, "w") as fh:
        fh.write(tok)
    try:
        os.link(tmp_file, token_file)
    except FileExistsError:
        with open(token_file) as fh:
            tok = fh.read().strip()
    finally:
        os.unlink(tmp_file)
    return tok


class CdcStreamDriver:
    """Runs the CDC kernel over a stream of eventlog micro-batches.

    State lives in a :class:`VersionedState` store: every batch writes the
    next version to a fresh directory (fully distributed — state rows never
    pass through the driver) and publishes it with an atomic manifest
    append; superseded versions are garbage-collected. A pre-existing plain
    Parquet table at ``state_path`` is migrated to version 0 on first use.
    """

    def __init__(
        self,
        spark: SparkSession,
        users: DataFrame,
        state_path: str,
        instance: str,
        cfg: SyncConfig | None = None,
        heartbeat_path: str | None = None,
        keep_versions: int = 2,
        ts_for_batch=None,
        prepare_batch=None,
    ):
        self.spark = spark
        self.users = users
        self.state_path = state_path
        self.store = VersionedState(
            spark, state_path, partition_by=("instance",), keep_versions=keep_versions
        )
        self.instance = instance
        self.cfg = cfg or SyncConfig()
        self.heartbeat_path = heartbeat_path
        # ts_for_batch(batch_id) -> str: exact per-batch write stamp
        # (defaults to deriving one from cfg.batch_ts + batch_id).
        self.ts_for_batch = ts_for_batch
        # prepare_batch(driver, state, batch_id) -> state: the seam for
        # the maintenance the reference performs INSIDE its polling loop
        # between applying event batches (etl.py:393-423): etd-done
        # acks, state garbage collection, and refreshing the source-db
        # users snapshot (reassign ``driver.users``). Runs after the
        # replay guard, so a replayed (skipped) batch never re-runs it.
        self.prepare_batch = prepare_batch
        self.statuses: list = []
        self.batches = 0
        # Replay-detection lineage: foreachBatch is AT-LEAST-ONCE — a
        # driver killed between the state commit and the checkpoint's
        # offset commit redelivers the same (batch_id, input). batch_id
        # is only meaningful per checkpoint RUN, so the lineage key is
        # checkpoint path + a run token persisted INSIDE the checkpoint
        # dir (run_file_stream sets it). The token is what makes a
        # wipe-and-recreate of the checkpoint dir against a retained
        # state store safe: batch_ids restart at 0, but the fresh token
        # changes the lineage key, so the guard can never mistake the
        # new run's batch 0..N for replays of the old run's (which
        # would silently drop data). Without a checkpoint there is no
        # replay contract and the guard is off.
        self._lineage: str | None = None
        self._migrate_legacy_layout()

    def _migrate_legacy_layout(self) -> None:
        """One-time: adopt a plain Parquet table at ``state_path`` as v=0
        (distributed read → distributed write; no driver round-trip)."""
        if self.store.exists():
            return
        try:
            legacy = self.spark.read.parquet(self.state_path)
        except Exception:
            return  # empty/new store: first commit will create v=0
        self.store.commit(legacy, {"migrated": True})
        # Retire the legacy files so a partition-discovering read of the
        # root can't see two copies (the commit above already scanned them).
        Path, fs = self.store._Path, self.store._fs
        for st in fs.listStatus(Path(self.state_path)):
            name = st.getPath().getName()
            if not (name.startswith("v=") or name.startswith("_")):
                fs.delete(st.getPath(), True)

    def _beat(self) -> None:
        if self.heartbeat_path:
            with open(self.heartbeat_path, "w") as f:
                json.dump({"ts": time.time(), "batches": self.batches}, f)

    def process_batch(self, events: DataFrame, batch_id: int) -> None:
        if self._lineage is not None and self.store.exists():
            meta = self.store.current_meta() or {}
            if (
                meta.get("lineage") == self._lineage
                and isinstance(meta.get("batch_id"), int)
                and batch_id <= meta["batch_id"]
            ):
                # Replayed micro-batch: the state version for this
                # (checkpoint, batch_id) already published — a crash
                # landed between the manifest append and the
                # checkpoint's offset commit. Skip: same input (the
                # checkpoint WAL pins the file set per batch_id), so
                # re-applying would double-apply retries/tombstone GC.
                # Status acks are NOT re-emitted — the ack protocol is
                # at-least-once (ST2), matching the reference. Every
                # skip is logged so a mis-skip (guard bug, manual state
                # surgery) is observable in the driver log, never silent.
                logging.getLogger(__name__).warning(
                    "replay guard: skipping already-committed batch_id=%s "
                    "(state at batch_id=%s, lineage=%s)",
                    batch_id,
                    meta["batch_id"],
                    self._lineage,
                )
                self.batches += 1
                self._beat()
                return
        state = self.store.read()
        if self.prepare_batch is not None:
            state = self.prepare_batch(self, state, batch_id)
        if self.ts_for_batch is not None:
            bts = self.ts_for_batch(batch_id)
        elif self.cfg.batch_ts.endswith("Z"):
            bts = f"{self.cfg.batch_ts[:-1]}{batch_id:04d}Z"
        else:
            bts = f"{self.cfg.batch_ts}-{batch_id}"
        cfg = SyncConfig(
            key=self.cfg.key,
            iv_hex=self.cfg.iv_hex,
            batch_ts=bts,
        )
        new_state, statuses = cdc_apply(state, self.users, events, self.instance, cfg)
        # Statuses are the per-event acks (bounded by the batch rate cap) —
        # the only thing the driver materializes. The state itself goes
        # executor → parquet v=<n+1>, published by the manifest append.
        self.statuses.append(statuses.collect())
        self.store.commit(
            new_state,
            {"batch_id": batch_id, "lineage": self._lineage},
        )
        self.batches += 1
        self._beat()

    def read_state(self) -> DataFrame:
        """Current committed state (manifest-resolved version)."""
        return self.store.read()

    def run_file_stream(
        self,
        events_dir: str,
        max_files_per_trigger: int = 1,
        processing_time: str | None = None,
        checkpoint: str | None = None,
    ):
        """Consume eventlog files appearing in a directory (the batch-file
        equivalent of the reference's polling query)."""
        self._lineage = (
            f"{checkpoint}#{_checkpoint_run_token(checkpoint)}"
            if checkpoint
            else None
        )
        stream = (
            self.spark.readStream.schema(EVENTLOG_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .csv(events_dir, sep=";", header=True)
        )
        writer = stream.writeStream.foreachBatch(self.process_batch)
        if processing_time:
            writer = writer.trigger(processingTime=processing_time)
        else:
            writer = writer.trigger(availableNow=True)
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        return writer.start()


def check_liveness(
    heartbeat_path: str, sleeptime_s: float = 20.0, grace_s: float = 600.0
) -> bool:
    """Heartbeat freshness check (reference: liveness:7-21): healthy iff
    the heartbeat file was written within 2·sleeptime + grace seconds."""
    import os

    try:
        age = time.time() - os.path.getmtime(heartbeat_path)
    except OSError:
        return False
    return age <= 2 * sleeptime_s + grace_s


def watermark_windowed_counts(
    events: DataFrame, delay: str = "10 minutes", window: str = "1 hour"
) -> DataFrame:
    """Read-only watermark mode (ST3): late-data-tolerant windowed counts.
    Works on both batch and streaming DataFrames."""
    return (
        events.withWatermark("event_time", delay)
        .groupBy(F.window("event_time", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
