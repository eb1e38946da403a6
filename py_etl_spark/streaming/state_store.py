"""Versioned Parquet state store: atomic batch publication without driver
materialization.

The reference mutates its target store atomically per record
(etl.py:1055-1105); the Spark-shaped equivalent is atomic per *batch*:

- each committed state version lives in its own directory
  ``{root}/v=<n>/`` — written fully distributed by the executors, never
  round-tripped through the driver (the old read-then-overwrite of one
  path forced a ``collect()`` per batch to dodge the self-overwrite
  hazard — a driver OOM at real state sizes);
- a commit becomes visible by appending ``{root}/_manifest/<n>.json``
  AFTER the data lands. Readers resolve the highest manifest entry, so a
  crash mid-write leaves at most an orphan data directory (reclaimed by
  GC), never a torn table — the same append-then-publish idea as a Delta
  transaction log, in plain Parquet;
- old versions are garbage-collected asynchronously-safe (current and
  ``keep_versions - 1`` predecessors survive, so concurrent readers of the
  previous version never lose their files mid-scan).

All filesystem access goes through the Hadoop FileSystem API, so the same
code addresses local disk in tests and HDFS/S3A on a cluster.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession


class VersionedState:
    """Manifest-pointer versioned Parquet table.

    Layout::

        root/
          _manifest/00000000000000000042.json   <- highest = current
          v=41/part-*.parquet                    <- previous (kept for readers)
          v=42/part-*.parquet                    <- current
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        partition_by: tuple[str, ...] = ("instance",),
        keep_versions: int = 2,
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.partition_by = partition_by
        self.keep_versions = max(1, keep_versions)
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(self.root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    # -- manifest ---------------------------------------------------------

    def _manifest_dir(self):
        return self._Path(f"{self.root}/_manifest")

    def _list_versions(self) -> list[int]:
        d = self._manifest_dir()
        if not self._fs.exists(d):
            return []
        out = []
        for st in self._fs.listStatus(d):
            name = st.getPath().getName()
            if name.endswith(".json"):
                try:
                    out.append(int(name[: -len(".json")]))
                except ValueError:
                    pass
        return sorted(out)

    def current_version(self) -> int | None:
        versions = self._list_versions()
        return versions[-1] if versions else None

    def current_meta(self) -> dict | None:
        """The ``meta`` dict the current version was committed with, or
        None if the store is empty. This is the replay-detection hook:
        a foreachBatch sink stores its (lineage, batch_id) here and
        skips a micro-batch it already published (at-least-once
        delivery → exactly-once state effect)."""
        v = self.current_version()
        if v is None:
            return None
        return self._read_manifest(v).get("meta") or {}

    def _write_manifest(self, version: int, path: str, meta: dict | None) -> None:
        payload = json.dumps(
            {"version": version, "path": path, "meta": meta or {}}
        ).encode()
        p = self._Path(f"{self.root}/_manifest/{version:020d}.json")
        out = self._fs.create(p, False)  # create-exclusive: the commit arbiter
        try:
            out.write(bytearray(payload))
        finally:
            out.close()

    def _read_manifest(self, version: int) -> dict:
        p = self._Path(f"{self.root}/_manifest/{version:020d}.json")
        # py4j passes primitive arrays BY VALUE: a Java-side
        # ``read(byte[])`` fills a copy the Python caller never sees. Read
        # through the no-arg single-byte overload instead — manifests are
        # ~100 bytes, so the per-call overhead is irrelevant.
        stream = self._fs.open(p)
        try:
            data = bytearray()
            while True:
                b = stream.read()
                if b < 0:
                    break
                data.append(b)
            return json.loads(bytes(data).decode())
        finally:
            stream.close()

    # -- data -------------------------------------------------------------

    def _data_path(self, version: int) -> str:
        """Resolve a committed version's data directory via its manifest.

        Pre-multi-writer layouts stored data at ``v=<n>`` with no manifest
        ``path`` field; fall back to that, then to a ``v=<n>-*`` directory
        listing, for backward compatibility. Unlike the earlier silent
        fallback, an unreadable manifest is surfaced loudly — a read bug
        here must not reappear downstream as a phantom PATH_NOT_FOUND."""
        manifest_err: Exception | None = None
        path = None
        try:
            path = self._read_manifest(version).get("path")
        except Exception as exc:  # noqa: BLE001 - rethrown below if no fallback
            manifest_err = exc
        if path:
            return path
        legacy = f"{self.root}/v={version}"
        if self._fs.exists(self._Path(legacy)):
            return legacy
        prefix = f"v={version}-"
        candidates = [
            st.getPath().toString()
            for st in self._fs.listStatus(self._Path(self.root))
            if st.isDirectory() and st.getPath().getName().startswith(prefix)
        ]
        if len(candidates) == 1:
            return candidates[0]
        raise RuntimeError(
            f"cannot resolve data path for version {version} under "
            f"{self.root}: manifest "
            f"{'unreadable: ' + repr(manifest_err) if manifest_err else 'has no path field'}, "
            f"no legacy v={version} dir, {len(candidates)} v={version}-* candidates"
        )

    def exists(self) -> bool:
        return self.current_version() is not None

    def versions(self) -> list[int]:
        """Committed versions still on disk (oldest → newest)."""
        return self._list_versions()

    def read(self, version: int | None = None) -> DataFrame:
        """Read the current version, or time-travel to an older committed
        version still inside the GC retention window."""
        if version is None:
            version = self.current_version()
            if version is None:
                raise FileNotFoundError(f"no committed version under {self.root}")
        elif version not in self._list_versions():
            raise FileNotFoundError(
                f"version {version} not available under {self.root} "
                f"(retained: {self._list_versions()})"
            )
        return self.spark.read.parquet(self._data_path(version))

    def commit(self, df: DataFrame, meta: dict | None = None,
               max_retries: int = 16) -> int:
        """Publish ``df`` as the next version. Multi-writer safe:

        1. the data lands in a writer-UNIQUE directory
           ``v=<n>-<token>`` (two racing writers can never interleave
           files in one directory);
        2. the create-exclusive manifest append is the single commit
           arbiter — exactly one writer wins version ``n``;
        3. a loser re-reads ``current_version()``, bumps, RENAMES its
           data directory to carry the new attempt's version prefix (a
           cheap same-filesystem metadata op on its writer-private dir),
           and re-attempts the manifest pointing at the renamed directory.
           The retry is manifest+rename only — the distributed write is
           never repeated. Re-stamping the prefix keeps the dir ahead of
           every competitor's GC horizon: ``_gc`` only sweeps ``v=<n>-*``
           dirs whose prefix fell BEHIND the oldest retained manifest, so
           even a writer that loses ``keep_versions + k`` consecutive
           races cannot have its data swept before its manifest lands.

        A crash between (1) and (2) leaves an unreferenced data dir that
        ``_gc`` reclaims once its version prefix falls behind the GC
        retention window.
        """
        v = (self.current_version() or 0) + 1 if self.exists() else 0
        token = uuid.uuid4().hex[:8]
        data_path = f"{self.root}/v={v}-{token}"
        writer = df.write.mode("errorifexists")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(data_path)
        for _ in range(max_retries):
            try:
                self._write_manifest(v, data_path, meta)
                break
            except Exception:
                cur = self.current_version()
                nxt = (cur + 1) if cur is not None else 0
                if nxt <= v:  # manifest create failed for a non-race reason
                    raise
                v = nxt
                restamped = f"{self.root}/v={v}-{token}"
                if self._fs.rename(self._Path(data_path), self._Path(restamped)):
                    data_path = restamped
        else:
            raise RuntimeError(
                f"commit lost {max_retries} consecutive manifest races under "
                f"{self.root}"
            )
        self._gc()
        return v

    def _gc(self) -> None:
        """Drop versions older than the newest ``keep_versions`` (manifest
        entry first, then data — a reader that already resolved an old
        manifest may still be scanning; keeping one spare version covers
        in-flight reads). Also reclaims orphan data dirs from crashed
        commits, but ONLY those whose version prefix is older than the
        oldest retained manifest — an in-flight writer's dir always
        carries a prefix >= current+1, so it can never be swept."""
        versions = self._list_versions()
        retained = versions[-self.keep_versions:]
        for v in versions[: -self.keep_versions]:
            path = self._data_path(v)
            self._fs.delete(
                self._Path(f"{self.root}/_manifest/{v:020d}.json"), False
            )
            self._fs.delete(self._Path(path), True)
        if not retained:
            return
        live = set()
        for v in retained:
            try:
                live.add(self._Path(self._data_path(v)).getName())
            except Exception:
                pass
        root = self._Path(self.root)
        for st in self._fs.listStatus(root):
            name = st.getPath().getName()
            if not st.isDirectory() or not name.startswith("v="):
                continue
            if name in live:
                continue
            try:
                prefix = int(name[2:].split("-", 1)[0])
            except ValueError:
                continue
            if prefix < retained[0]:
                self._fs.delete(st.getPath(), True)


def change_feed(
    store: "VersionedState",
    key_cols: tuple[str, ...],
    from_version: int | None = None,
    to_version: int | None = None,
) -> DataFrame:
    """Change-data-feed between two committed versions — the Delta-CDF
    analog for :class:`VersionedState`: a full-outer join of the two
    snapshots on ``key_cols`` classifying every key as
    ``insert`` / ``delete`` / ``update`` (with the changed column names)
    and dropping unchanged rows.

    This is what downstream consumers poll instead of re-reading the
    whole table: the output is proportional to the CHANGE volume, and
    because both sides are versions of the same table (same layout, same
    partitioning), the join keys co-locate and AQE keeps the exchange
    minimal. Column comparison is null-safe (``<=>``), so NULL→value and
    value→NULL both register as changes.

    Output: ``key_cols + (change_type, changed_cols)`` where
    ``changed_cols`` is the sorted array of differing column names
    (empty for insert/delete).
    """
    from pyspark.sql import functions as F

    hi = store.current_version() if to_version is None else to_version
    if from_version is None:
        # default: diff against the previous retained version — "what
        # changed in the latest commit", the polling consumer's question
        older = [v for v in store.versions() if v < hi]
        if not older:
            raise ValueError(
                f"change_feed needs two versions; only {hi} exists"
            )
        lo = older[-1]
    else:
        lo = from_version
    # read each side exactly once (a commit landing mid-call must not
    # shift which snapshot is being diffed)
    old_df = store.read(lo)
    new_df = store.read(hi)
    # presence markers instead of key-null tests: a NULL key value in the
    # data must not masquerade as an absent row
    old = old_df.withColumn("__op", F.lit(True)).alias("o")
    new = new_df.withColumn("__np", F.lit(True)).alias("n")
    shared = [
        c
        for c in old_df.columns
        if c in set(new_df.columns) and c not in key_cols
    ]
    cond = None
    for k in key_cols:
        e = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = e if cond is None else cond & e
    j = old.join(new, cond, "full_outer")
    old_present = F.col("o.__op").isNotNull()
    new_present = F.col("n.__np").isNotNull()
    diffs = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")),
                        F.lit(c),
                    )
                    for c in shared
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    ctype = (
        F.when(~old_present, F.lit("insert"))
        .when(~new_present, F.lit("delete"))
        .when(F.size(diffs) > 0, F.lit("update"))
    )
    return (
        j.select(
            *[
                F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k)
                for k in key_cols
            ],
            ctype.alias("change_type"),
            F.when(
                old_present & new_present, diffs
            ).otherwise(F.array().cast("array<string>")).alias("changed_cols"),
        )
        .filter(F.col("change_type").isNotNull())
    )
