"""Table maintenance: small-file compaction.

Every incremental pipeline (micro-batch CDC, daily crawl appends,
streaming sinks) accretes files far smaller than a scan-efficient split:
at 100 TB, a million 5 MB files cost ~8× the scan setup of 128 MB files
and crush the driver's file-listing phase. Compaction rewrites a
directory into ``ceil(total_bytes / target_bytes)`` files — paid once,
repaid on every subsequent scan.

Two entry points:

- :func:`compact_parquet` — rewrite a plain parquet directory INTO A NEW
  path (never in place: Spark cannot atomically overwrite a directory it
  is reading, and a mid-rewrite crash must not destroy the only copy);
- :func:`compact_state` — compact a :class:`~py_etl_spark.streaming.
  state_store.VersionedState` by committing the repartitioned current
  version as a NEW version: the manifest append makes the swap atomic,
  readers of the old version keep their files (GC retention), and a
  crash mid-compaction leaves only an orphan data dir for GC.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under ``path`` via the Hadoop FS API
    (driver-side metadata listing only — no data read)."""
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    n, total = 0, 0
    it = fs.listFiles(Path(path), True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        n += 1
        total += st.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 << 20,
) -> dict:
    """Rewrite ``src_path`` into ``dst_path`` with scan-sized files.

    Uses ``repartition(n)`` (round-robin) rather than ``coalesce``:
    coalesce merges without a shuffle but inherits upstream skew — one
    oversized input partition stays oversized; the single rebalance
    shuffle is the price of uniformly-sized output. Returns
    ``{files_before, bytes, files_after_target}``.
    """
    if src_path.rstrip("/") == dst_path.rstrip("/"):
        raise ValueError("compact_parquet writes to a NEW path; "
                         "swap directories after the rewrite commits")
    files, total = _dir_stats(spark, src_path)
    n = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src_path).repartition(n).write.mode(
        "errorifexists"
    ).parquet(dst_path)
    return {"files_before": files, "bytes": total, "files_after_target": n}


def compact_state(store, target_bytes: int = 128 << 20, meta: dict | None = None) -> int:
    """Compact a VersionedState's current version into a new version.

    The read and the write address different directories by construction
    (each version has its own), so this is safe against the self-overwrite
    hazard, atomic via the manifest append, and concurrent readers are
    protected by GC retention. Returns the new version number.
    """
    df = store.read()
    root_ver = store.current_version()
    data_path = store._data_path(root_ver)
    _files, total = _dir_stats(store.spark, data_path)
    n = max(1, math.ceil(total / target_bytes))
    return store.commit(
        df.repartition(n),
        meta={**(meta or {}), "compacted_from": root_ver},
    )


def analyze_table(df, cols: list[str], ndv_k: int = 256):
    """ANALYZE-style per-column statistics in one logical pass — the
    stats layer that feeds NDV-based planning (see
    ``sketch.kmv_join_size_estimate``): for each requested column, row
    count, non-null count, typed min/max (rendered as strings), and a
    KMV distinct-count estimate (exact below ``ndv_k``).

    Plan shape: typed min/max/counts collapse into ONE global aggregate
    row (partial agg per partition, single final row — metadata); NDV
    runs through :func:`~py_etl_spark.operators.sketch.kmv_distinct`
    over a map-side unpivot of (column, value-hash), so the only
    data-sized shuffles are the KMV distinct + per-column top-k. The
    |cols|-way unpivot blowup is the standard ANALYZE cost; restrict
    ``cols`` to what planning needs.

    Output: one row per column —
    ``(column, n_rows, n_nonnull, ndv_est, ndv_kept, min_value,
    max_value)``.
    """
    from pyspark.sql import functions as F

    from py_etl_spark.operators.sketch import kmv_distinct

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"nn_{c}"),
            F.min(F.col(c)).cast("string").alias(f"mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"mx_{c}"),
        ]
    onerow = df.agg(*aggs)
    percol = onerow.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"nn_{c}").alias("n_nonnull"),
                        F.col(f"mn_{c}").alias("min_value"),
                        F.col(f"mx_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    unpivot = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*").filter(F.col("v").isNotNull())
    ndv = kmv_distinct(unpivot, "v", k=ndv_k, group_cols=("column",)).select(
        "column",
        F.col("estimate").alias("ndv_est"),
        F.col("n_kept").alias("ndv_kept"),
    )
    # an all-NULL column has no NDV row after the isNotNull unpivot
    # filter — report 0 (matching the SQL mirror), not NULL
    return percol.join(ndv, "column", "left").select(
        "column",
        "n_rows",
        "n_nonnull",
        F.coalesce(F.col("ndv_est"), F.lit(0)).cast("long").alias("ndv_est"),
        F.coalesce(F.col("ndv_kept"), F.lit(0)).cast("long").alias(
            "ndv_kept"
        ),
        "min_value",
        "max_value",
    )


def agg_partial(df, keys: list[str], sum_cols: list[str] = (),
                min_cols: list[str] = (), max_cols: list[str] = ()):
    """Partial-aggregate shape for incremental view maintenance: per
    key-group, a row count plus sums/mins/maxes. The OUTPUT of this is
    what gets persisted as the materialized aggregate — counts and sums
    are linear, min/max are idempotent-monotone, so partials from any
    data partitioning combine exactly (the same algebra Spark's own
    map-side partial aggregation relies on, lifted to cross-JOB scope).
    """
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    aggs += [F.min(c).alias(f"min_{c}") for c in min_cols]
    aggs += [F.max(c).alias(f"max_{c}") for c in max_cols]
    return df.groupBy(*keys).agg(*aggs)


def incremental_agg_merge(snapshot, delta, keys: list[str]):
    """Fold a new batch's partial aggregate into the maintained one:
    union + re-combine. Cost is O(|groups| + |batch groups|) — the fact
    table is NEVER re-read; a daily refresh over 100 TB touches only the
    day's partition plus the (tiny) aggregate table. Columns follow the
    :func:`agg_partial` naming convention; both inputs must share it.

    The rebuild-equivalence guarantee (merge(partial(A), partial(B)) ==
    partial(A ∪ B)) is pinned by the ``agg_incremental_monthly_revenue``
    oracle on real data and the unit test on adversarial splits.
    """
    from pyspark.sql import functions as F

    cols = [c for c in snapshot.columns if c not in keys]
    both = snapshot.select(*keys, *cols).unionByName(
        delta.select(*keys, *cols)
    )
    aggs = []
    for c in cols:
        if c == "n" or c.startswith("sum_"):
            aggs.append(F.sum(c).alias(c))
        elif c.startswith("min_"):
            aggs.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            aggs.append(F.max(c).alias(c))
        else:
            raise ValueError(f"unmergeable aggregate column: {c}")
    return both.groupBy(*keys).agg(*aggs)
