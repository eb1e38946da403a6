"""Data-layout optimization: Z-order (Morton) clustering for multi-column
scan pruning.

Parquet pruning works off per-file / per-row-group min-max statistics: a
filter can skip a file only when the file's value RANGE for that column is
narrow. Sorting by one column gives perfect ranges for it and useless ones
for every other column; interleaving the bits of several columns (Morton
order — the same idea behind Delta's ``OPTIMIZE ZORDER BY``) gives every
participating column locality at once, so selective filters on ANY of them
skip most files. At 100 TB the difference between "scan 2 %" and "scan
100 %" IS the query time — this operator is how the engine writes data so
its own scans can prune.

The key computation is pure integer arithmetic (shift/mask/or), fully
inside whole-stage codegen and reproducible by any engine; the layout step
is ``repartitionByRange`` on the key (one range shuffle over sampled
bounds) + ``sortWithinPartitions`` — after which one output file covers
one compact Z-curve segment, i.e. a small hyper-rectangle of the key
space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of each column into one long.

    Columns must be non-negative integers (bucket/rank/clamp upstream —
    the low-bit truncation here wraps rather than errors, which preserves
    locality for values within range and degrades gracefully outside it).
    Bit i of column j lands at position ``i * n_cols + j``; with
    ``bits * n_cols ≤ 63`` the result fits a signed long.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        raise ValueError(f"{bits} bits × {n} cols exceeds a signed long")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * n + j)
    return key


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "__zkey",
) -> DataFrame:
    """Re-cluster ``df`` along the Z-curve of ``cols``: range-partition on
    the Morton key (Spark samples the key distribution for balanced
    bounds), sort within partitions, and drop the key. Write the result
    with any sink; every output file then carries tight min-max ranges for
    ALL of ``cols``."""
    keyed = df.withColumn(key_col, zorder_key([F.col(c) for c in cols], bits))
    parted = (
        keyed.repartitionByRange(num_partitions, key_col)
        if num_partitions
        else keyed.repartitionByRange(key_col)
    )
    return parted.sortWithinPartitions(key_col).drop(key_col)


def file_minmax_stats(
    spark, path: str, cols: list[str]
) -> "DataFrame":
    """Data-skipping index: per-FILE min/max/null/row statistics for the
    given columns — the persistable complement to :func:`zorder_layout`
    (clustering only pays off when a planner can consult tight per-file
    bounds and skip files; parquet footers hold these stats, but a
    standalone stats table lets ANY engine — or a driver-side planner
    deciding which partitions to even list — prune without touching
    footers, the Delta/Iceberg data-skipping idea in plain parquet).

    One scan of the target columns, one groupBy on the file name
    (map-side partial agg; output is file-count-sized metadata).
    Combine with :func:`zorder_key`: after Z-ordering, each file's
    [min, max] boxes are tight, so a point/range predicate intersects
    few boxes — `prune_files` below turns that into a file list.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), *cols
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
        ]
    return df.groupBy("file").agg(*aggs)


def prune_files(
    stats: "DataFrame", predicates: dict[str, tuple]
) -> list[str]:
    """Driver-side file pruning from a :func:`file_minmax_stats` table:
    keep files whose [min, max] box intersects every ``col: (lo, hi)``
    range (None bounds are open). Returns the surviving file list —
    feed it back to ``spark.read.parquet(*files)`` for a scan that never
    opens the skipped files. The stats table is metadata-sized, so the
    collect is bounded by file count, not data."""
    from pyspark.sql import functions as F

    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            cond = cond & (F.col(f"max_{c}") >= lo)
        if hi is not None:
            cond = cond & (F.col(f"min_{c}") <= hi)
    return [r.file for r in stats.filter(cond).select("file").collect()]
