"""Explicit exchange width for row-multiplying map chains.

Three operators repartition COMPACT parent rows (documents, probe parts,
capped cells) with an explicit ``numPartitions`` before a stage that
multiplies rows by 100-700x (gram/shingle explodes, within-cell pair
joins). The explicit width is load-bearing twice over:

- without it, AQE's advisory-size coalescing (64 MB on the compact
  exchange) folds the map width down to a handful of partitions, and the
  multiplying chain above it serializes (measured: the fuzzy broadcast
  path's candidate stage ran on 25 skewed scan splits, 22.1 -> 14.5 s at
  the 100x replica once widened — SCALING.md §11);
- scan-split counts bound the multiplying stage's parallelism regardless
  of executor count, and the compact exchange is the cheapest place to
  buy full width.

Deriving that width is the subtle part (ADVICE r10). The two candidate
sources disagree under dynamic allocation:

- ``sparkContext.defaultParallelism`` — total cores of executors present
  AT PLAN-BUILD TIME. On a static cluster (and local[N]) this is the
  true core count; under dynamic allocation it can be a near-zero
  snapshot taken before executors scale up, silently under-provisioning
  the chain the width exists to parallelize.
- ``spark.sql.shuffle.partitions`` — the user's DECLARED reduce width,
  stable across allocation changes, but defaults to 200 regardless of
  cluster size.

``exchange_width`` takes the max of the two: on a static cluster sized
with the usual partitions >= cores rule both agree or partitions win;
under dynamic allocation the declared width floors the snapshot, so a
cold defaultParallelism can never throttle the chain. (A too-WIDE
compact exchange is cheap — extra empty tasks on doc-sized rows; a
too-NARROW one serializes the 100-700x stage above it.) On this repo's
local[32] test pin both sources are 32, so the derivation is
plan-identical to the r10 defaultParallelism spelling at every
measured operating point.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def exchange_width(spark: SparkSession) -> int:
    """Partition count for a compact exchange feeding a row-multiplying
    map chain: ``max(defaultParallelism, spark.sql.shuffle.partitions)``
    (see module docstring for why neither source alone survives dynamic
    allocation)."""
    declared = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(spark.sparkContext.defaultParallelism, declared)
