"""Scale-safe total ordering / partition-boundary operators.

The reference computes keyset partition boundaries by walking every 1000th
primary key in a sorted scan (etl.py:446-457) and renders dumps in one
global order. On Spark, a ``row_number()``/``ntile()`` window with no
PARTITION BY funnels the whole table through a single partition — correct,
but a scale-killer at 100 TB. This module provides the distributed
equivalents:

- :func:`with_global_position` — exact global rank via the zipWithIndex
  pattern: deterministic range buckets + per-bucket window + driver-side
  cumulative offsets (driver traffic is O(num_buckets) ints, never rows).
- :func:`exact_ntile_boundaries` — exact ``ntile(k)`` upper bounds as order
  statistics over :func:`with_global_position` (matches the SQL ``ntile``
  oracle bit-for-bit).
- :func:`approx_partition_boundaries` — the production path for the
  reference's every-Nth-PK use case: ``approxQuantile`` range bounds, one
  pass, no total sort at all.

Determinism note: we do NOT use ``repartitionByRange`` for the bucket
assignment. RangePartitioner re-samples per physical planning, so two jobs
over the same lazy plan can disagree on boundaries; instead the bucket id
is a pure expression over the row's own sort key (struct comparisons
against literal boundaries), so recomputation is always consistent and no
persist/checkpoint is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "with_global_position",
    "exact_ntile_boundaries",
    "approx_partition_boundaries",
]


def _key_struct(order_cols: list[Column]) -> Column:
    return F.struct(*[c.alias(f"k{i}") for i, c in enumerate(order_cols)])


def _lit_struct(values) -> Column:
    return F.struct(*[F.lit(v).alias(f"k{i}") for i, v in enumerate(values)])


def with_global_position(
    df: DataFrame,
    order_cols: list[Column],
    position_col: str = "position",
    num_buckets: int = 32,
    sample_per_bucket: int = 200,
    seed: int = 42,
    n: int | None = None,
) -> DataFrame:
    """Exact 1-based global rank by ``order_cols`` without a global window.

    zipWithIndex pattern, all-DataFrame:

    1. sample ≤ ``num_buckets * sample_per_bucket`` sort keys to the driver
       and pick ``num_buckets - 1`` range boundaries;
    2. assign each row a bucket id with a deterministic struct-comparison
       expression (pure function of the row — safe to recompute);
    3. ``row_number()`` windowed PER BUCKET (no exchange-to-one);
    4. bucket counts (≤ ``num_buckets`` ints) → cumulative offsets,
       broadcast-joined back.

    Ties across bucket boundaries are fine as long as ``order_cols`` is a
    total order (include a unique tiebreaker column).

    ``n``: the input's exact row count, when the caller already knows it
    — skips this function's own ``count()`` action (one full pass of
    ``df``'s lineage). The POSITIONS are invariant to everything
    downstream of the count (it only sizes the sample fraction), so a
    wrong-but-positive n cannot corrupt results, only bucket balance.
    """
    key = _key_struct(order_cols)
    tagged = df.withColumn("__key", key)

    if n is None:
        n = tagged.count()
    if n == 0:
        return df.withColumn(position_col, F.lit(None).cast("long"))

    target = num_buckets * sample_per_bucket
    fraction = min(1.0, target / n)
    sampled = sorted(
        r["__key"] for r in tagged.select("__key").sample(fraction, seed=seed).collect()
    )
    boundaries = []
    if sampled and num_buckets > 1:
        step = len(sampled) / num_buckets
        seen = set()
        for i in range(1, num_buckets):
            b = tuple(sampled[min(int(i * step), len(sampled) - 1)])
            if b not in seen:
                seen.add(b)
                boundaries.append(b)

    pid = F.lit(0)
    for b in boundaries:
        pid = pid + F.when(F.col("__key") > _lit_struct(b), 1).otherwise(0)
    bucketed = tagged.withColumn("__pid", pid)

    w = Window.partitionBy("__pid").orderBy(F.col("__key"))
    local = bucketed.withColumn("__local", F.row_number().over(w))

    # Bucket counts: ≤ num_buckets rows — driver-side metadata, like
    # approxQuantile's result, not a data collect.
    counts = bucketed.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt")).collect()
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], acc))
        acc += row["__cnt"]
    # Offsets attach as a ≤ num_buckets-entry literal map lookup (r12) —
    # same values the old broadcast-join-back produced, with no join in
    # the plan at all.
    off_map = F.create_map(
        *[
            c
            for pid_v, off_v in offsets
            for c in (F.lit(pid_v), F.lit(off_v).cast("long"))
        ]
    )
    return (
        local.withColumn(
            position_col,
            (off_map[F.col("__pid")] + F.col("__local")).cast("long"),
        )
        .drop("__pid", "__key", "__local")
    )


def with_global_positions(
    df: DataFrame,
    rankings: list[tuple[str, list[Column]]],
    num_buckets: int = 32,
    sample_per_bucket: int = 200,
    seed: int = 42,
    n: int | None = None,
) -> DataFrame:
    """SEVERAL exact global ranks over the same rows, driver-fused (r12).

    ``rankings``: list of ``(position_col, order_cols)``. Produces the
    bit-identical positions of calling :func:`with_global_position` once
    per ranking (exact ranks are invariant to bucketing), but the driver
    round-trips collapse from ``3 × len(rankings)`` jobs to at most 3
    TOTAL (guide §5 — at bench scale the driver dispatch, not the
    executors, was the wall for the rank-ensemble query):

    1. one ``count()`` (skipped when ``n`` is given) — doubles as the
       materialization job when ``df`` is a lazy localCheckpoint;
    2. ONE boundary-sample job collecting every ranking's sort key from
       the same sampled rows;
    3. ONE bucket-count job — each ranking's bucket histogram rides a
       single exploded (ranking, bucket) aggregate.

    The final plan chains one per-bucket ``row_number`` window per
    ranking over ONE pass of ``df`` (no self-joins to re-assemble
    per-ranking frames), attaching offsets as literal map lookups.
    """
    keys = [(pc, _key_struct(cols)) for pc, cols in rankings]
    tagged = df.select(
        "*", *[k.alias(f"__key_{pc}") for pc, k in keys]
    )
    if n is None:
        n = tagged.count()
    if n == 0:
        out = df
        for pc, _ in rankings:
            out = out.withColumn(pc, F.lit(None).cast("long"))
        return out

    target = num_buckets * sample_per_bucket
    fraction = min(1.0, target / n)
    sampled_rows = (
        tagged.select(*[f"__key_{pc}" for pc, _ in keys])
        .sample(fraction, seed=seed)
        .collect()
    )

    def boundaries_of(pc: str) -> list[tuple]:
        sampled = sorted(r[f"__key_{pc}"] for r in sampled_rows)
        bs: list[tuple] = []
        if sampled and num_buckets > 1:
            step = len(sampled) / num_buckets
            seen = set()
            for i in range(1, num_buckets):
                b = tuple(sampled[min(int(i * step), len(sampled) - 1)])
                if b not in seen:
                    seen.add(b)
                    bs.append(b)
        return bs

    pid_cols = {}
    for pc, _ in keys:
        pid = F.lit(0)
        for b in boundaries_of(pc):
            pid = pid + F.when(
                F.col(f"__key_{pc}") > _lit_struct(b), 1
            ).otherwise(0)
        pid_cols[pc] = pid
    bucketed = tagged.select(
        "*", *[pid_cols[pc].alias(f"__pid_{pc}") for pc, _ in keys]
    )

    # ONE job for every ranking's bucket histogram: explode to
    # (ranking_index, pid) pairs — ≤ len(rankings)·num_buckets rows of
    # driver metadata.
    rp = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("r"), F.col(f"__pid_{pc}").alias("pid")
                )
                for i, (pc, _) in enumerate(keys)
            ]
        )
    ).alias("rp")
    counts = (
        bucketed.select(rp)
        .groupBy("rp.r", "rp.pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .collect()
    )
    out = bucketed
    for i, (pc, _) in enumerate(keys):
        offsets, acc = [], 0
        for row in sorted(
            (r for r in counts if r["r"] == i), key=lambda r: r["pid"]
        ):
            offsets.append((row["pid"], acc))
            acc += row["__cnt"]
        off_map = F.create_map(
            *[
                c
                for pid_v, off_v in offsets
                for c in (F.lit(pid_v), F.lit(off_v).cast("long"))
            ]
        )
        w = Window.partitionBy(f"__pid_{pc}").orderBy(F.col(f"__key_{pc}"))
        out = out.withColumn(
            pc,
            (off_map[F.col(f"__pid_{pc}")] + F.row_number().over(w)).cast(
                "long"
            ),
        )
    drop = [f"__key_{pc}" for pc, _ in keys] + [f"__pid_{pc}" for pc, _ in keys]
    return out.drop(*drop)


def exact_ntile_boundaries(
    df: DataFrame,
    order_col: str,
    k: int = 32,
    tile_col: str = "tile",
    bound_col: str = "upper_bound",
) -> DataFrame:
    """Exact ``ntile(k)`` upper bounds, fully distributed.

    ``ntile(k)`` over N rows gives the first ``N % k`` tiles ``N//k + 1``
    rows and the rest ``N//k``; the upper bound of tile *i* is therefore the
    order statistic at the cumulative tile size. We compute global positions
    with :func:`with_global_position` and keep only the ≤ k boundary rows.
    Matches ``SELECT tile, max(x) ... GROUP BY ntile(k)`` bit-for-bit.

    Reference semantics: etl.py:446-457 (every-1000th-PK keyset bounds).
    """
    n = df.count()
    if n == 0:
        return df.sparkSession.createDataFrame(
            [], f"{tile_col} BIGINT, {bound_col} BIGINT"
        )
    q, r = divmod(n, k)
    cum, bounds = 0, []
    for i in range(1, k + 1):
        size = q + (1 if i <= r else 0)
        if size == 0:
            continue
        cum += size
        bounds.append((cum, i))
    bounds_df = df.sparkSession.createDataFrame(bounds, "position BIGINT, tile BIGINT")

    ranked = with_global_position(
        df.select(order_col), [F.col(order_col)], position_col="position",
        n=n,  # r12: this function already counted df — one pass, not two
    )
    return (
        ranked.join(F.broadcast(bounds_df), "position")
        .select(
            F.col("tile").alias(tile_col),
            F.col(order_col).cast("long").alias(bound_col),
        )
    )


def approx_partition_boundaries(
    df: DataFrame, col: str, k: int = 32, relative_error: float = 0.001
) -> list[float]:
    """Production path for keyset range bounds: one ``approxQuantile`` pass
    (Greenwald-Khanna sketch, no sort, no shuffle of data rows), returning
    ``k - 1`` interior bounds. The reference's every-1000th-PK walk
    (etl.py:446-457) needs bounds that *roughly* equalize work per range —
    approximate quantiles are exactly that, at 100 TB for the cost of a
    single scan.
    """
    probs = [i / k for i in range(1, k)]
    return df.stat.approxQuantile(col, probs, relative_error)


def exact_kth_value(
    df,
    col: str,
    k: int,
    bins: int = 256,
    direct_threshold: int = 100_000,
    max_rounds: int = 64,
):
    """EXACT k-th smallest value of ``col`` (k is 1-based) without ever
    sorting the dataset globally — the distributed selection algorithm:

    1. one agg finds (min, max, n) — k is validated against n;
    2. each round histograms the CURRENT candidate range into ``bins``
       equal-width counters (one map-side-combined 1-row agg), walks
       the counts on the driver to find the bin containing the target
       rank, and narrows the range to that bin (adjusting the rank by
       the mass below it);
    3. when the surviving slice is ≤ ``direct_threshold`` rows the
       remainder resolves with a ``sort().limit(rank)`` over that slice
       only — a task-local top-k, never a global sort.

    Each round moves only ``bins`` longs to the driver, so a 100 TB
    column costs O(rounds) scans of a shrinking predicate (the range
    filter pushes down to parquet min/max, so later rounds touch only
    matching row groups) and never shuffles data at all. Ties and
    repeated values are handled by the rank bookkeeping, not value
    uniqueness. Returns the exact value as a Python float.
    """
    from pyspark.sql import functions as F

    base = df.filter(F.col(col).isNotNull()).select(F.col(col).cast("double").alias("v"))
    lo_hi_n = base.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("v").alias("n")
    ).collect()[0]
    lo, hi, n = lo_hi_n["lo"], lo_hi_n["hi"], lo_hi_n["n"]
    if n == 0 or not (1 <= k <= n):
        raise ValueError(f"k={k} out of range for n={n}")
    rank = k
    cur = base
    cnt = n  # seeded by the validation agg — round 1 must not rescan
    for _ in range(max_rounds):
        # (cnt, lo, hi) describe the CURRENT slice: the validation agg
        # seeds round 1, and each later round's values come from the
        # end-of-round stats agg below — exactly one full-slice scan
        # per round, never a redundant second scan of the same slice.
        if lo == hi:
            return lo
        if cnt <= direct_threshold:
            row = (
                cur.sort("v")
                .limit(rank)
                .sort(F.col("v").desc())
                .limit(1)
                .collect()
            )
            return row[0]["v"]
        width = (hi - lo) / bins
        if width == 0:
            return lo
        b = F.least(
            F.greatest(
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
                F.lit(0),
            ),
            F.lit(bins - 1),
        )
        counts_row = (
            cur.groupBy(b.alias("b")).count().collect()
        )
        counts = {r["b"]: r["count"] for r in counts_row}
        acc = 0
        for i in range(bins):
            c = counts.get(i, 0)
            if acc + c >= rank:
                rank -= acc
                new_lo = lo + i * width
                new_hi = hi if i == bins - 1 else lo + (i + 1) * width
                # Narrow with the SAME binning expression used for the
                # counts (b == i), so the count pass and the filter pass
                # agree bit-for-bit — at bin boundaries floating-point
                # rounding can make floor((v-lo)/width) and the range
                # predicates v >= new_lo / v < new_hi classify a value
                # differently, which would silently shift the tracked
                # rank (ADVICE r04). The range predicate stays, widened
                # by one bin width on each side, purely so the parquet
                # min/max pushdown still prunes row groups; it is a
                # strict superset of the bin, never the arbiter.
                cur = cur.filter(
                    (F.col("v") >= new_lo - width)
                    & (F.col("v") <= new_hi + width)
                    & (b == i)
                )
                lo, hi = new_lo, new_hi
                break
            acc += c
        else:  # pragma: no cover — rank accounted within bins by invariant
            raise AssertionError("rank walked past all bins")
        # end-of-round stats over the NARROWED slice: count for the
        # direct-path check, and the slice's ACTUAL min/max —
        # tightening [lo, hi] to the data both converges faster and
        # terminates the duplicate-heavy case (a value with
        # multiplicity above direct_threshold makes min == max long
        # before the range width underflows; without this the loop
        # burned max_rounds)
        stats = cur.agg(
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        ).collect()[0]
        cnt, lo, hi = stats["n"], stats["lo"], stats["hi"]
    raise RuntimeError("selection did not converge (pathological floats)")
