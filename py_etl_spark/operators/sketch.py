"""KMV (k-minimum-values) distinct-count sketch: deterministic, mergeable,
engine-portable.

Spark's native ``approx_count_distinct`` (HyperLogLog++) is the everyday
answer, but its register layout is engine-private: the estimate can't be
reproduced by another engine, unioned across separately-built sketches by
plain SQL, or oracle-checked bit-for-bit. KMV (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream") trades a little accuracy for
exactly those properties:

- the sketch is just the k smallest *distinct* hash values of the column —
  any engine that can hash and top-k can build, merge, and read it;
- hashes come from the portable md5-prefix family (same as MinHash /
  winnowing / deterministic_split), so DuckDB reproduces every value;
- two sketches merge by "union, re-take k smallest" — associative and
  idempotent, the shape a 100 TB rollup tree (per-file → per-partition →
  global) needs;
- the estimator is deterministic: with the k-th smallest distinct hash at
  fraction ``kth / 2^60`` of the hash space, est = ``(k-1) / (kth / 2^60)``
  (and exact when fewer than k distinct values exist).

Relative error is ~``1 / sqrt(k-2)`` (~13 % at k=64); the point here is
portability + mergeability + determinism, not beating HLL's constants.

Plan: one distinct-aggregate shuffle on (group, hash) — map-side partial
dedup makes the shuffle per-distinct-value — then a per-group top-k window
over DISTINCT hashes only, landing on the same grouping keys. The window
sorts each group's distinct hashes; at extreme per-group cardinality swap
stage 2 for a per-partition local top-k + re-top-k rollup (the merge
property above is what makes that refactor safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from py_etl_spark.functions.numeric import float_round

# 60-bit hash space: 15 hex chars of md5. Fits a signed long with headroom,
# and 2^60 is exactly representable in a double, so the estimate's
# float arithmetic is bit-identical across engines.
HASH_SPACE = float(1 << 60)


def _portable_hash60(col) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _hash_pair(col) -> tuple[F.Column, F.Column]:
    """Two independent 60-bit md5 slices — the Kirsch-Mitzenmacher
    (h1, h2) pair shared by the Bloom and count-min builders and their
    point probes (one definition keeps build and probe provably
    consistent)."""
    md5v = F.md5(col.cast("string"))
    h1 = F.conv(F.substring(md5v, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5v, 16, 15), 16, 10).cast("long")
    return h1, h2


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 64,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-group KMV sketch + distinct-count estimate.

    Output: ``group_cols + (n_kept, kth_hash, estimate, sketch)`` where
    ``sketch`` is the ascending array of the ≤k smallest distinct hashes
    (the mergeable state), ``n_kept = len(sketch)`` and ``estimate`` is
    exact below k.
    """
    if k < 3:
        raise ValueError("k must be ≥ 3 for the KMV estimator")
    groups = [F.col(g) for g in group_cols]
    hashed = df.select(
        *groups, _portable_hash60(F.col(col)).alias("h")
    ).distinct()
    w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy("h")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("kth_hash"))
    )
    return (
        topk.groupBy(*[F.col(g) for g in group_cols])
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("kth_hash"),
            F.array_sort(F.collect_list("h")).alias("sketch"),
        )
        .withColumn("estimate", est.cast("long"))
    )


def kmv_merge_sketches(sketches: list[list[int]], k: int) -> list[int]:
    """Driver-side reference merge: union of sketch arrays, k smallest
    distinct. Associativity/idempotence of this tiny function is what makes
    the distributed rollup-tree refactor legitimate; tests pin
    ``merge(sketch(A), sketch(B)) == sketch(A ∪ B)``."""
    pool = set()
    for s in sketches:
        pool.update(s)
    return sorted(pool)[:k]


def kmv_estimate(sketch: list[int], k: int) -> float:
    """Estimate from a merged sketch (same formula as the DataFrame path)."""
    if len(sketch) < k:
        return float(len(sketch))
    return round(float(k - 1) * HASH_SPACE / float(sketch[k - 1]))


def kmv_rollup(
    sketches: DataFrame,
    k: int,
    rollup_cols: tuple[str, ...] = (),
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge per-group KMV sketches up a level: explode the sketch
    arrays, dedupe, re-take the k smallest per rollup group.

    This is the rollup-tree edge :func:`kmv_distinct` promises — a
    100 TB distinct-count runs as per-partition sketches → per-table →
    global WITHOUT ever re-touching raw values. The merged result is
    bit-identical to building one sketch over the union (pinned by the
    ``kmv_distinct_rollup`` oracle and the unit merge test), because
    "k smallest of the union of k-smallest sets" = "k smallest of the
    union" whenever each input kept ITS k smallest.

    Input: output rows of :func:`kmv_distinct` (finer grouping); output:
    same shape at ``rollup_cols`` granularity.

    A global rollup (``rollup_cols=()``) does put its window on one
    partition — deliberately: the input is at most (finer groups × k)
    hashes, sketch METADATA bounded independent of data volume, the same
    scale class as the broadcast-scalar subquery patterns.
    """
    groups = [F.col(g) for g in rollup_cols]
    exploded = sketches.select(
        *groups, F.explode(F.col(sketch_col)).alias("h")
    ).distinct()
    w = Window.partitionBy(*[F.col(g) for g in rollup_cols]).orderBy("h")
    topk = exploded.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("kth_hash"))
    )
    return (
        topk.groupBy(*[F.col(g) for g in rollup_cols])
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("kth_hash"),
            F.array_sort(F.collect_list("h")).alias(sketch_col),
        )
        .withColumn("estimate", est.cast("long"))
    )


# ---- Bloom filter ---------------------------------------------------------

# 63 usable bits per word (bit index 0..62): keeps every shift result
# positive in BOTH engines — DuckDB raises on BIGINT `1 << 63` and signed
# wraparound would differ anyway. One wasted bit per word is noise.
_BLOOM_BITS_PER_WORD = 63


def bloom_build(
    df: DataFrame,
    col: str,
    words: int = 16,
    k_hashes: int = 4,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-group Bloom filter over ``col`` as ``array<long>`` — the
    semi-join pruning primitive: build on the SMALL side's keys, ship the
    array (words·8 bytes) to the big side's scan as a literal/broadcast,
    and drop non-members before the real join's shuffle. Spark's own
    runtime bloom pruning (InjectRuntimeFilter) does this transparently;
    this explicit, engine-portable version is for cross-JOB pruning — the
    filter can be persisted beside the table, read by any engine, and
    merged across partitions (bitwise OR — ``bit_or`` is commutative, so
    the build is shuffle-order-independent and deterministic).

    Positions via Kirsch-Mitzenmacher double hashing over two independent
    63-bit md5 slices: ``pos_i = (h1 + i·h2) mod (words·63)``.

    Output: ``group_cols + (bloom, n_bits_set)``. FPR ≈ ``(1-e^{-kn/m})^k``
    with m = words·63; size for your n upstream.
    """
    m = words * _BLOOM_BITS_PER_WORD
    h1, h2 = _hash_pair(F.col(col))
    groups = [F.col(g) for g in group_cols]
    pos = df.select(
        *groups,
        F.explode(
            F.array(*[F.pmod(h1 + i * h2, F.lit(m)) for i in range(k_hashes)])
        ).alias("p"),
    )
    # pow(2, bit) instead of shiftleft: the PySpark shiftleft helper takes
    # only a literal shift amount, and 2^bit for bit ≤ 62 is exactly
    # representable in a double, so the cast back to long is lossless
    word_rows = (
        pos.select(
            *groups,
            (F.col("p") / _BLOOM_BITS_PER_WORD).cast("long").alias("w"),
            F.pow(
                F.lit(2.0),
                F.pmod(F.col("p"), F.lit(_BLOOM_BITS_PER_WORD)),
            ).cast("long").alias("mask"),
        )
        .groupBy(*groups, F.col("w"))
        .agg(F.bit_or("mask").alias("b"))
    )
    # gap-fill absent words with 0 and order by word index
    entries = F.map_from_entries(
        F.collect_list(F.struct(F.col("w"), F.col("b")))
    )
    bloom = F.transform(
        F.sequence(F.lit(0), F.lit(words - 1)),
        lambda i: F.coalesce(
            F.try_element_at(entries, i.cast("long")), F.lit(0).cast("long")
        ),
    )
    return (
        word_rows.groupBy(*[F.col(g) for g in group_cols])
        .agg(bloom.alias("bloom"))
        .withColumn(
            "n_bits_set",
            F.aggregate(
                F.transform(F.col("bloom"), F.bit_count),
                F.lit(0),
                lambda acc, v: acc + v,
            ).cast("long"),
        )
    )


def _half_up(x: float) -> int:
    """floor(x + 0.5): pinned rounding for driver-side estimates.
    Python's built-in round() is banker's (half-to-even) while DuckDB's
    and Spark's round are half-up — any driver-computed value that an
    oracle re-derives must use ONE convention, so both sides say
    floor(x + 0.5) explicitly."""
    import math

    return int(math.floor(x + 0.5))


def kmv_set_estimates(
    sa: list[int], sb: list[int], k: int
) -> dict[str, int]:
    """Set-operation estimates from two KMV sketches (Beyer et al. 2007,
    "On synopses for distinct-value estimation"): merge to the k smallest
    of the union; the fraction of merged hashes present in BOTH sketches
    estimates Jaccard; intersection = Jaccard × union. Driver-side over
    sketch arrays (metadata, ≤ 2k longs) — the distributed build stays
    in :func:`kmv_distinct`.

    Returns ``{'est_a','est_b','est_union','est_intersection'}`` (all
    ints; exact when the inputs are below k — a complete sketch IS the
    value set).
    """
    seta, setb = set(sa), set(sb)
    union = sorted(seta | setb)[:k]
    big_k = len(union)
    cnt_both = sum(1 for h in union if h in seta and h in setb)
    if big_k < k:
        est_union = big_k
        est_inter = cnt_both
    else:
        kth = union[-1]
        est_union = _half_up(float(k - 1) * HASH_SPACE / float(kth))
        est_inter = _half_up(
            float(cnt_both) / float(big_k) * float(est_union)
        )
    def side(s: list[int]) -> int:
        # same estimator as kmv_estimate but with pinned half-up rounding
        if len(s) < k:
            return len(s)
        return _half_up(float(k - 1) * HASH_SPACE / float(s[k - 1]))

    return {
        "est_a": side(sa),
        "est_b": side(sb),
        "est_union": est_union,
        "est_intersection": est_inter,
    }


def kmv_join_size_estimate(
    sa: list[int],
    sb: list[int],
    rows_a: int,
    rows_b: int,
    k: int,
) -> dict[str, int]:
    """Equi-join cardinality estimate from per-table (row count, key
    sketch) — the cost-based-optimizer NDV formula, made mergeable and
    engine-portable: |A ⋈ B| ≈ |keys(A) ∩ keys(B)| · avg-multiplicity(A)
    · avg-multiplicity(B), under per-key uniformity (the same assumption
    every NDV-based planner makes; skewed keys need the CM sketch's
    frequency view on top).

    The point at 100 TB: both inputs' statistics are tiny mergeable
    sketches maintainable per partition/file and rolled up without
    re-touching data, so broadcast-vs-shuffle and join-order decisions
    can be made BEFORE launching the join.
    """
    est = kmv_set_estimates(sa, sb, k)
    ma = float(rows_a) / float(max(est["est_a"], 1))
    mb = float(rows_b) / float(max(est["est_b"], 1))
    est["est_join_rows"] = _half_up(
        float(est["est_intersection"]) * ma * mb
    )
    return est


# ---- Fixed-bin histogram sketch -------------------------------------------


def hist_sketch(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 256,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-group fixed-bin histogram sketch — the HDR-histogram-shaped
    quantile/distribution primitive: ``bins`` equal-width counters over
    ``[lo, hi)`` with clamped overflow bins, plus exact n/min/max.

    Why beside ``approxQuantile``/``percentile_approx``: Spark's GK/KLL
    state is engine-private; these counters are plain longs, so sketches
    merge by elementwise ``+`` (same linearity as the CM sketch — exact
    under per-partition rollup, shuffle-order-independent), persist
    beside the table, and any engine reproduces and reads them. Quantile
    error is bounded by one bin width — fixed a priori by (hi-lo)/bins,
    not data-dependent.

    Plan: bin assignment is map-side arithmetic; one (group, bin) count
    shuffle (map-side partial agg); one metadata-sized assembly agg.
    Output: ``group_cols + (counts, n, min_v, max_v)``.
    """
    if not (float(hi) > float(lo)) or bins < 1:
        # fail at plan-build time with the actual parameters — a zero
        # or negative width otherwise surfaces later as an opaque
        # ANSI divide-by-zero in an executor
        raise ValueError(f"hist_sketch needs hi > lo and bins >= 1, got "
                         f"lo={lo}, hi={hi}, bins={bins}")
    width = (float(hi) - float(lo)) / bins
    # NULL values carry no distribution signal; exclude them so they
    # can't masquerade as bin-0 mass (greatest() skips NULL args) and so
    # n counts only real observations
    df = df.filter(F.col(col).isNotNull())
    v = F.col(col).cast("double")
    binc = F.least(
        F.greatest(
            F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("int"),
            F.lit(0),
        ),
        F.lit(bins - 1),
    )
    groups = [F.col(g) for g in group_cols]
    cells = (
        df.select(*groups, v.alias("__v"), binc.alias("__b"))
        .groupBy(*group_cols, "__b")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min("__v").alias("mn"),
            F.max("__v").alias("mx"),
        )
    )
    entries = F.map_from_entries(
        F.collect_list(F.struct(F.col("__b"), F.col("c")))
    )
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(bins - 1)),
        lambda i: F.coalesce(
            F.try_element_at(entries, i.cast("int")), F.lit(0).cast("long")
        ),
    )
    return cells.groupBy(*[F.col(g) for g in group_cols]).agg(
        counts.alias("counts"),
        F.sum("c").alias("n"),
        F.min("mn").alias("min_v"),
        F.max("mx").alias("max_v"),
    )


def hist_quantiles(
    sketch: DataFrame,
    lo: float,
    hi: float,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Quantile estimates from a histogram sketch, as a pure Column
    expression walk over the counts array (no shuffle): for each q, take
    the first bin whose cumulative count reaches ``q·n`` and interpolate
    uniformly within it. Estimate error ≤ one bin width by construction.

    Deterministic cross-engine: the cumulative array is integers, the
    interpolation is one fixed-association double expression, rounded.
    Output: ``group_cols + (n, q<q> per requested quantile)``.
    """
    cum = F.aggregate(
        F.col("counts"),
        F.array().cast("array<long>"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0)) + x
            ),
        ),
    )
    out = sketch.withColumn("__cum", cum)
    n = F.col("n").cast("double")
    sel = [F.col(g) for g in group_cols] + [F.col("n")]
    nbins = F.size(F.col("counts"))
    width = (F.lit(float(hi)) - F.lit(float(lo))) / nbins
    for q in qs:
        target = F.lit(float(q)) * n
        # first index (1-based) whose cumulative count >= target
        idx = F.array_position(
            F.transform(F.col("__cum"), lambda c: c >= target), True
        )
        cum_at = F.element_at(F.col("__cum"), idx.cast("int"))
        c_at = F.element_at(F.col("counts"), idx.cast("int"))
        est = F.lit(float(lo)) + width * (
            (idx - 1).cast("double")
            + (target - (cum_at - c_at).cast("double")) / c_at.cast("double")
        )
        sel.append(
            # counts-interpolated decimal lattice -> bit-reproducible
            # float round
            float_round(est, 4).alias(f"q{str(q).replace('.', '_')}")
        )
    return out.select(*sel)


# ---- Count-min sketch -----------------------------------------------------


def cm_sketch(
    df: DataFrame,
    col: str,
    width: int = 64,
    depth: int = 4,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-group count-min sketch (Cormode & Muthukrishnan 2005) over
    ``col`` as ``array<array<long>>`` (depth rows × width counters) — the
    mergeable FREQUENCY sketch completing the family: KMV answers "how
    many distinct", Bloom answers "is it a member", CM answers "about how
    often" with one-sided error (never an undercount). Point estimate =
    ``min_d cm[d][pos_d(v)]``, overcount ≤ ``e·n/width`` with prob
    ``1 - e^{-depth}``.

    Same portability contract as the siblings: positions from
    Kirsch-Mitzenmacher double hashing over two 60-bit md5 slices
    (``pos_d = (h1 + d·h2) mod width``), counters are plain sums — so the
    merge is elementwise ``+`` (commutative/associative: the build is
    shuffle-order-independent, per-partition sketches roll up to exactly
    the global sketch, and any engine reproduces every cell bit-for-bit).
    Unlike KMV/Bloom there is no DISTINCT: multiplicity is the signal.

    Plan: depth-way map-side explode → one (group, d, pos) count with
    map-side partial aggregation (the only data-sized shuffle) → two
    metadata-sized assembly aggs over groups·depth·width cells. At 100 TB
    the counters-table never exceeds groups × depth × width longs.

    Output: ``group_cols + (cm, n_items)`` where ``n_items`` is the total
    item count (= the sum of any single row — every row sums to n, which
    doubles as a self-check).
    """
    h1, h2 = _hash_pair(F.col(col))
    groups = [F.col(g) for g in group_cols]
    # NULLs are not a frequency signal: drop them up front (a NULL hash
    # would otherwise become a NULL map key in the gap-fill and fail the
    # job; the SQL mirror's grid join drops them silently — align on
    # explicit exclusion instead)
    df = df.filter(F.col(col).isNotNull())
    pos = df.select(
        *groups,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(h1 + d * h2, F.lit(width)).alias("p"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("dp"),
    ).select(*group_cols, F.col("dp.d").alias("d"), F.col("dp.p").alias("p"))
    cells = pos.groupBy(*group_cols, "d", "p").agg(
        F.count(F.lit(1)).alias("c")
    )
    # gap-fill each depth row to exactly `width` counters, ordered by pos
    entries = F.map_from_entries(
        F.collect_list(F.struct(F.col("p"), F.col("c")))
    )
    row_arr = F.transform(
        F.sequence(F.lit(0), F.lit(width - 1)),
        lambda i: F.coalesce(
            F.try_element_at(entries, i.cast("long")), F.lit(0).cast("long")
        ),
    )
    rows = cells.groupBy(*group_cols, "d").agg(
        row_arr.alias("row"), F.sum("c").alias("rowsum")
    )
    # every row sums to n; taking d=0's sum keeps n_items an exact count
    return (
        rows.groupBy(*[F.col(g) for g in group_cols])
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("d"), F.col("row")))
            ).alias("_rows"),
            F.max(F.when(F.col("d") == 0, F.col("rowsum"))).alias("n_items"),
        )
        .select(
            *group_cols,
            F.transform(F.col("_rows"), lambda s: s["row"]).alias("cm"),
            F.col("n_items"),
        )
    )


def cm_point_estimate(cm: list[list[int]], value) -> F.Column:
    """Frequency estimate Column against a driver-side CM sketch (one
    collected row of :func:`cm_sketch` — depth·width·8 bytes of metadata).
    ``min`` over depth rows; never less than the true count."""
    width = len(cm[0])
    h1, h2 = _hash_pair(value)
    ests = []
    for d, row in enumerate(cm):
        arr = F.array(*[F.lit(int(c)).cast("long") for c in row])
        p = F.pmod(h1 + d * h2, F.lit(width))
        ests.append(F.element_at(arr, p.cast("int") + 1))
    return F.least(*ests)


def cm_merge_sketches(sketches: list[list[list[int]]]) -> list[list[int]]:
    """Driver-side reference merge: elementwise sum. Linearity of the
    counters is the whole mergeability story — tests pin
    ``cm(A) + cm(B) == cm(A ∪ B)`` cell-for-cell, which licenses the
    per-partition → global rollup refactor at scale."""
    out = [[0] * len(row) for row in sketches[0]]
    for s in sketches:
        for d, row in enumerate(s):
            for i, c in enumerate(row):
                out[d][i] += c
    return out


def bloom_contains(
    bloom: list[int], value, k_hashes: int = 4
) -> F.Column:
    """Membership test Column against a driver-side bloom array (e.g. one
    row of :func:`bloom_build` collected — words·8 bytes of metadata).
    True ⟺ all k positions set; false positives possible, false
    negatives not."""
    import hashlib as _hl

    m = len(bloom) * _BLOOM_BITS_PER_WORD
    h1, h2 = _hash_pair(value)
    arr = F.array(*[F.lit(int(w)).cast("long") for w in bloom])
    cond = F.lit(True)
    for i in range(k_hashes):
        p = F.pmod(h1 + i * h2, F.lit(m))
        word = F.element_at(arr, (p / _BLOOM_BITS_PER_WORD).cast("int") + 1)
        bit = F.pow(
            F.lit(2.0), F.pmod(p, F.lit(_BLOOM_BITS_PER_WORD))
        ).cast("long")
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


# ---- HyperLogLog ----------------------------------------------------------
#
# Completes the sketch family's cardinality corner: KMV answers distinct
# counts with O(k) 8-byte hashes, HLL answers the same question in m
# 6-bit registers (here: m longs for portability) with a fixed ~1.04/sqrt(m)
# relative error — the industry-standard shape for per-partition /
# per-file NDV that must merge associatively (register-wise max) across
# a 100 TB rollup tree. Same portability posture as KMV/Bloom/CM: the
# hash is the md5-prefix family, the registers are plain integers, and
# the estimator is a fixed-association expression over those integers,
# so any engine rebuilds and reads the sketch bit-identically
# (tests/test_operators.py pins merge ≡ direct; the driver oracle
# replays the whole construction in DuckDB SQL).

HLL_P = 8  # m = 256 registers; relative error ~1.04/16 = 6.5%
_HLL_M = 1 << HLL_P
_HLL_WBITS = 60 - HLL_P  # low bits that feed the rank
_HLL_RMAX = _HLL_WBITS + 1  # rank when the low bits are all zero


def _hll_rank(w) -> F.Column:
    """Position of the highest set bit measured from the top of the
    _HLL_WBITS-wide field, plus one — i.e. leading zeros + 1. Integer-only:
    bit length via base-2 string conversion (minimal-width in both Spark
    ``conv`` and DuckDB ``bin``), no float log in the plan."""
    bitlen = F.length(F.conv(w, 10, 2))
    return F.when(w == 0, F.lit(_HLL_RMAX)).otherwise(
        F.lit(_HLL_WBITS) - bitlen + 1
    )


def hll_estimate_cols(registers) -> dict[str, F.Column]:
    """Estimator columns over a registers array (1-indexed Spark array of
    m longs): ``n_zero`` empty registers, ``sum_scaled`` = Σ 2^(RMAX-reg)
    as a BIGINT (the harmonic-mean denominator scaled by 2^RMAX so it
    sums exactly — max m·2^RMAX = 2^61 fits a long; a double sum would
    lose low bits past 2^53), and ``estimate``: the standard HLL
    bias-corrected branch — linear counting when raw ≤ 2.5m and zero
    registers exist, else the harmonic estimate. Both branches are the
    same single expression over the same integers in Spark and DuckDB,
    so the rounded estimate is cross-engine identical."""
    n_zero = F.aggregate(
        registers,
        F.lit(0).cast("long"),
        lambda acc, r: acc + F.when(r == 0, 1).otherwise(0),
    )
    sum_scaled = F.aggregate(
        registers,
        F.lit(0).cast("long"),
        lambda acc, r: acc
        + F.pow(F.lit(2.0), F.lit(_HLL_RMAX) - r).cast("long"),
    )
    alpha_mm = (
        F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(_HLL_M)))
    ) * F.lit(float(_HLL_M) * float(_HLL_M))
    raw = (
        alpha_mm
        * F.pow(F.lit(2.0), F.lit(_HLL_RMAX))
        / F.col("sum_scaled").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (F.col("n_zero") > 0),
        F.round(
            F.lit(float(_HLL_M))
            * F.log(F.lit(float(_HLL_M)) / F.col("n_zero").cast("double"))
        ),
    ).otherwise(F.round(raw))
    return {
        "n_zero": n_zero,
        "sum_scaled": sum_scaled,
        "estimate": est.cast("long"),
    }


def _hll_assemble(cells: DataFrame, group_cols: tuple[str, ...]) -> DataFrame:
    """(group, bucket, reg) cells → per-group registers array + estimator
    columns. Metadata-sized input (≤ m rows per group)."""
    entries = F.map_from_entries(
        F.collect_list(F.struct(F.col("__bucket"), F.col("__reg")))
    )
    registers = F.transform(
        F.sequence(F.lit(0), F.lit(_HLL_M - 1)),
        lambda i: F.coalesce(
            F.try_element_at(entries, i.cast("int")), F.lit(0).cast("long")
        ),
    )
    sk = cells.groupBy(*[F.col(g) for g in group_cols]).agg(
        registers.alias("registers")
    )
    cols = hll_estimate_cols(F.col("registers"))
    sk = sk.withColumn("n_zero", cols["n_zero"]).withColumn(
        "sum_scaled", cols["sum_scaled"]
    )
    return sk.withColumn("estimate", cols["estimate"])


def hll_sketch(
    df: DataFrame, col: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Per-group HLL sketch of ``col``.

    Plan: bucket/rank are map-side arithmetic on the 60-bit md5 prefix
    (top HLL_P bits select the register, leading zeros of the rest set
    the rank); one (group, bucket) max-shuffle with map-side partial
    aggregation — at 100 TB each task emits at most m partial rows per
    group, so shuffle volume is bounded by groups·m·16 bytes regardless
    of row count. Output: ``group_cols + (registers, n_zero, sum_scaled,
    estimate)``.
    """
    h = _portable_hash60(F.col(col))
    df = df.filter(F.col(col).isNotNull())
    cells = (
        df.select(
            *[F.col(g) for g in group_cols],
            F.shiftright(h, _HLL_WBITS).alias("__bucket"),
            _hll_rank(
                h.bitwiseAND(F.lit((1 << _HLL_WBITS) - 1))
            ).alias("__reg0"),
        )
        .groupBy(*group_cols, "__bucket")
        .agg(F.max("__reg0").cast("long").alias("__reg"))
    )
    return _hll_assemble(cells, group_cols)


def hll_merge(
    sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge sketches (rows of ``registers`` arrays) down to one sketch
    per ``group_cols`` value (default: ONE global sketch): register-wise
    max — the associativity that makes HLL the rollup-tree NDV primitive
    (merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B), pinned by the rollup
    queries' oracles, which compute each rollup level DIRECTLY from the
    raw column). With ``group_cols`` this is the GROUPING-SETS move:
    build the finest-grain sketches once, then answer every coarser NDV
    (per-dim, global) by merging metadata — the raw data is scanned
    exactly once. Explode is over input_rows·m metadata rows, never
    over data."""
    cells = (
        sketches.select(
            *[F.col(g) for g in group_cols],
            F.posexplode("registers").alias("__bucket", "__r"),
        )
        .groupBy(*group_cols, "__bucket")
        .agg(F.max("__r").alias("__reg"))
    )
    return _hll_assemble(cells, group_cols)


def equi_depth_buckets(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 128,
    n_buckets: int = 4,
) -> DataFrame:
    """Equi-depth bucketizer — the two-phase "compute stats, apply to
    data" pattern in ONE plan: a global :func:`hist_sketch` derives the
    quantile cut bins (INTEGER comparison ``cum·n_buckets ≥ q·n`` — no
    float quantile math), the cuts broadcast back as one metadata row,
    and every row gets ``bucket`` = number of cuts strictly below its
    bin. The ML-preproc use: quantile feature binning / monotone target
    encoding that reproduces bit-identically on any engine.

    Error posture: bucket boundaries are resolved at bin granularity
    (error ≤ one bin width, fixed a priori — same contract as
    hist_quantiles). Plan: the sketch's two bounded shuffles + a 1-row
    broadcast join; bucket assignment is map-side arithmetic. Appends
    ``__bin`` and ``bucket``.
    """
    if not (float(hi) > float(lo)) or bins < 1 or n_buckets < 1:
        raise ValueError(
            f"equi_depth_buckets needs hi > lo, bins >= 1, n_buckets >= 1,"
            f" got lo={lo}, hi={hi}, bins={bins}, n_buckets={n_buckets}"
        )
    width = (float(hi) - float(lo)) / bins
    v = F.col(col).cast("double")
    binc = F.least(
        F.greatest(
            F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("int"),
            F.lit(0),
        ),
        F.lit(bins - 1),
    )
    sk = hist_sketch(df, col, lo, hi, bins)
    cum = F.aggregate(
        F.col("counts"),
        F.array().cast("array<long>"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0)) + x
            ),
        ),
    )
    # n_buckets == 1 needs an EMPTY cut list, but Spark's sequence(1, 0)
    # generates a DESCENDING [1, 0] (unlike SQL range, which is empty) —
    # left unguarded that fabricates two cuts and assigns bucket 1 in a
    # 1-bucket request (caught by the equi-depth hypothesis property)
    cut_qs = (
        F.array().cast("array<int>")
        if n_buckets == 1
        else F.sequence(F.lit(1), F.lit(n_buckets - 1))
    )
    cuts = F.transform(
        cut_qs,
        lambda q: F.array_position(
            F.transform(
                F.col("__cum"),
                lambda c: c * F.lit(n_buckets) >= q.cast("long") * F.col("n"),
            ),
            True,
        )
        - 1,  # 0-based cut bin
    )
    cuts_row = (
        sk.withColumn("__cum", cum)
        .select(cuts.alias("__cuts"))
    )
    out = df.filter(v.isNotNull()).crossJoin(F.broadcast(cuts_row))
    bucket = F.aggregate(
        F.col("__cuts"),
        F.lit(0),
        lambda acc, cut: acc
        + F.when(F.col("__bin").cast("long") > cut, 1).otherwise(0),
    )
    return (
        out.withColumn("__bin", binc)
        .withColumn("bucket", bucket)
        .drop("__cuts")
    )
