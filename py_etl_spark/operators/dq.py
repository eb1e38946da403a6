"""Data-quality constraint checking (the Deequ/Great-Expectations niche).

A declarative constraint list compiles into the FEWEST passes the
constraint mix allows:

- all row-level predicates (not-null, range, set-membership, regex)
  become conditional sums in ONE map-side-combined aggregation over a
  single scan — adding a tenth check costs zero extra I/O;
- ``unique`` adds one count-shuffle on its key columns (map-side
  partial agg; the violation count is metadata after that);
- broadcast ``fk`` checks fold into THAT SAME single scan: each is a
  broadcast LEFT join against the distinct dim keys plus a conditional
  sum over the match marker — K broadcast FKs cost zero extra passes
  over the fact table and never shuffle it;
- fact-sized ``fk`` checks (``broadcast=False``) pre-aggregate the fact
  to per-key counts and anti-join key-vs-key (the shuffle carries
  distinct-key partials, not fact rows).

Everything lands in one report row per constraint:
``(check_name, n_violations, passed)`` — metadata-sized, safe to
collect, trivially unioned across tables for a warehouse-wide report.
At 100 TB: one scan + K tiny aggs; the report is what a CI gate or a
freshness monitor consumes before publishing a table version.

Reference parity: the reference validates rows in its sync loop and
routes invalid ones to an error channel (refsync P10); this module is
the table-level batch complement, shaped like Amazon Deequ's analyzers
(public algorithm/API shape, reimplemented on DataFrame aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from py_etl_spark.functions.numeric import float_round

#: Overflow ceiling for drift numerators (int64 max). A parameter on
#: :func:`distribution_drift` (not a buried literal) so tests can lower
#: it and exercise the assert_true raise path in both SQL modes.
INT64_MAX = 9223372036854775807

Constraint = tuple  # (name, kind, payload) — see builders below


def not_null(col: str) -> Constraint:
    return (f"not_null({col})", "row", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Constraint:
    c = F.col(col)
    return (
        f"in_range({col})",
        "row",
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def in_set(col: str, values) -> Constraint:
    c = F.col(col)
    return (
        f"in_set({col})",
        "row",
        c.isNotNull() & ~c.isin(list(values)),
    )


def matches(col: str, pattern: str) -> Constraint:
    c = F.col(col)
    return (
        f"matches({col})",
        "row",
        c.isNotNull() & ~c.rlike(pattern),
    )


def unique(*cols: str) -> Constraint:
    return ("unique(" + ",".join(cols) + ")", "unique", tuple(cols))


def foreign_key(
    col: str, dim: DataFrame, dim_col: str, broadcast: bool = True
) -> Constraint:
    """``broadcast=True`` (default) for genuinely small dimensions;
    pass ``False`` for fact-sized referenced tables (orders under
    lineitem) — the anti-join then shuffles both sides on the key,
    which is the correct plan when neither side fits an executor."""
    return (f"fk({col})", "fk", (col, dim, dim_col, broadcast))


def check_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Compile ``constraints`` into the minimal-pass violation report.

    Row-level violation predicates are NULL-safe by construction (each
    builder decides whether NULL violates — only ``not_null`` counts
    NULLs), so conditional sums never silently skip rows.
    """
    reports: list[DataFrame] = []

    row_checks = [(n, p) for (n, k, p) in constraints if k == "row"]
    # Broadcast FK checks fold into the same single scan as the
    # row-level checks (r11, guide §1.2 "fewer passes"): each one is a
    # broadcast LEFT join against the distinct dim keys plus a
    # match-marker column, and its violation count becomes one more
    # conditional sum in the one wide aggregation — K broadcast FKs
    # cost ZERO extra scans of the fact table instead of K anti-join
    # passes (dq_check_star_fks read lineitem three times for its three
    # key columns; now once, projecting the three keys together).
    # Row multiplicity is preserved because the build side is distinct;
    # the left join keeps every fact row exactly once.
    bcast_fks = [
        (n, p)
        for (n, k, p) in constraints
        if k == "fk" and p[3]  # broadcast=True only
    ]
    if row_checks or bcast_fks:
        base = df
        fk_sums = []
        for i, (name, (col, dim, dim_col, _b)) in enumerate(bcast_fks):
            marker = f"__fk_ok_{i}"
            keys = (
                dim.select(F.col(dim_col).alias(col))
                .distinct()
                .withColumn(marker, F.lit(True))
            )
            base = base.join(F.broadcast(keys), on=col, how="left")
            fk_sums.append(
                (
                    name,
                    F.col(col).isNotNull() & F.col(marker).isNull(),
                )
            )
        aggs = [
            # coalesce: an EMPTY table has zero violations, not NULL ones
            F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(name)
            for name, pred in row_checks + fk_sums
        ]
        wide = base.agg(*aggs)
        # unpivot the single wide row into (constraint, n_violations)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(name).alias("check_name"),
                    F.col(name).alias("n_violations"),
                )
                for name, _ in row_checks + fk_sums
            ]
        )
        reports.append(
            wide.select(F.explode(pairs).alias("r")).select(
                "r.check_name", "r.n_violations"
            )
        )

    for name, kind, payload in constraints:
        if kind == "unique":
            cols = list(payload)
            # violations = rows beyond the first in each duplicated group
            dup = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") > 1)
                .agg(
                    F.coalesce(
                        F.sum(F.col("__c") - 1), F.lit(0)
                    ).cast("long").alias("n_violations")
                )
            )
            reports.append(dup.select(F.lit(name).alias("check_name"), "n_violations"))
        elif kind == "fk":
            col, dim, dim_col, bcast = payload
            if bcast:
                continue  # folded into the single-scan aggregation above
            keys = dim.select(F.col(dim_col).alias(col))
            # fact-sized dim: pre-aggregate the fact to (key, rows)
            # with map-side combine, anti-join keys-vs-keys, then
            # sum the per-key row counts back — the shuffle carries
            # distinct-key partials instead of every fact row
            # (r08, sf10 min-of-2: 18.6 -> 5.6 s on
            # lineitem->orders; the dim-side distinct was dropped
            # as pure waste)
            orphans = (
                df.filter(F.col(col).isNotNull())
                .groupBy(col)
                .agg(F.count(F.lit(1)).alias("__n"))
                .join(keys, on=col, how="left_anti")
                .agg(
                    F.coalesce(F.sum("__n"), F.lit(0))
                    .cast("long")
                    .alias("n_violations")
                )
            )
            reports.append(
                orphans.select(F.lit(name).alias("check_name"), "n_violations")
            )

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("n_violations") == 0)


def distribution_drift(
    df: DataFrame,
    col: str,
    group_col: str,
    group_a,
    group_b,
    lo: float,
    hi: float,
    bins: int = 64,
    int64_guard: int = INT64_MAX,
) -> DataFrame:
    """Distribution-drift report between two slices of a table — the
    training-data monitor for "did source X's length/score/price
    distribution move?": equal-width histograms of ``col`` for the two
    groups, compared by total-variation distance and a KS-style max
    cumulative gap.

    EXACT integer comparison: with bin counts cᵃ/cᵇ and totals nᵃ/nᵇ,
    the report carries ``tv_num = Σ|cᵃᵢ·nᵇ − cᵇᵢ·nᵃ|`` and ``ks_num =
    max |Cᵃᵢ·nᵇ − Cᵇᵢ·nᵃ|`` — no float ratio until the final rounded
    display columns tv = tv_num/(2·nᵃ·nᵇ) and ks = ks_num/(nᵃ·nᵇ), so
    thresholds compare engine-exactly. The cross products are computed
    in ``decimal(38,0)`` (exact up to 10³⁸ — BIGINT math would wrap
    silently once nᵃ·nᵇ passes 2⁶³, i.e. the two slices together exceed
    ~3e9 rows); the emitted ``tv_num``/``ks_num`` stay BIGINT for the
    oracle contract, and if a value genuinely exceeds int64 an
    ``assert_true`` guard raises BEFORE the decimal→long cast — loud in
    both SQL modes (the bare cast would throw under the Spark 4 ANSI
    default but yield NULL under legacy mode, and a NULL numerator
    would quietly turn a threshold comparison into unknown).
    ``int64_guard`` is that ceiling (default int64 max) — a parameter so
    tests can lower it and prove the raise path actually fires.

    Plan: one scan of the two slices into the same (group, bin) count
    shuffle as :func:`~py_etl_spark.operators.sketch.hist_sketch` (the
    histogram primitive is reused verbatim); the comparison is a
    zip_with/aggregate Column walk over two metadata rows. Output: ONE
    row ``(n_a, n_b, tv_num, tv, ks_num, ks)``.
    """
    from py_etl_spark.operators.sketch import hist_sketch

    def side(val, alias_n, alias_c):
        sk = hist_sketch(
            df.filter(F.col(group_col) == val), col, lo, hi, bins
        )
        return sk.select(
            F.col("n").alias(alias_n), F.col("counts").alias(alias_c)
        )

    both = side(group_a, "n_a", "__ca").crossJoin(
        side(group_b, "n_b", "__cb")
    )
    dec = "decimal(38,0)"
    na, nb = F.col("n_a").cast(dec), F.col("n_b").cast(dec)

    def long_checked(dec_col, name):
        # Overflow must be LOUD in BOTH SQL modes: the bare
        # decimal->long cast throws under ANSI but yields NULL under
        # legacy, and a NULL numerator would flow into NULL tv/ks where
        # a threshold comparison silently evaluates to unknown.
        # assert_true raises regardless of mode; it returns NULL when
        # the condition holds, hence the when(...isNull()) wrapper.
        ok = F.assert_true(
            dec_col <= F.lit(int64_guard),
            F.lit(f"dq_drift_report: {name} exceeds int64 — the slices "
                  "are large enough that the exact numerator no longer "
                  "fits the report's BIGINT contract"),
        )
        return F.when(ok.isNull(), dec_col).cast("long")

    tv_num = long_checked(
        F.aggregate(
            F.zip_with(
                F.col("__ca"),
                F.col("__cb"),
                lambda x, y: F.abs(x.cast(dec) * nb - y.cast(dec) * na),
            ),
            F.lit(0).cast(dec),
            lambda acc, v: acc + v,
        ),
        "tv_num",
    )
    cum = lambda c: F.aggregate(  # noqa: E731 — running-sum array walk
        F.col(c),
        F.array().cast("array<long>"),
        lambda acc, x: F.concat(
            acc,
            F.array(F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0)) + x),
        ),
    )
    ks_num = long_checked(
        F.array_max(
            F.zip_with(
                cum("__ca"),
                cum("__cb"),
                lambda x, y: F.abs(x.cast(dec) * nb - y.cast(dec) * na),
            )
        ),
        "ks_num",
    )
    return both.select(
        "n_a",
        "n_b",
        tv_num.alias("tv_num"),
        # int-ratio lattice -> bit-reproducible float round
        float_round(
            tv_num.cast("double") / (2.0 * na.cast("double") * nb.cast("double")), 6
        ).alias("tv"),
        ks_num.alias("ks_num"),
        float_round(
            ks_num.cast("double") / (na.cast("double") * nb.cast("double")), 6
        ).alias("ks"),
    )
