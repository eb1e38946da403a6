"""Behavioral analytics over event streams: ordered funnels and cohort
retention.

Both are classic warehouse queries a training-data/event engine gets asked
for; both are single-digit-shuffle DataFrame compositions — no iterative
driver logic, no UDFs.

Funnel semantics (the strict kind): a user reaches step *i+1* when an
event of that step's type occurs STRICTLY AFTER the event that completed
step *i*. "First qualifying event" at every step: the funnel time for a
step is the earliest event that advances it.

The implementation makes this ONE shuffle: group each user's events,
sort them in event-time order, and fold a ``(stage, t_last, times)``
accumulator across the sorted array with ``F.aggregate`` — a linear scan
per user, entirely in Column expressions (the staged-min-join formulation
the SQL oracle uses spends one join + shuffle PER STEP; at 100 TB and a
5-step funnel that's 5 scans vs this plan's 1). Memory is bounded by the
largest single user's event count, the same bound any per-key ordered
pass needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str | None = None,
) -> DataFrame:
    """Per-user strict ordered-funnel state.

    Output: ``(user_col, reached, step_ts[1..n])`` — ``reached`` ∈ [0, n]
    is how many steps completed; ``step_ts_i`` is when step i completed
    (NULL beyond ``reached``). ``tie_col`` breaks equal-timestamp scan
    order deterministically; advancement itself requires strictly
    increasing timestamps, so ties never advance two steps at once.
    """
    n = len(steps)
    if n == 0:
        raise ValueError("funnel needs at least one step")
    order_cols = [F.col(ts_col).alias("__t")] + (
        [F.col(tie_col).alias("__tie")] if tie_col else []
    )
    ev = F.array_sort(
        F.collect_list(F.struct(*order_cols, F.col(type_col).alias("__ty")))
    )
    ts_type = df.schema[ts_col].dataType

    zero = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast(ts_type).alias("t_last"),
        F.array().cast(f"array<{ts_type.simpleString()}>").alias("times"),
    )

    def advance(acc: Column, e: Column) -> Column:
        out = acc
        for i in range(n):
            cond = (acc["stage"] == i) & (e["__ty"] == steps[i])
            if i > 0:
                cond = cond & (e["__t"] > acc["t_last"])
            nxt = F.struct(
                F.lit(i + 1).alias("stage"),
                e["__t"].alias("t_last"),
                F.concat(acc["times"], F.array(e["__t"])).alias("times"),
            )
            out = F.when(cond, nxt).otherwise(out)
        return out

    agg = df.groupBy(user_col).agg(
        F.aggregate(ev, zero, advance).alias("__f")
    )
    return agg.select(
        user_col,
        F.col("__f.stage").cast("long").alias("reached"),
        *[
            # try_: a user who stalled at step i has a shorter times array,
            # and ANSI element_at would throw instead of yielding NULL
            F.try_element_at(F.col("__f.times"), F.lit(i + 1)).alias(
                f"t_step{i + 1}"
            )
            for i in range(n)
        ],
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-activity period,
    counted in every later period they were active.

    Output: ``(cohort_start, period_offset, n_users)``.

    Plan: one groupBy for first-activity (map-side partial min), one
    distinct for (user, period) activity — both shuffle on ``user_col``,
    so AQE/bucketing can co-locate the join between them — then the small
    (cohort, offset) count aggregate. The triangle is tiny (periods²), so
    everything downstream of the user-keyed stages is negligible.
    """
    pstart = F.date_trunc(period, F.col(ts_col))
    first = df.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort_start")
    )
    active = df.select(
        F.col(user_col), pstart.alias("period_start")
    ).distinct()
    seconds = {"week": 7 * 86400, "day": 86400}[period]
    return (
        active.join(first, user_col)
        .select(
            "cohort_start",
            (
                (
                    F.unix_timestamp("period_start")
                    - F.unix_timestamp("cohort_start")
                )
                / seconds
            )
            .cast("long")
            .alias("period_offset"),
        )
        .groupBy("cohort_start", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
