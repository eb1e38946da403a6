"""Plan inspection: make "did Catalyst do the right thing" testable.

The scale contract for every operator (SURVEY.md §4): filters and
projections reach the parquet scan, small dimensions broadcast, shuffles
only where semantics require them, and the hot path stays inside
whole-stage codegen. These helpers parse `explain("formatted")` output so
tests can assert those properties instead of hoping.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Formatted physical plan (post-AQE initial plan)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the scan node advertises PushedFilters containing every
    fragment (e.g. column names of pushed predicates)."""
    plan = executed_plan(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    joined = ";".join(m)
    return bool(m) and all(f in joined for f in fragments)


def scan_read_schema(df: DataFrame) -> list[str]:
    """Columns actually read from the (first) parquet scan — the column
    pruning witness."""
    plan = executed_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]


def _node_ids(plan: str, node: str) -> set[str]:
    """Distinct operator ids for a node type — the formatted explain lists
    each node twice (tree + details), so count ids, not mentions."""
    return set(re.findall(rf"\((\d+)\) {node}", plan))


def broadcast_join_count(df: DataFrame) -> int:
    plan = executed_plan(df)
    return len(_node_ids(plan, "BroadcastHashJoin")) + len(
        _node_ids(plan, "BroadcastNestedLoopJoin")
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle-exchange operators in the plan (broadcast
    exchanges excluded — they move only the small side)."""
    plan = executed_plan(df)
    return len(_node_ids(plan, "Exchange"))


def single_partition_exchange_count(df: DataFrame) -> int:
    """Number of exchange-to-one-partition operators — the global-sort /
    global-window scale-killer. Zero for every data-plane operator; a
    non-zero count means all rows funnel through a single task."""
    plan = executed_plan(df)
    return len(re.findall(r"Exchange SinglePartition", plan))


def node_count(df: DataFrame, node: str) -> int:
    """Distinct instances of a physical node type (e.g. 'Window',
    'TakeOrderedAndProject') in the formatted plan."""
    return len(_node_ids(executed_plan(df), node))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees.

    Uses the codegen explain mode ("Found N WholeStageCodegen subtrees"),
    which works on unexecuted AQE plans — the formatted/simple modes only
    annotate codegen after the adaptive plan finalizes."""
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", s)
    return int(m.group(1)) if m else 0
