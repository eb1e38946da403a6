"""Physical-plan inspection helpers."""

from py_etl_spark.plans.width import exchange_width  # noqa: F401
from py_etl_spark.plans.explain import (  # noqa: F401
    broadcast_join_count,
    executed_plan,
    has_pushed_filters,
    node_count,
    scan_read_schema,
    shuffle_count,
    single_partition_exchange_count,
    wholestage_codegen_spans,
)
