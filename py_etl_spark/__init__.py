"""py_etl_spark — a PySpark-native analytics/ETL engine.

A ground-up Spark rebuild of the capabilities of the reference engine
(rhoerbe/py-etl): relational→keyed-state synchronization (snapshot
reconciliation + CDC micro-batch streaming), a scalar conversion-function
registry, tree/table diffing, anonymization, plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Arrow-vectorized Pandas UDFs only where built-ins cannot express
the semantics, Structured Streaming for the unbounded paths.
"""

__version__ = "0.1.0"

from py_etl_spark.session import get_spark  # noqa: F401
