"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on by default in
:func:`py_etl_spark.session.get_spark`) handles sort-merge skew at runtime
by splitting oversized partitions. Salting is the *static* complement for
the cases AQE can't fix: a shuffled join where one key holds so many rows
that even a split partition re-concentrates on the same reducer key, and
pre-aggregations keyed by a hot value.

``salted_join`` joins a skewed fact against a dimension by

1. salting the fact side with a DETERMINISTIC salt derived from a unique
   column (``xxhash64(row_key) % salt_factor`` — never ``rand()``, which
   breaks retry/replay determinism and the engine's oracle checks), and
2. exploding the dimension ``salt_factor``× (one copy per salt value),

so a key carrying N rows spreads over ``salt_factor`` reducer keys. The
dimension grows by the factor — keep it broadcast-small or the factor
modest. Results are row-identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_etl_spark.functions.numeric import float_round

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_from: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` with the fact side spread over
    ``salt_factor`` sub-keys per join key.

    ``salt_from``: a fact column with high cardinality (ideally unique —
    e.g. the fact PK) hashed to derive the deterministic salt.
    """
    salted_fact = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salt_factor)).cast("int")
    )
    salted_dim = dim.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])),
    )
    out = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact[SALT_COL] == salted_dim[SALT_COL]),
        how,
    )
    return out.drop(SALT_COL)


def key_skew_profile(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Diagnose join/agg key skew BEFORE it burns a cluster: the
    ``top_k`` heaviest keys with row count, share of total rows, and skew
    factor (count ÷ mean rows per key). A skew factor in the hundreds on
    a join key is the signal to reach for ``salted_join`` / verify AQE
    skew splitting; at 100 TB you run this on a sample or a single
    partition range first.

    Plan: one shuffle (the per-key count), global totals as a broadcast
    scalar (one-row aggregate cross-joined in — never a window over an
    unpartitioned frame), and top-k via orderBy+limit which compiles to
    TakeOrderedAndProject (per-partition top-k + driver merge of k rows).
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("__total"),
        F.count(F.lit(1)).alias("__nkeys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            F.col(key_col),
            F.col("n").cast("long").alias("n_rows"),
            # int-ratio lattice → bit-reproducible float round
            # (functions/numeric.py), not F.round
            float_round(F.col("n") / F.col("__total"), 6).alias("share"),
            float_round(
                F.col("n") * F.col("__nkeys") / F.col("__total"), 4
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("n_rows"), key_col)
        .limit(top_k)
    )
