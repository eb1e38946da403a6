"""Driver contract: one named query per implemented operator (SURVEY.md §2).

Each entry pairs a Spark DataFrame implementation with the ANSI-SQL oracle
DuckDB runs on the same parquet tables. Column names/aliases match exactly
on both sides (the driver's compare sorts columns by name before hashing).

Cross-engine hash-match rules used throughout:
- integral outputs cast to BIGINT on both sides (DuckDB count→BIGINT,
  sum(int)→HUGEINT, Spark row_number→int … all normalized);
- order-dependent float aggregates rounded the same on both sides;
- timestamps compared as epoch millis (Spark session TZ is UTC);
- double→int conversions via floor() (DuckDB CAST rounds, Spark truncates);
- arrays joined to strings.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from py_etl_spark.functions.numeric import float_round
from py_etl_spark.operators import dedup, ranking, similarity, textstats
from py_etl_spark.operators.merge import MergePolicy, scd1_merge
from py_etl_spark.schemas import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    note: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# BPE-ish pre-tokenizer family (same as operators/corpus.TOKEN_RE);
# interpolated into several oracle SQL strings below.
_BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def query(name: str, oracle: str | None, note: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(fn, oracle, note)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---- exact money-aggregate idiom (r11) -------------------------------------
#
# sum(<double>) is reduction-order dependent: Spark's partial aggregation
# order varies with partitioning/AQE while DuckDB sums serially, so
# round(sum(x), 2) can flip a last digit whenever a group lands within
# float-error distance of a half-cent boundary — the r11 sf0.1 sweep
# caught q9 doing exactly that, and EVERY money aggregate in the registry
# shared the latency. The fix is exact integer arithmetic end-to-end:
#
#   1. `_xc(col, s)` quantizes each row to 10^-s units with
#      floor(x*10^s + 0.5) — *, +, floor are IEEE-correctly-rounded in
#      every engine, so the per-row integer is bit-reproducible (and for
#      inputs that ARE s-decimal values, e.g. 2-decimal prices at s=2 or
#      price*(1-disc) products at s=4, it recovers the EXACT decimal —
#      the sum is then true decimal money math, not an approximation).
#   2. Sum the integers. Integer sums are exact and order-free in both
#      engines (DuckDB sums BIGINT into HUGEINT). On the Spark side the
#      accumulator dtype is a measured tradeoff (sf0.1 q1 A/B,
#      interleaved min-of-5): LONG sums run at double-sum speed (0.31 s
#      vs 0.27 s for the 3-sum aggregate) but wrap silently past 2^63;
#      decimal(20,0) sums are overflow-free to 1e30 but ~2x (0.55 s) —
#      Decimal aggregation leaves the primitive codegen path. Rule:
#      LONG when max_rows_per_group x 10^s x max|value| at the 100 TB
#      target (~1e12 fact rows) stays under 9.2e17 (>= 10x margin) —
#      true for every per-key aggregate whose group count scales with
#      the data (per-order, per-customer, per-part, per-window...);
#      decimal(20,0) for O(1)-group aggregates over unbounded rows
#      (q1, q5, q6, q7, q8, q14, q19), where the agg is scan/join
#      dominated anyway. (A dollars/frac split-sum keeping two longs
#      per money column was built and measured — 0.64 s, no better
#      than decimal — rejected.)
#   3. `_xr2(sum, s)` renders the exact sum at 2 decimals with the same
#      bit-reproducible float ops.
#
# This also makes results CLUSTER-SIZE-INVARIANT: a 1000-executor run
# returns bit-identical money totals to a laptop run, which float sums
# do not. Oracles spell the same ops textually:
#   per-row:  CAST(floor((expr) * 1e{s} + 0.5) AS BIGINT)
#   render:   floor(CAST(sum(c) AS DOUBLE) / 1e{s-2} + 0.5) / 100.0
#             (s=2: CAST(sum(c) AS DOUBLE) / 100.0 — already cents)
# `_fr(col, k)` is the render-only variant for values that are already
# deterministic (exact-int ratios, averages of exact sums): a
# float-space round-half-up replacing round(), whose tie handling
# differs between engines (see q2_min_cost_supplier).


def _xc(col: Column, scale: int, dtype: str = "decimal(20,0)") -> Column:
    """Exact scaled-integer units of a money/metric expression.

    ``dtype``: Spark-side sum accumulator — "long" (codegen-fast; caller
    must show the 100 TB per-group envelope fits with >= 10x margin, see
    the idiom note above) or "decimal(20,0)" (overflow-free, ~2x)."""
    c = F.floor(col * float(10**scale) + F.lit(0.5))
    return c if dtype == "long" else c.cast(dtype)


def _xr2(sum_col: Column, scale: int) -> Column:
    """Render an exact scaled-integer SUM at 2 decimals."""
    d = sum_col.cast("double")
    if scale == 2:
        return d / 100.0
    return F.floor(d / float(10 ** (scale - 2)) + F.lit(0.5)) / 100.0


def _fr(col: Column, k: int) -> Column:
    """Bit-reproducible float-space round-half-up at k decimals
    (registry-local alias of functions.numeric.float_round)."""
    return float_round(col, k)


def _arr_csv(col, sep: str = ","):
    """Serialize an array Column to a canonical delimited string.

    The driver's correctness harness canonicalizes results with pandas
    ``sort_values``, which cannot hash list-valued cells — so every
    registry query's OUTPUT schema must be scalar-only (enforced by
    tests/test_queries_contract.py). Operators keep returning real
    arrays for programmatic use; the registry layer flattens them with
    this helper, and the DuckDB oracles apply the equivalent
    ``array_to_string`` so values stay bit-comparable.
    """
    return F.array_join(F.transform(col, lambda x: x.cast("string")), sep)


def _alpha_tokens() -> Column:
    """Lowercased ASCII-alpha tokens of ``text``: the maximal runs of
    letters, lowercased — the corpus tokenization every text-analytics
    oracle in this registry states as
    ``list_filter(string_split(lower(regexp_replace(text, '[^A-Za-z ]',
    ' ', 'g')), ' '), t -> t <> '')``.

    SAME token stream, one pass: replacing every non-alpha char with a
    space and re-splitting is a per-char regex REWRITE of the whole
    corpus before tokenization even starts; splitting directly on
    ``[^A-Za-z]+`` and lowercasing the resulting tokens yields the
    identical maximal-ASCII-alpha-run tokens for ~13x less CPU —
    measured sf1: 0.21 s vs 2.70 s for the bare tokenize, and it took
    corpus_top_bigrams from 7.4 s to 1.1 s.

    ORDER MATTERS (r08 fix): the split must happen BEFORE any
    lowercasing. ``split(lower(text), '[^a-z]+')`` is NOT equivalent —
    Unicode characters whose lower() maps INTO ``[a-z]`` (U+212A KELVIN
    SIGN -> ``k``, U+0130 LATIN CAPITAL I WITH DOT -> ``i``) become
    token characters under that spelling, while the oracle strips them
    before lowering (``"xKy"`` with U+212A: oracle ``['x','y']``, the
    broken spelling ``['xky']``). Splitting the ORIGINAL text on
    ``[^A-Za-z]+`` makes every token a pure-ASCII letter run, on which
    per-token lower() cannot import or drop characters — exact on ALL
    inputs, proven by the three-way adversarial pin and the hypothesis
    property over random Unicode (tests/test_queries_contract.py). The
    empty-string filter drops the split artifacts at the text edges,
    exactly like the oracle's ``t <> ''``. Oracles keep the
    regexp_replace spelling — per-query hash matches pin the
    equivalence corpus-wide.
    """
    return F.transform(
        F.filter(F.split(F.col("text"), "[^A-Za-z]+"), lambda t: t != ""),
        F.lower,
    )


# =========================================================================
# TPC-H-style headline queries (bench + broad operator composition)
# =========================================================================

@query(
    "q1_pricing_summary",
    """
    -- money sums in exact scaled integers (order-free; see the exact
    -- money-aggregate idiom at the top of this module): prices are
    -- 2-decimal, price*(1-disc) 4-decimal, *(1+tax) 6-decimal, so the
    -- per-row quantization recovers the exact decimal value and the
    -- integer sum IS the true decimal total. Averages divide the exact
    -- sums by count and render with the bit-reproducible float round.
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS BIGINT)                       AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0                               AS sum_base_price,
           floor(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                     * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 100.0 + 0.5) / 100.0                          AS sum_disc_price,
           floor(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                     * (1 + l_tax) * 1000000.0 + 0.5)
                               AS BIGINT)) AS DOUBLE)
                 / 10000.0 + 0.5) / 100.0                        AS sum_charge,
           floor(sum(l_quantity) / count(*) * 10000.0 + 0.5)
             / 10000.0                                           AS avg_qty,
           floor(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 100.0 / count(*)
                 * 10000.0 + 0.5) / 10000.0                      AS avg_price,
           floor(CAST(sum(CAST(floor(l_discount * 100.0 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 100.0 / count(*)
                 * 10000.0 + 0.5) / 10000.0                      AS avg_disc,
           count(*)                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    note="TPC-H Q1 shape: scan → filter → 8-agg groupBy (A-family); "
         "money aggregates in exact scaled integers (order-free)",
)
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            _xr2(F.sum(_xc(F.col("l_extendedprice"), 2)), 2)
            .alias("sum_base_price"),
            _xr2(F.sum(_xc(disc_price, 4)), 4).alias("sum_disc_price"),
            _xr2(F.sum(_xc(disc_price * (1 + F.col("l_tax")), 6)), 6)
            .alias("sum_charge"),
            _fr(F.sum("l_quantity") / F.count(F.lit(1)), 4).alias("avg_qty"),
            _fr(
                _xr2(F.sum(_xc(F.col("l_extendedprice"), 2)), 2)
                / F.count(F.lit(1)), 4,
            ).alias("avg_price"),
            # discount <= 0.10 → scaled rows <= 10: long envelope is
            # ~1e13 even for q1's O(1) groups at 100 TB
            _fr(
                _xr2(F.sum(_xc(F.col("l_discount"), 2, "long")), 2)
                / F.count(F.lit(1)), 4,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           -- exact scaled-integer revenue (order-free; module-top idiom) —
           -- doubly important here: revenue is the top-k SORT KEY
           floor(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                     * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 100.0 + 0.5) / 100.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    note="TPC-H Q3 shape: 3-way join → agg → deterministic top-k "
         "(TakeOrderedAndProject; no single-partition window)",
)
def q3_shipping_priority(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            # per-order groups (<= 7 lines each at any SF): long envelope
            _xr2(
                F.sum(
                    _xc(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                        4, "long",
                    )
                ),
                4,
            ).alias("revenue")
        )
    )
    # Top-k via orderBy+limit => TakeOrderedAndProject: each partition keeps
    # its local top 10, the driver merges 10*numPartitions rows. Fully
    # distributed, unlike a row_number() window with no PARTITION BY (which
    # funnels every aggregated row through one partition).
    return rev.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           -- exact scaled-integer revenue (order-free; module-top idiom)
           floor(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                     * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 100.0 + 0.5) / 100.0 AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    WHERE r_name = 'EUROPE'
    GROUP BY n_name
    """,
    note="TPC-H Q5 shape: 6-way snowflake join, broadcast dims",
)
def q5_local_supplier_volume(spark, sf_dir):
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dims = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    # r11 examined, variant measured and REJECTED: pushing the EUROPE
    # filter down via customer⋈dims → orders → lineitem (to avoid the
    # joined fact re-shuffling by custkey at the scale where customer
    # outgrows broadcast) measured 2.2× WORSE at sf1 (2.37→5.14 s
    # interleaved fresh-JVM A/B) and −5% at sf10: the join-output size
    # estimates defeat the static broadcast choices, where this simple
    # chain lets AQE runtime-broadcast customer. Details in
    # OPTIMIZATION_r11.md §q5.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(dims), cust.c_nationkey == dims.n_nationkey)
        .join(F.broadcast(sup),
              (li.l_suppkey == sup.s_suppkey) & (sup.s_nationkey == dims.n_nationkey))
        .groupBy("n_name")
        .agg(
            _xr2(
                F.sum(
                    _xc(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                ),
                4,
            ).alias("revenue")
        )
    )


# =========================================================================
# S — scans / sources / sinks
# =========================================================================

@query(
    "s1_full_scan_projection",
    "SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice FROM lineitem",
    note="S1: full scan with explicit column projection (pruned at parquet)",
)
def s1_full_scan_projection(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@query(
    "s2_keyset_range_scan",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders WHERE o_orderkey >= 100 AND o_orderkey < 1100
    """,
    note="S2: keyset range scan (pushed to parquet row-groups)",
)
def s2_keyset_range_scan(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 1100))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@query(
    "s3_point_lookup",
    "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderkey = 777",
    note="S3: indexed point lookup → pushed predicate",
)
def s3_point_lookup(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 777)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


@query(
    "s4_sorted_limit",
    """
    SELECT o_orderkey, o_orderpriority FROM orders ORDER BY o_orderkey LIMIT 50
    """,
    note="S4/O4: deterministic LIMIT via sort on unique key",
)
def s4_sorted_limit(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .limit(50)
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "s5_csv_roundtrip",
    """
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_returnflag, l_quantity
    FROM lineitem WHERE l_orderkey < 200
    """,
    note="S5+S6: ';'-CSV sink then source; values must survive the trip",
)
def s5_csv_roundtrip(spark, sf_dir):
    from py_etl_spark.sources.csv_io import write_csv

    df = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 200)
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            "l_returnflag",
            "l_quantity",
        )
    )
    path = os.path.join(tempfile.mkdtemp(prefix="pyetl_csv_"), "lineitem_csv")
    write_csv(df, path)  # the real S6 sink (whitespace-preserving)
    return spark.read.csv(
        path,
        sep=";",
        header=True,
        schema="l_orderkey long, l_linenumber long, l_returnflag string, l_quantity double",
    )


@query(
    "s7_scope_scan",
    """
    SELECT 'n=' || n_name || ',r=' || r_name AS dn,
           CAST(n_nationkey AS BIGINT) AS nationkey
    FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    """,
    note="S7/P9/F11: hierarchical-path construction + scope (suffix) filter",
)
def s7_scope_scan(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.concat(F.lit("n="), "n_name", F.lit(",r="), "r_name").alias("dn"),
            F.col("n_nationkey").cast("long").alias("nationkey"),
        )
        .filter(F.col("dn").endswith(",r=EUROPE"))
    )


@query(
    "s10_tree_ancestors",
    """
    SELECT 'n=' || n_name || ',r=' || r_name AS dn
    FROM nation JOIN region ON n_regionkey = r_regionkey
    UNION
    SELECT DISTINCT 'r=' || r_name AS dn FROM region
    """,
    note="S10: bootstrap ancestor entries from leaf paths (prefix explode)",
)
def s10_tree_ancestors(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    leaves = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.concat(F.lit("n="), "n_name", F.lit(",r="), "r_name").alias("dn"))
    # ancestor = everything after the first ',' — derived from the leaf dn
    # itself (the reference splits RDNs the same way, etl.py:819-851).
    parents = leaves.select(
        F.expr("substring(dn, instr(dn, ',') + 1)").alias("dn")
    )
    return leaves.unionByName(parents).distinct()


# =========================================================================
# P — projections / filters / predicates
# =========================================================================

@query(
    "p3_rename_convert_projection",
    """
    SELECT c_custkey AS uid,
           upper(c_name) AS name_upper,
           c_mktsegment AS segment,
           CAST(floor(c_acctbal) AS BIGINT) AS acctbal_floor
    FROM customer
    """,
    note="P1-P3/F-family: explicit projection with rename map + conversions",
)
def p3_rename_convert_projection(spark, sf_dir):
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("uid"),
        F.upper("c_name").alias("name_upper"),
        F.col("c_mktsegment").alias("segment"),
        F.floor("c_acctbal").cast("long").alias("acctbal_floor"),
    )


@query(
    "p4_status_filter",
    """
    SELECT event_id, user_id, event_type FROM events
    WHERE event_type IN ('signup', 'purchase')
    """,
    note="P4: status IN-list filter (reference: status IN ('N','E'))",
)
def p4_status_filter(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "purchase"))
        .select("event_id", "user_id", "event_type")
    )


@query(
    "p5_watermark_filter",
    """
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events
    WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    """,
    note="P5: watermark predicate event_time > high-water-mark",
)
def p5_watermark_filter(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .select("event_id", "user_id", F.unix_millis("ts").alias("ts_ms"))
    )


@query(
    "p6_keyset_semi_join",
    """
    SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
    """,
    note="P6/J5: key-set membership as broadcast left-semi join",
)
def p6_keyset_semi_join(spark, sf_dir):
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        _t(spark, sf_dir, "lineitem")
        .join(big.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


@query(
    "p10_validity_routing",
    """
    SELECT event_id,
           CASE WHEN event_type NOT IN ('click','view','purchase','signup','error')
                  THEN 'F'
                WHEN value IS NULL OR value < 0 THEN 'F'
                WHEN value > 400 THEN 'W'
                ELSE 'S' END AS status,
           CASE WHEN event_type NOT IN ('click','view','purchase','signup','error')
                  THEN 'invalid event_type'
                WHEN value IS NULL OR value < 0 THEN 'invalid value'
                WHEN value > 400 THEN 'value out of range'
                ELSE NULL END AS error_message
    FROM events
    """,
    note="P10/F20: validation routing into status + error side-channel",
)
def p10_validity_routing(spark, sf_dir):
    valid_types = ["click", "view", "purchase", "signup", "error"]
    bad_type = ~F.col("event_type").isin(valid_types)
    bad_value = F.col("value").isNull() | (F.col("value") < 0)
    warn = F.col("value") > 400
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(bad_type, "F").when(bad_value, "F").when(warn, "W").otherwise("S").alias("status"),
        F.when(bad_type, "invalid event_type")
        .when(bad_value, "invalid value")
        .when(warn, "value out of range")
        .otherwise(F.lit(None).cast("string"))
        .alias("error_message"),
    )


@query(
    "p12_first_n_per_group",
    """
    SELECT event_type, event_id,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS BIGINT) AS rn
    FROM events QUALIFY rn <= 3
    """,
    note="P12/A6/W3: first-N-per-group sampling via window",
)
def p12_first_n_per_group(spark, sf_dir):
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("event_type", "event_id", "rn")
    )


# =========================================================================
# J — joins
# =========================================================================

@query(
    "j1_snapshot_reconcile_outer",
    """
    WITH db AS (SELECT c_custkey AS k FROM customer WHERE c_custkey < 100),
         st AS (SELECT DISTINCT user_id AS k FROM events
                WHERE user_id BETWEEN 50 AND 149)
    SELECT coalesce(db.k, st.k) AS key,
           CASE WHEN db.k IS NOT NULL AND st.k IS NOT NULL THEN 'both'
                WHEN db.k IS NOT NULL THEN 'db_only'
                ELSE 'state_only' END AS branch
    FROM db FULL OUTER JOIN st ON db.k = st.k
    """,
    note="J1: snapshot reconciliation = full-outer join with 3 branches "
         "(both→update, db_only→insert, state_only→delete)",
)
def j1_snapshot_reconcile_outer(spark, sf_dir):
    db = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select(F.col("c_custkey").alias("db_k"))
    )
    st = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").between(50, 149))
        .select(F.col("user_id").alias("st_k"))
        .distinct()
    )
    j = db.join(st, db.db_k == st.st_k, "full_outer")
    return j.select(
        F.coalesce("db_k", "st_k").alias("key"),
        F.when(F.col("db_k").isNotNull() & F.col("st_k").isNotNull(), "both")
        .when(F.col("db_k").isNotNull(), "db_only")
        .otherwise("state_only")
        .alias("branch"),
    )


@query(
    "j2_event_entity_lookup",
    """
    SELECT event_id, c_name, round(value, 2) AS value
    FROM events LEFT JOIN customer ON user_id = c_custkey
    """,
    note="J2: per-event entity lookup → one broadcast join, not N+1 queries",
)
def j2_event_entity_lookup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    return ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey, "left"
    ).select("event_id", "c_name", F.round("value", 2).alias("value"))


@query(
    "j3_two_key_fallback_join",
    """
    SELECT o_orderkey,
           coalesce(c1.c_name, c2.c_name) AS resolved_name,
           CASE WHEN c1.c_custkey IS NOT NULL THEN 'primary' ELSE 'fallback' END AS matched_via
    FROM orders
    LEFT JOIN customer c1 ON c1.c_custkey = o_custkey + 1000
    LEFT JOIN customer c2 ON c2.c_custkey = o_custkey
    """,
    note="J3: match by key1, fall back to key2 (reference: cn then uid)",
)
def j3_two_key_fallback_join(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    c1 = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k1"), F.col("c_name").alias("name1")
    )
    c2 = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k2"), F.col("c_name").alias("name2")
    )
    return (
        orders.join(F.broadcast(c1), F.col("o_custkey") + 1000 == F.col("k1"), "left")
        .join(F.broadcast(c2), F.col("o_custkey") == F.col("k2"), "left")
        .select(
            "o_orderkey",
            F.coalesce("name1", "name2").alias("resolved_name"),
            F.when(F.col("k1").isNotNull(), "primary").otherwise("fallback").alias("matched_via"),
        )
    )


@query(
    "j4_sorted_merge_tree_compare",
    """
    WITH lhs AS (SELECT o_orderkey, round(o_totalprice,2) AS v FROM orders
                 WHERE o_orderstatus = 'O'),
         rhs AS (SELECT o_orderkey, round(o_totalprice,2) AS v FROM orders
                 WHERE o_orderstatus = 'F')
    SELECT coalesce(lhs.o_orderkey, rhs.o_orderkey) AS o_orderkey,
           CASE WHEN lhs.o_orderkey IS NULL THEN 'only_rhs'
                WHEN rhs.o_orderkey IS NULL THEN 'only_lhs'
                ELSE 'both' END AS side
    FROM lhs FULL OUTER JOIN rhs ON lhs.o_orderkey = rhs.o_orderkey
    """,
    note="J4: two-tree structural diff as sort-merge full-outer join",
)
def j4_sorted_merge_tree_compare(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    lhs = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("lk")
    )
    rhs = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("rk")
    )
    return lhs.join(rhs, lhs.lk == rhs.rk, "full_outer").select(
        F.coalesce("lk", "rk").alias("o_orderkey"),
        F.when(F.col("lk").isNull(), "only_rhs")
        .when(F.col("rk").isNull(), "only_lhs")
        .otherwise("both")
        .alias("side"),
    )


@query(
    "j7_anti_join_guard",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    note="J7/E4: existence anti-check (delete-guard) as left-anti join",
)
def j7_anti_join_guard(spark, sf_dir):
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        _t(spark, sf_dir, "customer")
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


# =========================================================================
# A — aggregations
# =========================================================================

@query(
    "a1_count_by_group",
    "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
    note="A1: counts per group",
)
def a1_count_by_group(spark, sf_dir):
    return _t(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "a2_watermark_running_max",
    "SELECT user_id, max(epoch_ms(ts)) AS wm_ms FROM events GROUP BY user_id",
    note="A2: per-key running max event_time (the CDC watermark)",
)
def a2_watermark_running_max(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max(F.unix_millis("ts")).alias("wm_ms"))
    )


@query(
    "a3_last_writer_wins",
    """
    SELECT user_id, event_type, round(value, 2) AS value
    FROM (SELECT user_id, event_type, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
    """,
    note="A3/W1: last-writer-wins per key via ordered window",
)
def a3_last_writer_wins(spark, sf_dir):
    # max(struct) instead of a row_number window (r11, guide §2.3):
    # lexicographic struct max IS the (desc ts, desc event_id) winner
    # with its payload attached — the agg gets map-side partial combine
    # and no per-partition sort of the full event stream. Equivalent
    # because event_id makes (ts, event_id) unique per key.
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.struct("ts", "event_id", "event_type", "value")
            ).alias("__m")
        )
        .select(
            "user_id",
            F.col("__m.event_type").alias("event_type"),
            F.round("__m.value", 2).alias("value"),
        )
    )


@query(
    "a4_duplicate_key_detection",
    """
    SELECT o_custkey, count(*) AS n FROM orders
    GROUP BY o_custkey HAVING count(*) > 15
    """,
    note="A4: duplicate/overloaded-key detection (reference: uid ambiguity warning)",
)
def a4_duplicate_key_detection(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 15)
    )


@query(
    "a5_partition_boundaries",
    """
    SELECT tile, max(o_orderkey) AS upper_bound
    FROM (SELECT o_orderkey,
                 CAST(ntile(32) OVER (ORDER BY o_orderkey) AS BIGINT) AS tile
          FROM orders)
    GROUP BY tile
    """,
    note="A5: keyset partition-boundary computation (reference: every-1000th PK). "
         "Distributed-exact ntile: order statistics at cumulative tile sizes via "
         "range-bucketed ranking (operators.ranking), no global window. "
         "Production path for this use case is ranking.approx_partition_boundaries.",
)
def a5_partition_boundaries(spark, sf_dir):
    return ranking.exact_ntile_boundaries(
        _t(spark, sf_dir, "orders"), "o_orderkey", k=32
    )


@query(
    "a7_pending_work_exists",
    """
    SELECT count(*) AS n_pending FROM events
    WHERE event_type = 'error' AND value > 400
    """,
    note="A7: sync-completion existence check",
)
def a7_pending_work_exists(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "error") & (F.col("value") > 400))
        .agg(F.count(F.lit(1)).alias("n_pending"))
    )


# =========================================================================
# W — windows
# =========================================================================

@query(
    "w2_retry_escalation",
    """
    SELECT event_id, user_id,
           CAST(attempt AS BIGINT) AS attempt,
           CASE WHEN attempt > 10 THEN 'F' ELSE 'E' END AS status
    FROM (SELECT event_id, user_id,
                 count(*) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attempt
          FROM events WHERE event_type = 'error')
    """,
    note="W2/ST4: retry counter accumulation with poison-pill cutoff >10",
)
def w2_retry_escalation(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).cast("long").alias("attempt"),
        )
        .withColumn("status", F.when(F.col("attempt") > 10, "F").otherwise("E"))
    )


# =========================================================================
# O — sorts / limits
# =========================================================================

@query(
    "o2_case_insensitive_sort",
    """
    SELECT doc_id, source,
           CAST(row_number() OVER (ORDER BY lower(source), doc_id) AS BIGINT) AS position
    FROM documents
    """,
    note="O2/O3: case-insensitive deterministic ordering (golden-dump contract). "
         "Range-partitioned global rank (zipWithIndex pattern) — no "
         "exchange-to-one; driver sees only bucket counts.",
)
def o2_case_insensitive_sort(spark, sf_dir):
    # Checkpoint the narrow (doc_id, source) frame once (r11, same
    # pattern as stable_row_ids_docs): with_global_position walks its
    # input lineage four times (count, boundary sample, bucket counts,
    # final plan) — against the raw scan that is four parquet passes.
    #
    # Retention + reliability (ADVICE r11, applies to all 4 eager
    # localCheckpoint sites in this module): the blocks live until the
    # Python frame is GC'd (py4j finalizer → ContextCleaner unpersist);
    # sweep harnesses (bench.py/check_correctness) additionally
    # unpersist between queries. localCheckpoint is NON-RELIABLE
    # storage — at the 1000-executor posture an executor loss drops its
    # blocks and fails the job (no lineage to recompute); for cluster
    # runs where that matters, set a checkpoint dir and use reliable
    # checkpoint() on these narrow frames instead (SCALING.md
    # localCheckpoint discussion).
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "source")
        # lazy (r12): with_global_position's count() doubles as the
        # materialization job — one driver round trip, not two
        .localCheckpoint(eager=False)
    )
    return ranking.with_global_position(
        docs, [F.lower("source"), F.col("doc_id")], position_col="position"
    ).select("doc_id", "source", "position")


# =========================================================================
# E — set operations
# =========================================================================

@query(
    "e1_set_difference",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    GROUP BY user_id HAVING count(*) > 15
    """,
    note="E1/E4: set difference (keys in lhs minus heavy-error keys)",
)
def e1_set_difference(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    errorers = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 15)
        .select("user_id")
    )
    # subtract = EXCEPT DISTINCT (set semantics, matching the SQL oracle);
    # exceptAll would be multiset difference — wrong here.
    return clickers.subtract(errorers)


@query(
    "e2_set_intersection",
    """
    SELECT user_id FROM events WHERE event_type = 'signup'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    note="E2: set intersection",
)
def e2_set_intersection(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "signup").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


# =========================================================================
# F — scalar function suites
# =========================================================================

@query(
    "f_string_suite",
    """
    SELECT c_custkey,
           'cn=' || c_name || ',ou=user,ou=ph08,o=BMUKK' AS dn,
           regexp_replace('cn=' || c_name || ',ou=user,ou=ph08,o=BMUKK',
                          'ou=ph[0-9]+', 'ou=ph15') AS dn15,
           CAST(split_part('pk_uniqueid=' || c_custkey, '=', -1) AS BIGINT) AS extracted_key,
           lower(c_mktsegment) AS seg_lower,
           CASE WHEN c_name LIKE 'Customer%' THEN 1 ELSE 0 END AS has_prefix
    FROM customer
    """,
    note="F8/F10/F11/F12: key extraction, dn build, instance rewrite, case fns",
)
def f_string_suite(spark, sf_dir):
    from py_etl_spark.functions import conversions as C

    dn = F.concat(F.lit("cn="), "c_name", F.lit(",ou=user,ou=ph08,o=BMUKK"))
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        dn.alias("dn"),
        C.rewrite_instance_in_dn(dn, "ph15").alias("dn15"),
        C.key_from_table_key(
            F.concat(F.lit("pk_uniqueid="), F.col("c_custkey").cast("string"))
        ).alias("extracted_key"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.when(F.col("c_name").startswith("Customer"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("has_prefix"),
    )


@query(
    "f_date_number_suite",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '.0' AS date_str,
           strftime(o_orderdate, '%Y%m%d%H%M%S') || 'Z' AS generalized_time,
           CAST(floor(o_totalprice) AS BIGINT) AS price_int,
           CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) AS price_str
    FROM orders
    """,
    note="F1/F2/F7: db-date '.0' rendering, GeneralizedTime, float→int-string keys",
)
def f_date_number_suite(spark, sf_dir):
    from py_etl_spark.functions import conversions as C

    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        C.from_db_date("o_orderdate").alias("date_str"),
        C.generalized_time("o_orderdate").alias("generalized_time"),
        F.floor("o_totalprice").cast("long").alias("price_int"),
        F.floor("o_totalprice").cast("long").cast("string").alias("price_str"),
    )


@query(
    "f_hash_fingerprint",
    """
    SELECT doc_id, md5(text) AS fp_md5, sha256(text) AS fp_sha256 FROM documents
    """,
    note="F13/F19-adjacent: portable content hashing (md5 + sha256)",
)
def f_hash_fingerprint(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("fp_md5"), F.sha2(F.col("text").cast("binary"), 256).alias("fp_sha256")
    )


# =========================================================================
# Streaming-shaped (windowed aggregation — batch-equivalent oracle)
# =========================================================================

@query(
    "st_tumbling_window_agg",
    """
    SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_ms,
           event_type,
           count(*) AS n,
           -- exact scaled-integer sum (order-free; module-top idiom):
           -- value quantized per row to 1e-4 units, summed exactly
           floor(CAST(sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100.0 + 0.5) / 100.0 AS sum_value
    FROM events GROUP BY 1, 2
    """,
    note="ST1-shape: tumbling 1h windowed aggregation (streaming-equivalent plan)",
)
def st_tumbling_window_agg(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # per-(window, type) groups scale with the data: long
            _xr2(F.sum(_xc(F.col("value"), 4, "long")), 4)
            .alias("sum_value"),
        )
        .select(
            F.unix_millis("w.start").alias("window_start_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# =========================================================================
# CDC merge (flagship — reference J1+ST8 semantics on the star schema)
# =========================================================================

CDC_MERGE_ORACLE = """
    WITH latest AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
    )
    SELECT c_custkey AS uid, c_name AS name, c_mktsegment AS segment,
           round(CASE WHEN l.user_id IS NOT NULL THEN l.value
                      ELSE c_acctbal END, 2) AS acctbal
    FROM customer c LEFT JOIN latest l ON c.c_custkey = l.user_id
    WHERE l.user_id IS NULL OR l.event_type <> 'error'
"""


@query(
    "cdc_merge_scd1",
    CDC_MERGE_ORACLE,
    note="Flagship: J1/A3/ST5/ST8 — latest-event-per-key applied to keyed "
         "state via the join-based merge kernel (delete on 'error', "
         "value update otherwise)",
)
def cdc_merge_scd1(spark, sf_dir):
    from py_etl_spark.operators.merge import OP_COL, OP_DELETE, OP_UPSERT

    cust = _t(spark, sf_dir, "customer")
    state = cust.select(
        F.col("c_custkey").alias("uid"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    # Latest-event-per-key as max(struct(ts, event_id, payload)) instead
    # of a row_number window (r11, guide §2.3): struct comparison is
    # lexicographic, so the max struct IS the (desc ts, desc event_id)
    # winner with its payload attached — same row the rn=1 filter
    # picked, pinned by the oracle's row_number spelling. The agg gets
    # map-side partial combine (the exchange carries per-task key
    # partials, not every event) and a hash aggregate replaces the
    # window's per-partition SORT of the full event stream.
    latest = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.struct("ts", "event_id", "event_type", "value")
            ).alias("__m")
        )
        .select(
            "user_id",
            F.col("__m.event_type").alias("event_type"),
            F.col("__m.value").alias("value"),
        )
    )
    # Change rows carry only the columns they modify; name/segment ride along
    # from state via the merge's column-wise coalesce.
    changes = latest.join(
        state, latest.user_id == state.uid, "inner"
    ).select(
        "uid",
        "name",
        "segment",
        F.round("value", 2).alias("acctbal"),
        F.when(F.col("event_type") == "error", OP_DELETE)
        .otherwise(OP_UPSERT)
        .alias(OP_COL),
    )
    return scd1_merge(state, changes, keys=["uid"])


@query(
    "cdc_tombstone_lifecycle",
    """
    WITH latest AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
    )
    SELECT c_custkey AS uid, c_name AS name,
           round(CASE WHEN l.user_id IS NOT NULL AND l.event_type <> 'error'
                      THEN l.value ELSE c_acctbal END, 2) AS acctbal,
           CASE WHEN l.event_type = 'error' THEN 'GESPERRT' ELSE 'OK' END AS status,
           CASE WHEN l.event_type = 'error' THEN 'TRUE' END AS deleted
    FROM customer c LEFT JOIN latest l ON c.c_custkey = l.user_id
    """,
    note="ST5/ST6 on the star schema: deletes tombstone (flag + forced "
         "status) instead of removing rows — the merge kernel's soft-delete "
         "policy, oracle-checked",
)
def cdc_tombstone_lifecycle(spark, sf_dir):
    from py_etl_spark.operators.merge import OP_COL, OP_DELETE, OP_UPSERT

    cust = _t(spark, sf_dir, "customer")
    state = cust.select(
        F.col("c_custkey").alias("uid"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("OK").alias("status"),
        F.lit(None).cast("string").alias("deleted"),
    )
    # max(struct) latest-per-key — same rewrite as cdc_merge_scd1 above
    # (guide §2.3: map-side partial combine, no full event sort)
    latest = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.struct("ts", "event_id", "event_type", "value")
            ).alias("__m")
        )
        .select(
            "user_id",
            F.col("__m.event_type").alias("event_type"),
            F.col("__m.value").alias("value"),
        )
    )
    changes = latest.join(state, latest.user_id == state.uid, "inner").select(
        "uid",
        "name",
        F.round("value", 2).alias("acctbal"),
        F.lit("OK").alias("status"),
        F.lit(None).cast("string").alias("deleted"),
        F.when(F.col("event_type") == "error", OP_DELETE)
        .otherwise(OP_UPSERT)
        .alias(OP_COL),
    )
    policy = MergePolicy(
        tombstone_col="deleted",
        tombstone_value="TRUE",
        tombstone_overrides={"status": "GESPERRT"},
    )
    return scd1_merge(state, changes, keys=["uid"], policy=policy)


@query(
    "scd2_history_from_events",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_type, event_id,
             lag(1) OVER w AS prev_marker,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), survivors AS (
      SELECT * FROM ordered
      WHERE prev_marker IS NULL OR event_type IS DISTINCT FROM prev_type
    )
    SELECT user_id,
           event_type,
           CAST(row_number() OVER w2 AS BIGINT)            AS version,
           CAST(epoch_ms(ts) AS BIGINT)                    AS valid_from_ms,
           CAST(epoch_ms(lead(ts) OVER w2) AS BIGINT)      AS valid_to_ms,
           lead(ts) OVER w2 IS NULL                        AS is_current
    FROM survivors
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    note="SCD Type-2 history build from a change log "
    "(operators/merge.scd2_history): per-key no-op suppression, validity "
    "intervals via lead(), one exchange for both windows",
)
def scd2_history_from_events(spark, sf_dir):
    from py_etl_spark.operators.merge import scd2_history

    hist = scd2_history(
        _t(spark, sf_dir, "events"),
        keys=["user_id"],
        ts_col="ts",
        tracked=["event_type"],
        tie_breakers=["event_id"],
    )
    return hist.select(
        "user_id",
        "event_type",
        "version",
        F.unix_millis("valid_from").alias("valid_from_ms"),
        F.unix_millis("valid_to").alias("valid_to_ms"),
        "is_current",
    )


@query(
    "kmv_distinct_users",
    """
    WITH hashed AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ), topk AS (
      SELECT * FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM hashed
      ) WHERE rn <= 64
    )
    SELECT event_type,
           count(*)    AS n_kept,
           max(h)      AS kth_hash,
           CAST(CASE WHEN count(*) < 64 THEN count(*)
                     ELSE round(63.0 * 1152921504606846976.0 / max(h))
                END AS BIGINT) AS estimate,
           array_to_string(array_agg(h ORDER BY h), ',') AS sketch_csv
    FROM topk GROUP BY event_type
    """,
    note="KMV distinct-count sketch (operators/sketch.kmv_distinct): "
    "portable md5-hash k-minimum-values, mergeable, deterministic "
    "estimate — the cross-engine/rollup-tree alternative to HLL; the "
    "sketch itself is emitted as a canonical CSV string (driver-safe "
    "scalar output, values unchanged)",
)
def kmv_distinct_users(spark, sf_dir):
    from py_etl_spark.operators.sketch import kmv_distinct

    sk = kmv_distinct(
        _t(spark, sf_dir, "events"), col="user_id", k=64,
        group_cols=("event_type",),
    )
    return sk.withColumn("sketch_csv", _arr_csv(F.col("sketch"))).drop(
        "sketch"
    )


@query(
    "corpus_sample_mixture",
    """
    SELECT doc_id, source, lang, n_chars
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8))
               AS BIGINT) % 1000000
          < CASE source
              WHEN 'src0' THEN 1000000
              WHEN 'src1' THEN  500000
              WHEN 'src2' THEN  250000
              ELSE              100000
            END
    """,
    note="Mixture-weighted deterministic sampling "
    "(operators/corpus.sample_mixture): per-source keep rates via salted "
    "id-hash thresholds — map-side, zero shuffle, bit-reproducible",
)
def corpus_sample_mixture(spark, sf_dir):
    from py_etl_spark.operators.corpus import sample_mixture

    return sample_mixture(
        _t(spark, sf_dir, "documents").select(
            "doc_id", "source", "lang", "n_chars"
        ),
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_rate=0.1,
    )


# Deterministic demo weights for the hashed linear quality gate (a real
# deployment passes trained fastText-style weights; the math is identical).
_QUALITY_DIM = 64
_QUALITY_WEIGHTS = [
    round(((i * 2654435761) % 2000) / 1000.0 - 1.0, 3)
    for i in range(_QUALITY_DIM)
]
_QUALITY_BIAS = 0.25


def _quality_linear_oracle() -> str:
    wlist = ", ".join(repr(w) for w in _QUALITY_WEIGHTS)
    return f"""
    WITH scored AS (
      SELECT doc_id,
             list_transform(
               list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                           tok -> tok <> ''),
               tok -> (CAST([{wlist}] AS DOUBLE[]))[
                 CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                   % {_QUALITY_DIM} + 1]
             ) AS ws
      FROM documents
    )
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_tokens,
           -- + 0.0 folds IEEE -0.0 (DuckDB's sign-preserving round of a
           -- tiny negative logit) to +0.0, matching Spark's BigDecimal
           -- round which never emits -0.0
           round({_QUALITY_BIAS!r} +
                 list_reduce(list_prepend(0.0, ws), (a, b) -> a + b)
                   / greatest(len(ws), 1), 6) + 0.0  AS logit,
           ({_QUALITY_BIAS!r} +
            list_reduce(list_prepend(0.0, ws), (a, b) -> a + b)
              / greatest(len(ws), 1)) >= 0     AS is_quality
    FROM scored
    """


def _curation_pipeline_oracle() -> str:
    wlist = ", ".join(repr(w) for w in _QUALITY_WEIGHTS)
    return f"""
    WITH scored AS (
      SELECT doc_id, source, text,
             list_transform(
               list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                           tok -> tok <> ''),
               tok -> (CAST([{wlist}] AS DOUBLE[]))[
                 CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                   % {_QUALITY_DIM} + 1]
             ) AS ws
      FROM documents
    ), gated AS (
      SELECT doc_id, source, text,
             CAST(len(ws) AS BIGINT) AS n_tokens,
             -- + 0.0: fold -0.0 to +0.0 (see _quality_linear_oracle)
             round({_QUALITY_BIAS!r} +
                   list_reduce(list_prepend(0.0, ws), (a, b) -> a + b)
                     / greatest(len(ws), 1), 6) + 0.0 AS logit
      FROM scored
      WHERE ({_QUALITY_BIAS!r} +
             list_reduce(list_prepend(0.0, ws), (a, b) -> a + b)
               / greatest(len(ws), 1)) >= 0
    ), keepers AS (
      SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
      FROM gated
      GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
    )
    SELECT g.doc_id, g.source, g.n_tokens, g.logit
    FROM gated g JOIN keepers k ON k.doc_id = g.doc_id
    """


@query(
    "corpus_curation_pipeline",
    _curation_pipeline_oracle(),
    note="End-to-end curation composition: model-based quality gate → "
    "exact dedup among survivors (min-id keeper) — operators compose "
    "without materialization barriers; the gate is map-side, dedup adds "
    "its one fingerprint shuffle + keeper semi-join",
)
def corpus_curation_pipeline(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # source/text carried through the scorer: one scan, no self-join
    gated = textstats.quality_score_hashed_linear(
        docs,
        weights=_QUALITY_WEIGHTS,
        bias=_QUALITY_BIAS,
        keep_cols=("source", "text"),
    ).filter(F.col("is_quality"))
    kept = dedup.deduplicate_exact(gated)
    return kept.select("doc_id", "source", "n_tokens", "logit")


@query(
    "quality_score_hashed_linear",
    _quality_linear_oracle(),
    note="Model-based quality gate (textstats.quality_score_hashed_linear):"
    " fastText-shaped hashing-trick linear classifier, mean-pooled logits "
    "over a literal weight vector — zero shuffle, no Python, bit-exact "
    "across engines (sigmoid deliberately omitted: exp() is libm-specific)",
)
def quality_score_hashed_linear(spark, sf_dir):
    return textstats.quality_score_hashed_linear(
        _t(spark, sf_dir, "documents"),
        weights=_QUALITY_WEIGHTS,
        bias=_QUALITY_BIAS,
    )


@query(
    "scd2_apply_incremental",
    """
    WITH log1 AS (
      SELECT user_id, ts, event_type, event_id FROM events
      WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    ), latest AS (
      SELECT user_id, ts, event_type, event_id FROM (
        SELECT user_id, ts, event_type, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
      ) WHERE rn = 1
    ), log AS (
      SELECT * FROM log1 UNION ALL SELECT * FROM latest
    ), ordered AS (
      SELECT user_id, ts, event_type, event_id,
             lag(1) OVER w AS prev_marker,
             lag(event_type) OVER w AS prev_type
      FROM log
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), survivors AS (
      SELECT * FROM ordered
      WHERE prev_marker IS NULL OR event_type IS DISTINCT FROM prev_type
    )
    SELECT user_id,
           event_type,
           CAST(row_number() OVER w2 AS BIGINT)            AS version,
           CAST(epoch_ms(ts) AS BIGINT)                    AS valid_from_ms,
           CAST(epoch_ms(lead(ts) OVER w2) AS BIGINT)      AS valid_to_ms,
           lead(ts) OVER w2 IS NULL                        AS is_current
    FROM survivors
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    note="SCD2 incremental apply (operators/merge.scd2_apply): history "
    "built to a cutoff, then ONE batch (last-writer-wins per key) applied "
    "against the is_current slice only; oracle is the full rebuild over "
    "the same composed log — the equivalence the apply must preserve",
)
def scd2_apply_incremental(spark, sf_dir):
    from py_etl_spark.operators.merge import scd2_apply, scd2_history

    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    base = scd2_history(
        ev.filter(F.col("ts") < cutoff),
        keys=["user_id"],
        ts_col="ts",
        tracked=["event_type"],
        tie_breakers=["event_id"],
    )
    # max(struct) latest-per-key — same rewrite as cdc_merge_scd1
    # (guide §2.3: map-side partial combine, no full event sort)
    batch = (
        ev.filter(F.col("ts") >= cutoff)
        .groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("__m"))
        .select(
            "user_id",
            F.col("__m.ts").alias("ts"),
            F.col("__m.event_type").alias("event_type"),
        )
    )
    hist = scd2_apply(
        base, batch, keys=["user_id"], ts_col="ts", tracked=["event_type"]
    )
    return hist.select(
        "user_id",
        "event_type",
        "version",
        F.unix_millis("valid_from").alias("valid_from_ms"),
        F.unix_millis("valid_to").alias("valid_to_ms"),
        "is_current",
    )


@query(
    "kmv_distinct_rollup",
    """
    WITH hashed AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ), topk AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hashed
      ) WHERE rn <= 64
    )
    SELECT count(*) AS n_kept,
           max(h)   AS kth_hash,
           CAST(CASE WHEN count(*) < 64 THEN count(*)
                     ELSE round(63.0 * 1152921504606846976.0 / max(h))
                END AS BIGINT) AS estimate,
           array_to_string(array_agg(h ORDER BY h), ',') AS sketch_csv
    FROM topk
    """,
    note="KMV rollup tree (operators/sketch.kmv_rollup): per-event_type "
    "sketches merged into the global sketch WITHOUT re-touching raw "
    "values; the oracle computes the global sketch directly, so a "
    "hash-match proves the merge is lossless",
)
def kmv_distinct_rollup(spark, sf_dir):
    from py_etl_spark.operators.sketch import kmv_distinct, kmv_rollup

    per_type = kmv_distinct(
        _t(spark, sf_dir, "events"), col="user_id", k=64,
        group_cols=("event_type",),
    )
    merged = kmv_rollup(per_type, k=64)
    return merged.withColumn("sketch_csv", _arr_csv(F.col("sketch"))).drop(
        "sketch"
    )


@query(
    "bloom_build_users",
    """
    WITH base AS (
      SELECT DISTINCT event_type,
             md5(CAST(user_id AS VARCHAR)) AS mv
      FROM events
    ), hashed AS (
      SELECT event_type,
             CAST(('0x' || substr(mv, 1, 15)) AS BIGINT)  AS h1,
             CAST(('0x' || substr(mv, 16, 15)) AS BIGINT) AS h2
      FROM base
    ), pos AS (
      SELECT event_type, (h1 + i * h2) % 1008 AS p
      FROM hashed CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t
    ), wordrows AS (
      SELECT event_type, p // 63 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS b
      FROM pos GROUP BY 1, 2
    ), grid AS (
      SELECT g.event_type, gw.w
      FROM (SELECT DISTINCT event_type FROM events) g
      CROSS JOIN (SELECT unnest(range(0, 16)) AS w) gw
    ), filled AS (
      SELECT grid.event_type, grid.w, coalesce(wordrows.b, 0) AS b
      FROM grid LEFT JOIN wordrows
        ON wordrows.event_type = grid.event_type AND wordrows.w = grid.w
    )
    SELECT event_type,
           array_to_string(array_agg(b ORDER BY w), ',') AS bloom_csv,
           CAST(sum(bit_count(b)) AS BIGINT) AS n_bits_set
    FROM filled GROUP BY event_type
    """,
    note="Portable Bloom filter build (operators/sketch.bloom_build): "
    "Kirsch-Mitzenmacher double hashing over md5 slices, 63-bit words, "
    "bit_or merge (commutative → order-independent, mergeable across "
    "partitions); the cross-job semi-join pruning primitive",
)
def bloom_build_users(spark, sf_dir):
    from py_etl_spark.operators.sketch import bloom_build

    bl = bloom_build(
        _t(spark, sf_dir, "events"), col="user_id", words=16, k_hashes=4,
        group_cols=("event_type",),
    )
    return bl.withColumn("bloom_csv", _arr_csv(F.col("bloom"))).drop("bloom")


@query(
    "bloom_semi_join_prune",
    """
    WITH members AS (
      SELECT DISTINCT md5(CAST(c_custkey AS VARCHAR)) AS mv
      FROM customer WHERE c_mktsegment = 'BUILDING'
    ), mwords AS (
      SELECT p // 63 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS b
      FROM (
        SELECT (CAST(('0x' || substr(mv, 1, 15)) AS BIGINT)
                + i * CAST(('0x' || substr(mv, 16, 15)) AS BIGINT)) % 8064
                 AS p
        FROM members CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t
      ) GROUP BY 1
    ), opos AS (
      SELECT o_orderkey, o_custkey,
             (CAST(('0x' || substr(mv, 1, 15)) AS BIGINT)
              + i * CAST(('0x' || substr(mv, 16, 15)) AS BIGINT)) % 8064
               AS p
      FROM (SELECT o_orderkey, o_custkey,
                   md5(CAST(o_custkey AS VARCHAR)) AS mv FROM orders)
      CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t
    ), ohit AS (
      SELECT o_orderkey, o_custkey,
             bool_and((coalesce(mw.b, 0)
                       & (CAST(1 AS BIGINT) << CAST(p % 63 AS INT))) != 0)
               AS hit
      FROM opos LEFT JOIN mwords mw ON mw.w = opos.p // 63
      GROUP BY 1, 2
    )
    SELECT count(*) AS n_orders,
           count(*) FILTER (WHERE hit) AS n_bloom_pass,
           count(*) FILTER (WHERE o_custkey IN (
             SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           )) AS n_exact_match,
           count(*) FILTER (WHERE hit AND o_custkey NOT IN (
             SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           )) AS n_false_positives
    FROM ohit
    """,
    note="Bloom pruning end-to-end: filter built on the dim side's keys "
    "(words*8 bytes of driver metadata), orders pre-filtered map-side "
    "before any shuffle; output measures the actual FPR on real data — "
    "the cross-job semi-join pruning pattern, fully deterministic",
)
def bloom_semi_join_prune(spark, sf_dir):
    from py_etl_spark.operators.sketch import bloom_build, bloom_contains

    cust = _t(spark, sf_dir, "customer")
    members = cust.filter(F.col("c_mktsegment") == "BUILDING")
    bloom_row = bloom_build(
        members, col="c_custkey", words=128, k_hashes=4
    ).collect()[0]
    orders = _t(spark, sf_dir, "orders")
    hit = bloom_contains(list(bloom_row.bloom), F.col("o_custkey"), 4)
    exact = orders.join(
        members.select(F.col("c_custkey").alias("o_custkey")).distinct(),
        "o_custkey",
        "left_semi",
    ).select("o_orderkey").withColumn("__m", F.lit(True))
    return (
        orders.withColumn("__hit", hit)
        .join(exact, "o_orderkey", "left")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("__hit"), 1)).alias("n_bloom_pass"),
            F.count(F.when(F.col("__m"), 1)).alias("n_exact_match"),
            F.count(
                F.when(F.col("__hit") & F.col("__m").isNull(), 1)
            ).alias("n_false_positives"),
        )
    )


@query(
    "cm_sketch_events",
    """
    WITH hashed AS (
      SELECT event_type,
             CAST(('0x' || substr(mv, 1, 15)) AS BIGINT)  AS h1,
             CAST(('0x' || substr(mv, 16, 15)) AS BIGINT) AS h2
      FROM (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS mv
            FROM events)
    ), pos AS (
      SELECT event_type, i AS d, (h1 + i * h2) % 64 AS p
      FROM hashed CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t
    ), cells AS (
      SELECT event_type, d, p, count(*) AS c FROM pos GROUP BY 1, 2, 3
    ), grid AS (
      SELECT g.event_type, gd.d, gp.p
      FROM (SELECT DISTINCT event_type FROM events) g
      CROSS JOIN (SELECT unnest(range(0, 4)) AS d) gd
      CROSS JOIN (SELECT unnest(range(0, 64)) AS p) gp
    ), filled AS (
      SELECT grid.event_type, grid.d, grid.p, coalesce(cells.c, 0) AS c
      FROM grid LEFT JOIN cells
        ON cells.event_type = grid.event_type
       AND cells.d = grid.d AND cells.p = grid.p
    ), rows_ AS (
      SELECT event_type, d,
             array_agg(c ORDER BY p) AS row,
             CAST(sum(c) AS BIGINT)  AS rowsum
      FROM filled GROUP BY 1, 2
    )
    SELECT event_type,
           array_to_string(
             list_transform(array_agg(row ORDER BY d),
                            r -> array_to_string(r, ',')),
             ';') AS cm_csv,
           max(CASE WHEN d = 0 THEN rowsum END) AS n_items
    FROM rows_ GROUP BY event_type
    """,
    note="Count-min sketch build (operators/sketch.cm_sketch): portable "
    "md5 double-hashing, plain-sum counters (elementwise-add merge → "
    "shuffle-order-independent, per-partition rollup exact); the "
    "frequency sibling of KMV (distinct) and Bloom (membership)",
)
def cm_sketch_events(spark, sf_dir):
    from py_etl_spark.operators.sketch import cm_sketch

    sk = cm_sketch(
        _t(spark, sf_dir, "events"), col="user_id", width=64, depth=4,
        group_cols=("event_type",),
    )
    cm_csv = F.array_join(
        F.transform(F.col("cm"), lambda r: _arr_csv(r)), ";"
    )
    return sk.withColumn("cm_csv", cm_csv).drop("cm")


@query(
    "cm_estimate_heavy_users",
    """
    WITH hashed AS (
      SELECT CAST(('0x' || substr(mv, 1, 15)) AS BIGINT)  AS h1,
             CAST(('0x' || substr(mv, 16, 15)) AS BIGINT) AS h2
      FROM (SELECT md5(CAST(user_id AS VARCHAR)) AS mv FROM events)
    ), cells AS (
      SELECT i AS d, (h1 + i * h2) % 512 AS p, count(*) AS c
      FROM hashed CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t
      GROUP BY 1, 2
    ), exact AS (
      SELECT user_id, count(*) AS exact_count
      FROM events GROUP BY user_id
      ORDER BY exact_count DESC, user_id LIMIT 20
    ), epos AS (
      SELECT e.user_id, e.exact_count, i.i AS d,
             (CAST(('0x' || substr(mv, 1, 15)) AS BIGINT)
              + i.i * CAST(('0x' || substr(mv, 16, 15)) AS BIGINT)) % 512 AS p
      FROM (SELECT user_id, exact_count,
                   md5(CAST(user_id AS VARCHAR)) AS mv FROM exact) e
      CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
    )
    SELECT epos.user_id,
           CAST(max(epos.exact_count) AS BIGINT) AS exact_count,
           CAST(min(coalesce(cells.c, 0)) AS BIGINT) AS cm_estimate,
           CAST(min(coalesce(cells.c, 0)) - max(epos.exact_count) AS BIGINT)
             AS overcount
    FROM epos LEFT JOIN cells ON cells.d = epos.d AND cells.p = epos.p
    GROUP BY epos.user_id
    """,
    note="CM point estimates vs exact counts for the top-20 heavy users: "
    "one-sided error demonstrated end-to-end (overcount >= 0 for every "
    "key); sketch collected as depth*width*8 bytes of driver metadata, "
    "estimate applied as a map-side expression",
)
def cm_estimate_heavy_users(spark, sf_dir):
    from py_etl_spark.operators.sketch import cm_point_estimate, cm_sketch

    events = _t(spark, sf_dir, "events")
    sk = cm_sketch(events, col="user_id", width=512, depth=4).collect()[0]
    cm = [list(row) for row in sk.cm]
    heavy = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), "user_id")
        .limit(20)
    )
    return heavy.select(
        "user_id",
        "exact_count",
        cm_point_estimate(cm, F.col("user_id")).alias("cm_estimate"),
        (
            cm_point_estimate(cm, F.col("user_id")) - F.col("exact_count")
        ).alias("overcount"),
    )


@query(
    "lm_fluency_bits",
    f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{_BPE_TOKEN_RE}') AS t
      FROM documents
    ), uni AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), pairs AS (
      SELECT doc_id,
             unnest(t[1:len(t)-1]) AS w1,
             unnest(t[2:len(t)])   AS w2
      FROM toks
    ), big AS (
      SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2
    ), tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
    scored AS (
      SELECT p.doc_id,
             CASE
               WHEN big.c12 IS NOT NULL
                 THEN length(bin(u1.c // big.c12)) - 1
               WHEN u2.c IS NOT NULL
                 THEN 2 + length(bin(tot.n // u2.c)) - 1
               ELSE 6 + length(bin(tot.n)) - 1
             END AS bits
      FROM pairs p
      LEFT JOIN big ON big.w1 = p.w1 AND big.w2 = p.w2
      LEFT JOIN uni u1 ON u1.w = p.w1
      LEFT JOIN uni u2 ON u2.w = p.w2
      CROSS JOIN tot
    ), per_doc AS (
      SELECT doc_id,
             CAST(count(*)  AS BIGINT) AS n_pairs,
             CAST(sum(bits) AS BIGINT) AS total_bits
      FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(per_doc.n_pairs, 0)    AS n_pairs,
           coalesce(per_doc.total_bits, 0) AS total_bits,
           floor((per_doc.total_bits / per_doc.n_pairs) * 1000000.0 + 0.5)
             / 1000000.0 AS avg_bits,
           coalesce(floor((per_doc.total_bits / per_doc.n_pairs)
                          * 1000000.0 + 0.5) / 1000000.0 <= 8.0,
                    false) AS is_fluent
    FROM documents d LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
    """,
    note="Bigram-LM fluency gate (operators/lm): the CCNet-style "
    "perplexity filter with stupid backoff, scored in integer code-"
    "length bits (floor-log2 via bin-string length) so per-doc totals "
    "are exact BIGINT sums — cross-engine bit-exact, no libm in the "
    "plan; train = 2 count-shuffles, score = 2 model joins + 1 doc agg",
)
def lm_fluency_bits(spark, sf_dir):
    from py_etl_spark.operators.lm import lm_score, tokenize_docs, train_bigram_lm

    docs = _t(spark, sf_dir, "documents")
    # Tokenize ONCE: train + score walk the token stream 4x (unigrams,
    # bigram pairs, total scalar, scoring pairs); materializing the
    # narrow (doc_id, toks) frame turns 4 corpus regex passes into 1
    # (r08, measured sf10: 45.9 -> see SCALING.md). Blocks are freed
    # with the frame's RDD by the ContextCleaner.
    # lazy (r12): the total-token agg below doubles as the
    # materialization job — one driver round trip, not two
    toks = tokenize_docs(docs).localCheckpoint(eager=False)
    unigrams, bigrams = train_bigram_lm(toks_df=toks)
    total = unigrams.agg(F.sum("c")).collect()[0][0]
    return lm_score(
        docs, unigrams, bigrams, total_tokens=int(total), toks_df=toks
    )


@query(
    "bm25_search_topk",
    f"""
    WITH base AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
             CAST(len(list_filter(t, x -> x = 'hash'))   AS BIGINT) AS tf0,
             CAST(len(list_filter(t, x -> x = 'join'))   AS BIGINT) AS tf1,
             CAST(len(list_filter(t, x -> x = 'stream')) AS BIGINT) AS tf2
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '{_BPE_TOKEN_RE}') AS t
            FROM documents)
    ), stats AS (
      SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
      FROM base
    )
    SELECT doc_id,
           CAST((CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
           round(0.0
             + round(ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0), 6)
               * CAST(tf0 AS DOUBLE) * 2.2
               / (CAST(tf0 AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * dl
                           / (CAST(sum_dl AS DOUBLE) / n_docs)))
             + round(ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0), 6)
               * CAST(tf1 AS DOUBLE) * 2.2
               / (CAST(tf1 AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * dl
                           / (CAST(sum_dl AS DOUBLE) / n_docs)))
             + round(ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0), 6)
               * CAST(tf2 AS DOUBLE) * 2.2
               / (CAST(tf2 AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * dl
                           / (CAST(sum_dl AS DOUBLE) / n_docs))),
             4) AS score_bm25
    FROM base CROSS JOIN stats
    ORDER BY score_bm25 DESC, doc_id LIMIT 15
    """,
    note="BM25 top-k search (operators/search.bm25_topk): the sparse-"
    "retrieval baseline beside ANN — dl/tf as regex-free count "
    "decomposition (splits + translate-delete, r09; counts identical "
    "to the TOKEN_RE extract), corpus stats in ONE broadcast-scalar "
    "agg row, score "
    "summed in fixed association so no order-dependent float summation; "
    "map-side scorer + TakeOrderedAndProject top-k",
)
def bm25_search_topk(spark, sf_dir):
    from py_etl_spark.operators.search import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"),
        terms=["hash", "join", "stream"],
        k=15,
    )


@query(
    "dedup_duplicate_spans",
    """
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
      FROM documents
    ), spans AS (
      SELECT doc_id, unnest(range(0, greatest(len(t) - 4, 0))) AS start, t
      FROM toks
    ), segs AS (
      SELECT doc_id, start,
             array_to_string(t[start + 1 : start + 5], ' ') AS seg
      FROM spans
    ), dup AS (
      SELECT doc_id, start FROM (
        SELECT doc_id, start, count(*) OVER (PARTITION BY seg) AS occ
        FROM segs
      ) WHERE occ > 1
    ), covered AS (
      SELECT DISTINCT doc_id, start + u.i AS pos
      FROM dup CROSS JOIN (SELECT unnest(range(0, 5)) AS i) u
    ), tokpos AS (
      SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) - 1 AS pos
      FROM toks
    )
    SELECT tk.doc_id,
           CAST(len(tk.t) AS BIGINT) AS n_tokens,
           CAST(coalesce(cv.n_cov, 0) AS BIGINT) AS n_dup_tokens,
           coalesce(kp.txt, '') AS text_dedup
    FROM toks tk
    LEFT JOIN (SELECT doc_id, count(*) AS n_cov FROM covered GROUP BY 1) cv
      ON cv.doc_id = tk.doc_id
    LEFT JOIN (
      SELECT tp.doc_id, string_agg(tp.w, ' ' ORDER BY tp.pos) AS txt
      FROM tokpos tp
      LEFT JOIN covered c ON c.doc_id = tp.doc_id AND c.pos = tp.pos
      WHERE c.pos IS NULL
      GROUP BY tp.doc_id
    ) kp ON kp.doc_id = tk.doc_id
    """,
    note="Substring-level duplicate-span masking "
    "(operators/dedup.duplicate_span_mask): Lee-et-al ExactSubstr "
    "semantics via stride-1 sliding shingles — catches duplicated runs "
    "that straddle segment_dedup's disjoint block boundaries; coverage "
    "explodes only the duplicated subset; ~3 bounded shuffles",
)
def dedup_duplicate_spans(spark, sf_dir):
    from py_etl_spark.operators.dedup import duplicate_span_mask

    return duplicate_span_mask(
        _t(spark, sf_dir, "documents"), span_words=5, max_occurrences=1
    )


@query(
    "kmv_join_size_estimate",
    """
    WITH sa AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
          SELECT DISTINCT
                 CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                      AS BIGINT) AS h
          FROM orders)
      ) WHERE rn <= 256
    ), sb AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
          SELECT DISTINCT
                 CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
                      AS BIGINT) AS h
          FROM lineitem)
      ) WHERE rn <= 256
    ), u AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
          SELECT DISTINCT h
          FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb))
      ) WHERE rn <= 256
    ), stats AS (
      SELECT (SELECT count(*) FROM u)  AS big_k,
             (SELECT max(h)   FROM u)  AS kth,
             (SELECT count(*) FROM u
               WHERE h IN (SELECT h FROM sa)
                 AND h IN (SELECT h FROM sb)) AS cb,
             (SELECT count(*) FROM sa) AS ka,
             (SELECT max(h)   FROM sa) AS akth,
             (SELECT count(*) FROM sb) AS kb,
             (SELECT max(h)   FROM sb) AS bkth,
             (SELECT count(*) FROM orders)   AS na,
             (SELECT count(*) FROM lineitem) AS nb,
             (SELECT count(*) FROM orders JOIN lineitem
                ON l_orderkey = o_orderkey) AS exact_join
    ), est1 AS (
      SELECT *,
        CASE WHEN ka < 256 THEN ka ELSE CAST(floor(
          255.0 * 1152921504606846976.0 / akth + 0.5) AS BIGINT) END AS est_a,
        CASE WHEN kb < 256 THEN kb ELSE CAST(floor(
          255.0 * 1152921504606846976.0 / bkth + 0.5) AS BIGINT) END AS est_b,
        CASE WHEN big_k < 256 THEN big_k ELSE CAST(floor(
          255.0 * 1152921504606846976.0 / kth + 0.5) AS BIGINT) END
          AS est_union
      FROM stats
    ), est2 AS (
      SELECT *,
        CASE WHEN big_k < 256 THEN cb ELSE CAST(floor(
          CAST(cb AS DOUBLE) / big_k * est_union + 0.5) AS BIGINT) END
          AS est_intersection
      FROM est1
    )
    SELECT est_a, est_b, est_union, est_intersection,
           CAST(floor(CAST(est_intersection AS DOUBLE)
                * (CAST(na AS DOUBLE) / greatest(est_a, 1))
                * (CAST(nb AS DOUBLE) / greatest(est_b, 1)) + 0.5)
             AS BIGINT) AS est_join_rows,
           CAST(exact_join AS BIGINT) AS exact_join_rows
    FROM est2
    """,
    note="Join cardinality from mergeable KMV key sketches "
    "(operators/sketch.kmv_set_estimates / kmv_join_size_estimate): the "
    "cost-based-optimizer NDV formula — intersection x avg "
    "multiplicities — computable from per-file rollup sketches BEFORE "
    "launching the join; est and exact emitted side by side, rounding "
    "pinned half-up on both engines",
)
def kmv_join_size_estimate(spark, sf_dir):
    from py_etl_spark.operators.sketch import (
        kmv_distinct,
        kmv_join_size_estimate as _est,
    )

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    k = 256
    sa = list(
        kmv_distinct(orders.select("o_orderkey"), "o_orderkey", k)
        .collect()[0].sketch
    )
    sb = list(
        kmv_distinct(li.select("l_orderkey"), "l_orderkey", k)
        .collect()[0].sketch
    )
    na, nb = orders.count(), li.count()
    est = _est(sa, sb, na, nb, k)
    exact = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).count()
    return spark.range(1).select(
        F.lit(est["est_a"]).cast("long").alias("est_a"),
        F.lit(est["est_b"]).cast("long").alias("est_b"),
        F.lit(est["est_union"]).cast("long").alias("est_union"),
        F.lit(est["est_intersection"]).cast("long").alias(
            "est_intersection"
        ),
        F.lit(est["est_join_rows"]).cast("long").alias("est_join_rows"),
        F.lit(int(exact)).cast("long").alias("exact_join_rows"),
    )


@query(
    "hist_quantile_prices",
    """
    WITH binned AS (
      SELECT l_returnflag,
             least(greatest(CAST(floor(
               (CAST(l_extendedprice AS DOUBLE) - 0.0)
               / ((110000.0 - 0.0) / 256)) AS INT), 0), 255) AS b
      FROM lineitem
    ), cells AS (
      SELECT l_returnflag, b, count(*) AS c FROM binned GROUP BY 1, 2
    ), grid AS (
      SELECT gg.l_returnflag, gb.b
      FROM (SELECT DISTINCT l_returnflag FROM binned) gg
      CROSS JOIN (SELECT unnest(range(0, 256)) AS b) gb
    ), filled AS (
      SELECT grid.l_returnflag, grid.b, coalesce(cells.c, 0) AS c
      FROM grid LEFT JOIN cells
        ON cells.l_returnflag = grid.l_returnflag AND cells.b = grid.b
    ), cum AS (
      SELECT l_returnflag, b, c,
             sum(c) OVER (PARTITION BY l_returnflag ORDER BY b) AS cm,
             sum(c) OVER (PARTITION BY l_returnflag) AS n
      FROM filled
    ), firsts AS (
      SELECT l_returnflag,
             min(CASE WHEN cm >= 0.5  * CAST(n AS DOUBLE) THEN b END) AS b50,
             min(CASE WHEN cm >= 0.95 * CAST(n AS DOUBLE) THEN b END) AS b95,
             min(CASE WHEN cm >= 0.99 * CAST(n AS DOUBLE) THEN b END) AS b99,
             CAST(max(n) AS BIGINT) AS n
      FROM cum GROUP BY 1
    )
    SELECT f.l_returnflag, f.n,
      floor((0.0 + ((110000.0 - 0.0) / 256) * (CAST(f.b50 AS DOUBLE)
        + (0.5 * CAST(f.n AS DOUBLE) - CAST(c50.cm - c50.c AS DOUBLE))
          / CAST(c50.c AS DOUBLE))) * 10000.0 + 0.5) / 10000.0 AS q0_5,
      floor((0.0 + ((110000.0 - 0.0) / 256) * (CAST(f.b95 AS DOUBLE)
        + (0.95 * CAST(f.n AS DOUBLE) - CAST(c95.cm - c95.c AS DOUBLE))
          / CAST(c95.c AS DOUBLE))) * 10000.0 + 0.5) / 10000.0 AS q0_95,
      floor((0.0 + ((110000.0 - 0.0) / 256) * (CAST(f.b99 AS DOUBLE)
        + (0.99 * CAST(f.n AS DOUBLE) - CAST(c99.cm - c99.c AS DOUBLE))
          / CAST(c99.c AS DOUBLE))) * 10000.0 + 0.5) / 10000.0 AS q0_99
    FROM firsts f
    JOIN cum c50 ON c50.l_returnflag = f.l_returnflag AND c50.b = f.b50
    JOIN cum c95 ON c95.l_returnflag = f.l_returnflag AND c95.b = f.b95
    JOIN cum c99 ON c99.l_returnflag = f.l_returnflag AND c99.b = f.b99
    """,
    note="Histogram-sketch quantiles (operators/sketch.hist_sketch + "
    "hist_quantiles): plain-long equal-width counters — mergeable by "
    "elementwise +, engine-portable, error bounded by one bin width a "
    "priori (the HDR-histogram niche Spark's engine-private GK/KLL "
    "state can't serve); estimate is a shuffle-free Column walk",
)
def hist_quantile_prices(spark, sf_dir):
    from py_etl_spark.operators.sketch import hist_quantiles, hist_sketch

    sk = hist_sketch(
        _t(spark, sf_dir, "lineitem"),
        col="l_extendedprice",
        lo=0.0,
        hi=110000.0,
        bins=256,
        group_cols=("l_returnflag",),
    )
    return hist_quantiles(
        sk, lo=0.0, hi=110000.0, qs=(0.5, 0.95, 0.99),
        group_cols=("l_returnflag",),
    )


@query(
    "text_normalize_unicode",
    r"""
    WITH messed AS (
      SELECT doc_id,
             replace(text, 'a', 'a' || chr(769))
               || chr(160) || chr(8220) || 'quoted' || chr(8221)
               || chr(7) || ' end' || chr(8203) AS mess
      FROM documents
    ), cleaned AS (
      SELECT doc_id, mess,
        trim(regexp_replace(
          translate(
            regexp_replace(
              regexp_replace(
                nfc_normalize(mess),
                '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{200b}\x{200c}\x{200d}\x{feff}]',
                '', 'g'),
              '[\x{00a0}\x{1680}\x{2000}-\x{200a}\x{202f}\x{205f}\x{3000}]',
              ' ', 'g'),
            chr(8216) || chr(8217) || chr(8218) || chr(8220) || chr(8221)
              || chr(8222) || chr(8211) || chr(8212),
            repeat(chr(39), 3) || repeat(chr(34), 3) || '--'),
          '\s+', ' ', 'g')) AS text_clean
      FROM messed
    )
    SELECT doc_id, text_clean, (text_clean <> mess) AS changed
    FROM cleaned
    """,
    note="Unicode text normalization (operators/textstats.normalize_text "
    "+ clean_text_exprs): NFC composition via Arrow pandas UDF (DuckDB's "
    "nfc_normalize reproduces Python unicodedata exactly — the oracle "
    "injects decomposed accents, smart quotes, unicode spaces, control "
    "and zero-width chars into every doc and both engines must emit the "
    "same cleaned string), then JVM-regex cleanup; map-side, 0 shuffles",
)
def text_normalize_unicode(spark, sf_dir):
    from py_etl_spark.operators.textstats import normalize_text

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.col("text"), "a", "á"),
            F.lit(" “quoted” end​"),
        ).alias("text"),
    )
    return normalize_text(docs).select("doc_id", "text_clean", "changed")


@query(
    "interval_overlap_signup_purchase",
    """
    WITH iv AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT)        AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS e
      FROM events
    )
    SELECT l.user_id,
           l.event_id AS event_id_l,
           r.event_id AS event_id_r
    FROM iv l JOIN iv r
      ON l.user_id = r.user_id
     AND l.event_type = 'signup' AND r.event_type = 'purchase'
     AND l.s <= r.e AND r.s <= l.e
    """,
    note="Interval-interval overlap join "
    "(operators/timeseries.interval_overlap_join): both sides banded "
    "into epoch-hour buckets, equi-join on (key, bucket) + residual "
    "overlap predicate, pair accepted ONLY in the bucket containing "
    "max(starts) — exactly one bucket qualifies, so no distinct() and "
    "no dedup shuffle; the two-sided generalization of the range join",
)
def interval_overlap_signup_purchase(spark, sf_dir):
    from py_etl_spark.operators.timeseries import interval_overlap_join

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.floor(F.col("ts").cast("double")).cast("long").alias("start_s"),
    ).withColumn("end_s", F.col("start_s") + 1800)
    left = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "event_id", "start_s", "end_s"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "start_s", "end_s"
    )
    return interval_overlap_join(
        left, right, key_col="user_id", bucket_seconds=3600
    ).select(
        "user_id",
        F.col("event_id_l"),
        F.col("event_id_r"),
    )


@query(
    "corpus_sample_stratified",
    """
    SELECT doc_id, source, lang, sample_rank FROM (
      SELECT doc_id, source, lang,
             row_number() OVER (
               PARTITION BY source, lang
               ORDER BY CAST(('0x' || substr(
                   md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 15))
                 AS BIGINT) ASC, doc_id ASC
             ) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= 10
    """,
    note="Exact-count stratified sampling "
    "(operators/corpus.sample_stratified_exact): guaranteed n per "
    "stratum via salted-hash top-n — uniform without replacement, "
    "retry/repartition-stable, independent draws per salt; one "
    "window shuffle, same local-top-n rollup refactor as KMV at "
    "extreme stratum cardinality",
)
def corpus_sample_stratified(spark, sf_dir):
    from py_etl_spark.operators.corpus import sample_stratified_exact

    return sample_stratified_exact(
        _t(spark, sf_dir, "documents").select("doc_id", "source", "lang"),
        n_per_stratum=10,
        strata_cols=("source", "lang"),
    )


@query(
    "pagerank_part_supplier",
    """
    WITH pairs AS (
      SELECT DISTINCT 'p:' || CAST(l_partkey AS VARCHAR) AS src,
                      's:' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem
    ), e AS (
      SELECT src, dst FROM pairs
      UNION ALL
      SELECT dst AS src, src AS dst FROM pairs
    ), nodes AS (
      SELECT DISTINCT node
      FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
    ), deg AS (
      SELECT src AS node, count(*) AS deg FROM e GROUP BY 1
    ), pr0 AS (
      SELECT node, CAST(1000000 AS BIGINT) AS r
      FROM nodes
    ), c1 AS (
      SELECT e.dst AS node, sum(pr0.r // deg.deg) AS im
      FROM e JOIN pr0 ON pr0.node = e.src JOIN deg ON deg.node = e.src
      GROUP BY 1
    ), pr1 AS (
      SELECT nodes.node,
             CAST(150000
                  + CAST(850000 AS BIGINT) * coalesce(c1.im, 0) // 1000000 AS BIGINT) AS r
      FROM nodes LEFT JOIN c1 ON c1.node = nodes.node
    ), c2 AS (
      SELECT e.dst AS node, sum(pr1.r // deg.deg) AS im
      FROM e JOIN pr1 ON pr1.node = e.src JOIN deg ON deg.node = e.src
      GROUP BY 1
    ), pr2 AS (
      SELECT nodes.node,
             CAST(150000
                  + CAST(850000 AS BIGINT) * coalesce(c2.im, 0) // 1000000 AS BIGINT) AS r
      FROM nodes LEFT JOIN c2 ON c2.node = nodes.node
    ), c3 AS (
      SELECT e.dst AS node, sum(pr2.r // deg.deg) AS im
      FROM e JOIN pr2 ON pr2.node = e.src JOIN deg ON deg.node = e.src
      GROUP BY 1
    ), pr3 AS (
      SELECT nodes.node,
             CAST(150000
                  + CAST(850000 AS BIGINT) * coalesce(c3.im, 0) // 1000000 AS BIGINT) AS r
      FROM nodes LEFT JOIN c3 ON c3.node = nodes.node
    )
    SELECT node, r AS rank_micro FROM pr3
    """,
    note="Fixed-point integer PageRank (operators/graph."
    "pagerank_fixed_point) over the bipartite part↔supplier co-supply "
    "graph: ranks in micro-units, per-edge shares are integer floor-"
    "divisions, per-node sums exact BIGINT — iterative graph analytics "
    "with order-free distributed sums, bit-exact vs the 3-iteration "
    "unrolled oracle; 2 key-partitioned shuffles per iteration",
)
def pagerank_part_supplier(spark, sf_dir):
    from py_etl_spark.operators.graph import pagerank_fixed_point

    # Node ids stay BIGINT through the whole iterative core — part p
    # encodes as 2p, supplier s as 2s+1 — and decode to the oracle's
    # 'p:<k>'/'s:<k>' strings only in the final projection. Every
    # exchange in the loop (the distinct, degree, the per-iteration
    # rank join + dst rollup) hashes/sorts 8-byte longs instead of
    # 10-14 byte strings with string comparators; the rank arithmetic
    # never touches the key, so the result is bit-identical. Exact up
    # to keys of 2^52 (keys double under the encoding) — twelve orders
    # above the sf10 replica's 2e10 offset keys.
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select(
        (F.col("l_partkey") * 2).cast("long").alias("src"),
        (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
    ).distinct()
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank_fixed_point(edges, damping=0.85, iterations=3)
    node_str = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("p:"), F.expr("node DIV 2").cast("string")),
    ).otherwise(
        F.concat(F.lit("s:"), F.expr("(node - 1) DIV 2").cast("string"))
    )
    return ranks.select(node_str.alias("node"), "rank_micro")


@query(
    "agg_incremental_monthly_revenue",
    """
    SELECT strftime(o_orderdate, '%Y-%m')        AS month,
           CAST(count(*) AS BIGINT)              AS n,
           -- exact cents sum (order-free; module-top idiom); min/max are
           -- order-free already, and rounding a value that IS a
           -- 2-decimal price never sits on a tie boundary
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0                AS revenue,
           round(min(o_totalprice), 2)           AS min_order,
           round(max(o_totalprice), 2)           AS max_order
    FROM orders GROUP BY 1
    """,
    note="Incremental materialized-aggregate maintenance "
    "(operators/maintenance.agg_partial + incremental_agg_merge): the "
    "Spark path maintains the monthly rollup by merging a pre-cutoff "
    "snapshot partial with the new batch's partial (union + recombine, "
    "O(groups + batch) — the fact table is never re-read), while the "
    "oracle rebuilds from scratch; hash-match IS the rebuild-"
    "equivalence proof on real data",
)
def agg_incremental_monthly_revenue(spark, sf_dir):
    from py_etl_spark.operators.maintenance import (
        agg_partial,
        incremental_agg_merge,
    )

    orders = (
        _t(spark, sf_dir, "orders")
        .withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
        # exact cents (module-top idiom): partials sum integers, so the
        # snapshot+delta merge is order-free AND bit-equal to a rebuild;
        # per-month groups (~1e16 envelope at 100 TB): long
        .withColumn("o_totalprice_c", _xc(F.col("o_totalprice"), 2, "long"))
    )
    cutoff = "1997-01-01"
    snap = agg_partial(
        orders.filter(F.col("o_orderdate") < cutoff),
        keys=["month"],
        sum_cols=["o_totalprice_c"],
        min_cols=["o_totalprice"],
        max_cols=["o_totalprice"],
    )
    delta = agg_partial(
        orders.filter(F.col("o_orderdate") >= cutoff),
        keys=["month"],
        sum_cols=["o_totalprice_c"],
        min_cols=["o_totalprice"],
        max_cols=["o_totalprice"],
    )
    merged = incremental_agg_merge(snap, delta, keys=["month"])
    return merged.select(
        "month",
        F.col("n").cast("long").alias("n"),
        _xr2(F.col("sum_o_totalprice_c"), 2).alias("revenue"),
        F.round("min_o_totalprice", 2).alias("min_order"),
        F.round("max_o_totalprice", 2).alias("max_order"),
    )


def _analyze_col_oracle(col: str) -> str:
    """One UNION-ALL block of the analyze_stats_orders oracle: stats +
    KMV NDV for one orders column, mirroring maintenance.analyze_table."""
    return f"""
    SELECT '{col}' AS "column",
           (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
           (SELECT CAST(count({col}) AS BIGINT) FROM orders) AS n_nonnull,
           (SELECT CAST(CASE WHEN count(*) < 256 THEN count(*)
                   ELSE round(255.0 * 1152921504606846976.0 / max(h))
                   END AS BIGINT)
            FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
                    SELECT DISTINCT CAST(('0x' || substr(
                      md5(CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                    FROM orders WHERE {col} IS NOT NULL))
            WHERE rn <= 256) AS ndv_est,
           (SELECT CAST(least(count(DISTINCT {col}), 256) AS BIGINT)
            FROM orders WHERE {col} IS NOT NULL) AS ndv_kept,
           (SELECT CAST(min({col}) AS VARCHAR) FROM orders) AS min_value,
           (SELECT CAST(max({col}) AS VARCHAR) FROM orders) AS max_value
    """


@query(
    "analyze_stats_orders",
    " UNION ALL ".join(
        _analyze_col_oracle(c)
        for c in ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    ),
    note="ANALYZE-style column statistics "
    "(operators/maintenance.analyze_table): typed min/max + null counts "
    "in ONE global aggregate row, NDV via per-column KMV sketches "
    "(mergeable — at 100 TB the NDV rolls up per file instead of a "
    "count-distinct shuffle per column); feeds kmv_join_size_estimate",
)
def analyze_stats_orders(spark, sf_dir):
    from py_etl_spark.operators.maintenance import analyze_table

    return analyze_table(
        _t(spark, sf_dir, "orders"),
        cols=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
        ndv_k=256,
    )


# =========================================================================
# Training-data pipeline: dedup / text analysis / similarity
# =========================================================================

@query(
    "dedup_exact_groups",
    """
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
           CAST(min(doc_id) AS BIGINT) AS keeper,
           count(*) AS n_docs
    FROM documents GROUP BY 1
    """,
    note="Dedup-exact: hash-groupBy fingerprint → keeper + group size",
)
def dedup_exact_groups(spark, sf_dir):
    return dedup.exact_duplicates(_t(spark, sf_dir, "documents"))


@query(
    "dedup_segments_corpus",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
    ), segs AS (
      SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
             array_to_string(list_slice(t, i * 5 + 1, i * 5 + 5), ' ') AS seg
      FROM toks,
           unnest(range(0, greatest(CAST(ceil(len(t) / 5.0) AS BIGINT), 1)))
             AS u(i)
    ), nonempty AS (
      SELECT * FROM segs WHERE seg <> ''
    ), counted AS (
      SELECT *, count(*) OVER (PARTITION BY seg) AS occ FROM nonempty
    )
    SELECT doc_id,
           count(*) AS n_segments,
           count(*) FILTER (WHERE occ <= 1) AS n_kept,
           coalesce(
             string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE occ <= 1),
             ''
           ) AS text_dedup
    FROM counted GROUP BY doc_id
    """,
    note="Segment-level corpus dedup (CCNet/RefinedWeb line dedup "
    "generalized): drop every 5-word segment that repeats corpus-wide, "
    "reassemble survivors in order (operators/dedup.segment_dedup; "
    "2 shuffles: window on segment + groupBy doc)",
)
def dedup_segments_corpus(spark, sf_dir):
    return dedup.segment_dedup(
        _t(spark, sf_dir, "documents"), segment_words=5, max_occurrences=1
    )


@query(
    "dedup_incremental_batch",
    """
    WITH ledger AS (
      SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS fingerprint
      FROM documents WHERE doc_id < 250
    ), batch_best AS (
      SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS fingerprint,
             CAST(min(doc_id) AS BIGINT) AS doc_id
      FROM documents WHERE doc_id >= 250
      GROUP BY 1
    )
    SELECT b.fingerprint, b.doc_id
    FROM batch_best b
    LEFT JOIN ledger l ON l.fingerprint = b.fingerprint
    WHERE l.fingerprint IS NULL
    """,
    note="Incremental exact dedup (operators/dedup.incremental_exact_dedup):"
    " day-N batch admitted against the corpus fingerprint ledger — "
    "O(batch) not O(corpus); batch groupBy + ledger anti-join, both "
    "fingerprint-keyed",
)
def dedup_incremental_batch(spark, sf_dir):
    from py_etl_spark.operators.textstats import fingerprint_md5

    docs = _t(spark, sf_dir, "documents")
    ledger = docs.filter(F.col("doc_id") < 250).select(
        fingerprint_md5(F.col("text")).alias("fingerprint")
    ).distinct()
    fresh, _updated = dedup.incremental_exact_dedup(
        docs.filter(F.col("doc_id") >= 250), ledger
    )
    return fresh


@query(
    "text_stats",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS stat_n_chars,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS stat_n_tokens,
           CAST(length(regexp_replace(text, '[^.,;:!?''"-]', '', 'g')) AS BIGINT) AS stat_n_punct
    FROM documents
    """,
    note="Text quality stats: char/token/punct counting, JVM-side only",
)
def text_stats(spark, sf_dir):
    t = F.col("text")
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(t).cast("long").alias("stat_n_chars"),
        textstats.token_count(t).alias("stat_n_tokens"),
        textstats.punct_count(t).alias("stat_n_punct"),
    )


_LANG_ORACLE_COUNTS = {
    lang: "len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
          f"t -> t IN ({', '.join(repr(m) for m in markers)})))"
    for lang, markers in textstats.LANG_MARKERS.items()
}

@query(
    "lang_id_heuristic",
    f"""
    WITH scored AS (
      SELECT doc_id,
             {_LANG_ORACLE_COUNTS['en']} AS c_en,
             {_LANG_ORACLE_COUNTS['de']} AS c_de,
             {_LANG_ORACLE_COUNTS['fr']} AS c_fr,
             {_LANG_ORACLE_COUNTS['es']} AS c_es
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN c_en > 0 AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
                WHEN c_de > 0 AND c_de >= c_fr AND c_de >= c_es THEN 'de'
                WHEN c_fr > 0 AND c_fr >= c_es THEN 'fr'
                WHEN c_es > 0 THEN 'es'
                ELSE 'und' END AS lang_guess
    FROM scored
    """,
    note="Language-ID: stopword-marker scoring (first language wins ties)",
)
def lang_id_heuristic(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", textstats.lang_guess(F.col("text")).alias("lang_guess")
    )


def _rep_gram_cte(n: int) -> str:
    """Per-n CTE pair: explode token n-grams, then per-doc top/dup/total
    instance counts (mirrors textstats.repetition_metrics exactly)."""
    return f"""
    g{n} AS (
      SELECT doc_id, g, count(*) AS c FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(toks) - {n} + 2, 1)),
                 i -> array_to_string(list_slice(toks, i, i + {n} - 1), ' ')
               )) AS g
        FROM rep_t) GROUP BY doc_id, g
    ), a{n} AS (
      SELECT doc_id, max(c) AS top{n},
             sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup{n},
             sum(c) AS total{n}
      FROM g{n} GROUP BY doc_id
    )"""


@query(
    "quality_repetition_metrics",
    f"""
    WITH rep_t AS (
      SELECT doc_id, regexp_extract_all(text, '{_BPE_TOKEN_RE}') AS toks
      FROM documents
    ),{_rep_gram_cte(2)},{_rep_gram_cte(3)},{_rep_gram_cte(4)}
    SELECT t.doc_id,
           CAST(coalesce(a2.top2, 0) AS BIGINT) AS rep2_top,
           CAST(coalesce(a2.dup2, 0) AS BIGINT) AS rep2_dup,
           CAST(coalesce(a2.total2, 0) AS BIGINT) AS rep2_total,
           CAST(coalesce(a3.top3, 0) AS BIGINT) AS rep3_top,
           CAST(coalesce(a3.dup3, 0) AS BIGINT) AS rep3_dup,
           CAST(coalesce(a3.total3, 0) AS BIGINT) AS rep3_total,
           CAST(coalesce(a4.top4, 0) AS BIGINT) AS rep4_top,
           CAST(coalesce(a4.dup4, 0) AS BIGINT) AS rep4_dup,
           CAST(coalesce(a4.total4, 0) AS BIGINT) AS rep4_total
    FROM rep_t t
    LEFT JOIN a2 USING (doc_id)
    LEFT JOIN a3 USING (doc_id)
    LEFT JOIN a4 USING (doc_id)
    """,
    note="Gopher-family repetition signals (operators/textstats."
         "repetition_metrics): per-doc top/duplicate token n-gram instance "
         "counts for n=2,3,4. Per-doc Counters need no cross-row data, so "
         "the op is a ZERO-shuffle Arrow mapInPandas pass — O(tokens) per "
         "doc where pure-Column gram counting is O(tokens^2). Integer "
         "counts keep the oracle hash float-free.",
)
def quality_repetition_metrics(spark, sf_dir):
    from py_etl_spark.operators.textstats import repetition_metrics

    out = repetition_metrics(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        *[
            F.col(f"rep{n}_{k}")
            for n in (2, 3, 4)
            for k in ("top", "dup", "total")
        ],
    )


def _shingle_hash_ctes(where: str = "") -> str:
    """Shared DuckDB CTE block: documents → normalized word 3-shingles →
    portable 32-bit md5 base hash (mirrors dedup.exploded_shingles +
    dedup._base_hash(family='md5') exactly)."""
    return f"""
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN text IS NULL THEN NULL
                  ELSE coalesce(nullif(list_filter(string_split_regex(
                         lower(text), '[^a-z0-9]+'), x -> x <> ''),
                       []::VARCHAR[]), ['']::VARCHAR[]) END AS toks
      FROM documents {where}
    ), toks AS (
      SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
      FROM raw
    ), sh AS (
      SELECT doc_id,
             concat_ws(' ', tok, lead(tok,1) OVER w, lead(tok,2) OVER w) AS shingle
      FROM (SELECT doc_id, tok, pos,
                   count(*) OVER (PARTITION BY doc_id) AS n FROM toks)
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY pos <= n - 2 OR (n < 3 AND pos = 1)
    ), hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh
    )"""


def _affine_coeffs(num_hashes: int, seed: int = 42):
    # single source of truth with the Spark operator (r11: the modulus
    # moved to a prime just above the 32-bit hash domain — the 2^61-1
    # family was monotone over half the domain, see dedup.PERM_PRIME)
    return dedup.affine_coeffs(num_hashes, seed)


def _minhash_lsh_oracle_sql() -> str:
    """Full cross-engine oracle for banded MinHash-LSH candidate pairs with
    the portable md5-affine hash family (32 hashes, 8 bands × 4 rows)."""
    p = dedup.PERM_PRIME
    mins = ",\n             ".join(
        f"min(({a} * h + {b}) % {p}) AS mh_{i}"
        for i, (a, b) in enumerate(_affine_coeffs(32))
    )
    bands = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, mh_{4 * b} AS v0, mh_{4 * b + 1} AS v1, "
        f"mh_{4 * b + 2} AS v2, mh_{4 * b + 3} AS v3 FROM sigs"
        for b in range(8)
    )
    return f"""{_shingle_hash_ctes()}, sigs AS (
      SELECT doc_id,
             {mins}
      FROM hashed GROUP BY doc_id
    ), banded AS (
      {bands}
    )
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM banded l JOIN banded r
      ON l.band = r.band AND l.v0 = r.v0 AND l.v1 = r.v1
     AND l.v2 = r.v2 AND l.v3 = r.v3 AND l.doc_id < r.doc_id
    """


@query(
    "dedup_minhash_lsh",
    _minhash_lsh_oracle_sql(),
    note="MinHash(32)+LSH(8 bands) candidate pairs — the 100 TB near-dup "
         "path. Registry variant uses the portable md5-affine family so the "
         "full banded pipeline is oracle-checked; production default is the "
         "same plan with xxhash64 signatures and 8-byte bucket hashes "
         "(plan-tested). Hot buckets are capped (skew guard).",
)
def dedup_minhash_lsh(spark, sf_dir):
    return dedup.minhash_lsh_candidates(
        _t(spark, sf_dir, "documents"), hash_family="md5"
    )


def _minhash_oracle_sql() -> str:
    p = dedup.PERM_PRIME
    mins = ",\n           ".join(
        f"min(({a} * h + {b}) % {p}) AS mh_{i}"
        for i, (a, b) in enumerate(_affine_coeffs(8))
    )
    return f"""{_shingle_hash_ctes("WHERE doc_id < 40")}
    SELECT doc_id,
           {mins}
    FROM hashed GROUP BY doc_id
    """


@query(
    "dedup_minhash_portable_small",
    _minhash_oracle_sql(),
    note="MinHash signatures with a PORTABLE (md5-based) hash family on a "
         "bounded subset — the full SQL oracle for the xxhash64 scale path",
)
def dedup_minhash_portable_small(spark, sf_dir):
    coeffs = dedup.affine_coeffs(8)
    p = dedup.PERM_PRIME
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    hashed = dedup.exploded_shingles(docs).select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.min((F.col("h") * a + b) % p).alias(f"mh_{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )


def _simhash_oracle_sql() -> str:
    """Cross-engine SimHash oracle: portable 60-bit md5 token hash, ±1 bit
    votes, sign → bit (mirrors dedup.simhash64(hash_family='md5'))."""
    votes = ",\n             ".join(
        f"sum(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS v_{i}"
        for i in range(60)
    )
    bits = "\n           + ".join(
        f"(CASE WHEN v_{i} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE CAST(0 AS BIGINT) END)"
        for i in range(60)
    )
    return f"""
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN text IS NULL THEN NULL
                  ELSE coalesce(nullif(list_filter(string_split_regex(
                         lower(text), '[^a-z0-9]+'), x -> x <> ''),
                       []::VARCHAR[]), ['']::VARCHAR[]) END AS toks
      FROM documents
    ), toks AS (
      SELECT doc_id, unnest(toks) AS tok FROM raw
    ), hashed AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
    ), votes AS (
      SELECT doc_id,
             {votes}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({bits} AS BIGINT) AS simhash
    FROM votes
    """


@query(
    "dedup_simhash",
    _simhash_oracle_sql(),
    note="SimHash-60bit signatures (banded Hamming candidates in "
         "dedup.simhash_candidates). Registry variant uses the portable md5 "
         "token hash so signatures are oracle-checked bit-for-bit; "
         "production default is xxhash64 with the identical plan.",
)
def dedup_simhash(spark, sf_dir):
    return dedup.simhash64(_t(spark, sf_dir, "documents"), hash_family="md5")


@query(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  round(list_dot_product(q.v, c.v) /
                        (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6)
                    AS cosine
           FROM q JOIN c ON q.vec_id <> c.vec_id
         )
    SELECT query_id, neighbor_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 5
    """,
    note="ANN baseline: exact brute-force cosine top-k (broadcast probes, "
         "no corpus shuffle)",
)
def ann_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk_bruteforce(emb, queries, k=5, dim=64)


@query(
    "embedding_quantize_int8",
    """
    WITH t AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS amax
      FROM t
    )
    SELECT vec_id,
           round(CASE WHEN amax > 0 THEN 127.0 / amax ELSE 0.0 END, 9)
             AS q_scale,
           array_to_string(list_transform(v,
             x -> CAST(least(127, greatest(-127,
                    CAST(round(x * (CASE WHEN amax > 0 THEN 127.0 / amax
                                    ELSE 0.0 END)) AS BIGINT))) AS BIGINT)
           ), ',') AS q_vec
    FROM s
    """,
    note="Symmetric per-vector int8 scalar quantization (operators/"
         "similarity.quantize_embeddings_int8): scale = 127/max|v|, "
         "elements clamp-rounded to ±127 — the 4x memory/IO lever for ANN "
         "indexes at corpus scale (candidate generation on int8, exact "
         "re-rank on survivors' floats). Pure Column HOFs, zero shuffle; "
         "all arithmetic in double so DuckDB replays it bit-for-bit.",
)
def embedding_quantize_int8(spark, sf_dir):
    q = similarity.quantize_embeddings_int8(
        _t(spark, sf_dir, "embeddings")
    )
    return q.select(
        "vec_id",
        F.round(F.col("q_scale"), 9).alias("q_scale"),
        F.concat_ws(",", F.col("q_vec").cast("array<string>")).alias("q_vec"),
    )


def _int8_qv_sql() -> str:
    """Shared CTE block: embeddings → int8-quantized DOUBLE lists
    (mirrors similarity.quantize_embeddings_int8 exactly)."""
    return """
    WITH t AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
               AS amax
      FROM embeddings
    ), qz AS (
      SELECT vec_id,
             list_transform(v, x -> CAST(least(127, greatest(-127,
               CAST(round(x * (CASE WHEN amax > 0 THEN 127.0 / amax
                               ELSE 0.0 END)) AS BIGINT))) AS DOUBLE)) AS qv
      FROM t
    )"""


@query(
    "ann_cosine_topk_int8",
    f"""{_int8_qv_sql()},
    q AS (SELECT vec_id AS query_id, qv AS qq FROM qz WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.qq, c.qv) /
               (sqrt(list_dot_product(q.qq, q.qq)) *
                sqrt(list_dot_product(c.qv, c.qv))) AS raw
      FROM q JOIN qz c ON q.query_id <> c.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, raw,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY raw DESC, neighbor_id)
                  AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, round(raw, 6) AS cosine_i8, rank
    FROM ranked WHERE rank <= 5
    """,
    note="Quantized candidate generation (operators/similarity."
         "cosine_topk_int8): top-k cosine scored entirely on int8 vectors "
         "— the 4x-cheaper first stage whose survivors get the exact "
         "float re-rank. Integer dot products are exact in doubles, so "
         "the score (and the rank order, tie-broken on neighbor id) is "
         "bit-reproducible across engines. Broadcast probes, no corpus "
         "shuffle, one top-k exchange keyed by query id.",
)
def ann_cosine_topk_int8(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk_int8(
        emb, emb.filter(F.col("vec_id") < 10), k=5, dim=64
    )


@query(
    "ann_cosine_topk_twostage",
    f"""{_int8_qv_sql()},
    q8 AS (SELECT vec_id AS query_id, qv AS qq FROM qz WHERE vec_id < 10),
    s1 AS (
      SELECT q8.query_id, c.vec_id AS neighbor_id,
             list_dot_product(q8.qq, c.qv) /
               (sqrt(list_dot_product(q8.qq, q8.qq)) *
                sqrt(list_dot_product(c.qv, c.qv))) AS raw8
      FROM q8 JOIN qz c ON q8.query_id <> c.vec_id
    ), cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY raw8 DESC, neighbor_id) AS r
        FROM s1) WHERE r <= 20
    ), e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s2 AS (
      SELECT cand.query_id, cand.neighbor_id,
             list_dot_product(eq.v, en.v) /
               (sqrt(list_dot_product(eq.v, eq.v)) *
                sqrt(list_dot_product(en.v, en.v))) AS raw
      FROM cand
      JOIN e eq ON eq.vec_id = cand.query_id
      JOIN e en ON en.vec_id = cand.neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, raw,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY raw DESC, neighbor_id)
                  AS BIGINT) AS rank
      FROM s2
    )
    SELECT query_id, neighbor_id, round(raw, 6) AS cosine, rank
    FROM ranked WHERE rank <= 5
    """,
    note="Two-stage ANN (operators/similarity.cosine_topk_twostage): "
         "int8 candidate generation (4x-smaller scan) -> exact float "
         "re-rank of the 20 survivors per query. The corpus never "
         "shuffles in either stage — stage 2 drives off the broadcast "
         "candidate list; full vectors are read for only 20 x |queries| "
         "rows. Bit-reproducible end to end (both stage formulas proven "
         "individually by their own oracles).",
)
def ann_cosine_topk_twostage(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk_twostage(
        emb, emb.filter(F.col("vec_id") < 10), k=5, candidate_k=20, dim=64
    )


def _ann_lsh_oracle_sql() -> str:
    """Cross-engine oracle for hyperplane-LSH top-k: the seeded INTEGER
    hyperplanes are embedded as literal arrays, so DuckDB reproduces the
    exact buckets (sequential dot products are bit-identical across both
    engines; scaling a hyperplane never changes the sign pattern)."""
    planes = similarity.hyperplane_coords(64, 4, seed=42, integer_planes=True)
    terms = "\n           + ".join(
        f"{1 << i} * (CASE WHEN list_dot_product(v, "
        f"[{','.join(str(int(x)) for x in p)}]::DOUBLE[]) >= 0 "
        f"THEN 1 ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (
      SELECT vec_id, v,
           CAST({terms} AS BIGINT) AS bucket
      FROM e
    ),
    q AS (SELECT vec_id AS query_id, v AS q_vec, bucket FROM b WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.q_vec, c.v) /
                   (sqrt(list_dot_product(q.q_vec, q.q_vec)) *
                    sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
      FROM q JOIN b c ON q.bucket = c.bucket AND q.query_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 5
    """


@query(
    "ann_cosine_lsh",
    _ann_lsh_oracle_sql(),
    note="ANN scale path: random-hyperplane LSH bucketed cosine top-k. "
         "Seeded integer hyperplanes make the approximate path itself "
         "oracle-checkable; recall@k vs brute force asserted in unit tests.",
)
def ann_cosine_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk_lsh(
        emb, queries, dim=64, k=5, planes=4, integer_planes=True
    )


# =========================================================================
# Further TPC-H-shaped queries (bench breadth)
# =========================================================================

@query(
    "q6_forecast_revenue",
    """
    -- exact scaled-integer revenue (order-free; module-top idiom):
    -- price*discount is a 4-decimal product, recovered exactly at 1e4
    SELECT floor(CAST(sum(CAST(floor(l_extendedprice * l_discount
                                     * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 100.0 + 0.5) / 100.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    note="TPC-H Q6 shape: tight multi-predicate scan → single agg "
         "(pure pushdown showcase)",
)
def q6_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _xr2(
                F.sum(_xc(F.col("l_extendedprice") * F.col("l_discount"), 4)),
                4,
            ).alias("revenue")
        )
    )


@query(
    "q14_promo_revenue_share",
    """
    -- ratio of exact scaled-integer sums (order-free; module-top idiom):
    -- both operands are exact BIGINTs, so the ratio is one deterministic
    -- double division; render with the bit-reproducible float round
    SELECT floor(100.0
                 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                 THEN CAST(floor(l_extendedprice
                                                 * (1 - l_discount)
                                                 * 10000.0 + 0.5) AS BIGINT)
                                 ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 10000.0 + 0.5) AS BIGINT))
                        AS DOUBLE)
                 * 10000.0 + 0.5) / 10000.0 AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
    note="TPC-H Q14 shape: join + conditional aggregation ratio",
)
def q14_promo_revenue_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev_c = _xc(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    zero_c = F.lit(0).cast("decimal(20,0)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            _fr(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev_c).otherwise(zero_c)
                ).cast("double")
                / F.sum(rev_c).cast("double"),
                4,
            ).alias("promo_share")
        )
    )


@query(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, o_orderkey,
           CAST(total_qty AS BIGINT) AS total_qty
    FROM (
      SELECT o.o_custkey AS c_custkey, l.l_orderkey AS o_orderkey,
             sum(l.l_quantity) AS total_qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ) WHERE total_qty > 150
    """,
    note="TPC-H Q18 shape: join → group → HAVING on the aggregate",
)
def q18_large_volume_customers(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    # Aggregate below the join (r09): an orderkey maps to exactly one
    # custkey, so grouping by (custkey, orderkey) after a fact-fact join
    # equals grouping lineitem by orderkey alone and attaching custkey
    # afterwards. The old shape shuffled BOTH facts for the join and then
    # the joined rows again for the aggregate; this shape's only big
    # exchange is lineitem's map-side-combined per-order sum, and the
    # >150 filter leaves so few qualifying orders that AQE broadcasts
    # them — orders never shuffles at all. Same trick family as
    # q21/part_pair bounded-group decorrelation.
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return per_order.join(
        orders, per_order.l_orderkey == orders.o_orderkey
    ).select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("total_qty").cast("long").alias("total_qty"),
    )


# =========================================================================
# Semi-structured + distinct/percentile aggregates + unpivot
# =========================================================================

@query(
    "json_props_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    note="semi-structured: JSON property extraction from a string column",
)
def json_props_extract(spark, sf_dir):
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@query(
    "a8_distinct_and_percentile",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           round(quantile_cont(value, 0.5), 4) AS median_value,
           round(quantile_cont(value, 0.95), 4) AS p95_value
    FROM events GROUP BY event_type
    """,
    note="distinct aggregation + exact interpolated percentiles",
)
def a8_distinct_and_percentile(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("median_value"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95_value"),
        )
    )


@query(
    "e5_unpivot_metrics",
    """
    SELECT c_custkey, metric, round(v, 2) AS v
    FROM (SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
                 CAST(c_nationkey AS DOUBLE) AS nationkey
          FROM customer)
    UNPIVOT (v FOR metric IN (acctbal, nationkey))
    """,
    note="unpivot/melt: wide metrics to (key, metric, value) rows",
)
def e5_unpivot_metrics(spark, sf_dir):
    wide = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return wide.unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "v").select(
        "c_custkey", "metric", F.round("v", 2).alias("v")
    )


# =========================================================================
# Grouping extensions (rollup / cube / grouping sets / pivot) — the
# reference has no grouping sets (SURVEY §2.4 note); Spark exposes them and
# the engine surfaces them as first-class operators.
# =========================================================================

@query(
    "g1_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    note="rollup with grouping() markers",
)
def g1_rollup(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
        )
    )


@query(
    "g2_cube",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    note="cube over two dimensions",
)
def g2_cube(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "g3_pivot",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS st_o,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS st_f,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS st_p
    FROM orders GROUP BY o_orderpriority
    """,
    note="pivot (orderstatus → columns); oracle via conditional aggregation",
)
def g3_pivot(spark, sf_dir):
    p = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("st_o"),
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("st_f"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("st_p"),
    )


# =========================================================================
# Sessionization + as-of join (common OLAP patterns Spark lacks natively;
# composed from windows/joins — SURVEY §7 custom-operator policy (a))
# =========================================================================

@query(
    "sessionize_events",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE OR
                       lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, min(epoch_ms(ts)) AS session_start_ms
    FROM sess GROUP BY user_id, session_id
    """,
    note="sessionization: 30-min-gap sessions via lag + running sum",
)
def sessionize_events(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > 1800, 1
    ).when(F.lag("ts").over(w).isNull(), 1).otherwise(0)
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        _t(spark, sf_dir, "events")
        .withColumn("brk", brk)
        .withColumn("session_id", F.sum("brk").over(running).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_millis("ts")).alias("session_start_ms"),
        )
    )


@query(
    "asof_latest_order_at_shipdate",
    """
    SELECT l_orderkey, l_linenumber, asof_orderkey FROM (
      SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
             o2.o_orderkey AS asof_orderkey,
             row_number() OVER (
               PARTITION BY l.l_orderkey, l.l_linenumber
               ORDER BY o2.o_orderdate DESC, o2.o_orderkey DESC) AS rn
      FROM lineitem l
      JOIN orders o1 ON l.l_orderkey = o1.o_orderkey
      JOIN orders o2 ON o2.o_custkey = o1.o_custkey
                     AND o2.o_orderdate <= l.l_shipdate
      WHERE l.l_orderkey < 100
    ) WHERE rn = 1
    """,
    note="as-of join: latest order of the same customer at each line's "
         "shipdate (range join + windowed argmax — Spark's as-of recipe)",
)
def asof_latest_order_at_shipdate(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    o1 = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k1"), F.col("o_custkey").alias("c1")
    )
    o2 = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_custkey").alias("c2"),
        F.col("o_orderdate").alias("d2"),
    )
    # Broadcast the side that FITS (guide §3.1, r11): the probe is the
    # bounded l_orderkey<100 line set (~700 rows at any SF); orders is
    # the table that GROWS. The old shape broadcast full orders twice —
    # a driver collect of the fact table, fatal at scale. Now the probe
    # (then the probe⋈o1 intermediate, still probe-sized) is the build
    # side and orders streams map-side with zero exchange.
    j = (
        F.broadcast(li).join(o1, li.l_orderkey == F.col("k1"))
    )
    j = F.broadcast(j).join(
        o2, (F.col("c2") == F.col("c1")) & (F.col("d2") <= F.col("l_shipdate"))
    )
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.desc("d2"), F.desc("asof_orderkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            "asof_orderkey",
        )
    )


# =========================================================================
# More training-data ops with strong oracles
# =========================================================================

@query(
    "ngram_jaccard_allpairs_small",
    """
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN text IS NULL THEN NULL
                  ELSE coalesce(nullif(list_filter(string_split_regex(
                         lower(text), '[^a-z0-9]+'), x -> x <> ''),
                       []::VARCHAR[]), ['']::VARCHAR[]) END AS toks
      FROM documents WHERE doc_id < 40
    ), toks AS (
      SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
      FROM raw
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', tok, lead(tok,1) OVER w, lead(tok,2) OVER w) AS shingle
      FROM (SELECT doc_id, tok, pos,
                   count(*) OVER (PARTITION BY doc_id) AS n FROM toks)
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY pos <= n - 2 OR (n < 3 AND pos = 1)
    ), sizes AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor((i / (sa.sz + sb.sz - i)) * 1000000.0 + 0.5) / 1000000.0
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE i / (sa.sz + sb.sz - i) >= 0.01
    """,
    note="n-gram Jaccard, exact all-pairs on a bounded subset (the "
         "LSH-bucketed variant is the scale path; this is its oracle)",
)
def ngram_jaccard_allpairs_small(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    return dedup.ngram_jaccard_pairs(docs, threshold=0.01)


@query(
    "embedding_near_dup",
    """
    WITH a AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings WHERE vec_id < 200),
         b AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
             AS cosine
    FROM a JOIN b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) > 0.3
    """,
    note="embedding-cosine near-duplicate pairs above a threshold",
)
def embedding_near_dup(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    # r12: norms fold once per input row below the pair join (the
    # cosine_topk_bruteforce pattern — a norm's value does not depend on
    # which row evaluates it, so the cosine doubles are bit-identical to
    # the per-pair spelling), and dot/norm take the unrolled codegen
    # path (dim=64 fixture contract, similarity._dot).
    a = emb.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        similarity._norm(F.col("embedding"), 64).alias("__na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        similarity._norm(F.col("embedding"), 64).alias("__nb"),
    )
    cos = similarity._dot(F.col("va"), F.col("vb"), 64) / (
        F.col("__na") * F.col("__nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("__cos", cos)
        .filter(F.col("__cos") > 0.3)
        .select("id_a", "id_b", F.round("__cos", 6).alias("cosine"))
    )


@query(
    "fuzzy_join_part_names",
    """
    WITH pl AS (
      SELECT p_partkey AS id_a, ' ' || lower(trim(p_name)) || ' ' AS s
      FROM part WHERE p_partkey < 300
    ), pr AS (
      SELECT p_partkey AS id_b, ' ' || lower(trim(p_name)) || ' ' AS s
      FROM part
    ), gl AS (
      SELECT id_a, unnest(list_distinct(list_transform(
               range(1, greatest(length(s) - 2, 1) + 1),
               i -> substr(s, CAST(i AS INT), 3)))) AS gram
      FROM pl
    ), gr AS (
      SELECT id_b, unnest(list_distinct(list_transform(
               range(1, greatest(length(s) - 2, 1) + 1),
               i -> substr(s, CAST(i AS INT), 3)))) AS gram
      FROM pr
    ), sl AS (
      SELECT id_a, len(list_distinct(list_transform(
               range(1, greatest(length(s) - 2, 1) + 1),
               i -> substr(s, CAST(i AS INT), 3)))) AS sz_a
      FROM pl
    ), sr AS (
      SELECT id_b, len(list_distinct(list_transform(
               range(1, greatest(length(s) - 2, 1) + 1),
               i -> substr(s, CAST(i AS INT), 3)))) AS sz_b
      FROM pr
    ), inter AS (
      SELECT id_a, id_b, count(*) AS i
      FROM gl JOIN gr USING (gram)
      WHERE id_a < id_b
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, floor((i / (sz_a + sz_b - i)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
    FROM inter JOIN sl USING (id_a) JOIN sr USING (id_b)
    WHERE i / (sz_a + sz_b - i) >= 0.5
    """,
    note="Fuzzy entity-resolution join (operators/fuzzy.fuzzy_join): "
    "char-3-gram Jaccard via the gram inverted index — candidates only "
    "where grams collide, never all-pairs; stop-gram cap is the scale "
    "lever (exact path here so the oracle is exact too)",
)
def fuzzy_join_part_names(spark, sf_dir):
    from py_etl_spark.operators.fuzzy import fuzzy_join

    part = _t(spark, sf_dir, "part")
    out = fuzzy_join(
        part.filter(F.col("p_partkey") < 300),
        part,
        left_on="p_name",
        right_on="p_name",
        left_id="p_partkey",
        right_id="p_partkey",
        threshold=0.5,
        # bounded probe side: broadcast its gram index — the corpus-side
        # gram rows never shuffle (replaces the r06 gram_salt=16 reducer
        # spread: a broadcast join has no gram reducer to salt).
        # prefix_filter measured WORSE here (sf10 28.5 -> 35.8 s): TPC-H
        # p_name draws 5 words from ~92 colors, so each probe string's
        # "rarest" floor(|A|/2)+1 grams still include ~100k-DF in-word
        # grams — candidate volume barely drops while the DF pass +
        # distinct + verification join add cost. The lever needs a
        # Zipfian gram DF (real text), not a 92-word vocabulary.
        broadcast_left_grams=True,
    )
    return out.filter(F.col("id_a") < F.col("id_b"))


@query(
    "anonymize_email_domains",
    """
    SELECT CAST(event_id AS BIGINT) AS event_id,
           'u' || CAST(user_id AS VARCHAR) || '@example.org' AS email
    FROM events WHERE event_type = 'signup'
    """,
    note="anonymization property check: pseudonymized email keeps the "
         "synthetic domain structure (full key-consistency covered in tests)",
)
def anonymize_email_domains(spark, sf_dir):
    # Build a synthetic email column, anonymize it with the engine's
    # pseudonymizer, and emit the structure-preserved part (domain); the
    # local part's determinism is asserted in unit tests.
    from py_etl_spark.operators.anonymize import pseudo_email

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    email = F.concat(F.lit("u"), F.col("user_id").cast("string"), F.lit("@example.org"))
    anon = pseudo_email(email, "salt")
    return ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.concat(
            F.lit("u"), F.col("user_id").cast("string"), F.lit("@"),
            F.substring_index(anon, "@", -1),
        ).alias("email"),
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH uc AS (
      SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_cost
      FROM lineitem
    ), r AS (
      SELECT l_partkey, l_suppkey, unit_cost,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY unit_cost, l_suppkey) AS rn
      FROM uc
    )
    -- floor(x*1e4 + 0.5)/1e4 instead of round(x, 4): *, +, floor, / are
    -- IEEE-correctly-rounded in every engine, so the result is
    -- bit-reproducible — round() is not (Spark rounds the exact decimal
    -- expansion via BigDecimal HALF_UP, DuckDB rounds in float space;
    -- the r11 sf0.1 sweep caught a boundary unit_cost flipping between
    -- 147.7012 and 147.7013). unit_cost > 0 always, so half-up == half
    -- away from zero.
    SELECT p_partkey, p_type, s_name,
           floor(unit_cost * 10000.0 + 0.5) / 10000.0 AS best_unit_cost
    FROM r
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE rn = 1 AND p_size <= 10
    """,
    note="TPC-H Q2 shape: argmin-per-group (cheapest supplier per part) via "
         "partitioned window; dims broadcast",
)
def q2_min_cost_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
    )
    # argmin-per-group as min(struct(unit_cost, l_suppkey)) instead of a
    # row_number window (r11, guide §2.3): lexicographic struct min IS
    # the (unit_cost asc, l_suppkey asc) winner, so the fact-wide window
    # sort becomes a hash aggregate with map-side partial combine — the
    # exchange carries one partial per (task, part), not every lineitem.
    best = (
        li.groupBy("l_partkey")
        .agg(F.min(F.struct("unit_cost", "l_suppkey")).alias("__m"))
        .select(
            "l_partkey",
            F.col("__m.unit_cost").alias("unit_cost"),
            F.col("__m.l_suppkey").alias("l_suppkey"),
        )
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    sup = _t(spark, sf_dir, "supplier")
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), best.l_suppkey == sup.s_suppkey)
        .select(
            "p_partkey", "p_type", "s_name",
            # bit-reproducible float-space round-half-up (see oracle note)
            (F.floor(F.col("unit_cost") * 10000.0 + F.lit(0.5)) / 10000.0)
            .alias("best_unit_cost"),
        )
    )


@query(
    "q4_order_priority_exists",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    note="TPC-H Q4 shape: EXISTS decorrelated to a left-semi join, then agg",
)
def q4_order_priority_exists(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    # EXISTS(l_shipdate > o_orderdate) ⟺ max(l_shipdate) > o_orderdate
    # per order key, so aggregate the fact BEFORE the join (r11, guide
    # §2.3 "aggregate before you shuffle"): the exchange carries one
    # map-side-combined (orderkey, max_ship) partial per key instead of
    # every lineitem row, and the join side shrinks enough for AQE to
    # broadcast it when the window is small. The scan filter
    # l_shipdate > '1997-01-01' is exact: every qualifying order has
    # o_orderdate ≥ that bound, so l_shipdate > o_orderdate implies it —
    # and it pushes to the parquet scan (PushedFilters), where the old
    # semi-join shape scanned and shuffled the full fact table.
    li_max = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .filter(
            F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
        )
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("__max_ship"))
    )
    sat = orders.join(
        li_max, orders.o_orderkey == li_max.l_orderkey, "inner"
    ).filter(F.col("__max_ship") > F.col("o_orderdate"))
    return sat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )


@query(
    "q10_returned_revenue",
    """
    SELECT c_custkey, c_name,
           -- exact scaled-integer revenue (order-free; module-top idiom) —
           -- revenue is also the top-20 sort key
           floor(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                     * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 100.0 + 0.5) / 100.0 AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    note="TPC-H Q10 shape: returned-item revenue per customer, "
         "TakeOrderedAndProject top-20",
)
def q10_returned_revenue(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            # per-customer groups (order count per customer is fixed in
            # the schema, independent of SF): long envelope
            _xr2(
                F.sum(
                    _xc(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                        4, "long",
                    )
                ),
                4,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_IVF_FIXED_CENTROIDS = (0, 7, 21, 42)


@query(
    "ivf_assign_fixed",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e
          WHERE vec_id IN {_IVF_FIXED_CENTROIDS}),
    scored AS (
      SELECT e.vec_id, c.cid,
             list_dot_product(e.v, c.cv) /
               (sqrt(list_dot_product(e.v, e.v)) *
                sqrt(list_dot_product(c.cv, c.cv))) AS cos
      FROM e CROSS JOIN c
    ),
    ranked AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid) AS rn
      FROM scored
    )
    SELECT vec_id, CAST(cid AS BIGINT) AS ivf_cell FROM ranked WHERE rn = 1
    """,
    note="IVF coarse quantization with pinned centroid rows: assignment is a "
         "map-side argmax over k literal centroids (k·dim driver metadata, "
         "no corpus shuffle); oracle-checked bit-for-bit. Trained-centroid "
         "path (Lloyd's) covered by unit convergence tests.",
)
def ivf_assign_fixed(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.filter(F.col("vec_id").isin(*_IVF_FIXED_CENTROIDS))
        .orderBy("vec_id")
        .collect()
    )
    centroids = [[float(x) for x in r["embedding"]] for r in cent_rows]
    cid_of_index = F.array(
        *[F.lit(int(r["vec_id"])) for r in cent_rows]
    )
    assigned = similarity.ivf_assign(emb, centroids)
    return assigned.select(
        "vec_id",
        F.element_at(cid_of_index, F.col("ivf_cell").cast("int") + 1)
        .cast("long")
        .alias("ivf_cell"),
    )


@query(
    "semantic_dedup_fixed",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e
          WHERE vec_id IN {_IVF_FIXED_CENTROIDS}),
    scored AS (
      SELECT e.vec_id, c.cid,
             list_dot_product(e.v, c.cv) /
               (sqrt(list_dot_product(e.v, e.v)) *
                sqrt(list_dot_product(c.cv, c.cv))) AS cos
      FROM e CROSS JOIN c
    ),
    assigned AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    un AS (
      -- unit vectors once per row, mirroring the Spark plan's
      -- normalize-before-join (identical arithmetic: x / sqrt(v·v))
      SELECT a.vec_id, a.cell,
             list_transform(e.v,
               x -> x / sqrt(list_dot_product(e.v, e.v))) AS uv
      FROM assigned a JOIN e ON e.vec_id = a.vec_id
    ),
    capped AS (
      -- degenerate-cell guard, identical to the Spark plan: only the
      -- first 2048 rows per cell (by vec_id) participate in pairs
      SELECT vec_id, cell, uv FROM (
        SELECT *, row_number() OVER (PARTITION BY cell
                                     ORDER BY vec_id) AS rk
        FROM un
      ) WHERE rk <= 2048
    ),
    dropped AS (
      SELECT DISTINCT pb.vec_id
      FROM capped pa
      JOIN capped pb ON pb.cell = pa.cell AND pa.vec_id < pb.vec_id
      WHERE list_dot_product(pa.uv, pb.uv) >= 0.45
    )
    SELECT a.vec_id, CAST(a.cell AS BIGINT) AS ivf_cell,
           d.vec_id IS NULL AS is_kept
    FROM assigned a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    """,
    note="SemDeDup-style semantic dedup (operators/similarity."
         "semantic_dedup): map-side cluster assignment over pinned "
         "centroids, within-cluster-only cosine pairs capped at 2048 "
         "rows/cell before the self-join (pair work bounded at "
         "k*cap^2/2 however degenerate the cell; oracle caps "
         "identically), deterministic lower-id-wins drop rule",
)
def semantic_dedup_fixed(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.filter(F.col("vec_id").isin(*_IVF_FIXED_CENTROIDS))
        .orderBy("vec_id")
        .collect()
    )
    centroids = [[float(x) for x in r["embedding"]] for r in cent_rows]
    cid_of_index = F.array(*[F.lit(int(r["vec_id"])) for r in cent_rows])
    out = similarity.semantic_dedup(emb, centroids, threshold=0.45)
    return out.select(
        "vec_id",
        F.element_at(cid_of_index, F.col("ivf_cell").cast("int") + 1)
        .cast("long")
        .alias("ivf_cell"),
        "is_kept",
    )


@query(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           -- exact scaled-integer revenue (order-free; module-top idiom)
           floor(CAST(sum(CAST(floor(volume * 10000.0 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100.0 + 0.5) / 100.0 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                           AND TIMESTAMP '1996-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    note="TPC-H Q7 shape: bilateral nation-pair volume. Both nation dims and "
         "supplier broadcast; the disjunctive nation-pair predicate is "
         "evaluated map-side after broadcast joins, so only the "
         "lineitem⋈orders⋈customer fact joins shuffle.",
)
def q7_nation_volume(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            _xr2(
                F.sum(
                    _xc(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                ),
                4,
            ).alias("revenue")
        )
    )


@query(
    "q12_priority_lineclass",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    note="TPC-H Q12 shape (shipmode → linestatus: source lacks l_shipmode): "
         "fact⋈fact equi-join with pushed date range, CASE-sum pivoted "
         "priority counts; single shuffle pair for the join + partial aggs.",
)
def q12_priority_lineclass(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q19_disjunctive_brand_revenue",
    """
    -- exact scaled-integer revenue (order-free; module-top idiom)
    SELECT floor(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                     * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 100.0 + 0.5) / 100.0 AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    note="TPC-H Q19 shape: disjunctive multi-branch predicate across a "
         "broadcast join. The conjunctive envelope (brand IN set, size ≤ 15, "
         "quantity ≤ 30) is manually hoisted below the join so each side "
         "prunes before the OR is evaluated — Catalyst cannot factor an OR "
         "that spans both join sides on its own.",
)
def q19_disjunctive_brand_revenue(spark, sf_dir):
    # Envelope filters: necessary-condition projections of the OR branches
    # onto each side, pushed into the parquet scans.
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(branch)
        .agg(
            _xr2(
                F.sum(
                    _xc(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                ),
                4,
            ).alias("revenue")
        )
    )




@query(
    "token_count_bpe",
    f"""
    SELECT source,
           count(*) AS docs,
           CAST(sum(len(regexp_extract_all(text, '{_BPE_TOKEN_RE}'))) AS BIGINT)
             AS total_tokens,
           -- avg of exact integer counts is deterministic; render with
           -- the bit-reproducible float round (round() tie handling
           -- differs between engines — module-top idiom)
           floor(avg(len(regexp_extract_all(text, '{_BPE_TOKEN_RE}')))
                 * 10000.0 + 0.5) / 10000.0
             AS avg_tokens
    FROM documents
    GROUP BY source
    """,
    note="LLM-pipeline token accounting: BPE-ish pre-tokenizer regex "
         "(letter runs | digit runs | single punctuation), counted entirely "
         "JVM-side via regexp_extract_all — no Python in the hot path; one "
         "shuffle on the 20-value source key.",
)
def token_count_bpe(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    ntok = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_TOKEN_RE), F.lit(0)))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(ntok).cast("long").alias("total_tokens"),
        _fr(F.avg(ntok), 4).alias("avg_tokens"),
    )


def _bpe_oracle_sql() -> str:
    """Oracle for bpe_token_count_fixed: DuckDB replays the layered
    FIXED_MERGES table with sequential replace() over delimiter-wrapped
    symbols (bpe.BPETokenizer.replay_sql) — provably equivalent to the
    min-rank-first encoder for layered tables (tests/test_bpe.py checks
    the whole corpus vocabulary)."""
    from py_etl_spark.functions.bpe import BPETokenizer, FIXED_MERGES

    replay = BPETokenizer(FIXED_MERGES).replay_sql("t")
    return f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_TOKEN_RE}')) AS BIGINT)
             AS n_pretokens,
           CAST(coalesce(list_sum(list_transform(
                 regexp_extract_all(text, '{_BPE_TOKEN_RE}'),
                 t -> {replay})), 0) AS BIGINT)
             AS n_bpe_tokens
    FROM documents
    """


@query(
    "bpe_token_count_fixed",
    _bpe_oracle_sql(),
    note="REAL merges-table BPE (GPT-2-style min-rank-first encoder, "
         "functions/bpe.py) applied via Arrow-batched mapInPandas — merge "
         "ranks ride the closure to executors once, rows never shuffle, "
         "per-word LRU memoization exploits Zipf. Oracle replays the "
         "layered merge table in DuckDB via structural-delimiter "
         "replace(), bit-exact per doc.",
)
def bpe_token_count_fixed(spark, sf_dir):
    from py_etl_spark.functions.bpe import (
        BPETokenizer,
        FIXED_MERGES,
        with_bpe_token_counts,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tok = BPETokenizer(FIXED_MERGES)
    npre = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_TOKEN_RE), F.lit(0))
    )
    return (
        with_bpe_token_counts(docs, tok, out_col="n_bpe_tokens")
        .withColumn("n_pretokens", npre.cast("long"))
        .select("doc_id", "n_pretokens", "n_bpe_tokens")
    )


@query(
    "q13_order_count_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    note="TPC-H Q13 shape (priority filter: source lacks o_comment): "
         "customers-without-orders kept via outer semantics. Implemented as "
         "pre-aggregated orders (partial count before the join) + left join "
         "+ coalesce(0) — the per-custkey counts shuffle instead of the raw "
         "order rows, and the second distribution agg is map-side partial.",
)
def q13_order_count_distribution(spark, sf_dir):
    per_cust_orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    per_cust = cust.join(
        per_cust_orders, cust.c_custkey == per_cust_orders.o_custkey, "left"
    ).select(F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("c_count"))
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@query(
    "q15_top_supplier",
    """
    -- revenue view in exact scaled integers (order-free; module-top
    -- idiom): max() and the equality run on exact BIGINTs, so the
    -- winning-supplier pick is fully deterministic — an equality on
    -- rounded float sums was the most boundary-sensitive spot in the
    -- registry (row MEMBERSHIP flips, not just a displayed digit)
    WITH revenue AS (
      SELECT l_suppkey,
             sum(CAST(floor(l_extendedprice * (1 - l_discount)
                            * 10000.0 + 0.5) AS BIGINT)) AS total_revenue_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           floor(CAST(total_revenue_c AS DOUBLE) / 100.0 + 0.5) / 100.0
             AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM revenue)
    """,
    note="TPC-H Q15 shape: revenue view + scalar-max subquery. The 1-row "
         "max aggregate is broadcast back onto the view (no second scan of "
         "lineitem, no shuffle for the scalar compare); supplier dim "
         "broadcast. Max/equality on exact scaled-integer revenue, so the "
         "pick is deterministic cross-engine and cross-cluster-size.",
)
def q15_top_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        # per-supplier groups (lineitems per supplier fixed per SF):
        # long envelope
        F.sum(
            _xc(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4,
                "long")
        ).alias("total_revenue_c")
    )
    mx = rev.agg(F.max("total_revenue_c").alias("__mx"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue_c == mx.__mx)
        .join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            _xr2(F.col("total_revenue_c"), 4).alias("total_revenue"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    """
    -- exact cents sum (order-free; module-top idiom), then one
    -- deterministic /7.0 and the bit-reproducible float render
    SELECT floor(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 100.0 / 7.0
                 * 100.0 + 0.5) / 100.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS t_partkey, 0.2 * avg(l_quantity) AS qty_thresh
          FROM lineitem GROUP BY l_partkey) t
      ON t_partkey = l_partkey
    WHERE p_brand = 'Brand#12' AND p_type = 'SMALL'
      AND l_quantity < qty_thresh
    """,
    note="TPC-H Q17 shape: correlated scalar-avg subquery decorrelated to a "
         "per-part aggregate + join. The part filter is applied FIRST "
         "(broadcast semi-prune), so the per-part avg is computed only over "
         "the surviving parts' lineitems — identical result, ~2000× less "
         "aggregated at TPC-H selectivity. l_quantity is integer-valued, so "
         "avg is exact and the threshold compare is deterministic "
         "cross-engine.",
)
def q17_small_quantity_revenue(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_sel = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    th = li_sel.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li_sel.join(F.broadcast(th), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            # brand+type filter leaves ~1/1000 of lineitem: long envelope
            _fr(
                _xr2(F.sum(_xc(F.col("l_extendedprice"), 2, "long")), 2)
                / 7.0, 2,
            ).alias("avg_yearly")
        )
    )


@query(
    "q22_idle_customer_balance",
    """
    -- exact cents sum (order-free; module-top idiom); the scalar-avg
    -- threshold is likewise exact-cents-sum / count so the membership
    -- predicate is deterministic cross-engine
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5)
                                            AS BIGINT)) AS DOUBLE)
                              / 100.0 / count(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
    note="TPC-H Q22 shape (nationkey for phone prefix): above-average "
         "balances with no RECENT orders. Scalar avg broadcast (1 row); the "
         "NOT EXISTS is a left-anti join against pre-distinct'd o_custkey "
         "(date filter pushed to the orders scan, map-side partial dedup "
         "shrinks the anti-join shuffle to distinct keys).",
)
def q22_idle_customer_balance(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        # acctbal <= 9999.99 → scaled rows <= 1e6; 1.5e10 customers at
        # 100 TB → 1.5e16: long envelope
        (
            F.sum(_xc(F.col("c_acctbal"), 2, "long")).cast("double")
            / 100.0
            / F.count(F.lit(1))
        ).alias("__ab")
    )
    buyers = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__ab")
    )
    return (
        rich.join(buyers, rich.c_custkey == buyers.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            _xr2(F.sum(_xc(F.col("c_acctbal"), 2, "long")), 2)
            .alias("totacctbal"),
        )
    )


_STOPWORD_RE = r"\b(the|and|of|to|in|a|is)\b"


@query(
    "quality_filter_gopher",
    f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_words,
             len(regexp_replace(text, '\\s', '', 'g'))
               AS word_chars,
             len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
               AS sym_chars,
             greatest(len(text), 1) AS n_chars_nz,
             regexp_matches(lower(text), '{_STOPWORD_RE}') AS has_stopword
      FROM documents
    )
    SELECT doc_id, n_words,
           round(word_chars / n_words, 4)    AS mean_word_len,
           round(sym_chars / n_chars_nz, 4)  AS symbol_ratio,
           has_stopword,
           (n_words BETWEEN 5 AND 10000
            AND word_chars / n_words BETWEEN 2 AND 12
            AND sym_chars / n_chars_nz < 0.2
            AND has_stopword) AS keep
    FROM m
    """,
    note="LLM-pipeline quality gate (Gopher-style rules): word-count "
         "bounds, mean word length, symbol ratio, stopword presence → keep "
         "flag + per-rule evidence columns. Pure Column expressions, "
         "map-side only — zero shuffles, fully codegen'd at 100 TB. "
         "Integer-exact intermediates keep every threshold compare "
         "deterministic cross-engine.",
)
def quality_filter_gopher(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    # char-class counts as translate-DELETE length deltas (the r09
    # regex-rewrite lesson); Java \s is exactly [ \t\n\x0B\f\r]
    _ws = " \t\n\x0b\f\r"
    _alnum = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    )
    word_chars = F.length(F.translate(F.col("text"), _ws, ""))
    sym_chars = F.length(F.translate(F.col("text"), _alnum + _ws, ""))
    n_chars_nz = F.greatest(F.length("text"), F.lit(1))
    has_stopword = F.lower(F.col("text")).rlike(_STOPWORD_RE)
    mean_word_len = word_chars / n_words
    symbol_ratio = sym_chars / n_chars_nz
    keep = (
        n_words.between(5, 10000)
        & mean_word_len.between(2, 12)
        & (symbol_ratio < 0.2)
        & has_stopword
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        has_stopword.alias("has_stopword"),
        keep.alias("keep"),
    )


def _cc_oracle_sql() -> str:
    """Connected-components oracle: the LSH candidate pairs (identical CTE
    chain to dedup_minhash_lsh) fed into a recursive transitive-closure CTE;
    cluster id = min reachable doc_id. Bounded: near-dup components are
    small cliques, so the closure is tiny relative to the corpus."""
    lsh = _minhash_lsh_oracle_sql()
    with_block, pair_select = lsh.split("SELECT DISTINCT", 1)
    return (
        with_block.replace("WITH ", "WITH RECURSIVE ", 1)
        + ", pairs AS (\n      SELECT DISTINCT"
        + pair_select.rstrip()
        + "\n    ), edges AS (\n"
        + "      SELECT id_a AS s, id_b AS d FROM pairs\n"
        + "      UNION ALL\n"
        + "      SELECT id_b AS s, id_a AS d FROM pairs\n"
        + "    ), reach(node, label) AS (\n"
        + "      SELECT doc_id, doc_id FROM documents\n"
        + "      UNION\n"
        + "      SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node\n"
        + "    )\n"
        + "    SELECT CAST(node AS BIGINT) AS doc_id,\n"
        + "           CAST(min(label) AS BIGINT) AS cluster_id\n"
        + "    FROM reach GROUP BY node\n"
    )


@query(
    "dedup_cc_clusters",
    _cc_oracle_sql(),
    note="Near-dup CLUSTERS (not just pairs): MinHash-LSH candidate edges → "
         "distributed connected components by min-label propagation "
         "(2 shuffles/iteration, converges in O(component diameter); "
         "localCheckpoint bounds lineage). Every doc gets a cluster_id — "
         "the canonical keep-one-per-cluster LLM dedup output. Oracle: "
         "recursive-CTE transitive closure over the identical edge set.",
)
def dedup_cc_clusters(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_candidates(docs, hash_family="md5")
    cc = dedup.connected_components(pairs, nodes=docs.select("doc_id"))
    return cc.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def _ivf_topk_oracle_sql() -> str:
    cos_ec = (
        "list_dot_product(e.v, c.cv) / (sqrt(list_dot_product(e.v, e.v)) * "
        "sqrt(list_dot_product(c.cv, c.cv)))"
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e
          WHERE vec_id IN {_IVF_FIXED_CENTROIDS}),
    scored_cells AS (
      SELECT e.vec_id, e.v, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {cos_ec} DESC, c.cid) AS rn
      FROM e CROSS JOIN c
    ),
    assigned AS (SELECT vec_id, v, cid AS cell FROM scored_cells WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, v AS q_vec, cid AS cell
               FROM scored_cells WHERE vec_id < 10 AND rn <= 2),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             round(list_dot_product(p.q_vec, a.v) /
                   (sqrt(list_dot_product(p.q_vec, p.q_vec)) *
                    sqrt(list_dot_product(a.v, a.v))), 6) AS cosine
      FROM probes p JOIN assigned a
        ON p.cell = a.cell AND p.query_id <> a.vec_id
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS BIGINT)
             AS rank
    FROM cand QUALIFY rank <= 5
    """


@query(
    "ann_ivf_topk_fixed",
    _ivf_topk_oracle_sql(),
    note="IVF probe SEARCH (completes the IVF pair with ivf_assign_fixed): "
         "each query scores only the corpus vectors in its nprobe=2 nearest "
         "cells of 4 pinned centroids. Corpus cells map-side; probe join is "
         "a broadcast equi-join on cell — at rest the corpus is partitioned "
         "by ivf_cell so the probe prunes at the source. Oracle-checked "
         "bit-for-bit; trained-centroid path shares the code.",
)
def ann_ivf_topk_fixed(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.filter(F.col("vec_id").isin(*_IVF_FIXED_CENTROIDS))
        .orderBy("vec_id")
        .collect()
    )
    centroids = [[float(x) for x in r["embedding"]] for r in cent_rows]
    probe_queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(emb, probe_queries, centroids, nprobe=2, k=5)


@query(
    "q21_last_shipper",
    """
    WITH per_order AS (
      SELECT l_orderkey AS ok, max(l_shipdate) AS max_ship,
             count(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT s_name, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS numwait
    FROM lineitem
    JOIN per_order ON l_orderkey = ok
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE l_shipdate = max_ship AND n_supp > 1
    GROUP BY s_name
    """,
    note="TPC-H Q21 shape (shipdate for receipt/commit: source lacks those "
         "columns): the EXISTS/NOT-EXISTS pair decorrelated into ONE "
         "per-order collect_set aggregate — an order is a BOUNDED group "
         "(~7 lineitems), so the last-shipper set is an in-row array op, "
         "and the fact table is scanned and shuffled exactly once. The "
         "r07 shape joined 60M lineitems back to the 15M-order aggregate "
         "(SMJ, the dominant stage at sf10: 1853 executor-s) and scanned "
         "lineitem twice for the countDistinct expand; collapsing both "
         "into the single groupBy measured 52.9 -> 16.5 s at sf10 "
         "(same-session min-of-2). Supplier dim broadcast.",
)
def q21_last_shipper(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # one shuffle: per-order max shipdate + the distinct (shipdate,
    # suppkey) pairs; n_supp>1 and the max-ship shipper set are then
    # array expressions over a ≤|order| collected set — after the
    # struct-set filter each surviving supplier appears once per order,
    # so the final countDistinct degrades to a plain count
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.max("l_shipdate").alias("max_ship"),
            F.collect_set(F.struct("l_shipdate", "l_suppkey")).alias("sh"),
        )
        .filter(
            # drop nulls before the distinct so n_supp matches the
            # oracle's count(DISTINCT l_suppkey), which excludes NULLs —
            # size(array_distinct(...)) would count NULL as a supplier
            F.size(
                F.array_distinct(
                    F.filter(
                        F.transform(F.col("sh"), lambda x: x.l_suppkey),
                        lambda k: k.isNotNull(),
                    )
                )
            )
            > 1
        )
        .select(
            "l_orderkey",
            F.explode(
                F.transform(
                    F.filter(
                        F.col("sh"),
                        lambda x: x.l_shipdate == F.col("max_ship"),
                    ),
                    lambda x: x.l_suppkey,
                )
            ).alias("l_suppkey"),
        )
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(F.broadcast(sup), per_order.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("l_orderkey").cast("long").alias("numwait"))
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^\s,]+"


@query(
    "pii_scrub_stats",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text ||
               CASE WHEN doc_id % 5 = 0
                    THEN ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.com'
                    ELSE '' END ||
               CASE WHEN doc_id % 7 = 0
                    THEN ' see https://docs.example.com/d/'
                         || CAST(doc_id AS VARCHAR)
                    ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{_URL_RE}')) AS BIGINT) AS n_urls,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_URL_RE}', '<URL>', 'g')) AS scrubbed_md5
    FROM aug
    """,
    note="LLM-pipeline PII scrub: email/URL detection counts + redacted-"
         "text fingerprint, entirely JVM-side regex (no Python). The "
         "synthetic corpus carries no PII, so deterministic spans are "
         "injected in-query (same expression both engines) — the oracle "
         "checks real extraction and replacement, not vacuous zeros. "
         "Map-side only: zero shuffles at any scale.",
)
def pii_scrub_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" see https://docs.example.com/d/"),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(""),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _URL_RE, "<URL>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_URL_RE), F.lit(0)))
        .cast("long")
        .alias("n_urls"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@query(
    "range_join_followup_events",
    """
    SELECT s.event_id, CAST(count(e.event_id) AS BIGINT) AS n_follow
    FROM events s JOIN events e
      ON e.user_id = s.user_id
     AND e.ts >  s.ts
     AND e.ts <= s.ts + INTERVAL 1 HOUR
    WHERE s.event_type = 'signup'
    GROUP BY s.event_id
    """,
    note="RANGE JOIN (banded): follow-up events within 1 h of each signup. "
         "A naive theta-join on the time inequality is a per-user cross "
         "product; instead both sides are bucketed into epoch-hours — the "
         "anchor explodes to the (at most 2) buckets its window touches, "
         "the probe maps to exactly 1 — and the join becomes an equi-join "
         "on (user_id, hour_bucket) with the exact interval as a residual "
         "filter. Each follower lands in one anchor bucket, so no dedup "
         "is needed. This is the standard Spark banding pattern for "
         "point-in-interval joins at scale.",
)
def range_join_followup_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    hb = lambda c: F.floor(F.unix_timestamp(c) / 3600)  # noqa: E731
    anchors = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("anchor_id"),
            F.col("user_id").alias("a_user"),
            F.col("ts").alias("a_ts"),
        )
        .withColumn("hbucket", F.explode(F.array(hb(F.col("a_ts")), hb(F.col("a_ts")) + 1)))
    )
    probes = ev.select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    ).withColumn("hbucket", hb(F.col("p_ts")))
    joined = anchors.join(
        probes,
        (F.col("a_user") == F.col("p_user"))
        & (anchors.hbucket == probes.hbucket)
        & (F.col("p_ts") > F.col("a_ts"))
        & (F.col("p_ts") <= F.col("a_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.groupBy(F.col("anchor_id").alias("event_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_follow")
    )


@query(
    "q8_market_share",
    """
    -- ratio of exact scaled-integer sums (order-free; module-top idiom)
    SELECT o_year,
           floor(CAST(sum(CASE WHEN nation = 'NATION_3'
                               THEN volume_c ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume_c) AS DOUBLE)
                 * 10000.0 + 0.5) / 10000.0 AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
                  AS BIGINT) AS volume_c,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 00:00:00'
    ) allnations
    GROUP BY o_year
    """,
    note="TPC-H Q8 shape: 8-way snowflake + ratio-of-conditional-sums per "
         "year. All five dims broadcast; only the three fact joins "
         "(lineitem⋈orders⋈customer) shuffle, then one 2-group agg.",
)
def q8_market_share(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rows = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n2), sup.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _xc(vol, 4).alias("volume_c"),
            "nation",
        )
    )
    zero_c = F.lit(0).cast("decimal(20,0)")
    return rows.groupBy("o_year").agg(
        _fr(
            F.sum(
                F.when(F.col("nation") == "NATION_3", F.col("volume_c"))
                .otherwise(zero_c)
            ).cast("double")
            / F.sum("volume_c").cast("double"),
            4,
        ).alias("mkt_share")
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
    note="TPC-H Q16 shape (lineitem as the part↔supplier bridge; acctbal "
         "for the complaints predicate): distinct-supplier counts per part "
         "attribute triple, excluded suppliers dropped with a broadcast "
         "left-anti join (keys are non-null, so NOT IN ≡ anti-join). "
         "countDistinct expands to a two-phase partial-distinct aggregate — "
         "no row ever shuffles twice.",
)
def q16_supplier_part_counts(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_sup = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_sup), li.l_suppkey == bad_sup.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "q20_heavy_part_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 50
    )
    """,
    note="TPC-H Q20 shape: nested semi-join chain — parts by name prefix "
         "(broadcast), per-supplier shipped-quantity HAVING aggregate, "
         "then a left-semi join into supplier. The IN-subquery never "
         "materializes as a distinct set: the semi join consumes the "
         "aggregate directly.",
)
def q20_heavy_part_suppliers(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # heavy is bounded by |suppliers| (an aggregate per supplier) —
    # dimension-sized, so broadcast explicitly rather than waiting for AQE
    # to discover the post-agg size at runtime.
    return sup.join(F.broadcast(heavy), sup.s_suppkey == heavy.l_suppkey, "left_semi")


@query(
    "skew_salted_join_orders",
    """
    SELECT o_orderkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
    note="Skew-salted join (operators/skew.salted_join): the fact side is "
         "spread over 8 deterministic sub-keys (xxhash64 of the PK, never "
         "rand()) and the dimension replicated 8x, so a hot customer key "
         "occupies 8 reducers instead of 1. Result-identical to the plain "
         "join — which is exactly what the oracle checks.",
)
def skew_salted_join_orders(spark, sf_dir):
    from py_etl_spark.operators.skew import salted_join

    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return salted_join(
        orders, cust, "o_custkey", "c_custkey", salt_from="o_orderkey",
        salt_factor=8,
    ).select("o_orderkey", "c_name", "c_mktsegment")


@query(
    "key_skew_profile_lineitem",
    """
    WITH c AS (
      SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY l_suppkey
    ), t AS (
      SELECT sum(n) AS total, count(*) AS nkeys FROM c
    )
    SELECT l_suppkey, CAST(n AS BIGINT) AS n_rows,
           floor((CAST(n AS DOUBLE) / total) * 1000000.0 + 0.5) / 1000000.0
             AS share,
           floor((CAST(n * nkeys AS DOUBLE) / total) * 10000.0 + 0.5) / 10000.0
             AS skew_factor
    FROM c, t
    ORDER BY n_rows DESC, l_suppkey LIMIT 10
    """,
    note="Key-skew diagnostics (operators/skew.key_skew_profile): top-10 "
         "heaviest join-key values with row share and skew factor "
         "(count / mean-per-key) — the pre-flight check that tells you "
         "when to reach for salted_join or verify AQE skew splitting. "
         "One shuffle (per-key count); totals ride a broadcast scalar "
         "cross join, never an unpartitioned window; top-k compiles to "
         "TakeOrderedAndProject.",
)
def key_skew_profile_lineitem(spark, sf_dir):
    from py_etl_spark.operators.skew import key_skew_profile

    return key_skew_profile(
        _t(spark, sf_dir, "lineitem"), "l_suppkey", top_k=10
    )


@query(
    "profile_orders_table",
    """
    SELECT CAST(count(*) AS BIGINT)                      AS n_rows,
           CAST(count(DISTINCT o_custkey) AS BIGINT)     AS custkey_distinct,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS status_distinct,
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)                               AS priority_nulls,
           CAST(min(o_orderkey) AS BIGINT)               AS orderkey_min,
           CAST(max(o_orderkey) AS BIGINT)               AS orderkey_max,
           round(min(o_totalprice), 2)                   AS totalprice_min,
           round(max(o_totalprice), 2)                   AS totalprice_max,
           CAST(epoch(min(o_orderdate)) AS BIGINT)       AS orderdate_min_s,
           CAST(epoch(max(o_orderdate)) AS BIGINT)       AS orderdate_max_s
    FROM orders
    """,
    note="Table profiling (the stats face of the reference's schema "
         "introspection, ldaptest.py schema action): row count, per-column "
         "distincts / null counts / ranges in ONE pass — every aggregate "
         "is partial map-side, one final 1-row reduce. The pattern scans "
         "100 TB exactly once regardless of how many columns are profiled.",
)
def profile_orders_table(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("o_custkey").cast("long").alias("custkey_distinct"),
        F.countDistinct("o_orderstatus").cast("long").alias("status_distinct"),
        F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("priority_nulls"),
        F.min("o_orderkey").cast("long").alias("orderkey_min"),
        F.max("o_orderkey").cast("long").alias("orderkey_max"),
        F.round(F.min("o_totalprice"), 2).alias("totalprice_min"),
        F.round(F.max("o_totalprice"), 2).alias("totalprice_max"),
        F.unix_timestamp(F.min("o_orderdate")).cast("long").alias("orderdate_min_s"),
        F.unix_timestamp(F.max("o_orderdate")).cast("long").alias("orderdate_max_s"),
    )


@query(
    "a9_price_histogram",
    """
    SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(l_extendedprice), 2) AS lo,
           round(max(l_extendedprice), 2) AS hi
    FROM lineitem GROUP BY 1
    """,
    note="Fixed-width histogram (profiling / data-quality family): bucket "
         "assignment is a map-side floor expression, the distribution is "
         "one partial-agg shuffle on the bucket id — the distributed "
         "histogram pattern (never a driver-side value pull).",
)
def a9_price_histogram(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "bucket", F.floor(F.col("l_extendedprice") / 5000.0).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
    )


@query(
    "q9_product_profit",
    """
    -- profit is defined in exact integer cents: the per-row amount is a
    -- chain of IEEE-exact double ops (bit-identical in every engine),
    -- rounded to cents per row with the bit-reproducible
    -- floor(x*100 + 0.5), then summed as integers — an order-free exact
    -- sum. round(sum(double), 2) was order-DEPENDENT: the r11 sf0.1
    -- sweep caught one (nation, year) group landing on a half-cent
    -- boundary, flipping .61/.62 with the reduction order.
    SELECT nation, o_year,
           CAST(sum(amount_c) AS DOUBLE) / 100.0 AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(floor((l_extendedprice * (1 - l_discount)
                         - 0.1 * p_retailprice * l_quantity) * 100.0
                        + 0.5) AS BIGINT) AS amount_c
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    """,
    note="TPC-H Q9 shape (p_retailprice stands in for ps_supplycost — no "
         "partsupp table in this dataset): name-substring part filter, "
         "5-way join, per-nation-year profit. part/supplier/nation "
         "broadcast; only lineitem⋈orders shuffles, then one small agg. "
         "Profit aggregated in exact integer cents (order-free).",
)
def q9_product_profit(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey", "p_retailprice")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            # exact integer cents per row (bit-reproducible float round,
            # see oracle note); (nation, year) groups scale with the
            # data (~1e15 envelope at 100 TB): long accumulator
            _xc(amount, 2, "long").alias("amount_c"),
        )
        .groupBy("nation", "o_year")
        .agg(
            (F.sum("amount_c").cast("double") / 100.0).alias("sum_profit")
        )
    )


@query(
    "q11_important_stock",
    """
    -- per-part values in exact scaled integers (order-free; module-top
    -- idiom): the threshold predicate decides row MEMBERSHIP, so both
    -- comparison sides must be deterministic, not merely rounded
    WITH val AS (
      SELECT l_partkey,
             sum(CAST(floor(l_extendedprice * (1 - l_discount)
                            * 10000.0 + 0.5) AS BIGINT)) AS raw_value_c
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey,
           floor(CAST(raw_value_c AS DOUBLE) / 100.0 + 0.5) / 100.0 AS value
    FROM val
    WHERE floor(CAST(raw_value_c AS DOUBLE) / 100.0 + 0.5) / 100.0
          > (SELECT floor(CAST(sum(raw_value_c) AS DOUBLE) / 10000.0 * 0.002
                          * 100.0 + 0.5) / 100.0
                                 FROM val)
    """,
    note="TPC-H Q11 shape (lineitem value per part for one nation's "
         "suppliers — no partsupp table): group-by + HAVING against a "
         "global scalar subquery. The scalar is the same part-keyed "
         "aggregate re-reduced to one row and broadcast; both comparison "
         "sides derive from exact scaled-integer sums so the threshold "
         "membership is deterministic cross-engine.",
)
def q11_important_stock(spark, sf_dir):
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    val = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            # per-part groups (bounded lineitems/part): long envelope
            F.sum(
                _xc(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4,
                    "long")
            ).alias("raw_value_c")
        )
    )
    # scalar threshold: the part-keyed aggregate re-reduced to one row,
    # then broadcast — never a driver collect. This GLOBAL re-sum of the
    # per-part longs is a 1-group aggregate over unbounded groups →
    # decimal accumulator (the per-part values are already tiny in count,
    # so the decimal path costs nothing here)
    thresh = val.agg(
        _fr(
            F.sum(F.col("raw_value_c").cast("decimal(20,0)")).cast("double")
            / 10000.0 * 0.002, 2,
        ).alias("__t")
    )
    value = _xr2(F.col("raw_value_c"), 4)
    return (
        val.join(F.broadcast(thresh), value > F.col("__t"))
        .select("l_partkey", value.alias("value"))
    )


@query(
    "doc_winnow_fingerprints",
    """
    WITH norm AS (
      SELECT doc_id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS n
      FROM documents
    ), pos AS (
      SELECT doc_id, n,
             unnest(range(1, length(n) - 6)) AS p
      FROM norm WHERE length(n) >= 8
    ), hashed AS (
      SELECT doc_id, p,
             ('0x' || substr(md5(substr(n, CAST(p AS INTEGER), 8)), 1, 8))::BIGINT AS h
      FROM pos
    ), winmin AS (
      SELECT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM hashed
    ), fps AS (SELECT DISTINCT doc_id, fp FROM winmin)
    SELECT doc_id,
           CAST(count(*) AS BIGINT)  AS n_fps,
           CAST(sum(fp) AS BIGINT)   AS fp_checksum,
           CAST(min(fp) AS BIGINT)   AS fp_min,
           CAST(max(fp) AS BIGINT)   AS fp_max
    FROM fps GROUP BY doc_id
    """,
    note="Winnowing document fingerprints (MOSS rolling k-gram hash, k=8 "
         "w=4, operators/fingerprint.py): char-gram explode + md5-portable "
         "hash + per-doc window min + distinct, summarized per doc. One "
         "shuffle (doc partition), reused by window, distinct, and "
         "aggregate alike.",
)
def doc_winnow_fingerprints(spark, sf_dir):
    from py_etl_spark.operators.fingerprint import fingerprint_profile

    return fingerprint_profile(
        _t(spark, sf_dir, "documents"), k=8, w=4, hash_family="md5"
    )


@query(
    "corpus_split_deterministic",
    """
    SELECT CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT)    AS docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 100 AS b,
             n_chars
      FROM documents
    )
    GROUP BY 1
    """,
    note="Deterministic train/val/test split (operators/corpus."
         "deterministic_split, 80/10/10): md5(id) mod 100 — map-side, no "
         "rand(), stable under task retry and repartitioning, reproducible "
         "by any engine. The query summarizes per-split doc/char counts "
         "(one small agg shuffle); the op itself is shuffle-free.",
)
def corpus_split_deterministic(spark, sf_dir):
    from py_etl_spark.operators.corpus import deterministic_split

    docs = deterministic_split(_t(spark, sf_dir, "documents"))
    return docs.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "corpus_token_budget_quota",
    f"""
    WITH t AS (
      SELECT source, doc_id,
             CAST(len(regexp_extract_all(text, '{_BPE_TOKEN_RE}')) AS BIGINT)
               AS n_tokens,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM documents
    ), c AS (
      SELECT source, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT source, doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
    FROM c WHERE cum - n_tokens < 800
    """,
    note="Per-source token-budget quota (operators/corpus."
         "token_budget_quota, 800 tokens/source): docs ordered by md5(id) "
         "— a deterministic unbiased shuffle — running BPE-regex token sum "
         "per source, keep docs starting under budget. One window shuffle "
         "on the group key; groups are independent across the cluster.",
)
def corpus_token_budget_quota(spark, sf_dir):
    from py_etl_spark.operators.corpus import token_budget_quota

    return token_budget_quota(
        _t(spark, sf_dir, "documents"), budget=800
    ).select("source", "doc_id", "n_tokens", "cum_tokens")


@query(
    "corpus_decontaminate_vs_benchmark",
    """
    WITH raw AS (
      SELECT doc_id, source,
             CASE WHEN text IS NULL THEN NULL
                  ELSE coalesce(nullif(list_filter(string_split_regex(
                         lower(text), '[^a-z0-9]+'), x -> x <> ''),
                       []::VARCHAR[]), ['']::VARCHAR[]) END AS toks
      FROM documents
    ), toks AS (
      SELECT doc_id, source, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS pos
      FROM raw
    ), sh AS (
      SELECT doc_id, source,
             concat_ws(' ', tok, lead(tok,1) OVER w, lead(tok,2) OVER w)
               AS shingle
      FROM (SELECT doc_id, source, tok, pos,
                   count(*) OVER (PARTITION BY doc_id) AS n FROM toks)
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY pos <= n - 2 OR (n < 3 AND pos = 1)
    ), bench AS (
      SELECT DISTINCT shingle FROM sh WHERE source = 'src0'
    ), corp AS (
      SELECT doc_id, shingle FROM sh WHERE source <> 'src0'
    )
    SELECT doc_id, CAST(count(DISTINCT c.shingle) AS BIGINT) AS n_hits
    FROM corp c JOIN bench b USING (shingle)
    GROUP BY doc_id
    """,
    note="Benchmark decontamination (operators/corpus.decontaminate): "
         "corpus docs sharing any word 3-gram with the eval set (source="
         "src0 stands in as the benchmark). The benchmark's distinct "
         "shingles BROADCAST — the 100 TB corpus side never shuffles its "
         "text; the only exchange is the per-doc hit count.",
)
def corpus_decontaminate_vs_benchmark(spark, sf_dir):
    from py_etl_spark.operators.corpus import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    corp = docs.filter(F.col("source") != "src0")
    return decontaminate(corp, bench)


@query(
    "corpus_chunk_tokens",
    f"""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(text, '{_BPE_TOKEN_RE}') AS toks
      FROM documents
    ), c AS (
      SELECT doc_id,
             unnest(range(0, greatest(CAST(ceil(len(toks) / 50.0) AS BIGINT),
                                      1))) AS chunk_id,
             toks
      FROM t
    ), sl AS (
      SELECT doc_id, chunk_id,
             list_slice(toks, chunk_id * 50 + 1, chunk_id * 50 + 50) AS ct
      FROM c
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(ct) AS BIGINT) AS n_chunk_tokens,
           array_to_string(ct, ' ') AS chunk
    FROM sl WHERE len(ct) > 0
    """,
    note="Fixed-size token chunking (operators/corpus.chunk_documents, 50 "
         "tokens/chunk): tokenize → explode chunk index → slice, all "
         "map-side JVM expressions — chunking 100 TB is embarrassingly "
         "parallel and this plan has ZERO shuffles. Memory bounded by the "
         "largest single document, never the corpus.",
)
def corpus_chunk_tokens(spark, sf_dir):
    from py_etl_spark.operators.corpus import chunk_documents

    return chunk_documents(_t(spark, sf_dir, "documents"), chunk_tokens=50)


@query(
    "corpus_mix_report",
    f"""
    WITH s AS (
      SELECT source,
             CAST(len(regexp_extract_all(text, '{_BPE_TOKEN_RE}')) AS BIGINT)
               AS n_tokens,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 100 AS b
      FROM documents
    )
    SELECT source,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY 1, 2
    """,
    note="Training-mix report: docs and token totals per (source, split) "
         "after the deterministic md5-bucket split — the dashboard number "
         "a mixture-weighted pretraining run is steered by. Map-side "
         "split + token count, one group-by shuffle over (source, split) "
         "pairs.",
)
def corpus_mix_report(spark, sf_dir):
    from py_etl_spark.operators.corpus import TOKEN_RE, deterministic_split

    docs = deterministic_split(_t(spark, sf_dir, "documents"))
    ntok = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))
    )
    return docs.groupBy("source", "split").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum(ntok).cast("long").alias("total_tokens"),
    )


def _bpe_train_oracle_sql(
    num_merges: int = 64,
    max_vocab: int = 65536,
    min_pair_freq: int = 2,
) -> str:
    """Generate the DuckDB oracle for :func:`bpe_train_merges`: the
    Sennrich argmax-merge loop UNROLLED as ``num_merges`` chained CTE
    stages (DuckDB 1.0 recursive CTEs allow only one self-reference per
    step; the trainer needs the word table twice per iteration — pair
    counting and merge application — so unrolling is the portable form).

    Every CTE is ``MATERIALIZED``: DuckDB inlines CTEs by default, and
    each ``w_k`` is referenced twice, so inlining would blow up
    exponentially in the iteration count.

    Per stage k: pair counts over ``w_k`` (sum of word freqs), best
    pair by (count DESC, left, right) — Python's
    ``min(key=(-count, pair))`` tie-break — then the LEFTMOST
    NON-OVERLAPPING merge application, set-based: mark match positions,
    group consecutive matches into islands (index minus row_number),
    pick even offsets within each island (Python's ``i += 2`` resume),
    drop the consumed right-hand symbols via ``lag(pick)``, and
    re-aggregate identical merged words. An exhausted stage (no pair
    reaches ``min_pair_freq``) yields an empty ``b_k``, the scalar
    subqueries go NULL, no position matches, and every later stage is
    identically empty — matching the trainer's early stop.
    """
    parts = [f"""
    w0 AS MATERIALIZED (
      SELECT regexp_split_to_array(w, '') AS syms, cnt AS freq FROM (
        SELECT w, count(*) AS cnt FROM (
          SELECT unnest(regexp_extract_all(text, '{_BPE_TOKEN_RE}')) AS w
          FROM documents
        ) GROUP BY w
        ORDER BY cnt DESC, w LIMIT {max_vocab}
      )
    )"""]
    for k in range(num_merges):
        parts.append(f"""
    p{k} AS MATERIALIZED (
      SELECT syms[i+1] AS l, syms[i+2] AS r2, sum(freq) AS cnt
      FROM w{k}, unnest(range(len(syms)-1)) u(i)
      GROUP BY 1, 2
    ),
    b{k} AS MATERIALIZED (
      SELECT l, r2 FROM p{k} WHERE cnt >= {min_pair_freq}
      ORDER BY cnt DESC, l, r2 LIMIT 1
    ),
    w{k + 1} AS MATERIALIZED (
      SELECT syms, sum(freq) AS freq FROM (
        SELECT wid,
               list(CASE WHEN pick THEN s || (SELECT r2 FROM b{k})
                    ELSE s END ORDER BY i) AS syms,
               any_value(freq) AS freq
        FROM (
          SELECT *, coalesce(
                      lag(pick) OVER (PARTITION BY wid ORDER BY i),
                      false) AS prev_pick
          FROM (
            SELECT *, hit AND (i - min(i) OVER (
                        PARTITION BY wid, grp, hit)) % 2 = 0 AS pick
            FROM (
              SELECT *, i - row_number() OVER (
                          PARTITION BY wid, hit ORDER BY i) AS grp
              FROM (
                SELECT wid, freq, i, syms[i+1] AS s,
                       (syms[i+1] = (SELECT l FROM b{k}) AND
                        syms[i+2] = (SELECT r2 FROM b{k})) AS hit
                FROM (SELECT row_number() OVER () AS wid, syms, freq
                      FROM w{k}),
                     unnest(range(len(syms))) u(i)
              )
            )
          )
        )
        WHERE NOT prev_pick
        GROUP BY wid
      ) GROUP BY syms
    )""")
    merges_sel = "\n    UNION ALL\n".join(
        f'    SELECT CAST({k} AS BIGINT) AS rank, l AS "left", '
        f'r2 AS "right" FROM b{k}'
        for k in range(num_merges)
    )
    return ("WITH " + ",".join(parts)
            + f"\n    SELECT * FROM (\n{merges_sel}\n    ) ORDER BY rank")


@query(
    "bpe_train_merges",
    _bpe_train_oracle_sql(),  # the Sennrich loop, unrolled to SQL —
    # closes the r05 rows-only gap; the hand-computed-merges /
    # determinism / layering proofs remain in tests/test_bpe.py
    note="BPE merges-table TRAINING (functions/bpe.bpe_train): "
         "distributed word-frequency histogram (one combiner-friendly "
         "shuffle, top-64k cap bounds driver materialization — the ivf_"
         "train two-phase pattern), then the Sennrich merge loop on the "
         "compressed dict, O(vocab) per merge regardless of corpus size. "
         "Deterministic (lexicographic tie-break) under repartition; "
         "output is layered by construction, so trained tables are valid "
         "for the sequential SQL replay oracle.",
)
def bpe_train_merges(spark, sf_dir):
    from py_etl_spark.functions.bpe import bpe_train

    merges = bpe_train(_t(spark, sf_dir, "documents"), num_merges=64)
    return spark.createDataFrame(
        [(i, lft, r) for i, (lft, r) in enumerate(merges)],
        "rank long, left string, right string",
    )


@query(
    "corpus_pack_examples",
    f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, regexp_extract_all(text, '{_BPE_TOKEN_RE}') AS toks,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM documents
    ), c AS (
      SELECT doc_id, h,
             unnest(range(0, greatest(CAST(ceil(len(toks) / 50.0) AS BIGINT),
                                      1))) AS chunk_id,
             toks
      FROM t
    ), ch AS (
      SELECT doc_id, h, chunk_id,
             len(list_slice(toks, chunk_id * 50 + 1, chunk_id * 50 + 50)) AS n
      FROM c
      WHERE len(list_slice(toks, chunk_id * 50 + 1, chunk_id * 50 + 50)) > 0
    ), ordered AS (
      SELECT CAST(h % 256 AS INTEGER) AS shard, doc_id, chunk_id, n,
             row_number() OVER (PARTITION BY h % 256
                                ORDER BY h, doc_id, chunk_id) AS rn
      FROM ch
    ), packed AS (
      SELECT shard, doc_id, chunk_id, n, rn,
             CAST(0 AS BIGINT) AS example_id, n AS fill
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.doc_id, o.chunk_id, o.n, o.rn,
             CASE WHEN p.fill + o.n <= 200
                  THEN p.example_id ELSE p.example_id + 1 END,
             CASE WHEN p.fill + o.n <= 200 THEN p.fill + o.n ELSE o.n END
      FROM packed p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT shard, doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(n AS BIGINT) AS n_chunk_tokens, example_id
    FROM packed
    """,
    note="Context-window packing (operators/corpus.pack_chunks): greedy "
         "next-fit of 50-token chunks into 200-token examples, walked in "
         "deterministic md5-hash order within hash shards. One shuffle "
         "(shard partition), O(1)-state walk per shard in applyInPandas — "
         "no driver materialization, example ids unique per (shard, "
         "example_id) with zero cross-shard coordination. The oracle "
         "replays the identical walk as a DuckDB recursive CTE (one row "
         "per shard per step).",
)
def corpus_pack_examples(spark, sf_dir):
    from py_etl_spark.operators.corpus import chunk_documents, pack_chunks

    chunks = chunk_documents(_t(spark, sf_dir, "documents"), chunk_tokens=50)
    # applyInPandas is a column-pruning barrier: every input column
    # rides the shard shuffle and the Arrow round-trip. This report
    # needs only the assignment, so drop the chunk text BEFORE packing
    # (the walk keys on ids + sizes alone) — assemble_examples keeps
    # text flowing because its output genuinely carries it. Local
    # wall-time is tokenize-dominated (sf10 ~20 s either way); the cut
    # is shuffle BYTES, which is what a networked cluster pays for.
    return pack_chunks(
        chunks.select("doc_id", "chunk_id", "n_chunk_tokens"),
        context_tokens=200,
        num_shards=256,
    ).select("shard", "doc_id", "chunk_id", "n_chunk_tokens", "example_id")


@query(
    "corpus_assemble_examples",
    f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, regexp_extract_all(text, '{_BPE_TOKEN_RE}') AS toks,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM documents
    ), c AS (
      SELECT doc_id, h,
             unnest(range(0, greatest(CAST(ceil(len(toks) / 50.0) AS BIGINT),
                                      1))) AS chunk_id,
             toks
      FROM t
    ), ch AS (
      SELECT doc_id, h, chunk_id,
             list_slice(toks, chunk_id * 50 + 1, chunk_id * 50 + 50) AS ct
      FROM c
      WHERE len(list_slice(toks, chunk_id * 50 + 1, chunk_id * 50 + 50)) > 0
    ), ordered AS (
      SELECT CAST(h % 256 AS INTEGER) AS shard, doc_id, h, chunk_id,
             len(ct) AS n, array_to_string(ct, ' ') AS chunk,
             row_number() OVER (PARTITION BY h % 256
                                ORDER BY h, doc_id, chunk_id) AS rn
      FROM ch
    ), packed AS (
      SELECT shard, doc_id, h, chunk_id, n, chunk, rn,
             CAST(0 AS BIGINT) AS example_id, n AS fill
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.doc_id, o.h, o.chunk_id, o.n, o.chunk, o.rn,
             CASE WHEN p.fill + o.n <= 200
                  THEN p.example_id ELSE p.example_id + 1 END,
             CASE WHEN p.fill + o.n <= 200 THEN p.fill + o.n ELSE o.n END
      FROM packed p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT shard, example_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n) AS BIGINT) AS example_tokens,
           string_agg(chunk, ' ' ORDER BY h, doc_id, chunk_id)
             AS example_text
    FROM packed GROUP BY shard, example_id
    """,
    note="Training-example emission (operators/corpus.assemble_examples): "
         "pack_chunks assignments aggregated into one row per example — "
         "member chunks concatenated in the packing walk's hash order, "
         "chunk count, token total. One groupBy shuffle; per-example sort "
         "is array_sort over a few KB of collected structs (bounded by "
         "the context budget), never a global window. Completes the "
         "chunk -> pack -> emit pipeline.",
)
def corpus_assemble_examples(spark, sf_dir):
    from py_etl_spark.operators.corpus import (
        assemble_examples,
        chunk_documents,
        pack_chunks,
    )

    chunks = chunk_documents(_t(spark, sf_dir, "documents"), chunk_tokens=50)
    packed = pack_chunks(chunks, context_tokens=200, num_shards=256)
    return assemble_examples(packed).select(
        "shard", "example_id", "n_chunks", "example_tokens", "example_text"
    )


@query(
    "jsonl_roundtrip_documents",
    """
    SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
    note="JSONL source/sink (sources/jsonl_io.py): documents → newline-"
         "delimited JSON → schema-explicit read-back; values must survive "
         "the trip (JSON escaping of newlines/quotes/unicode). Spark's "
         "json format is split-parallel both ways; the reader is "
         "PERMISSIVE with a corrupt-record quarantine channel.",
)
def jsonl_roundtrip_documents(spark, sf_dir):
    from py_etl_spark.sources.jsonl_io import read_jsonl, write_jsonl

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="pyetl_jsonl_"), "docs_jsonl")
    write_jsonl(docs, path)
    return read_jsonl(
        spark, path,
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@query(
    "funnel_signup_click_purchase",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    ), users AS (SELECT DISTINCT user_id FROM events)
    SELECT u.user_id,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS reached,
           CAST(epoch_ms(t1) AS BIGINT) AS t_step1_ms,
           CAST(epoch_ms(t2) AS BIGINT) AS t_step2_ms,
           CAST(epoch_ms(t3) AS BIGINT) AS t_step3_ms
    FROM users u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
    """,
    note="Strict ordered funnel (operators/funnel.funnel): per-user "
         "sorted-array fold in ONE groupBy shuffle — the staged-min-join "
         "formulation the oracle uses costs one join per step",
)
def funnel_signup_click_purchase(spark, sf_dir):
    from py_etl_spark.operators.funnel import funnel

    out = funnel(
        _t(spark, sf_dir, "events"),
        steps=["signup", "click", "purchase"],
        tie_col="event_id",
    )
    return out.select(
        "user_id",
        "reached",
        F.unix_millis("t_step1").alias("t_step1_ms"),
        F.unix_millis("t_step2").alias("t_step2_ms"),
        F.unix_millis("t_step3").alias("t_step3_ms"),
    )


@query(
    "cohort_retention_weekly",
    """
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_start
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS period_start
      FROM events
    )
    SELECT CAST(epoch_ms(cohort_start) AS BIGINT) AS cohort_start_ms,
           CAST((epoch(period_start) - epoch(cohort_start)) / 604800
                AS BIGINT) AS period_offset,
           count(*) AS n_users
    FROM active JOIN first USING (user_id)
    GROUP BY 1, 2
    """,
    note="Weekly cohort retention triangle (operators/funnel."
         "cohort_retention): both user-keyed stages shuffle on the same "
         "key; the (cohort, offset) rollup is negligible",
)
def cohort_retention_weekly(spark, sf_dir):
    from py_etl_spark.operators.funnel import cohort_retention

    out = cohort_retention(_t(spark, sf_dir, "events"), period="week")
    return out.select(
        F.unix_millis("cohort_start").alias("cohort_start_ms"),
        "period_offset",
        "n_users",
    )


def _zorder_oracle() -> str:
    terms = " + ".join(
        f"(((ck >> {i}) & 1) << {2 * i}) + (((day >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    )
    return f"""
    WITH b AS (
      SELECT o_orderkey,
             o_custkey % 65536 AS ck,
             CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) % 65536 AS day
      FROM orders
    )
    SELECT o_orderkey, ck, day, {terms} AS zkey FROM b
    """


@query(
    "zorder_key_orders",
    _zorder_oracle(),
    note="Z-order (Morton) clustering key (operators/layout.zorder_key): "
         "bit-interleave of (custkey, order day) — the OPTIMIZE-ZORDER "
         "layout primitive that gives min-max pruning on BOTH columns; "
         "pure shift/mask codegen, zero shuffle for the key itself",
)
def zorder_key_orders(spark, sf_dir):
    from py_etl_spark.operators.layout import zorder_key

    o = _t(spark, sf_dir, "orders")
    ck = F.pmod(F.col("o_custkey"), F.lit(65536))
    day = F.pmod(
        F.floor(F.unix_timestamp("o_orderdate") / 86400).cast("long"),
        F.lit(65536),
    )
    return o.select(
        "o_orderkey",
        ck.alias("ck"),
        day.alias("day"),
        zorder_key([ck, day], 16).alias("zkey"),
    )


_RESAMPLE_ORACLE = """
    WITH bounds AS (
      SELECT date_trunc('day', min(ts)) AS lo,
             date_trunc('day', max(ts)) AS hi
      FROM events
    ), grid AS (
      SELECT t.event_type, gs.day
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        FROM bounds
      ) gs
    ), counts AS (
      SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ), dense AS (
      SELECT g.event_type, g.day, CAST(coalesce(c.n, 0) AS BIGINT) AS n
      FROM grid g
      LEFT JOIN counts c ON c.event_type = g.event_type AND c.day = g.day
    )
"""


@query(
    "events_daily_resample",
    _RESAMPLE_ORACLE
    + """
    SELECT event_type, CAST(epoch_ms(day) AS BIGINT) AS day_ms, n
    FROM dense
    """,
    note="Calendar resample with gap fill (operators/timeseries."
    "resample_daily): dense per-(type, day) counts — the grid is "
    "groups × sequence() metadata joined onto one count agg, zero days "
    "materialized from nothing",
)
def events_daily_resample(spark, sf_dir):
    from py_etl_spark.operators.timeseries import resample_daily

    out = resample_daily(_t(spark, sf_dir, "events"))
    return out.select(
        "event_type", F.unix_millis("day").alias("day_ms"), "n"
    )


@query(
    "events_rolling_7d",
    _RESAMPLE_ORACLE
    + """
    SELECT event_type, CAST(epoch_ms(day) AS BIGINT) AS day_ms, n,
           round(avg(n) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
             AS rolling_mean
    FROM dense
    """,
    note="Trailing 7-day moving average over the gap-filled series "
    "(operators/timeseries.rolling_mean): one window shuffle on the "
    "group key; zero-filled days participate, as a calendar mean must",
)
def events_rolling_7d(spark, sf_dir):
    from py_etl_spark.operators.timeseries import (
        resample_daily,
        rolling_mean,
    )

    dense = resample_daily(_t(spark, sf_dir, "events"))
    out = rolling_mean(dense)
    return out.select(
        "event_type",
        F.unix_millis("day").alias("day_ms"),
        "n",
        "rolling_mean",
    )


@query(
    "orc_roundtrip_documents",
    """
    SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
    note="ORC source/sink (sources/orc_io.py): documents → zstd ORC → "
         "schema-explicit read-back; same pushdown/pruning machinery as "
         "parquet, exercised as a value-preserving roundtrip",
)
def orc_roundtrip_documents(spark, sf_dir):
    from py_etl_spark.sources.orc_io import read_orc, write_orc

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="pyetl_orc_"), "docs_orc")
    write_orc(docs, path)
    return read_orc(
        spark, path,
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@query(
    "st_hopping_window_agg",
    """
    WITH e AS (
      -- epoch() returns DOUBLE in DuckDB; CAST immediately so every
      -- downstream expression (and the final window_start_ms) is BIGINT,
      -- matching Spark's unix_millis. Sibling st_tumbling_window_agg uses
      -- epoch_ms() for the same reason.
      SELECT CAST(epoch(time_bucket(INTERVAL 15 MINUTE, ts)) AS BIGINT) AS b,
             event_type
      FROM events
    ), w AS (
      SELECT unnest([b - 2700, b - 1800, b - 900, b]) AS ws, event_type
      FROM e
    )
    SELECT ws * 1000 AS window_start_ms, event_type, count(*) AS n
    FROM w GROUP BY 1, 2
    """,
    note="Hopping (sliding) 1h/15min windowed aggregation — the streaming "
         "window family's third member next to tumbling and session "
         "windows. Spark's window(slide) explodes each event into "
         "size/hop = 4 window memberships map-side, then one group agg; "
         "the oracle replicates the same 4 aligned starts per event.",
)
def st_hopping_window_agg(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis("w.start").alias("window_start_ms"),
            "event_type",
            "n",
        )
    )


# =========================================================================
# Exact integer embedding moments (operators/similarity.embedding_moments_int)
# =========================================================================

@query(
    "embedding_moments_matrix",
    """
    WITH q AS (
      SELECT list_transform(embedding::DOUBLE[],
               x -> CAST(round(x * 100000.0) AS BIGINT)) AS qv
      FROM embeddings
    ), grid AS (
      SELECT gi.i, gj.j
      FROM (SELECT unnest(range(0, 64)) AS i) gi
      CROSS JOIN (SELECT unnest(range(0, 64)) AS j) gj
      WHERE gj.j >= gi.i
    )
    SELECT CAST(g.i AS INT) AS i, CAST(g.j AS INT) AS j,
           CAST(sum(q.qv[g.i + 1] * q.qv[g.j + 1]) AS BIGINT) AS s
    FROM grid g CROSS JOIN q GROUP BY g.i, g.j
    UNION ALL
    SELECT CAST(gi.i AS INT), CAST(-1 AS INT),
           CAST(sum(q.qv[gi.i + 1]) AS BIGINT)
    FROM (SELECT unnest(range(0, 64)) AS i) gi CROSS JOIN q GROUP BY gi.i
    UNION ALL
    SELECT CAST(-1 AS INT), CAST(-1 AS INT), CAST(count(*) AS BIGINT) FROM q
    """,
    note="Exact scaled-integer second-moment matrix "
    "(similarity.embedding_moments_int): the distributed PCA/whitening "
    "feed — elements quantized once, every sum an order-free BIGINT, so "
    "the matrix is bit-identical under any partitioning and any engine "
    "(a float dot-product accumulation would differ per shuffle order). "
    "Map-side nested-transform pair terms; the only shuffle carries ≤ "
    "tasks·d² partial rows. pca_from_moments turns the collected "
    "metadata into mean/cov/eigvecs on the driver",
)
def embedding_moments_matrix(spark, sf_dir):
    from py_etl_spark.operators.similarity import embedding_moments_int

    return embedding_moments_int(
        _t(spark, sf_dir, "embeddings"), dim=64
    )


# =========================================================================
# Weighted sampling without replacement (operators/corpus.sample_weighted)
# =========================================================================

@query(
    "corpus_sample_weighted",
    """
    SELECT doc_id, source, lang, n_chars FROM (
      SELECT doc_id, source, lang, n_chars,
             pow(CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                           || ':wrs'), 1, 15)) AS BIGINT)
                      AS DOUBLE) / 1152921504606846976.0,
                 1.0 / CAST(n_chars AS DOUBLE)) AS k
      FROM documents
      WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0
    ) ORDER BY k DESC, doc_id LIMIT 200
    """,
    note="Weighted sampling without replacement "
    "(corpus.sample_weighted): Efraimidis–Spirakis exponential keys "
    "u^(1/w) over the deterministic md5(id:salt) uniform — inclusion "
    "probability ∝ n_chars, bit-reproducible (no rand()), top-k "
    "compiles to TakeOrderedAndProject so the corpus never shuffles",
)
def corpus_sample_weighted(spark, sf_dir):
    from py_etl_spark.operators.corpus import sample_weighted

    return sample_weighted(
        _t(spark, sf_dir, "documents").select(
            "doc_id", "source", "lang", "n_chars"
        ),
        k=200,
        weight_col="n_chars",
    )


# =========================================================================
# Trending top-k per window (streaming-dashboard shape)
# =========================================================================

@query(
    "trending_event_types_hourly",
    """
    SELECT window_start_ms, event_type, n, rnk FROM (
      SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_ms,
             event_type, count(*) AS n,
             row_number() OVER (
               PARTITION BY time_bucket(INTERVAL 1 HOUR, ts)
               ORDER BY count(*) DESC, event_type) AS rnk
      FROM events GROUP BY time_bucket(INTERVAL 1 HOUR, ts), event_type
    ) WHERE rnk <= 3
    """,
    note="Trending top-k per hour — the streaming-dashboard rollup: "
    "windowed counts then rank ≤ 3 within each window (deterministic "
    "count-desc/type tiebreak); the rank window runs over the "
    "window×type ROLLUP (metadata-scale), not raw events",
)
def trending_event_types_hourly(spark, sf_dir):
    from pyspark.sql import Window

    counts = (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rw = Window.partitionBy("w").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= 3)
        .select(
            F.unix_millis("w.start").alias("window_start_ms"),
            "event_type",
            "n",
            "rnk",
        )
    )


# =========================================================================
# Audio windowed features (operators/multimodal.audio_window_features)
# =========================================================================

@query(
    "audio_window_features_synthetic",
    None,
    note="Audio frame-sample/feature pipeline "
    "(multimodal.audio_window_features): RIFF-walk 16-bit PCM WAVs in "
    "Arrow batches, emit integer-exact per-window energy (Σs², peak) — "
    "the audio analog of the thumbnail loop. Rows-only: the WAV corpus "
    "is synthesized deterministically from doc ids (no audio column in "
    "the star schema; DuckDB has no RIFF walker); integer-exactness is "
    "pinned in tests/test_operators.py against a struct-unpacked replay",
)
def audio_window_features_synthetic(spark, sf_dir):
    import struct

    from py_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_window_features,
    )

    ids = [
        r["doc_id"]
        for r in _t(spark, sf_dir, "documents")
        .select("doc_id").orderBy("doc_id").limit(32).collect()
    ]
    rows = []
    for did in ids:
        # deterministic integer square wave: amplitude keyed by doc_id
        amp = 1000 + (did % 7) * 500
        pcm = b"".join(
            struct.pack("<h", amp if (i // 8) % 2 == 0 else -amp)
            for i in range(800)
        )
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", len(pcm))
        )
        rows.append(
            (did, "audio", bytearray(hdr + pcm), "audio/wav", None, None, 100)
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    return audio_window_features(media, window_ms=25)


# =========================================================================
# Data-quality constraint report (operators/dq.check_constraints)
# =========================================================================

@query(
    "dq_check_orders",
    """
    WITH rowchecks AS (
      SELECT 'not_null(o_custkey)' AS check_name,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'in_range(o_totalprice)',
             CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                            AND (o_totalprice < 0 OR o_totalprice > 1000000)
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'in_set(o_orderstatus)',
             CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('O', 'F', 'P')
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'matches(o_orderpriority)',
             CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                            AND NOT regexp_matches(o_orderpriority,
                                                   '^[0-9]-[A-Z ]+$')
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'unique(o_orderkey)',
             CAST(coalesce(sum(c - 1), 0) AS BIGINT)
      FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
      WHERE c > 1
      UNION ALL
      SELECT 'fk(o_custkey)',
             CAST(count(*) AS BIGINT)
      FROM orders o
      WHERE o.o_custkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
    )
    SELECT check_name, n_violations, n_violations = 0 AS passed
    FROM rowchecks
    """,
    note="Deequ-shaped data-quality gate (operators/dq.check_constraints): "
    "declarative constraints compiled to minimal passes — ALL row-level "
    "checks (null/range/set/regex) fold into ONE conditional-sum scan, "
    "uniqueness adds one map-side-combined key count, the FK check is a "
    "broadcast anti-join (fact table never shuffles); report is one "
    "metadata row per constraint, the publish-gate for table versions",
)
def dq_check_orders(spark, sf_dir):
    from py_etl_spark.operators import dq

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return dq.check_constraints(
        orders,
        [
            dq.not_null("o_custkey"),
            dq.in_range("o_totalprice", 0, 1000000),
            dq.in_set("o_orderstatus", ["O", "F", "P"]),
            dq.matches("o_orderpriority", "^[0-9]-[A-Z ]+$"),
            dq.unique("o_orderkey"),
            dq.foreign_key("o_custkey", customer, "c_custkey"),
        ],
    )


# =========================================================================
# Compressibility quality signal (rows-only: DuckDB has no deflate)
# =========================================================================

@query(
    "quality_compression_ratio",
    None,
    note="Deflate-compressibility gate "
    "(textstats.compression_ratio): flags too-repetitive (template "
    "spam) and too-random (binary junk) documents by integer "
    "compression percentage — Arrow-batched zlib, map-side, no "
    "shuffle. Rows-only: deflate bytes are zlib-version-dependent and "
    "DuckDB has no deflate; invariants (ratio ≥ 100 on prose, "
    "repetitive ≫ random, determinism) are pinned in "
    "tests/test_operators.py instead",
)
def quality_compression_ratio(spark, sf_dir):
    from py_etl_spark.operators.textstats import compression_ratio

    return compression_ratio(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    ).select("doc_id", "n_bytes", "c_bytes", "ratio_pct")


# =========================================================================
# Time-series anomaly flagging (trailing-baseline spike detection)
# =========================================================================

@query(
    "events_anomaly_days",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, count(*) AS n
      FROM events GROUP BY 1
    ), w AS (
      SELECT day, n,
             sum(n)   OVER tw AS base,
             count(*) OVER tw AS cnt
      FROM daily
      WINDOW tw AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT epoch_ms(CAST(day AS TIMESTAMP)) AS day_ms, n,
           CASE WHEN cnt = 7 THEN base END AS n_prev7,
           (cnt = 7 AND 14 * n > 3 * base) AS is_spike
    FROM w
    """,
    note="Trailing-baseline anomaly flag: daily counts vs the previous "
    "7 full days, spike ⟺ n > 1.5×mean(prev 7) expressed as the exact "
    "integer inequality 14n > 3·Σ — no float ratio in the predicate. "
    "The global window runs over the DAILY rollup (≤ one row per day — "
    "metadata-scale after the map-side-combined count shuffle), so the "
    "single-partition sort is over hundreds of rows even at 100 TB of "
    "raw events",
)
def events_anomaly_days(spark, sf_dir):
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tw = Window.orderBy("day").rowsBetween(-7, -1)
    return daily.select(
        F.unix_millis("day").alias("day_ms"),
        "n",
        F.sum("n").over(tw).alias("__base"),
        F.count(F.lit(1)).over(tw).alias("__cnt"),
    ).select(
        "day_ms",
        "n",
        F.when(F.col("__cnt") == 7, F.col("__base")).alias("n_prev7"),
        (
            (F.col("__cnt") == 7)
            & (14 * F.col("n") > 3 * F.col("__base"))
        ).alias("is_spike"),
    )


# =========================================================================
# Boilerplate line removal (operators/textstats.boilerplate_line_filter)
# =========================================================================

@query(
    "quality_boilerplate_lines",
    """
    WITH split AS (
      SELECT doc_id, source,
             string_split(text, chr(10)) AS lines,
             list_filter(string_split(text, chr(10)),
               l -> length(trim(l)) >= 10
                    AND length(regexp_replace(trim(l), '[^A-Za-z]', '', 'g'))
                        * 2 >= length(trim(l))) AS kept
      FROM documents
    )
    SELECT doc_id, source,
           CAST(length(lines) AS INT) AS n_lines,
           CAST(length(kept) AS INT) AS n_kept,
           array_to_string(kept, chr(10)) AS clean_text
    FROM split
    """,
    note="Line-level boilerplate removal "
    "(textstats.boilerplate_line_filter): jusText/RefinedWeb-shaped "
    "intra-document cleanup — drop short or <50%-alphabetic lines, "
    "integer-only predicate, zero shuffles (fuses into the same scan as "
    "the Gopher gate); complements segment_dedup's cross-document line "
    "dedup",
)
def quality_boilerplate_lines(spark, sf_dir):
    from py_etl_spark.operators.textstats import boilerplate_line_filter

    return boilerplate_line_filter(
        _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    ).select("doc_id", "source", "n_lines", "n_kept", "clean_text")


# =========================================================================
# Session windows (ST3-shape: the third Spark window kind)
# =========================================================================

@query(
    "st_session_window_agg",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           epoch_ms(min(ts)) AS session_start_ms,
           epoch_ms(max(ts) + INTERVAL 30 MINUTE) AS session_end_ms,
           count(*) AS n_events,
           -- exact scaled-integer sum (order-free; module-top idiom)
           floor(CAST(sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT))
                      AS DOUBLE) / 100.0 + 0.5) / 100.0 AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
    note="ST-shape session windows — F.session_window (the third window "
    "kind beside tumbling/hopping; identical API under readStream with "
    "a watermark) vs the oracle's gaps-and-islands replay; sessions "
    "merge while the gap is < 30 min, end = last event + gap, matching "
    "Spark's half-open [start, last+gap) merge rule",
)
def st_session_window_agg(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # per-(user, session) groups scale with the data: long
            _xr2(F.sum(_xc(F.col("value"), 4, "long")), 4)
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_millis("w.start").alias("session_start_ms"),
            F.unix_millis("w.end").alias("session_end_ms"),
            "n_events",
            "sum_value",
        )
    )


# =========================================================================
# HyperLogLog (operators/sketch.hll_sketch / hll_merge)
# =========================================================================

_HLL_ORACLE_CELLS = """
      SELECT {group_sel} h // 4503599627370496 AS b,
             max(CASE WHEN h % 4503599627370496 = 0 THEN 53
                      ELSE 52 - length(bin(h % 4503599627370496)) + 1
                 END) AS reg
      FROM h GROUP BY {group_by}
"""

_HLL_ORACLE_EST = """
      CAST(CASE WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                     * pow(2.0, 53) / CAST(sum_scaled AS DOUBLE) <= 640.0
                     AND n_zero > 0
                THEN round(256.0 * ln(256.0 / CAST(n_zero AS DOUBLE)))
                ELSE round((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                           * pow(2.0, 53) / CAST(sum_scaled AS DOUBLE))
           END AS BIGINT) AS estimate
"""


@query(
    "hll_distinct_event_ids",
    """
    WITH h AS (
      SELECT event_type,
             CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events WHERE event_id IS NOT NULL
    ), cells AS (
    """
    + _HLL_ORACLE_CELLS.format(group_sel="event_type,", group_by="1, 2")
    + """
    ), grid AS (
      SELECT g.event_type, gb.b
      FROM (SELECT DISTINCT event_type FROM cells) g
      CROSS JOIN (SELECT unnest(range(0, 256)) AS b) gb
    ), filled AS (
      SELECT grid.event_type, grid.b, coalesce(cells.reg, 0) AS reg
      FROM grid LEFT JOIN cells
        ON cells.event_type = grid.event_type AND cells.b = grid.b
    ), agg AS (
      SELECT event_type,
             array_to_string(array_agg(CAST(reg AS BIGINT) ORDER BY b), ',')
               AS registers_csv,
             CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero,
             CAST(sum(CAST(pow(2.0, 53 - reg) AS BIGINT)) AS BIGINT)
               AS sum_scaled
      FROM filled GROUP BY 1
    )
    SELECT event_type, registers_csv, n_zero, sum_scaled,
    """
    + _HLL_ORACLE_EST
    + """
    FROM agg
    """,
    note="HyperLogLog NDV sketch (operators/sketch.hll_sketch): 256 "
    "integer registers from the md5-prefix hash family, bias-corrected "
    "linear-counting/harmonic estimate — register-wise-max mergeable, "
    "the per-file NDV primitive for 100 TB rollup trees; whole sketch "
    "+ estimator replayed in DuckDB bit-exactly",
)
def hll_distinct_event_ids(spark, sf_dir):
    from py_etl_spark.operators.sketch import hll_sketch

    sk = hll_sketch(
        _t(spark, sf_dir, "events"), col="event_id",
        group_cols=("event_type",),
    )
    return sk.withColumn(
        "registers_csv", _arr_csv(F.col("registers"))
    ).drop("registers")


@query(
    "hll_rollup_doc_ids",
    """
    WITH h AS (
      SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM documents WHERE doc_id IS NOT NULL
    ), cells AS (
    """
    + _HLL_ORACLE_CELLS.format(group_sel="", group_by="1")
    + """
    ), filled AS (
      SELECT gb.b, coalesce(cells.reg, 0) AS reg
      FROM (SELECT unnest(range(0, 256)) AS b) gb
      LEFT JOIN cells ON cells.b = gb.b
    ), agg AS (
      SELECT CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero,
             CAST(sum(CAST(pow(2.0, 53 - reg) AS BIGINT)) AS BIGINT)
               AS sum_scaled
      FROM filled
    )
    SELECT true AS merge_eq_direct, n_zero, sum_scaled,
    """
    + _HLL_ORACLE_EST
    + """
    FROM agg
    """,
    note="HLL rollup-tree proof (operators/sketch.hll_merge): per-source "
    "sketches merged register-wise-max ≡ the direct global sketch — the "
    "Spark side physically builds per-source sketches and merges them, "
    "the oracle computes the direct global sketch; the hash match IS the "
    "merge-associativity proof (same posture as kmv_distinct_rollup)",
)
def hll_rollup_doc_ids(spark, sf_dir):
    from py_etl_spark.operators.sketch import hll_merge, hll_sketch

    docs = _t(spark, sf_dir, "documents")
    per_source = hll_sketch(docs, col="doc_id", group_cols=("source",))
    merged = hll_merge(per_source.select("registers"))
    direct = hll_sketch(docs, col="doc_id").select(
        F.col("registers").alias("direct_registers")
    )
    return merged.crossJoin(direct).select(
        (F.col("registers") == F.col("direct_registers")).alias(
            "merge_eq_direct"
        ),
        "n_zero",
        "sum_scaled",
        "estimate",
    )


_HLL_GS_LEVEL = """
    SELECT {level_lit} AS level, {source_sel} AS source, {lang_sel} AS lang,
           n_zero, sum_scaled,
    """ + _HLL_ORACLE_EST + """
    FROM (
      SELECT {group_out} CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_zero,
             CAST(sum(CAST(pow(2.0, 53 - reg) AS BIGINT)) AS BIGINT)
               AS sum_scaled
      FROM (
        SELECT {grid_cols} gb.b, coalesce(c.reg, 0) AS reg
        FROM {grid_src}
        CROSS JOIN (SELECT unnest(range(0, 256)) AS b) gb
        LEFT JOIN (
          SELECT {group_sel} h // 4503599627370496 AS b,
                 max(CASE WHEN h % 4503599627370496 = 0 THEN 53
                          ELSE 52 - length(bin(h % 4503599627370496)) + 1
                     END) AS reg
          FROM h GROUP BY {group_by}
        ) c ON c.b = gb.b {join_extra}
      ) GROUP BY {group_out_by}
    )
"""


@query(
    "hll_grouping_sets_docs",
    """
    WITH h AS (
      SELECT source, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM documents WHERE doc_id IS NOT NULL
    )
    """
    + _HLL_GS_LEVEL.format(
        level_lit="'by_source'", source_sel="source",
        lang_sel="CAST(NULL AS VARCHAR)",
        group_out="source,", group_out_by="source",
        grid_cols="g.source,",
        grid_src="(SELECT DISTINCT source FROM h) g",
        group_sel="source,", group_by="1, 2",
        join_extra="AND c.source = g.source",
    )
    + " UNION ALL "
    + _HLL_GS_LEVEL.format(
        level_lit="'by_lang'", source_sel="CAST(NULL AS VARCHAR)",
        lang_sel="lang",
        group_out="lang,", group_out_by="lang",
        grid_cols="g.lang,",
        grid_src="(SELECT DISTINCT lang FROM h) g",
        group_sel="lang,", group_by="1, 2",
        join_extra="AND c.lang = g.lang",
    )
    + " UNION ALL "
    + _HLL_GS_LEVEL.format(
        level_lit="'global'", source_sel="CAST(NULL AS VARCHAR)",
        lang_sel="CAST(NULL AS VARCHAR)",
        group_out="", group_out_by="()",
        grid_cols="",
        grid_src="(SELECT 1) g",
        group_sel="", group_by="1",
        join_extra="",
    ),
    note="HLL grouping sets (sketch.hll_sketch + grouped hll_merge): the "
    "finest-grain (source, lang) sketches are built from ONE scan of the "
    "raw column; per-source, per-lang and global NDV all come from "
    "register-wise-max merges of that metadata. The oracle computes "
    "every level DIRECTLY from the raw ids — each level's hash match "
    "proves merge ≡ direct at that granularity",
)
def hll_grouping_sets_docs(spark, sf_dir):
    from py_etl_spark.operators.sketch import hll_merge, hll_sketch

    base = hll_sketch(
        _t(spark, sf_dir, "documents"), col="doc_id",
        group_cols=("source", "lang"),
    )
    sel = ["n_zero", "sum_scaled", "estimate"]
    by_source = hll_merge(base, ("source",)).select(
        F.lit("by_source").alias("level"), "source",
        F.lit(None).cast("string").alias("lang"), *sel
    )
    by_lang = hll_merge(base, ("lang",)).select(
        F.lit("by_lang").alias("level"),
        F.lit(None).cast("string").alias("source"), "lang", *sel
    )
    global_ = hll_merge(base).select(
        F.lit("global").alias("level"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("string").alias("lang"), *sel
    )
    return by_source.unionByName(by_lang).unionByName(global_)



# =========================================================================
# Event-type transition matrix (Markov counts over per-user sequences)
# =========================================================================

@query(
    "event_transition_matrix",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
    note="Markov transition counts over per-user event sequences — the "
    "behavioral-model feed (next-event prediction priors, anomaly "
    "transition scoring): one user-keyed window (total (ts, id) order) "
    "+ one pair-count rollup, both map-side-combined; the matrix is "
    "|types|² metadata",
)
def event_transition_matrix(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# =========================================================================
# PMI collocations (integer-exact association scores)
# =========================================================================

@query(
    "token_pmi_pairs",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(regexp_replace(text,
               '[^A-Za-z ]', ' ', 'g')), ' '), t -> t <> '') AS ts
      FROM documents
    ), uni AS (
      SELECT unnest(ts) AS tok FROM toks
    ), uc AS (
      SELECT tok, count(*) AS n FROM uni GROUP BY tok
    ), tot AS (
      SELECT count(*) AS n_total FROM uni
    ), bi AS (
      SELECT ts[i] AS a, ts[i + 1] AS b
      FROM toks, LATERAL (SELECT unnest(range(1, len(ts))) AS i) ix
    ), bc AS (
      SELECT a, b, count(*) AS n_ab FROM bi GROUP BY 1, 2 HAVING count(*) >= 5
    )
    SELECT bc.a, bc.b,
           CAST(bc.n_ab AS BIGINT) AS n_ab,
           CAST(ua.n AS BIGINT) AS n_a,
           CAST(ub.n AS BIGINT) AS n_b,
           CAST(bc.n_ab * t.n_total * 1000000 // (ua.n * ub.n) AS BIGINT)
             AS pmi_ratio_ppm
    FROM bc JOIN uc ua ON ua.tok = bc.a
            JOIN uc ub ON ub.tok = bc.b
            CROSS JOIN tot t
    ORDER BY pmi_ratio_ppm DESC, bc.a, bc.b LIMIT 50
    """,
    note="PMI collocations — association mining with NO floats: the "
    "PMI ordering P(ab)/(P(a)P(b)) is carried as the exact integer "
    "ratio n_ab·N·10⁶ // (n_a·n_b) (log is monotone, so ppm order ≡ "
    "PMI order); unigram + bigram counts are the two "
    "map-side-combined shuffles, the count joins are token-keyed "
    "(AQE broadcasts), top-k via TakeOrderedAndProject",
)
def token_pmi_pairs(spark, sf_dir):
    # ONE tokenize pass + ONE shuffle for all three count families. The
    # r06 shape ran three full scan+explode passes over the text (unigram
    # counts, the global token total, bigram counts) — each one a full
    # regex tokenization of the corpus, and the corpus is the only thing
    # that is big here (the count tables are vocabulary-sized). Fusing
    # them: per doc, emit unigrams as (a, NULL) structs and adjacent
    # pairs as (a, b) structs in a single explode, count once under one
    # map-side-combined groupBy(a, b) — NULL never occurs as a real
    # second token, so the two families cannot collide — then split the
    # metadata-sized result by b IS NULL and derive n_total as Σ unigram
    # counts (exactly count(*) over tokens, in BIGINT). uc/bc/total all
    # hang off the SAME exchange, so Catalyst materializes the scan and
    # the shuffle once (ReusedExchange); sf1 wall drops ~2.5x and the
    # second-decade ratio leaves the linearity boundary. Oracle SQL is
    # untouched — per-branch semantics are identical.
    toks = _alpha_tokens()
    docs = _t(spark, sf_dir, "documents").select(toks.alias("__ts"))
    null_s = F.lit(None).cast("string")
    uni_structs = F.transform(
        F.col("__ts"),
        lambda t: F.struct(t.alias("a"), null_s.alias("b")),
    )
    pair_structs = F.filter(
        F.zip_with(
            F.col("__ts"),
            # exact tail (no arbitrary length cap — mirrors the oracle's
            # LATERAL range(1, len(ts)) bound, ADVICE r04)
            F.slice(F.col("__ts"), 2, F.size("__ts")),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
        lambda s: s["b"].isNotNull(),
    )
    counts = (
        docs.select(
            F.explode(F.concat(uni_structs, pair_structs)).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # n_a / n_b attach via WINDOWS over the counts table, not self-joins:
    # partition by a puts token t's unigram row (t, NULL) in the same
    # hash partition as every pair whose FIRST token is t; partition by
    # coalesce(b, a) does the same for the SECOND token (the unigram
    # row's b is NULL, so coalesce routes it by its own token). The
    # conditional sum picks out exactly the one unigram row per
    # partition. Self-joins here would re-branch the DAG and Catalyst
    # re-scans the corpus per branch (inferred join null-filters +
    # per-branch pruning de-canonicalize the exchanges — measured, not
    # guessed); windows keep ONE linear chain, and both window
    # exchanges move only the vocabulary-sized count table. The global
    # token total is the one remaining extra pass (a global agg cannot
    # ride a hash-partitioned window, and a single-partition window
    # would be a real scale bug).
    w_a = Window.partitionBy("a")
    w_b = Window.partitionBy(F.coalesce(F.col("b"), F.col("a")))
    uni_n = F.sum(F.when(F.col("b").isNull(), F.col("n")))
    chain = (
        counts.withColumn("n_a", uni_n.over(w_a))
        .withColumn("n_b", uni_n.over(w_b))
    )
    bc = (
        chain.filter(F.col("b").isNotNull() & (F.col("n") >= 5))
        .select("a", "b", F.col("n").alias("n_ab"), "n_a", "n_b")
    )
    total = (
        counts.filter(F.col("b").isNull())
        .agg(F.sum("n").alias("n_total"))
    )
    out = (
        bc.crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            F.col("n_ab").alias("n_ab"),
            F.col("n_a"),
            F.col("n_b"),
            # DIV: exact BIGINT division (matches DuckDB //) — a floor
            # over double division would drift past 2^53 numerators.
            # Exactness envelope: n_ab·N·10⁶ < 2^63, i.e. n_ab·N below
            # ~9.2e12 — comfortably true for any single shard/day slice
            # this runs on; past it, shard the corpus (PMI numerators
            # are not mergeable anyway) or move the ratio to log space.
            # Spark's DIV coerces decimals back to BIGINT and WRAPS
            # silently even under ANSI (verified), so decimal(38,0)
            # here would widen nothing — the envelope is the contract.
            F.expr("(n_ab * n_total * 1000000L) DIV (n_a * n_b)")
            .cast("long")
            .alias("pmi_ratio_ppm"),
        )
    )
    return out.orderBy(
        F.col("pmi_ratio_ppm").desc(), "a", "b"
    ).limit(50)


# =========================================================================
# Inverted-index posting lists (persistable IR artifact beside BM25)
# =========================================================================

@query(
    "search_posting_lists",
    """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(
               regexp_replace(text, '[^A-Za-z ]', ' ', 'g')), ' '),
               t -> t <> '')) AS tok
      FROM documents
    ), tf AS (
      SELECT tok, doc_id, count(*) AS tf
      FROM toks GROUP BY 1, 2
    )
    SELECT tok,
           CAST(count(*) AS BIGINT) AS df,
           array_to_string(array_agg(doc_id ORDER BY doc_id), ',')
             AS postings_csv,
           array_to_string(array_agg(tf ORDER BY doc_id), ',') AS tfs_csv
    FROM tf
    WHERE tok IN ('the', 'data', 'model', 'training', 'quality')
    GROUP BY tok
    """,
    note="Inverted-index posting lists — the persistable IR artifact "
    "behind BM25: per term the document-frequency and doc-id-sorted "
    "postings+tf arrays (parallel arrays, ready for columnar storage "
    "and skip-list style merging). Two map-side-combined shuffles "
    "((tok, doc) tf then per-term assembly); the demo projects five "
    "probe terms so the oracle output stays bounded — the build itself "
    "is corpus-wide. Hot-term posting caps follow the same recipe as "
    "the LSH bucket caps",
)
def search_posting_lists(spark, sf_dir):
    toks_arr = _alpha_tokens()
    tf = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(toks_arr).alias("tok"))
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col("doc_id"), F.col("tf")))
    )
    return (
        tf.filter(
            F.col("tok").isin("the", "data", "model", "training", "quality")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"), pairs.alias("__p"))
        .select(
            "tok",
            "df",
            _arr_csv(
                F.transform(F.col("__p"), lambda s: s["doc_id"])
            ).alias("postings_csv"),
            _arr_csv(F.transform(F.col("__p"), lambda s: s["tf"])).alias(
                "tfs_csv"
            ),
        )
    )


# =========================================================================
# Bounded per-key retention (last N events per user)
# =========================================================================

@query(
    "last_n_events_per_user",
    """
    SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type
    FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
    note="Bounded per-key retention — keep the LAST 3 events per user "
    "(recency context windows / state-size caps): one user-keyed "
    "window; AQE's WindowGroupLimit pushes the rank filter into the "
    "sort, so each task retains ≤N rows per key before the exchange",
)
def last_n_events_per_user(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "user_id",
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "event_type",
        )
    )


# =========================================================================
# Blocklist safety gate
# =========================================================================

_BLOCKLIST = {
    "violence": ["attack", "destroy", "weapon"],
    "spam": ["free", "winner", "click"],
}


@query(
    "safety_blocklist_filter",
    """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(
               regexp_replace(text, '[^A-Za-z ]', ' ', 'g')), ' '),
               t -> t <> '')) AS tok
      FROM documents
    ), hits AS (
      SELECT doc_id,
             sum(CASE WHEN tok IN ('attack', 'destroy', 'weapon')
                      THEN 1 ELSE 0 END) AS n_violence,
             sum(CASE WHEN tok IN ('free', 'winner', 'click')
                      THEN 1 ELSE 0 END) AS n_spam,
             count(*) AS n_tokens
      FROM toks GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(h.n_violence, 0) AS BIGINT) AS n_violence,
           CAST(coalesce(h.n_spam, 0) AS BIGINT) AS n_spam,
           (coalesce(h.n_violence, 0) * 1000
              > coalesce(h.n_tokens, 1) * 5
            OR coalesce(h.n_spam, 0) * 1000
              > coalesce(h.n_tokens, 1) * 10) AS is_blocked
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    """,
    note="Blocklist safety gate — the category-wordlist curation "
    "filter: per-doc hit counts per category (token match against the "
    "broadcast-literal blocklist) and an integer-exact block decision "
    "(hits·1000 > tokens·threshold_permille — no float rate). The "
    "token explode + doc rollup is ONE map-side-combined shuffle; a "
    "production list swaps the literals for a broadcast join without "
    "changing the plan shape",
)
def safety_blocklist_filter(spark, sf_dir):
    toks_arr = _alpha_tokens()
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(toks_arr).alias("tok"))
    hits = toks.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("tok").isin(_BLOCKLIST["violence"]), 1).otherwise(0)
        ).alias("n_violence"),
        F.sum(
            F.when(F.col("tok").isin(_BLOCKLIST["spam"]), 1).otherwise(0)
        ).alias("n_spam"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    j = docs.select("doc_id").join(hits, "doc_id", "left")
    nv = F.coalesce(F.col("n_violence"), F.lit(0))
    ns = F.coalesce(F.col("n_spam"), F.lit(0))
    nt = F.coalesce(F.col("n_tokens"), F.lit(1))
    return j.select(
        "doc_id",
        nv.cast("long").alias("n_violence"),
        ns.cast("long").alias("n_spam"),
        ((nv * 1000 > nt * 5) | (ns * 1000 > nt * 10)).alias("is_blocked"),
    )


# =========================================================================
# Partition-gap report (missing daily partitions)
# =========================================================================

@query(
    "partition_gap_report",
    """
    WITH days AS (
      SELECT date_trunc('day', ts) AS day, count(*) AS n
      FROM events GROUP BY 1
    ), bounds AS (
      SELECT min(day) AS lo, max(day) AS hi FROM days
    ), grid AS (
      SELECT unnest(generate_series(bounds.lo, bounds.hi,
                                    INTERVAL 1 DAY)) AS day
      FROM bounds
    )
    SELECT epoch_ms(CAST(g.day AS TIMESTAMP)) AS day_ms,
           CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
           d.n IS NULL AS is_gap
    FROM grid g LEFT JOIN days d ON d.day = g.day
    """,
    note="Partition-gap report — the backfill planner's input: the "
    "dense day grid between the observed bounds (metadata-sized "
    "sequence) anti-checked against the daily rollup; a day with zero "
    "rows is a missing ingest partition. One map-side-combined daily "
    "count is the only data-sized shuffle",
)
def partition_gap_report(spark, sf_dir):
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    return grid.join(daily, "day", "left").select(
        F.unix_millis("day").alias("day_ms"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.col("n").isNull().alias("is_gap"),
    )


# =========================================================================
# Exact distributed selection (operators/ranking.exact_kth_value)
# =========================================================================

@query(
    "exact_median_price",
    """
    SELECT v AS median FROM (
      SELECT v, row_number() OVER (ORDER BY v) AS rn, count(*) OVER () AS n
      FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS v
            FROM lineitem WHERE l_extendedprice IS NOT NULL)
    ) WHERE rn = (n + 1) // 2
    """,
    note="EXACT median without a global sort "
    "(ranking.exact_kth_value): distributed selection — each round "
    "histograms the candidate range (one map-side-combined 256-long "
    "agg), narrows to the bin holding the target rank, and the final "
    "≤100k-row slice resolves task-locally; O(log) shrinking-predicate "
    "scans (range filter pushes to parquet min/max), zero data "
    "shuffles. The exact-order-statistics complement to the "
    "one-bin-width-error hist_quantiles",
)
def exact_median_price(spark, sf_dir):
    from py_etl_spark.operators.ranking import exact_kth_value

    li = _t(spark, sf_dir, "lineitem")
    n = li.filter(F.col("l_extendedprice").isNotNull()).count()
    v = exact_kth_value(li, "l_extendedprice", k=(n + 1) // 2)
    return spark.createDataFrame([(float(v),)], "median double")


# =========================================================================
# Rank-ensemble quality blend (composing the gate family)
# =========================================================================

@query(
    "quality_rank_ensemble",
    """
    WITH m AS (
      SELECT doc_id,
             n_chars AS len_score,
             length(regexp_replace(text, '[^ ]', '', 'g')) AS ws_score,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_score
      FROM documents
    ), ranked AS (
      SELECT doc_id,
             rank() OVER (ORDER BY len_score DESC, doc_id)   AS r_len,
             rank() OVER (ORDER BY ws_score DESC, doc_id)    AS r_ws,
             rank() OVER (ORDER BY alpha_score DESC, doc_id) AS r_alpha
      FROM m
    )
    SELECT doc_id,
           CAST(r_len AS BIGINT) AS r_len,
           CAST(r_ws AS BIGINT) AS r_ws,
           CAST(r_alpha AS BIGINT) AS r_alpha,
           CAST(r_len + r_ws + r_alpha AS BIGINT) AS rank_sum
    FROM ranked
    """,
    note="Rank-ensemble quality blend — the scale-free way to combine "
    "heterogeneous gate scores (length, whitespace density, alpha mass "
    "here; Gopher/LM-bits/compression plug in identically): each metric "
    "becomes a total-order rank (deterministic doc_id tie-break), the "
    "ensemble is the exact integer rank sum — no score normalization "
    "constants to tune or drift. Ranks come from ranking.with_global_"
    "position (bucketed zipWithIndex, zero single-partition exchanges "
    "— the oracle's rank() over the total order is identical to "
    "row_number, so the naive-window SQL still defines the semantics)",
)
def quality_rank_ensemble(spark, sf_dir):
    from py_etl_spark.operators.ranking import with_global_positions

    # Char-class counts as length deltas of a translate-DELETE — the
    # r09 textstats/winnowing lesson: regexp_replace('[^X]','') is a
    # hidden full rewrite of every corpus byte through the regex
    # engine, while translate is a single table-lookup pass. Counts
    # are identical: #spaces = len - len(text minus spaces), #letters
    # = len - len(text minus A-Za-z).
    _letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("len_score"),
        (F.length("text") - F.length(F.translate("text", " ", "")))
        .cast("long")
        .alias("ws_score"),
        (F.length("text") - F.length(F.translate("text", _letters, "")))
        .cast("long")
        .alias("alpha_score"),
    )
    # Materialize the NARROW scores once (doc_id + 3 longs, ~32 B/row —
    # at 100 TB that is TB-scale text reduced to GB-scale metadata on
    # executor-local storage). Without this each of the three ranking
    # branches re-executes the full text scan + translate for every one
    # of with_global_position's driver actions (count, boundary sample,
    # bucket counts) AND in the final plan — ~9 text passes per run,
    # measured 3.5 s at sf0.1 where one pass is ~0.3 s. The guide-§8
    # rule: decide placement on a lightweight proxy, touch the heavy
    # bytes once.
    # lazy (r12): the shared count() below doubles as the
    # materialization job — one driver round trip, not two
    docs = docs.localCheckpoint(eager=False)
    n = docs.count()  # shared by all three rankings (metadata-cheap)

    # r12: the three rankings fuse into ONE driver-round-trip family
    # (ranking.with_global_positions — 1 shared count + 1 sample job +
    # 1 bucket-count job, was 7 jobs) and ONE final plan pass (three
    # chained per-bucket windows, no doc_id re-join of three branches).
    # Positions are exact ranks — bit-identical to the per-ranking
    # operator by construction.
    out = with_global_positions(
        docs,
        [
            (name, [(-F.col(col)).alias("neg"), F.col("doc_id")])
            for col, name in (
                ("len_score", "r_len"),
                ("ws_score", "r_ws"),
                ("alpha_score", "r_alpha"),
            )
        ],
        n=n,
    ).select("doc_id", "r_len", "r_ws", "r_alpha")
    return out.withColumn(
        "rank_sum", F.col("r_len") + F.col("r_ws") + F.col("r_alpha")
    )


# =========================================================================
# Embedding outliers vs label centroid (exact integer distances)
# =========================================================================

@query(
    "embedding_outlier_scores",
    """
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding::DOUBLE[],
               x -> CAST(round(x * 100000.0) AS BIGINT)) AS qv
      FROM embeddings WHERE label IS NOT NULL
    ), cent AS (
      SELECT label, gi.i AS i, sum(qv[gi.i + 1]) AS s, count(*) AS n
      FROM q CROSS JOIN (SELECT unnest(range(0, 64)) AS i) gi
      GROUP BY label, gi.i
    ), dist AS (
      SELECT q.vec_id, q.label,
             sum((cent.n * q.qv[cent.i + 1] - cent.s)
                 * (cent.n * q.qv[cent.i + 1] - cent.s)) AS d2_scaled
      FROM q JOIN cent ON cent.label = q.label
      GROUP BY q.vec_id, q.label
    )
    SELECT vec_id, label, CAST(d2_scaled AS BIGINT) AS d2_scaled,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT vec_id, label, d2_scaled,
             row_number() OVER (PARTITION BY label
                                ORDER BY d2_scaled DESC, vec_id) AS rnk
      FROM dist
    ) WHERE rnk <= 5
    """,
    note="Per-label embedding outliers — mislabel/contamination "
    "triage: distance² to the class centroid multiplied through by n² "
    "(Σ(n·qᵢ−sᵢ)²) so the score stays an EXACT BIGINT — no float mean, "
    "order-free, engine-identical; top-5 farthest per label. Centroid "
    "sums come from the label_centroids_int build; the per-vector "
    "distance is a map-side array walk against the broadcast centroids. "
    "Overflow envelope: d·(2·n_label·scale·max|x|)² < 2^63 — at "
    "scale=1e5, unit-ish vectors, d=64 that allows ~3k rows per label; "
    "beyond that drop the quant scale a decade per 10× label size "
    "(ordering is preserved — every term shrinks by the same factor)",
)
def embedding_outlier_scores(spark, sf_dir):
    from py_etl_spark.operators.similarity import label_centroids_int

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("label").isNotNull())
    cents = label_centroids_int(emb, dim=64)
    q = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.round(x * F.lit(100000.0)).cast("long"),
    )
    joined = emb.select("vec_id", "label", q.alias("__q")).join(
        F.broadcast(cents), "label"
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("__q"),
            F.col("sums"),
            lambda qi, si: (F.col("n") * qi - si) * (F.col("n") * qi - si),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("label").orderBy(
        F.col("d2_scaled").desc(), F.col("vec_id")
    )
    return (
        joined.withColumn("d2_scaled", d2)
        .select("vec_id", "label", "d2_scaled")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
    )


# =========================================================================
# Deterministic augmentation (operators/corpus.augment_word_dropout)
# =========================================================================

@query(
    "corpus_augment_word_dropout",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), kept AS (
      SELECT doc_id, len(ts) AS n,
             list_filter(
               list_transform(range(1, len(ts) + 1), j ->
                 CASE WHEN CAST(('0x' || substr(md5(
                        CAST(doc_id AS VARCHAR) || ':'
                        || CAST(j - 1 AS VARCHAR) || ':aug'), 1, 8))
                        AS BIGINT) % 100 >= 15
                      THEN ts[j] END),
               x -> x IS NOT NULL) AS ks
      FROM toks
    )
    SELECT doc_id, CAST(n AS INT) AS n_tokens,
           CAST(n - len(ks) AS INT) AS n_dropped,
           array_to_string(ks, ' ') AS aug_text
    FROM kept
    """,
    note="Deterministic word-dropout augmentation "
    "(corpus.augment_word_dropout): token i of doc d drops iff "
    "md5(d:i:salt)%100 < 15 — hash-keyed (never rand()), so each salt "
    "is an independent, bit-reproducible augmentation epoch; index-aware "
    "array filter, map-side, zero shuffles",
)
def corpus_augment_word_dropout(spark, sf_dir):
    from py_etl_spark.operators.corpus import augment_word_dropout

    return augment_word_dropout(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    ).select("doc_id", "n_tokens", "n_dropped", "aug_text")


# =========================================================================
# Vocabulary coverage / OOV report
# =========================================================================

@query(
    "vocab_coverage_report",
    """
    WITH toks AS (
      SELECT source, unnest(list_filter(string_split(lower(
               regexp_replace(text, '[^A-Za-z ]', ' ', 'g')), ' '),
               t -> t <> '')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok FROM toks GROUP BY tok HAVING count(*) >= 5
    )
    SELECT source,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS oov_ppm
    FROM toks LEFT JOIN vocab v USING (tok)
    GROUP BY source
    """,
    note="Vocabulary coverage / OOV report — tokenizer-adjacent corpus "
    "analytics: vocab = tokens with corpus count ≥ 5 (one count "
    "shuffle), per-source OOV rate in exact parts-per-million (integer "
    "floor-div, no float ratio); the token↔vocab join is hash-keyed on "
    "the token (AQE broadcasts when the vocab fits)",
)
def vocab_coverage_report(spark, sf_dir):
    toks_arr = _alpha_tokens()
    toks = (
        _t(spark, sf_dir, "documents")
        .select("source", F.explode(toks_arr).alias("tok"))
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 5)
        .select("tok", F.lit(True).alias("__in_vocab"))
    )
    joined = toks.join(vocab, "tok", "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.floor(
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            * 1000000
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("oov_ppm"),
    )


# =========================================================================
# Labeled-embedding training prep (operators/similarity)
# =========================================================================

@query(
    "embedding_label_centroids",
    """
    WITH q AS (
      SELECT label,
             list_transform(embedding::DOUBLE[],
               x -> CAST(round(x * 100000.0) AS BIGINT)) AS qv
      FROM embeddings WHERE label IS NOT NULL
    ), cells AS (
      SELECT label, gi.i AS i, sum(qv[gi.i + 1]) AS s, count(*) AS c
      FROM q CROSS JOIN (SELECT unnest(range(0, 64)) AS i) gi
      GROUP BY label, gi.i
    )
    SELECT label, CAST(max(c) AS BIGINT) AS n,
           array_to_string(array_agg(CAST(s AS BIGINT) ORDER BY i), ',')
             AS sums_csv
    FROM cells GROUP BY label
    """,
    note="Per-label class centroids in exact integer space "
    "(similarity.label_centroids_int): order-free BIGINT numerators — "
    "the nearest-centroid classifier / per-class drift feed; ONE "
    "(label, i) sum shuffle bounded at tasks·labels·d partial rows",
)
def embedding_label_centroids(spark, sf_dir):
    from py_etl_spark.operators.similarity import label_centroids_int

    cent = label_centroids_int(_t(spark, sf_dir, "embeddings"), dim=64)
    return cent.withColumn("sums_csv", _arr_csv(F.col("sums"))).drop("sums")


@query(
    "ann_hard_negatives",
    """
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
               FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  c.label AS n_label,
                  round(list_dot_product(q.v, c.v) /
                        (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
           FROM q JOIN c ON q.vec_id <> c.vec_id
           WHERE c.label IS DISTINCT FROM q.label
         )
    SELECT query_id, neighbor_id, n_label, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id)
                AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 5
    """,
    note="Hard-negative mining (similarity.hard_negatives): per query "
    "the top-k most-similar DIFFERENT-label vectors — contrastive-pair "
    "construction; label filter BEFORE ranking, same broadcast-probe / "
    "no-corpus-shuffle plan as the ANN baseline",
)
def ann_hard_negatives(spark, sf_dir):
    from py_etl_spark.operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    return hard_negatives(
        emb, emb.filter(F.col("vec_id") < 10), k=5, dim=64
    )


@query(
    "knn_label_agreement",
    """
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
               FROM embeddings WHERE vec_id < 50),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
               FROM embeddings),
         topk AS (
           SELECT * FROM (
             SELECT q.vec_id AS query_id, q.label AS q_label,
                    c.label AS n_label,
                    round(list_dot_product(q.v, c.v) /
                          (sqrt(list_dot_product(q.v, q.v))
                           * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine,
                    row_number() OVER (PARTITION BY q.vec_id
                                       ORDER BY
                        round(list_dot_product(q.v, c.v) /
                              (sqrt(list_dot_product(q.v, q.v))
                               * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
                        c.vec_id) AS rnk
             FROM q JOIN c ON q.vec_id <> c.vec_id
           ) WHERE rnk <= 5
         ), votes AS (
           SELECT query_id, q_label, n_label, count(*) AS n_votes
           FROM topk GROUP BY 1, 2, 3
         ), winner AS (
           SELECT query_id, q_label, n_label AS pred_label FROM (
             SELECT query_id, q_label, n_label, n_votes,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY n_votes DESC, n_label)
                      AS wr
             FROM votes
           ) WHERE wr = 1
         )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN pred_label = q_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM winner
    """,
    note="kNN label-agreement eval — the embedding-quality metric: "
    "5-NN majority vote (deterministic tie-break: votes desc, smallest "
    "label) vs the query's own label; composition of the ANN top-k "
    "plan + two metadata-scale vote windows",
)
def knn_label_agreement(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    topk = similarity.cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") < 50), k=5, dim=64
    )
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    # Broadcast the side that FITS (guide §3.1, r11): topk is |probes|·k
    # rows (250 here) while the label frames are corpus-sized — the old
    # shape broadcast the CORPUS labels (and the unfiltered q-label
    # frame), which is exactly the build side that stops fitting at
    # scale. Now the probe-side label lookup filters to the probe set
    # before broadcasting, and the neighbor-label join broadcasts the
    # metadata-sized topk against the streamed corpus labels.
    q_labels = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    votes = (
        F.broadcast(topk)
        .join(labels, "neighbor_id")
        .join(F.broadcast(q_labels), "query_id")
        .groupBy("query_id", "q_label", "n_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("n_label").asc()
    )
    winner = votes.withColumn("wr", F.row_number().over(wr)).filter(
        F.col("wr") == 1
    )
    return winner.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(
            F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_correct"),
    )


# =========================================================================
# Point-in-time SCD2 feature join (operators/merge.scd2_point_in_time_join)
# =========================================================================

@query(
    "scd2_point_in_time_features",
    None,  # oracle assigned below — wraps the history build's SQL
    note="Point-in-time-correct feature join "
    "(merge.scd2_point_in_time_join): each event picks up the SCD2 "
    "state valid ONE HOUR BEFORE its own timestamp — the leakage-safe "
    "training join (a naive latest-value join would leak the future); "
    "facts before a key's first interval keep NULL features. No window: "
    "intervals partition the timeline, so the key equi-join with "
    "residual bounds matches at most one row per fact",
)
def scd2_point_in_time_features(spark, sf_dir):
    from py_etl_spark.operators.merge import (
        scd2_history,
        scd2_point_in_time_join,
    )

    ev = _t(spark, sf_dir, "events")
    hist = scd2_history(
        ev,
        keys=["user_id"],
        ts_col="ts",
        tracked=["event_type"],
        tie_breakers=["event_id"],
    )
    facts = ev.select(
        "event_id",
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("asof_ts"),
    ).filter(F.col("event_id") < 2000)
    out = scd2_point_in_time_join(
        facts, hist.drop("is_current"), keys=["user_id"], fact_ts="asof_ts"
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("pit_event_type").alias("pit_type"),
        F.col("pit_version").alias("pit_version"),
    )


REGISTRY["scd2_point_in_time_features"].oracle = f"""
    WITH hist AS ({REGISTRY["scd2_history_from_events"].oracle}),
    facts AS (
      SELECT event_id, user_id,
             epoch_ms(ts - INTERVAL 1 HOUR) AS t_ms
      FROM events WHERE event_id < 2000
    )
    SELECT f.event_id, f.user_id,
           h.event_type AS pit_type,
           h.version AS pit_version
    FROM facts f LEFT JOIN hist h
      ON h.user_id = f.user_id
     AND h.valid_from_ms <= f.t_ms
     AND (h.valid_to_ms IS NULL OR f.t_ms < h.valid_to_ms)
    """


# =========================================================================
# Split-leakage report (dedup fingerprints crossing train/test)
# =========================================================================

@query(
    "split_leakage_report",
    """
    WITH assigned AS (
      SELECT doc_id, md5(text) AS fp,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8)) AS BIGINT) % 100 < 80
                  THEN 'train'
                  WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8)) AS BIGINT) % 100 < 90
                  THEN 'val' ELSE 'test' END AS split
      FROM documents
    ), groups AS (
      SELECT fp,
             count(*) AS n_docs,
             count(DISTINCT split) AS n_splits,
             sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
             sum(CASE WHEN split = 'test'  THEN 1 ELSE 0 END) AS n_test
      FROM assigned GROUP BY fp
    )
    SELECT CAST(count(*) AS BIGINT) AS n_fingerprints,
           CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_groups,
           CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaking_groups,
           CAST(sum(CASE WHEN n_train > 0 AND n_test > 0
                         THEN n_train * n_test ELSE 0 END) AS BIGINT)
             AS n_train_test_pairs
    FROM groups
    """,
    note="Split-leakage audit — eval hygiene: exact-dup fingerprints "
    "that span deterministic_split's train/test assignment (the "
    "contamination a random split invites and hash-dedup-then-split "
    "prevents); ONE fingerprint-keyed count shuffle, then a metadata "
    "rollup — train·test pair counts are exact integers",
)
def split_leakage_report(spark, sf_dir):
    from py_etl_spark.operators.corpus import deterministic_split

    docs = deterministic_split(
        _t(spark, sf_dir, "documents"), id_col="doc_id"
    ).select(F.md5("text").alias("fp"), "split")
    groups = docs.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("split").alias("n_splits"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
            "n_train"
        ),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias(
            "n_test"
        ),
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_groups"),
        F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_leaking_groups"),
        F.sum(
            F.when(
                (F.col("n_train") > 0) & (F.col("n_test") > 0),
                F.col("n_train") * F.col("n_test"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_train_test_pairs"),
    )


# =========================================================================
# Item co-occurrence edges (market-basket pair counts)
# =========================================================================

@query(
    "part_pair_cooccurrence",
    """
    WITH capped AS (
      SELECT l_orderkey, l_partkey
      FROM (
        SELECT l_orderkey, l_partkey,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_partkey) AS rn
        FROM lineitem
      ) WHERE rn <= 16
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b LIMIT 100
    """,
    note="Market-basket co-occurrence edges: parts bought together in "
    "one order — the graph-edge builder for item-similarity / "
    "recommendation. The basket is CAPPED at 16 items (row_number over "
    "the order key, the hot-bucket cap recipe from dedup.py's LSH "
    "buckets) BEFORE the self-join, so fan-out is bounded at "
    "Σ min(basket,16)² even when one pathological hot order key holds "
    "millions of rows at 100 TB; TPC-H baskets are ≤7 items so the cap "
    "never bites on this data and the top-100 answer is exact (the "
    "oracle caps identically). One pair-count shuffle, top-k via "
    "TakeOrderedAndProject",
)
def part_pair_cooccurrence(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Bounded-group decorrelation (the q21/r08 recipe): an order is a
    # bounded basket, so collect it ONCE and build pairs in-row instead
    # of self-joining the fact table — the join shape scanned lineitem
    # twice and sorted both sides for the SMJ; this shape is one
    # order-keyed groupBy + map-side pair explode. The hot-basket cap
    # (16 smallest partkeys, duplicates counted — identical multiset to
    # the old row_number-over-partkey cap, value-deterministic) is a
    # sort_array+slice on the collected array. The exploded part_a row
    # carries the ≤16-element array, so generator memory is bounded.
    per_order = li.groupBy("l_orderkey").agg(
        F.slice(F.sort_array(F.collect_list("l_partkey")), 1, 16).alias(
            "parts"
        )
    )
    ex = per_order.select(
        "parts", F.posexplode("parts").alias("i", "part_a")
    )
    pairs = ex.select(
        "part_a",
        F.explode(F.slice("parts", F.col("i") + 2, 16)).alias("part_b"),
    ).filter(F.col("part_a") < F.col("part_b"))
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(100)
    )


# =========================================================================
# Canonical representative per dup-cluster (operators/dedup)
# =========================================================================

@query(
    "dedup_keep_canonical",
    None,  # oracle assigned below — wraps the cluster stage's SQL
    note="Canonical-representative dedup (dedup.keep_canonical_per_"
    "cluster): after MinHash-LSH + connected components, keep the "
    "highest-quality doc per cluster (n_chars here; any gate score "
    "plugs in), ties to smallest id — dedup that keeps the BEST copy, "
    "deterministically. One cluster-keyed window over id/quality "
    "triples; the text never shuffles",
)
def dedup_keep_canonical(spark, sf_dir):
    from py_etl_spark.operators import dedup

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_candidates(docs, hash_family="md5")
    cc = dedup.connected_components(pairs, nodes=docs.select("doc_id"))
    clusters = cc.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )
    return dedup.keep_canonical_per_cluster(
        clusters, docs, quality_col="n_chars"
    ).select("doc_id", "cluster_id", "n_chars", "is_canonical")


REGISTRY["dedup_keep_canonical"].oracle = f"""
    WITH cc AS ({REGISTRY["dedup_cc_clusters"].oracle})
    SELECT doc_id, cluster_id, n_chars,
           rn = 1 AS is_canonical
    FROM (
      SELECT cc.doc_id, cc.cluster_id, d.n_chars,
             row_number() OVER (PARTITION BY cc.cluster_id
                                ORDER BY d.n_chars DESC, cc.doc_id ASC)
               AS rn
      FROM cc JOIN documents d ON d.doc_id = cc.doc_id
    )
    """


# =========================================================================
# Forward as-of join with tolerance
# =========================================================================

@query(
    "asof_next_order_within_30d",
    """
    SELECT l_orderkey, l_linenumber, next_orderkey FROM (
      SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
             o2.o_orderkey AS next_orderkey,
             row_number() OVER (
               PARTITION BY l.l_orderkey, l.l_linenumber
               ORDER BY o2.o_orderdate ASC, o2.o_orderkey ASC) AS rn
      FROM lineitem l
      JOIN orders o1 ON l.l_orderkey = o1.o_orderkey
      JOIN orders o2 ON o2.o_custkey = o1.o_custkey
                     AND o2.o_orderdate > l.l_shipdate
                     AND o2.o_orderdate <= l.l_shipdate
                                           + INTERVAL 30 DAY
      WHERE l.l_orderkey < 100
    ) WHERE rn = 1
    """,
    note="FORWARD as-of join with tolerance (mirror of "
    "asof_latest_order_at_shipdate): earliest same-customer order "
    "STRICTLY AFTER each line's shipdate but within 30 days — the "
    "look-ahead variant (next-event attribution); range join + "
    "windowed argmin, the tolerance bound is what keeps the banded "
    "fan-out finite at scale",
)
def asof_next_order_within_30d(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    o1 = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k1"), F.col("o_custkey").alias("c1")
    )
    o2 = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_custkey").alias("c2"),
        F.col("o_orderdate").alias("d2"),
    )
    # Probe-sized build sides, orders streams (guide §3.1, r11 — same
    # fix as asof_latest_order_at_shipdate: the old shape broadcast
    # full orders twice).
    j = F.broadcast(li).join(o1, li.l_orderkey == F.col("k1"))
    j = F.broadcast(j).join(
        o2,
        (F.col("c2") == F.col("c1"))
        & (F.col("d2") > F.col("l_shipdate"))
        & (F.col("d2") <= F.col("l_shipdate") + F.expr("INTERVAL 30 DAY")),
    )
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.asc("d2"), F.asc("next_orderkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            "next_orderkey",
        )
    )


# =========================================================================
# Equi-depth bucketizer (operators/sketch.equi_depth_buckets)
# =========================================================================

@query(
    "feature_bucketize_order_prices",
    """
    WITH binned AS (
      SELECT least(greatest(CAST(floor(CAST(o_totalprice AS DOUBLE)
               / (500000.0 / 128)) AS INT), 0), 127) AS b
      FROM orders WHERE o_totalprice IS NOT NULL
    ), cells AS (
      SELECT b, count(*) AS c FROM binned GROUP BY 1
    ), filled AS (
      SELECT gb.b, coalesce(cells.c, 0) AS c
      FROM (SELECT unnest(range(0, 128)) AS b) gb
      LEFT JOIN cells ON cells.b = gb.b
    ), cum AS (
      SELECT b, c, sum(c) OVER (ORDER BY b) AS cm, sum(c) OVER () AS n
      FROM filled
    ), cuts AS (
      SELECT q, min(CASE WHEN cm * 4 >= q * n THEN b END) AS cut
      FROM cum CROSS JOIN (SELECT unnest(range(1, 4)) AS q) qs
      GROUP BY q
    ), assigned AS (
      SELECT binned.b,
             (SELECT count(*) FROM cuts WHERE binned.b > cuts.cut)
               AS bucket
      FROM binned
    )
    SELECT CAST(bucket AS INT) AS bucket, count(*) AS n,
           CAST(min(b) AS INT) AS min_bin, CAST(max(b) AS INT) AS max_bin
    FROM assigned GROUP BY 1
    """,
    note="Equi-depth quantile bucketizer (sketch.equi_depth_buckets): "
    "the two-phase compute-stats→apply-to-data pattern in ONE plan — "
    "hist_sketch derives the quartile cut bins via the INTEGER test "
    "cum·4 ≥ q·n, the cuts broadcast back as one metadata row, bucket "
    "assignment is map-side; boundaries resolve at bin granularity "
    "(error ≤ one a-priori bin width)",
)
def feature_bucketize_order_prices(spark, sf_dir):
    from py_etl_spark.operators.sketch import equi_depth_buckets

    out = equi_depth_buckets(
        _t(spark, sf_dir, "orders"),
        col="o_totalprice",
        lo=0.0,
        hi=500000.0,
        bins=128,
        n_buckets=4,
    )
    return out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__bin").alias("min_bin"),
        F.max("__bin").alias("max_bin"),
    )


# =========================================================================
# Ordered per-user event sequences (sequence-dataset assembly)
# =========================================================================

@query(
    "user_event_sequences",
    """
    SELECT user_id,
           count(*) AS n_events,
           array_to_string(array_agg(event_type ORDER BY ts, event_id), ',')
             AS seq_types_csv,
           array_to_string(array_agg(epoch_ms(ts) ORDER BY ts, event_id),
                           ',') AS seq_ts_csv
    FROM events GROUP BY user_id
    """,
    note="Sequence-dataset assembly: per-user event history as ORDERED "
    "arrays — the construction step for behavioral-sequence training "
    "examples. One user-keyed shuffle with map-side partial "
    "collect_list; the (ts, event_id) sort key makes the array order "
    "total and deterministic (ties broken by id), so arrays hash-match "
    "cross-engine",
)
def user_event_sequences(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    item = F.struct(
        F.col("ts").alias("ts"),
        F.col("event_id").alias("event_id"),
        F.col("event_type").alias("event_type"),
    )
    seq = F.sort_array(F.collect_list(item))
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            seq.alias("__seq"),
        )
        .select(
            "user_id",
            "n_events",
            _arr_csv(
                F.transform(F.col("__seq"), lambda s: s["event_type"])
            ).alias("seq_types_csv"),
            _arr_csv(
                F.transform(F.col("__seq"), lambda s: F.unix_millis(s["ts"]))
            ).alias("seq_ts_csv"),
        )
    )


# =========================================================================
# Corpus-wide top-k n-grams
# =========================================================================

@query(
    "corpus_top_bigrams",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(regexp_replace(text,
               '[^A-Za-z ]', ' ', 'g')), ' '), t -> t <> '') AS ts
      FROM documents
    ), bi AS (
      SELECT ts[i] || ' ' || ts[i + 1] AS bigram
      FROM toks, LATERAL (SELECT unnest(range(1, len(ts))) AS i) ix
    )
    SELECT bigram, count(*) AS n
    FROM bi GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 50
    """,
    note="Corpus-wide top-k bigram counts — the vocabulary/collocation "
    "profile: lowercase alpha tokenization, adjacent-pair explode "
    "map-side, ONE count shuffle with map-side partials, top-k via "
    "TakeOrderedAndProject (per-partition heaps, no global sort)",
)
def corpus_top_bigrams(spark, sf_dir):
    toks = _alpha_tokens()
    pairs = F.filter(
        F.zip_with(
            toks,
            # exact tail (no arbitrary length cap — mirrors the oracle's
            # LATERAL range(1, len(ts)) bound, ADVICE r04)
            F.slice(toks, 2, F.size(toks)),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        # a real pair "a b" contains the separator space; the zip_with
        # tail slot is null at the last position, so concat_ws yields a
        # bare single token there — no space. contains() is a plain
        # substring probe where the former ^\S+$ rlike paid a regex per
        # bigram occurrence.
        lambda p: p.contains(" "),
    )
    return (
        _t(spark, sf_dir, "documents")
        .select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(50)
    )


# =========================================================================
# Stride-scheduled source interleaving (operators/corpus.interleave_sources)
# =========================================================================

@query(
    "corpus_interleave_sources",
    """
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'),
                                    1, 15)) AS BIGINT) ASC, doc_id ASC) AS r
      FROM documents WHERE source IN ('src0', 'src1', 'src2')
    )
    SELECT doc_id, source, CAST(r AS BIGINT) AS source_rank,
           CAST(r * CASE source WHEN 'src0' THEN 1
                                WHEN 'src1' THEN 2
                                ELSE 4 END AS BIGINT) AS mix_key
    FROM ranked
    """,
    note="Stride-scheduled training-order mixing "
    "(corpus.interleave_sources): weights src0:4 src1:2 src2:1 — docs "
    "ordered by mix_key appear 4:2:1 over EVERY prefix (evenly spread, "
    "not front-loaded); ranks come from the md5(id:salt) shuffle and "
    "the key is pure BIGINT stride arithmetic, so the training order "
    "is bit-reproducible on any cluster",
)
def corpus_interleave_sources(spark, sf_dir):
    from py_etl_spark.operators.corpus import interleave_sources

    return interleave_sources(
        _t(spark, sf_dir, "documents"),
        weights={"src0": 4, "src1": 2, "src2": 1},
    )


# =========================================================================
# Distribution drift report (operators/dq.distribution_drift)
# =========================================================================

@query(
    "dq_drift_doc_lengths",
    """
    WITH binned AS (
      SELECT source,
             least(greatest(CAST(floor(CAST(n_chars AS DOUBLE)
               / (600.0 / 64)) AS INT), 0), 63) AS b
      FROM documents
      WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
    ), cells AS (
      SELECT source, b, count(*) AS c FROM binned GROUP BY 1, 2
    ), grid AS (
      SELECT s.source, gb.b
      FROM (VALUES ('src0'), ('src1')) s(source)
      CROSS JOIN (SELECT unnest(range(0, 64)) AS b) gb
    ), filled AS (
      SELECT grid.source, grid.b, coalesce(cells.c, 0) AS c
      FROM grid LEFT JOIN cells
        ON cells.source = grid.source AND cells.b = grid.b
    ), cum AS (
      SELECT source, b, c,
             sum(c) OVER (PARTITION BY source ORDER BY b) AS cm
      FROM filled
    ), pair AS (
      SELECT a.b, a.c AS ca, bb.c AS cb, a.cm AS cma, bb.cm AS cmb
      FROM cum a JOIN cum bb ON a.b = bb.b
      WHERE a.source = 'src0' AND bb.source = 'src1'
    ), tot AS (
      SELECT sum(CASE WHEN source = 'src0' THEN c END) AS n_a,
             sum(CASE WHEN source = 'src1' THEN c END) AS n_b
      FROM filled
    )
    SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
           CAST(sum(abs(ca * t.n_b - cb * t.n_a)) AS BIGINT) AS tv_num,
           floor((CAST(sum(abs(ca * t.n_b - cb * t.n_a)) AS DOUBLE)
                  / (2.0 * CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0
             AS tv,
           CAST(max(abs(cma * t.n_b - cmb * t.n_a)) AS BIGINT) AS ks_num,
           floor((CAST(max(abs(cma * t.n_b - cmb * t.n_a)) AS DOUBLE)
                  / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0
             AS ks
    FROM pair, tot t GROUP BY t.n_a, t.n_b
    """,
    note="Distribution-drift monitor (dq.distribution_drift): "
    "total-variation + KS-style max cumulative gap between two slices' "
    "histograms, carried as cross-multiplied BIGINT numerators so drift "
    "thresholds compare engine-exactly; reuses hist_sketch's (group, "
    "bin) shuffle — the comparison itself is a Column walk over two "
    "metadata rows",
)
def dq_drift_doc_lengths(spark, sf_dir):
    from py_etl_spark.operators.dq import distribution_drift

    return distribution_drift(
        _t(spark, sf_dir, "documents"),
        col="n_chars",
        group_col="source",
        group_a="src0",
        group_b="src1",
        lo=0.0,
        hi=600.0,
        bins=64,
    )


# =========================================================================
# Star-wide referential audit (operators/dq, broadcast + shuffle FK paths)
# =========================================================================

@query(
    "dq_check_star_fks",
    """
    SELECT 'fk(l_orderkey)' AS check_name, CAST(count(*) AS BIGINT)
             AS n_violations,
           count(*) = 0 AS passed
    FROM lineitem l
    WHERE l.l_orderkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'fk(l_partkey)', CAST(count(*) AS BIGINT), count(*) = 0
    FROM lineitem l
    WHERE l.l_partkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'fk(l_suppkey)', CAST(count(*) AS BIGINT), count(*) = 0
    FROM lineitem l
    WHERE l.l_suppkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'fk(o_custkey)', CAST(count(*) AS BIGINT), count(*) = 0
    FROM orders o
    WHERE o.o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'fk(c_nationkey)', CAST(count(*) AS BIGINT), count(*) = 0
    FROM customer c
    WHERE c.c_nationkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM nation n
                      WHERE n.n_nationkey = c.c_nationkey)
    """,
    note="Star-wide referential audit (dq.check_constraints): every FK "
    "edge of the schema in one unioned report; small dims "
    "(part/supplier/customer/nation) take the broadcast anti-join, the "
    "fact-sized orders side takes the shuffle anti-join "
    "(broadcast=False) — the plan choice a 100 TB audit requires",
)
def dq_check_star_fks(spark, sf_dir):
    from py_etl_spark.operators import dq

    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    li_report = dq.check_constraints(
        lineitem,
        [
            dq.foreign_key(
                "l_orderkey", orders, "o_orderkey", broadcast=False
            ),
            dq.foreign_key("l_partkey", _t(spark, sf_dir, "part"), "p_partkey"),
            dq.foreign_key(
                "l_suppkey", _t(spark, sf_dir, "supplier"), "s_suppkey"
            ),
        ],
    )
    o_report = dq.check_constraints(
        orders, [dq.foreign_key("o_custkey", customer, "c_custkey")]
    )
    c_report = dq.check_constraints(
        customer,
        [dq.foreign_key("c_nationkey", _t(spark, sf_dir, "nation"),
                        "n_nationkey")],
    )
    return li_report.unionByName(o_report).unionByName(c_report)


# =========================================================================
# Two-stage entity resolution: gram candidates → Levenshtein re-rank
# =========================================================================

@query(
    "fuzzy_rerank_levenshtein",
    None,  # oracle assigned below — reuses the candidate stage's SQL
    note="Two-stage ER (fuzzy.levenshtein_rerank): the gram inverted "
    "index proposes (recall), exact JVM Levenshtein disposes "
    "(precision) — the DP runs ONLY on candidate pairs, never "
    "all-pairs; integer edit distance is engine-exact, so the whole "
    "two-stage pipeline replays in DuckDB",
)
def fuzzy_rerank_levenshtein(spark, sf_dir):
    from py_etl_spark.operators.fuzzy import fuzzy_join, levenshtein_rerank

    part = _t(spark, sf_dir, "part")
    cands = fuzzy_join(
        part.filter(F.col("p_partkey") < 300),
        part,
        left_on="p_name",
        right_on="p_name",
        left_id="p_partkey",
        right_id="p_partkey",
        threshold=0.5,
        # bounded probe side: broadcast its gram index — the corpus-side
        # gram rows never shuffle (replaces the r06 gram_salt=16 reducer
        # spread: a broadcast join has no gram reducer to salt).
        # prefix_filter measured WORSE here (sf10 28.5 -> 35.8 s): TPC-H
        # p_name draws 5 words from ~92 colors, so each probe string's
        # "rarest" floor(|A|/2)+1 grams still include ~100k-DF in-word
        # grams — candidate volume barely drops while the DF pass +
        # distinct + verification join add cost. The lever needs a
        # Zipfian gram DF (real text), not a 92-word vocabulary.
        broadcast_left_grams=True,
    ).filter(F.col("id_a") < F.col("id_b"))
    return levenshtein_rerank(
        cands,
        part.filter(F.col("p_partkey") < 300),
        part,
        left_on="p_name",
        right_on="p_name",
        left_id="p_partkey",
        right_id="p_partkey",
        max_dist=24,
    )


REGISTRY["fuzzy_rerank_levenshtein"].oracle = (
    f"""
    WITH base AS ({REGISTRY["fuzzy_join_part_names"].oracle})
    SELECT b.id_b, b.id_a, b.jaccard,
           levenshtein(pa.p_name, pb.p_name) AS lev,
           floor((1.0 - levenshtein(pa.p_name, pb.p_name)
                  / greatest(length(pa.p_name), length(pb.p_name)))
                 * 1000000.0 + 0.5) / 1000000.0
             AS lev_sim
    FROM base b
    JOIN part pa ON pa.p_partkey = b.id_a
    JOIN part pb ON pb.p_partkey = b.id_b
    WHERE levenshtein(pa.p_name, pb.p_name) <= 24
    """
)


# =========================================================================
# k-anonymity / l-diversity privacy audit
# =========================================================================

@query(
    "privacy_k_anonymity_report",
    """
    WITH g AS (
      SELECT c_mktsegment, c_nationkey,
             count(*) AS grp_size,
             count(DISTINCT c_acctbal) AS n_sensitive
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(grp_size) AS BIGINT) AS min_group_size,
           CAST(sum(CASE WHEN grp_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_groups_below_k,
           CAST(sum(CASE WHEN grp_size < 5 THEN grp_size ELSE 0 END)
                AS BIGINT) AS n_rows_at_risk,
           CAST(min(n_sensitive) AS BIGINT) AS min_l_diversity,
           min(grp_size) >= 5 AS k_anonymous,
           min(n_sensitive) >= 2 AS l_diverse
    FROM g
    """,
    note="Privacy audit — the release gate beside the anonymizer "
    "family: k-anonymity (every quasi-identifier group ≥ k=5 rows) and "
    "l-diversity (each group carries ≥ l=2 distinct sensitive values — "
    "k-anonymity alone fails when a small group shares one sensitive "
    "value) over (segment, nation) with acctbal as the sensitive "
    "attribute. ONE group shuffle (count + count-distinct map-side "
    "partials) + a metadata rollup; re-run after pseudonymization to "
    "prove the release contract holds",
)
def privacy_k_anonymity_report(spark, sf_dir):
    g = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("grp_size"),
            F.countDistinct("c_acctbal").alias("n_sensitive"),
        )
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("grp_size").alias("min_group_size"),
        F.sum(F.when(F.col("grp_size") < 5, 1).otherwise(0))
        .cast("long")
        .alias("n_groups_below_k"),
        F.sum(F.when(F.col("grp_size") < 5, F.col("grp_size")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.min("n_sensitive").alias("min_l_diversity"),
        (F.min("grp_size") >= 5).alias("k_anonymous"),
        (F.min("n_sensitive") >= 2).alias("l_diverse"),
    )


# =========================================================================
# Source-similarity matrix (pairwise KMV Jaccard over token sketches)
# =========================================================================

@query(
    "source_similarity_matrix",
    """
    WITH toks AS (
      SELECT source, unnest(list_filter(string_split(lower(
               regexp_replace(text, '[^A-Za-z ]', ' ', 'g')), ' '),
               t -> t <> '')) AS tok
      FROM documents
    ), hashed AS (
      SELECT DISTINCT source,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM toks
    ), sk AS (
      SELECT source, array_agg(h ORDER BY h) AS s FROM (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM hashed
      ) WHERE rn <= 128 GROUP BY source
    )
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(len(list_sort(list_distinct(a.s || b.s))[:128]) AS BIGINT)
             AS k_used,
           CAST(len(list_intersect(
                  list_sort(list_distinct(a.s || b.s))[:128],
                  list_intersect(a.s, b.s))) AS BIGINT) AS n_common,
           CAST(len(list_intersect(
                  list_sort(list_distinct(a.s || b.s))[:128],
                  list_intersect(a.s, b.s))) * 1000000
                // len(list_sort(list_distinct(a.s || b.s))[:128])
                AS BIGINT) AS jacc_ppm
    FROM sk a JOIN sk b ON a.source < b.source
    """,
    note="Corpus-similarity dashboard: pairwise Jaccard between SOURCE "
    "vocabularies estimated from per-source KMV token sketches — the "
    "standard KMV set-resemblance estimator (|merged∩A∩B| / k over the "
    "union's k smallest); the all-pairs join is sources² METADATA "
    "rows of 128 longs each, the corpus is scanned once for the "
    "sketches; similarity in exact integer ppm",
)
def source_similarity_matrix(spark, sf_dir):
    from py_etl_spark.operators.sketch import kmv_distinct

    toks_arr = _alpha_tokens()
    toks = (
        _t(spark, sf_dir, "documents")
        .select("source", F.explode(toks_arr).alias("tok"))
    )
    sk = kmv_distinct(toks, col="tok", k=128, group_cols=("source",)).select(
        "source", "sketch"
    )
    a = sk.select(F.col("source").alias("src_a"), F.col("sketch").alias("sa"))
    b = sk.select(F.col("source").alias("src_b"), F.col("sketch").alias("sb"))
    pair = a.join(b, F.col("src_a") < F.col("src_b"))
    merged = F.slice(
        F.array_sort(F.array_union(F.col("sa"), F.col("sb"))), 1, 128
    )
    common = F.array_intersect(
        merged, F.array_intersect(F.col("sa"), F.col("sb"))
    )
    return pair.select(
        "src_a",
        "src_b",
        F.size(merged).cast("long").alias("k_used"),
        F.size(common).cast("long").alias("n_common"),
        F.expr(
            "CAST(size(array_intersect("
            "  slice(array_sort(array_union(sa, sb)), 1, 128),"
            "  array_intersect(sa, sb))) * 1000000L"
            " DIV size(slice(array_sort(array_union(sa, sb)), 1, 128))"
            " AS LONG)"
        ).alias("jacc_ppm"),
    )


# =========================================================================
# CUSUM change detection (exact integer fold over the daily rollup)
# =========================================================================

@query(
    "events_cusum_alarm",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, count(*) AS n
      FROM events GROUP BY 1
    ), series AS (
      SELECT array_agg(n - 400 ORDER BY day) AS xs, count(*) AS n_days
      FROM daily
    ), folded AS (
      SELECT n_days,
             list_reduce(
               list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                            list_transform(xs, x -> [x, CAST(0 AS BIGINT)])),
               (acc, x) -> [greatest(CAST(0 AS BIGINT), acc[1] + x[1]),
                            greatest(acc[2],
                                     greatest(CAST(0 AS BIGINT),
                                              acc[1] + x[1]))]
             ) AS st
      FROM series
    )
    SELECT CAST(n_days AS BIGINT) AS n_days,
           CAST(st[2] AS BIGINT) AS s_max,
           st[2] > 600 AS alarm
    FROM folded
    """,
    note="One-sided CUSUM change detection over the daily rollup — the "
    "sequential drift alarm (did the event rate shift above target "
    "K=400/day?): S_i = max(0, S_{i-1} + (n_i − K)), alarm ⟺ max S > "
    "H=600. The recursion is inherently ordered, so it runs as ONE "
    "exact-integer fold over the ≤days-long rollup array (metadata) — "
    "the raw stream still only pays the single daily count shuffle; "
    "DuckDB replays the fold with a pair-accumulator list_reduce",
)
def events_cusum_alarm(spark, sf_dir):
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    series = daily.agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("day"), F.col("n")))
            ),
            lambda s: s["n"] - 400,
        ).alias("xs"),
        F.count(F.lit(1)).alias("n_days"),
    )
    fold = F.aggregate(
        F.col("xs"),
        F.struct(
            F.lit(0).cast("long").alias("s"), F.lit(0).cast("long").alias("m")
        ),
        lambda acc, x: F.struct(
            F.greatest(F.lit(0).cast("long"), acc["s"] + x).alias("s"),
            F.greatest(
                acc["m"], F.greatest(F.lit(0).cast("long"), acc["s"] + x)
            ).alias("m"),
        ),
    )
    return series.select(
        F.col("n_days").cast("long").alias("n_days"),
        fold["m"].alias("s_max"),
        (fold["m"] > 600).alias("alarm"),
    )


# =========================================================================
# Stable global row ids (the bucketed zipWithIndex path, driver-checked)
# =========================================================================

@query(
    "stable_row_ids_docs",
    """
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
                AS BIGINT) AS position
    FROM documents
    """,
    note="Exact contiguous 1..N global ids WITHOUT a global sort "
    "(ranking.with_global_position — the zipWithIndex pattern: sampled "
    "range buckets, per-bucket row_number, cumulative offsets "
    "broadcast back). This query puts the engine's scale-path global "
    "rank itself under the driver oracle (previously only plan-tested "
    "via o2): the oracle is the naive global window, so the hash match "
    "proves the bucketed path ≡ the definition with zero "
    "single-partition exchanges (pinned)",
)
def stable_row_ids_docs(spark, sf_dir):
    from py_etl_spark.operators.ranking import with_global_position

    # Checkpoint the NARROW (doc_id, n_chars) frame once (r11, same
    # pattern as quality_rank_ensemble): with_global_position walks its
    # input lineage four times (count, boundary sample, bucket counts,
    # final plan) — against the raw scan that is four parquet passes;
    # against the 16-byte-row checkpoint it is one scan + three block
    # reads. Blocks are freed with the frame's RDD by the
    # ContextCleaner.
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        # lazy (r12): with_global_position's count() doubles as the
        # materialization job — one driver round trip, not two
        .localCheckpoint(eager=False)
    )
    # order_cols are VALUE expressions compared ascending (they ride a
    # struct comparison); n_chars DESC ≡ (-n_chars) ASC for these longs
    out = with_global_position(
        docs, [(-F.col("n_chars")).alias("neg_len"), F.col("doc_id")]
    )
    return out.select("doc_id", F.col("position").cast("long"))


# =========================================================================
# Reciprocal-rank fusion of two retrieval rankings
# =========================================================================

@query(
    "retrieval_rrf_fusion",
    None,  # oracle assigned below — composes the two ANN oracles
    note="Reciprocal-rank fusion (RRF, k=60) of two rankers over the "
    "same query set — the hybrid-retrieval combiner (sparse+dense in "
    "production; here the exact-float and int8-quantized ANN rankings, "
    "both independently oracle-checked): score = Σ 1/(60+rank) on "
    "integer ranks, so the fused doubles are bit-identical across "
    "engines; full-outer on (query, neighbor) keeps results either "
    "ranker surfaces. Rank lists are k·|queries| metadata — the fusion "
    "never touches the corpus",
)
def retrieval_rrf_fusion(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    dense = similarity.cosine_topk_bruteforce(
        emb, probes, k=5, dim=64
    ).select(
        "query_id", "neighbor_id", F.col("rank").alias("r_dense")
    )
    quant = similarity.cosine_topk_int8(emb, probes, k=5, dim=64).select(
        F.col("query_id").alias("q2"),
        F.col("neighbor_id").alias("n2"),
        F.col("rank").alias("r_quant"),
    )
    fused = dense.join(
        quant,
        (F.col("query_id") == F.col("q2"))
        & (F.col("neighbor_id") == F.col("n2")),
        "full_outer",
    ).select(
        F.coalesce(F.col("query_id"), F.col("q2")).alias("query_id"),
        F.coalesce(F.col("neighbor_id"), F.col("n2")).alias("neighbor_id"),
        (
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_dense")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(60) + F.col("r_quant")), F.lit(0.0)
            )
        ).alias("__s"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__s").desc(), F.col("neighbor_id")
    )
    return fused.select(
        "query_id",
        "neighbor_id",
        F.round("__s", 9).alias("rrf_score"),
        F.row_number().over(w).cast("long").alias("rrf_rank"),
    )


REGISTRY["retrieval_rrf_fusion"].oracle = f"""
    WITH dense AS ({REGISTRY["ann_cosine_topk"].oracle}),
    quant AS ({REGISTRY["ann_cosine_topk_int8"].oracle}),
    fused AS (
      SELECT coalesce(d.query_id, qt.query_id) AS query_id,
             coalesce(d.neighbor_id, qt.neighbor_id) AS neighbor_id,
             coalesce(1.0 / (60 + d.rank), 0.0)
               + coalesce(1.0 / (60 + qt.rank), 0.0) AS s
      FROM dense d FULL JOIN quant qt
        ON d.query_id = qt.query_id AND d.neighbor_id = qt.neighbor_id
    )
    SELECT query_id, neighbor_id, round(s, 9) AS rrf_score,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY s DESC, neighbor_id)
                AS BIGINT) AS rrf_rank
    FROM fused
    """


# =========================================================================
# Incremental posting-list merge (merge ≡ direct proof)
# =========================================================================

def _posting_lists_for(spark, sf_dir, parity=None):
    toks_arr = _alpha_tokens()
    docs = _t(spark, sf_dir, "documents")
    if parity is not None:
        docs = docs.filter(F.col("doc_id") % 2 == parity)
    tf = (
        docs.select("doc_id", F.explode(toks_arr).alias("tok"))
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(
            F.col("tok").isin("the", "data", "model", "training", "quality")
        )
    )
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col("doc_id"), F.col("tf")))
    )
    return (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"), pairs.alias("__p"))
        .select(
            "tok",
            "df",
            F.transform(F.col("__p"), lambda s: s["doc_id"]).alias("postings"),
            F.transform(F.col("__p"), lambda s: s["tf"]).alias("tfs"),
        )
    )


@query(
    "posting_lists_incremental_merge",
    None,  # oracle assigned below — the DIRECT build over the full corpus
    note="Incremental index maintenance (search.merge_posting_lists): "
    "even-doc base index merged with the odd-doc delta index — per-term "
    "sorted-array union with tf summation over INDEX-sized rows, the "
    "corpus never re-read; the oracle builds the full-corpus index "
    "directly, so the hash match IS the merge ≡ direct proof",
)
def posting_lists_incremental_merge(spark, sf_dir):
    from py_etl_spark.operators.search import merge_posting_lists

    base = _posting_lists_for(spark, sf_dir, parity=0)
    delta = _posting_lists_for(spark, sf_dir, parity=1)
    merged = merge_posting_lists(base, delta)
    return merged.select(
        "tok",
        "df",
        _arr_csv(F.col("postings")).alias("postings_csv"),
        _arr_csv(F.col("tfs")).alias("tfs_csv"),
    )


REGISTRY["posting_lists_incremental_merge"].oracle = REGISTRY[
    "search_posting_lists"
].oracle


# =========================================================================
# Head+tail truncation to a token budget
# =========================================================================

@query(
    "corpus_truncate_head_tail",
    """
    WITH toks AS (
      SELECT doc_id, text, string_split(text, ' ') AS ts
      FROM documents
    )
    SELECT doc_id,
           CAST(len(ts) AS INT) AS n_tokens,
           len(ts) > 48 AS was_truncated,
           CASE WHEN len(ts) > 48
                THEN array_to_string(ts[1:32], ' ') || ' ... '
                     || array_to_string(ts[-16:], ' ')
                ELSE text END AS trunc_text
    FROM toks
    """,
    note="Head+tail truncation (corpus.truncate_head_tail): keep the "
    "first 32 + last 16 whitespace tokens when over budget — the "
    "long-doc strategy when the middle matters least; pure array-slice "
    "Columns, map-side, zero shuffles",
)
def corpus_truncate_head_tail(spark, sf_dir):
    from py_etl_spark.operators.corpus import truncate_head_tail

    return truncate_head_tail(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        head_tokens=32,
        tail_tokens=16,
    ).select("doc_id", "n_tokens", "was_truncated", "trunc_text")


# =========================================================================
# Pareto frontier (2-D skyline over quality metrics)
# =========================================================================

@query(
    "pareto_frontier_docs",
    """
    WITH m AS (
      SELECT length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS q,
             n_chars AS l
      FROM documents
    ), pts AS (
      SELECT q, l, count(*) AS n_docs FROM m GROUP BY q, l
    )
    SELECT CAST(p.q AS BIGINT) AS q, CAST(p.l AS BIGINT) AS l,
           CAST(p.n_docs AS BIGINT) AS n_docs
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM m
      WHERE m.q >= p.q AND m.l >= p.l AND (m.q > p.q OR m.l > p.l)
    )
    """,
    note="2-D Pareto skyline — the multi-objective curation frontier "
    "(docs not dominated on (alpha mass, length); generalizes to any "
    "metric pair): per-q max-l collapse (one small shuffle), then a "
    "suffix-max walk ordered by q desc over ≤|distinct q| rows — the "
    "skyline never compares all pairs; the oracle is the O(n²) "
    "NOT-EXISTS dominance definition, so the hash match proves the "
    "suffix-max formulation ≡ the definition. The final window rides "
    "|distinct q| METADATA rows (bounded by the metric's resolution, "
    "same posture as the daily-rollup windows)",
)
def pareto_frontier_docs(spark, sf_dir):
    m = _t(spark, sf_dir, "documents").select(
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("long").alias("q"),
        F.col("n_chars").cast("long").alias("l"),
    )
    pts = m.groupBy("q", "l").agg(F.count(F.lit(1)).alias("n_docs"))
    per_q = Window.partitionBy("q").orderBy(F.col("l").desc())
    best = pts.withColumn("__r", F.row_number().over(per_q)).filter(
        F.col("__r") == 1
    )
    suffix = Window.orderBy(F.col("q").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        best.withColumn("__hi", F.max("l").over(suffix))
        .filter(F.col("__hi").isNull() | (F.col("l") > F.col("__hi")))
        .select("q", "l", "n_docs")
    )


# =========================================================================
# Rolling 7-day distinct users via windowed HLL register merge
# =========================================================================

@query(
    "rolling_7d_distinct_users_hll",
    """
    WITH h AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events WHERE user_id IS NOT NULL
    ), cells AS (
      SELECT day, h // 4503599627370496 AS b,
             max(CASE WHEN h % 4503599627370496 = 0 THEN 53
                      ELSE 52 - length(bin(h % 4503599627370496)) + 1
                 END) AS reg
      FROM h GROUP BY 1, 2
    ), days AS (
      SELECT DISTINCT day FROM cells
    ), merged AS (
      SELECT d.day, c.b, max(c.reg) AS reg
      FROM days d JOIN cells c
        ON c.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day, c.b
    ), filled AS (
      SELECT d.day, gb.b, coalesce(m.reg, 0) AS reg
      FROM days d
      CROSS JOIN (SELECT unnest(range(0, 256)) AS b) gb
      LEFT JOIN merged m ON m.day = d.day AND m.b = gb.b
    ), agg AS (
      SELECT day,
             CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero,
             CAST(sum(CAST(pow(2.0, 53 - reg) AS BIGINT)) AS BIGINT)
               AS sum_scaled
      FROM filled GROUP BY 1
    )
    SELECT epoch_ms(CAST(day AS TIMESTAMP)) AS day_ms, n_zero, sum_scaled,
    """
    + _HLL_ORACLE_EST
    + """
    FROM agg
    """,
    note="Rolling 7-day distinct users — the rolling-cardinality "
    "problem exact DISTINCT cannot solve incrementally: daily HLL "
    "register cells (bounded: days·m rows after ONE data-sized "
    "shuffle) self-join over the 7-day band and merge register-wise "
    "max — each day's window NDV from metadata, never re-touching raw "
    "events; the whole construction replays in DuckDB bit-exactly",
)
def rolling_7d_distinct_users_hll(spark, sf_dir):
    from py_etl_spark.operators.sketch import (
        _portable_hash60,
        hll_estimate_cols,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    h = _portable_hash60(F.col("user_id"))
    wbits = 52
    cells = (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.shiftright(h, wbits).alias("b"),
            h.bitwiseAND(F.lit((1 << wbits) - 1)).alias("w"),
        )
        .withColumn(
            "reg0",
            F.when(F.col("w") == 0, F.lit(wbits + 1)).otherwise(
                F.lit(wbits) - F.length(F.conv(F.col("w"), 10, 2)) + 1
            ),
        )
        .groupBy("day", "b")
        .agg(F.max("reg0").cast("long").alias("reg"))
    )
    days = cells.select("day").distinct()
    # each daily cell serves the 7 windows ending on day..day+6 — a
    # map-side ≤7× explode of METADATA rows, then a broadcast semi-join
    # keeps only observed window-end days (no nested-loop range join)
    targets = cells.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
        "b",
        "reg",
    )
    merged = (
        targets.join(F.broadcast(days), "day")
        .groupBy("day", "b")
        .agg(F.max("reg").alias("reg"))
    )
    entries = F.map_from_entries(
        F.collect_list(F.struct(F.col("b"), F.col("reg")))
    )
    registers = F.transform(
        F.sequence(F.lit(0), F.lit(255)),
        lambda i: F.coalesce(
            F.try_element_at(entries, i.cast("int")), F.lit(0).cast("long")
        ),
    )
    sk = merged.groupBy("day").agg(registers.alias("registers"))
    cols = hll_estimate_cols(F.col("registers"))
    return (
        sk.withColumn("n_zero", cols["n_zero"])
        .withColumn("sum_scaled", cols["sum_scaled"])
        .withColumn("estimate", cols["estimate"])
        .select(
            F.unix_millis("day").alias("day_ms"),
            "n_zero",
            "sum_scaled",
            "estimate",
        )
    )



# =========================================================================
# contract surface
# =========================================================================

# The external driver checks registry entries in dict order and caps its
# list at 50. Emit the registry in an explicit priority order so the cap
# lands on queries whose correctness is independently evidenced elsewhere:
#   _FRONT (r11 rotation, exactly 50 — count pinned by
#           test_queries_contract), in list order:
#           (a) the 7 stalest-window entries (VERDICT r10 "Next round"
#           item 3) — the 5 whose newest window-green is r06
#           (jsonl_roundtrip_documents, deferred from r10;
#           s1_full_scan_projection; s2_keyset_range_scan;
#           skew_salted_join_orders; token_count_bpe) and the 2
#           declared rows-only entries never re-windowed since r04/r05
#           (quality_compression_ratio, audio_window_features_synthetic).
#           (b) 8 whose VALUES or candidate sets changed in r11:
#           dedup_minhash_lsh + dedup_minhash_portable_small +
#           dedup_cc_clusters + dedup_keep_canonical — the MinHash
#           permutation-modulus fix (dedup.PERM_PRIME), oracles
#           co-migrated; retrieval_rrf_fusion — term_count guard path;
#           fuzzy_join_part_names + fuzzy_rerank_levenshtein +
#           semantic_dedup_fixed — the exchange_width() helper at their
#           repartition sites. (bm25_search_topk and
#           doc_winnow_fingerprints, fronted for these same families
#           mid-round, ceded their slots to the optimization block (f):
#           the term_count guard only REJECTS invalid terms and the
#           xxhash64 lever is unit-only — neither changes the plan or
#           values of the windowed query; both were window-green in r10
#           at their current shapes.)
#           (c) 4 r11 sf0.1-sweep divergence fixes (VALUES change at
#           boundary rows, oracles co-migrated): quality_score_hashed_
#           linear + corpus_curation_pipeline — the -0.0 logit
#           normalization; q2_min_cost_supplier — bit-reproducible
#           float-space round; q9_product_profit — exact integer-cents
#           profit sum.
#           (d) the 16 money-aggregate conversions (class-wide
#           follow-through of (c): every round(sum(double))/
#           round(avg(double)) aggregate moved to the exact
#           scaled-integer idiom, module-top note) — q1, q3, q5, q6,
#           q7, q8, q10, q11, q14, q15, q17, q19, q22,
#           agg_incremental_monthly_revenue, st_tumbling_window_agg,
#           st_session_window_agg (+ token_count_bpe's avg render,
#           already fronted as stalest).
#           (e) 5 lattice-ratio float_round conversions
#           (functions/numeric.py): ngram_jaccard_allpairs_small +
#           key_skew_profile_lineitem + lm_fluency_bits, plus
#           dq_drift_doc_lengths + hist_quantile_prices (listed after
#           the money block; the fuzzy pair carries the same change and
#           is already listed in (b)).
#           (f) the 10 optimization-pass plan rewrites (values
#           identical — each proven hash-green at sf0.01+sf0.1 when it
#           landed; fronted so the driver window re-proves them at the
#           closing HEAD): pagerank_part_supplier (loop-invariant
#           checkpoint), quality_rank_ensemble (shared count +
#           narrow-frame checkpoint), dq_check_star_fks +
#           dq_check_orders (single-scan folded FK checks),
#           q4_order_priority_exists (EXISTS→max-pre-agg + pushed
#           bound), asof_latest_order_at_shipdate (probe-side
#           broadcast), cdc_merge_scd1 + cdc_tombstone_lifecycle +
#           a3_last_writer_wins + scd2_apply_incremental
#           (latest-per-key row_number window → max(struct) hash
#           aggregate). Two plan-changed queries cede window slots for
#           the value-changed (e) pair and stay on repo-side evidence
#           (sf0.01+sf0.1 hash-green runs + updated plan pins):
#           knn_label_agreement (locally neutral broadcast-side swap,
#           metadata-sized either way) and asof_next_order_within_30d
#           (identical change to its fronted sibling); likewise
#           o2_case_insensitive_sort (third-session narrow-frame
#           checkpoint, values identical, hash-green at sf0.01+sf0.1
#           with its plan pin and plans/r11 pair).
#           The rest of the r07-green cohort defers to r12, all
#           redundantly evidenced (byte-exact golden pipeline coverage,
#           stream-parity units, property pins, or plan-pinned trivial
#           scans on top of their r07 driver rows): a1_count_by_group,
#           a2_watermark_running_max, a4_duplicate_key_detection,
#           a7_pending_work_exists, p4_status_filter,
#           p6_keyset_semi_join, s3_point_lookup, s4_sorted_limit,
#           f_string_suite, f_date_number_suite,
#           j1_snapshot_reconcile_outer, j3_two_key_fallback_join,
#           p10_validity_routing, s5_csv_roundtrip, s7_scope_scan,
#           s10_tree_ancestors, p3_rename_convert_projection,
#           a5_partition_boundaries, e1_set_difference,
#           e2_set_intersection, f_hash_fingerprint,
#           j2_event_entity_lookup, j4_sorted_merge_tree_compare,
#           j7_anti_join_guard, lang_id_heuristic,
#           o2_case_insensitive_sort, p12_first_n_per_group,
#           p5_watermark_filter, w2_retry_escalation,
#           cm_estimate_heavy_users, kmv_join_size_estimate,
#           dedup_exact_groups (the cohort's a3_last_writer_wins,
#           cdc_merge_scd1, cdc_tombstone_lifecycle,
#           st_tumbling_window_agg, dq_drift_doc_lengths and
#           hist_quantile_prices moved to changed blocks (d)/(e)/(f)).
#           Changed-path evidence outranks freshness rotation: every
#           deferred entry stays FULL-gate green each round.
#   middle: everything r08+-green that isn't prioritized.
#   _TAIL: the r08/r09 windows' unchanged greens (freshest evidence,
#           cheapest to cede to the cap).
# tools/check_correctness.py runs the FULL registry regardless (committed
# as CORRECTNESS_FULL_r*.json).
_FRONT = [
    # the 7 stalest (5 r06-green + the 2 rows-only last windowed r04/r05)
    "jsonl_roundtrip_documents",
    "s1_full_scan_projection",
    "s2_keyset_range_scan",
    "skew_salted_join_orders",
    "token_count_bpe",
    "quality_compression_ratio",
    "audio_window_features_synthetic",
    # changed in r11 (value- or plan-affecting code paths)
    "dedup_minhash_lsh",
    "dedup_minhash_portable_small",
    "dedup_cc_clusters",
    "dedup_keep_canonical",
    "retrieval_rrf_fusion",
    "fuzzy_join_part_names",
    "fuzzy_rerank_levenshtein",
    "semantic_dedup_fixed",
    # r11 sf0.1-sweep divergence fixes (values change at boundary rows)
    "quality_score_hashed_linear",
    "corpus_curation_pipeline",
    "q2_min_cost_supplier",
    "q9_product_profit",
    # r11 exact money-aggregate conversions (class-wide follow-through)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_revenue",
    "q11_important_stock",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_disjunctive_brand_revenue",
    "q22_idle_customer_balance",
    "agg_incremental_monthly_revenue",
    "st_tumbling_window_agg",
    "st_session_window_agg",
    # r11 lattice-ratio float_round conversions (jaccard/share/bits/
    # quantile renders; fuzzy pair + dq_drift + hist_quantile already
    # fronted above)
    "ngram_jaccard_allpairs_small",
    "key_skew_profile_lineitem",
    "lm_fluency_bits",
    # r11 float_round conversions carried by queries outside the blocks
    # above (values change at boundary rows — window evidence required)
    "dq_drift_doc_lengths",
    "hist_quantile_prices",
    # r11 optimization-pass plan changes (values identical, plans
    # restructured — guide-driven rewrites, each oracle-verified at
    # sf0.01+sf0.1 when it landed; the driver window re-proves them)
    "pagerank_part_supplier",
    "quality_rank_ensemble",
    "dq_check_star_fks",
    "dq_check_orders",
    "q4_order_priority_exists",
    "asof_latest_order_at_shipdate",
    "cdc_merge_scd1",
    "cdc_tombstone_lifecycle",
    "a3_last_writer_wins",
    "scd2_apply_incremental",
]
_TAIL = [
    "token_pmi_pairs",
    "corpus_top_bigrams",
    "search_posting_lists",
    "posting_lists_incremental_merge",
    "source_similarity_matrix",
    "safety_blocklist_filter",
    "vocab_coverage_report",
    "corpus_pack_examples",
    "corpus_assemble_examples",
    "json_props_extract",
    "a8_distinct_and_percentile",
    "e5_unpivot_metrics",
    "g1_rollup",
    "g2_cube",
    "g3_pivot",
    "sessionize_events",
    "st_hopping_window_agg",
    "trending_event_types_hourly",
    "events_anomaly_days",
    "hll_rollup_doc_ids",
    "hll_grouping_sets_docs",
    "event_transition_matrix",
    "last_n_events_per_user",
    "partition_gap_report",
    "embedding_outlier_scores",
    "scd2_point_in_time_features",
    "split_leakage_report",
    "feature_bucketize_order_prices",
    "privacy_k_anonymity_report",
    "events_cusum_alarm",
    "pareto_frontier_docs",
    "rolling_7d_distinct_users_hll",
    "stable_row_ids_docs",
]

def _ordered_registry() -> dict[str, QuerySpec]:
    front = [n for n in _FRONT if n in REGISTRY]
    tail = [n for n in _TAIL if n in REGISTRY]
    mid = [n for n in REGISTRY if n not in set(front) | set(tail)]
    return {n: REGISTRY[n] for n in front + mid + tail}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _ordered_registry().items()
        if spec.oracle is not None
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC merge pipeline at sf0.001."""
    return cdc_merge_scd1(spark, "/root/testdata/sf0.001")
