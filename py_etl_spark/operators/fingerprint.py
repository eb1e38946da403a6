"""Document fingerprinting via winnowing (rolling k-gram hash + window min).

Schleimer/Wilkerson/Aiken winnowing (the MOSS algorithm, SIGMOD'03): hash
every character k-gram of the normalized text, then keep the minimum hash
of each sliding window of ``w`` consecutive grams. Any substring of length
>= k + w - 1 shared by two documents is guaranteed to contribute at least
one common fingerprint, so fingerprint overlap is a near-dup/plagiarism
signal with bounded density (~2/(w+1) of gram positions survive).

Scale shape — one shuffle total:

- gram generation is a generated ``sequence`` + ``explode`` + ``substring``
  (all codegen'd JVM expressions, no Python, no array HOF interpretation);
- the hash is map-side;
- the only shuffle is the per-doc window (``partitionBy(doc_id)``), and the
  downstream per-doc aggregate reuses that exact partitioning, so Catalyst
  plans a single Exchange. Every document is independent — the op scales
  linearly with corpus size across any number of executors, and a 100 TB
  corpus just means more doc partitions.

Hash families (same split as the MinHash/SimHash operators):

- ``md5`` — PORTABLE: first 8 hex chars of md5 → BIGINT, reproducible
  bit-for-bit by the DuckDB oracle (and any engine with md5);
- ``xxhash64`` — production: JVM-native xxhash64 folded to 32 bits,
  cheaper per gram, identical plan.

The reference engine has no fingerprinting op; this is part of the
LLM-training-data operator family the brief adds (document fingerprinting
via rolling hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from py_etl_spark.plans.width import exchange_width


def _gram_hash(gram_col, family: str):
    if family == "md5":
        return F.conv(F.substring(F.md5(gram_col), 1, 8), 16, 10).cast("long")
    if family == "xxhash64":
        # fold to 32 bits so fingerprints stay positive and overflow-safe
        return F.pmod(F.xxhash64(gram_col), F.lit(1 << 32)).cast("long")
    raise ValueError(f"unknown hash family: {family}")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """Distinct ``(id_col, fp)`` winnowing fingerprints per document.

    Text is normalized (lowercase, whitespace collapsed) before gramming;
    documents shorter than ``k`` normalized chars produce no fingerprints.
    Trailing windows shorter than ``w`` still emit their min (deterministic
    and engine-portable; full-window-only semantics would drop < w grams at
    each doc tail).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    # r09 shape: ONE exchange, placed where rows are SMALL. The old plan
    # exploded first and let the per-doc window shuffle every (id, pos,
    # hash) gram row — ~20 bytes × |corpus chars| (10 GB at the 100×
    # replica) — then paid a second (id, fp) exchange for distinct.
    # Repartitioning the DOCUMENT rows by id up front moves the only
    # exchange to the ~1 KB/doc normalized-text rows (the corpus' own
    # size); the explode and hash stay map-side, the window then finds
    # its partitioning already satisfied (Generate preserves the child's
    # hashpartitioning — only the local sort remains), and the distinct
    # becomes a per-doc collect_set + explode that reuses the same
    # partitioning (fingerprint sets are bounded: ~2/(w+1) density).
    # Measured sf10 interleaved A/B min-of-2: 19.7 → 15.9 s (the
    # remainder is map-side compute: gram explode ~6.7 s + md5 ~4.3 s +
    # the window's local sort). Output rows identical.
    base = (
        df.select(F.col(id_col), norm.alias("__norm"))
        .filter(F.length("__norm") >= k)
        # explicit width (r10, the fuzzy.py lesson): without a
        # numPartitions, AQE may coalesce this compact doc exchange by
        # its ~64 MB advisory size — but its WIDTH is what parallelizes
        # the 290×-row-multiplying gram chain above it. Pin it to the
        # cluster's full width (measured at sf10: 27.4 → 25.4 s, within
        # session noise; adopted for width determinism; derivation and
        # dynamic-allocation caveat: plans/width.py).
        .repartition(exchange_width(df.sparkSession), F.col(id_col))
    )
    grams = base.select(
        id_col,
        F.explode(
            F.sequence(F.lit(1), F.length("__norm") - F.lit(k - 1))
        ).alias("__p"),
        "__norm",
    ).select(
        id_col,
        "__p",
        F.substring(F.col("__norm"), F.col("__p"), F.lit(k)).alias("__gram"),
    )
    hashed = grams.select(
        id_col, "__p", _gram_hash(F.col("__gram"), hash_family).alias("__h")
    )
    win = Window.partitionBy(id_col).orderBy("__p").rowsBetween(0, w - 1)
    fps = hashed.select(id_col, F.min("__h").over(win).alias("fp"))
    return (
        fps.groupBy(id_col)
        .agg(F.collect_set("fp").alias("__fps"))
        .select(id_col, F.explode("__fps").alias("fp"))
    )


def fingerprint_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """Per-document fingerprint summary: count, checksum, min, max.

    Output is one row per document (corpus-linear, never gram-sized), and
    the aggregate reuses the window's doc partitioning — no extra shuffle.
    """
    fps = winnow_fingerprints(df, text_col, id_col, k, w, hash_family)
    return fps.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_fps"),
        F.sum("fp").cast("long").alias("fp_checksum"),
        F.min("fp").cast("long").alias("fp_min"),
        F.max("fp").cast("long").alias("fp_max"),
    )


def shared_fingerprint_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    hash_family: str = "xxhash64",
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs: documents sharing >= ``min_shared``
    winnowing fingerprints.

    Same bucket-join shape as LSH dedup: group by fingerprint, self-join
    within fingerprint buckets (id_a < id_b), count shared fps per pair.
    ``max_bucket_size`` caps degenerate fingerprints (e.g. a boilerplate
    8-gram present in half the corpus) exactly like the LSH hot-bucket
    guard — an uncapped hot fingerprint is an O(n²) bucket at 100 TB.
    """
    fps = winnow_fingerprints(df, text_col, id_col, k, w, hash_family)
    bucket_n = Window.partitionBy("fp")
    fps = fps.withColumn("__bn", F.count(F.lit(1)).over(bucket_n)).filter(
        F.col("__bn") <= max_bucket_size
    )
    a = fps.select(F.col("fp"), F.col("doc_id").alias("id_a"))
    b = fps.select(F.col("fp"), F.col("doc_id").alias("id_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    return pairs
