"""Fuzzy (similarity) join for entity resolution: char-n-gram Jaccard via
an inverted gram index.

The reference's two-key fallback join (refsync J3: try cn, fall back to
uid) handles keys that are EXACTLY equal under a different column; this
operator handles keys that are nearly equal — misspelled names, reordered
words, OCR noise — the standard record-linkage problem.

Algorithm (set-similarity join, Chaudhuri/Ganti/Kaushik 2006 family):

1. each side explodes into distinct boundary-padded lowercase char
   n-grams — map-side;
2. the gram inverted index joins the two sides on the gram — only pairs
   sharing ≥1 gram ever meet (never an all-pairs cross product);
3. one groupBy on the candidate pair counts shared grams; Jaccard
   ``inter / (|A| + |B| - inter)`` filters to the threshold.

Scale levers, both standard:
- **stop-gram cap** (``max_gram_freq``): a gram occurring in half the
  table ("Customer#…") contributes candidate pairs quadratically while
  carrying no discriminating signal. Dropping grams above the frequency
  cap bounds the index's fan-out exactly like the LSH/winnowing
  hot-bucket caps; pairs that share ONLY stop-grams are below any useful
  threshold anyway (their union is large), so recall at sane thresholds
  is unaffected.
- at extreme scale, prefix filtering (order grams by global frequency,
  index only each string's rarest ``k·(1-τ)+1`` grams) drops candidate
  counts another order of magnitude; the cap is the simpler 90 % version.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from py_etl_spark.functions.numeric import float_round
from py_etl_spark.plans.width import exchange_width


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct boundary-padded lowercase char n-grams as array<string>.

    A leading/trailing space makes word starts/ends count as features
    ("red" vs "fred" differ in the boundary gram ' re' vs ' fr')."""
    padded = F.concat(F.lit(" "), F.lower(F.trim(col)), F.lit(" "))
    ln = F.length(padded)
    idx = F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: padded.substr(i, F.lit(n)))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_id: str,
    right_id: str,
    threshold: float = 0.5,
    n: int = 3,
    max_gram_freq: int | None = None,
    gram_salt: int | None = None,
    broadcast_left_grams: bool = False,
    prefix_filter: bool = False,
) -> DataFrame:
    """Pairs ``(id_a, id_b, jaccard)`` with char-n-gram Jaccard ≥
    ``threshold``. ``max_gram_freq`` enables the stop-gram cap (frequency
    counted per side; Jaccard is then over the capped gram sets — the
    documented approximation). Plan: two map-side explodes, the gram
    equi-join,
    one pair-count groupBy — no cross product anywhere.

    ``gram_salt``: spread each gram's pair generation over ``salt``
    deterministic sub-keys (right side salted by ``xxhash64(id)``, left
    side replicated ×salt). The gram join's shuffle key is the GRAM, so
    a hot gram (" ca" in every part name) lands its entire pair fan-out
    on ONE reducer — measured at the 100× replica, the un-salted probe
    join ran its tail on a single core for minutes while 31 cores sat
    idle (wall super-linear even though pair COUNT is linear). Salting
    restores full parallelism with IDENTICAL output — each (gram, pair)
    meets exactly once, under the right row's single salt value. Use
    for probe-style joins (small left, huge right); the left side is
    replicated ×salt, so don't salt two big sides.

    ``broadcast_left_grams``: when the left side is a bounded probe set
    (its exploded gram index fits in a broadcast — a few MB), hint the
    gram join to broadcast it. The right side's gram rows then never
    shuffle AT ALL (map-side hash join; the only remaining exchange is
    the candidate-pair groupBy, which is hash-balanced by construction),
    and ``gram_salt`` becomes moot — salt exists to spread a hot gram's
    reducer in the SHUFFLE join, and a broadcast join has no gram
    reducer. Catalyst won't pick this on its own: the post-explode size
    estimate of the left frame is row-count-blind, so AQE plans a
    shuffle join at scale. Don't set it for two big sides.

    ``prefix_filter``: EXACT candidate pruning (Chaudhuri/Ganti/Kaushik
    prefix filtering). J(A,B) ≥ τ implies |A∩B| ≥ ⌈τ·|A|⌉, so B can
    miss at most |A| − ⌈τ|A|⌉ of A's grams — any fixed subset of
    ⌊(1−τ)·|A|⌋ + 1 grams of A must be hit (pigeonhole). Indexing only
    each left string's GLOBALLY RAREST that-many grams (rarest by
    right-side document frequency — the choice that minimizes candidate
    fan-out) generates every qualifying pair and far fewer others:
    candidates fall from Σ_g fL(g)·fR(g) to Σ_A Σ_{g∈rare(A)} fR(g)
    (the gram DF table is ≤ |alphabet|^n rows, always broadcastable).
    Shared-gram COUNTS can no longer be read off the pruned join, so
    candidates are verified exactly per pair via ``array_intersect`` of
    the two full gram sets — bit-identical output, pinned by the
    brute-force property test. Composes with ``broadcast_left_grams``;
    mutually exclusive with ``max_gram_freq`` (the cap changes which
    grams exist, breaking the pigeonhole bound)."""
    if prefix_filter and max_gram_freq is not None:
        raise ValueError(
            "prefix_filter's pigeonhole bound is exact only over the "
            "FULL gram sets; combining it with max_gram_freq would drop "
            "qualifying pairs — pick one"
        )
    if broadcast_left_grams:
        # The broadcast path's entire heavy chain — gram explode, the
        # map-side hash join (which fans each right gram row out to
        # every matching probe: 674M (gram, pair) rows at the 100×
        # replica), and the pair-count PARTIAL aggregation — runs in
        # ONE stage whose parallelism is the right table's scan-split
        # count, and row-group skew in those splits serializes it (the
        # shuffle-join path has no such problem: its gram exchange
        # rebalances). Repartitioning the COMPACT doc rows by id before
        # the explode (the winnowing recipe, fingerprint.py:82) costs a
        # doc-row-sized exchange and buys even, full-width parallelism
        # for the row-multiplying chain: measured at the 100× replica,
        # pair-count stage 22.1 → 14.5 s interleaved min-of-2 (−35%).
        # Explicit numPartitions so AQE's coalescing (advisory 64 MB on
        # the compact exchange) can't fold the map width back down
        # (derivation + dynamic-allocation caveat: plans/width.py).
        right = right.repartition(
            exchange_width(right.sparkSession), F.col(right_id)
        )
    lg = left.select(
        F.col(left_id).alias("id_a"),
        F.explode(char_ngrams(F.col(left_on), n)).alias("gram"),
    )
    rg = right.select(
        F.col(right_id).alias("id_b"),
        F.explode(char_ngrams(F.col(right_on), n)).alias("gram"),
    )
    if max_gram_freq is not None:
        from pyspark.sql import Window as W

        freq = F.count(F.lit(1)).over(W.partitionBy("gram"))
        rg = rg.withColumn("__gf", freq).filter(
            F.col("__gf") <= max_gram_freq
        ).drop("__gf")
        lg = lg.withColumn("__gf", freq).filter(
            F.col("__gf") <= max_gram_freq
        ).drop("__gf")
    sizes_l = left.select(
        F.col(left_id).alias("id_a"),
        F.size(char_ngrams(F.col(left_on), n)).alias("sz_a"),
    )
    sizes_r = right.select(
        F.col(right_id).alias("id_b"),
        F.size(char_ngrams(F.col(right_on), n)).alias("sz_b"),
    )
    if prefix_filter:
        from pyspark.sql import Window as W

        # right-side gram document frequency: bounded by the n-gram
        # alphabet (tens of thousands of rows), always broadcastable
        gfreq = rg.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
        # rank each left string's grams rarest-first (absent-from-right
        # grams first: fR = 0 generates zero candidates) and keep the
        # floor(sz_a·(1−τ))+1 prefix the pigeonhole bound needs
        w = W.partitionBy("id_a").orderBy(
            F.col("__df").asc_nulls_first(), F.col("gram")
        )
        lp = (
            lg.join(F.broadcast(gfreq), "gram", "left")
            .join(sizes_l, "id_a")
            .withColumn("__rn", F.row_number().over(w))
            .filter(
                F.col("__rn")
                <= F.floor(F.col("sz_a") * (1.0 - threshold)) + 1
            )
            .select("id_a", "gram")
        )
        if broadcast_left_grams:
            lp = F.broadcast(lp)
        cand = lp.join(rg, "gram").select("id_a", "id_b").distinct()
        # exact verification over the FULL gram sets: the pruned join
        # can't count shared grams, array_intersect can
        ga = left.select(
            F.col(left_id).alias("id_a"),
            char_ngrams(F.col(left_on), n).alias("__ga"),
        )
        gb = right.select(
            F.col(right_id).alias("id_b"),
            char_ngrams(F.col(right_on), n).alias("__gb"),
        )
        if broadcast_left_grams:
            ga = F.broadcast(ga)
        verified = (
            cand.join(ga, "id_a")
            .join(gb, "id_b")
            .withColumn(
                "inter", F.size(F.array_intersect("__ga", "__gb"))
            )
            .withColumn(
                "__j",
                F.col("inter")
                / (F.size("__ga") + F.size("__gb") - F.col("inter")),
            )
            .filter(F.col("__j") >= threshold)
        )
        return verified.select(
            "id_a", "id_b",
            # int-ratio lattice -> bit-reproducible float round
            float_round(F.col("__j"), 6).alias("jaccard"),
        )
    if gram_salt and not broadcast_left_grams:
        rg = rg.withColumn(
            "__gs",
            F.pmod(F.xxhash64(F.col("id_b")), F.lit(gram_salt)).cast(
                "int"
            ),
        )
        lg = lg.withColumn(
            "__gs",
            F.explode(F.array(*[F.lit(s) for s in range(gram_salt)])),
        )
        join_keys = ["gram", "__gs"]
    else:
        join_keys = ["gram"]
    if broadcast_left_grams:
        lg = F.broadcast(lg)
    inter = (
        lg.join(rg, join_keys)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter")
    )
    return (
        inter.join(sizes_l, "id_a")
        .join(sizes_r, "id_b")
        .withColumn("__j", jac)
        .filter(F.col("__j") >= threshold)
        .select(
            "id_a", "id_b",
            # int-ratio lattice -> bit-reproducible float round
            float_round(F.col("__j"), 6).alias("jaccard"),
        )
    )


def levenshtein_rerank(
    candidates: DataFrame,
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_id: str,
    right_id: str,
    max_dist: int | None = None,
) -> DataFrame:
    """Exact edit-distance re-rank of :func:`fuzzy_join` candidates — the
    standard two-stage ER pipeline: the gram index proposes (cheap,
    recall-oriented), Levenshtein disposes (exact, precision-oriented).
    Appends ``lev`` (raw distance, INT) and ``lev_sim`` = round(1 −
    lev/max(len), 6); optionally filters to ``lev ≤ max_dist``.

    Scale: the DP runs ONLY on candidate pairs (Σ gram-collisions,
    bounded by the stop-gram cap), never all-pairs; strings re-join via
    two id-keyed joins that AQE broadcasts when the candidate set is
    small. JVM `levenshtein` expression — integer-exact, identical in
    DuckDB, no Python in the path.
    """
    l_s = left.select(
        F.col(left_id).alias("id_a"), F.col(left_on).alias("__sa")
    )
    r_s = right.select(
        F.col(right_id).alias("id_b"), F.col(right_on).alias("__sb")
    )
    out = (
        candidates.join(l_s, "id_a")
        .join(r_s, "id_b")
        .withColumn("lev", F.levenshtein(F.col("__sa"), F.col("__sb")))
        .withColumn(
            "lev_sim",
            # int-ratio lattice -> bit-reproducible float round
            float_round(
                F.lit(1.0)
                - F.col("lev")
                / F.greatest(F.length("__sa"), F.length("__sb")),
                6,
            ),
        )
    )
    if max_dist is not None:
        out = out.filter(F.col("lev") <= max_dist)
    return out.drop("__sa", "__sb")
