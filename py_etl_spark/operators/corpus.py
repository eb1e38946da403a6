"""Corpus curation ops for training-data pipelines: deterministic splits,
token-budget quotas, benchmark decontamination.

These are the operations that sit between "raw deduped documents" and "a
training mix" at 100 TB. All three are pure DataFrame ops, shuffle-minimal,
and — critically for a distributed pipeline — DETERMINISTIC: re-running a
failed stage, replaying a lineage, or recomputing on a different cluster
layout yields byte-identical assignments. That is why every random-looking
choice here is a hash of a stable key (the md5-prefix portable family, same
as MinHash/winnowing), never ``rand()``/``sample()``:

- ``rand()`` breaks task-retry determinism (a retried task re-draws),
- seeded per-partition RNGs break under repartitioning,
- hash(key) is stable under both, and any engine can reproduce it.

Reference scope: the reference engine has none of these; they belong to the
LLM-training-data operator family the brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _hash_bucket(key_col, buckets: int):
    """Deterministic, engine-portable bucket in [0, buckets): first 8 hex
    chars of md5(key) as an integer, mod buckets."""
    return F.pmod(
        F.conv(F.substring(F.md5(key_col.cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(buckets),
    )


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, int] | None = None,
) -> DataFrame:
    """Assign every row to a named split by hashing its id.

    ``splits`` maps name → percentage (must sum to 100); default
    train/val/test 80/10/10. Map-side only — no shuffle, no sampling
    nondeterminism, and the same row lands in the same split on any
    cluster, any day, any engine that can compute md5.
    """
    splits = splits or {"train": 80, "val": 10, "test": 10}
    if sum(splits.values()) != 100:
        raise ValueError("split percentages must sum to 100")
    bucket = _hash_bucket(F.col(id_col), 100)
    expr = None
    hi = 0
    last = list(splits)[-1]
    for name, pct in splits.items():
        hi += pct
        cond = bucket < hi
        branch = F.lit(name)
        expr = (
            F.when(cond, branch) if expr is None else expr.when(cond, branch)
        )
        if name == last:
            expr = expr.otherwise(branch)
    return df.withColumn("split", expr)


def token_budget_quota(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Cap each group at ``budget`` tokens, keeping a deterministic
    hash-ordered prefix of its documents.

    The per-source mixing-ratio op: order each group's docs by
    md5(id) (an unbiased deterministic shuffle), take the running token
    sum, and keep every doc that STARTS under the budget (so each group
    may overshoot by at most one document — the standard greedy quota).

    One shuffle (the per-group window); token counting is a JVM regex by
    default. Pass ``n_tokens_col`` to budget on a PRECOMPUTED count
    instead — e.g. exact BPE counts from
    ``functions.bpe.with_bpe_token_counts`` — making the quota honest
    against a real tokenizer while the window plan stays identical.
    Groups are independent, so 100 TB with thousands of sources spreads
    across the cluster; a single gigantic source is bounded by its own
    budget scan and can be pre-salted upstream if one group dominates.
    Output adds ``n_tokens`` and ``cum_tokens``.
    """
    if n_tokens_col is not None:
        ntok = F.col(n_tokens_col)
    else:
        ntok = F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        )
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = (
        Window.partitionBy(group_col)
        .orderBy(h, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.withColumn("n_tokens", ntok.cast("long")).withColumn(
        "cum_tokens", F.sum("n_tokens").over(w).cast("long")
    )
    return out.filter(F.col("cum_tokens") - F.col("n_tokens") < budget)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size token chunks (training-example
    packing's first half; ``pack_chunks`` below assembles the chunks into
    fixed-budget context-window examples).

    Output: ``(id_col, chunk_id, n_chunk_tokens, chunk)`` with
    ``chunk = the i-th run of chunk_tokens tokens re-joined by spaces``.

    Entirely MAP-SIDE: tokenize (JVM regex) → pre-slice every chunk
    inside ONE transform → posexplode the sliced arrays. No shuffle, no
    Python — chunking a 100 TB corpus is embarrassingly parallel and
    this plan keeps it that way. The per-doc token array lives only
    inside one task's row scope, so memory is bounded by the largest
    single document, not the corpus.

    ORDER MATTERS (r08): the previous shape exploded a chunk INDEX next
    to the full token array and sliced afterwards — each output row
    carried the WHOLE document's tokens, O(doc_tokens × chunks_per_doc)
    materialized bytes, quadratic in doc length. Slicing before the
    explode keeps every token in exactly one output row: sf10
    same-session A/B min-of-2, 24.2 → 5.9 s, identical rows. The
    tokenize itself is evaluated once per row (``__toks`` is a
    materialized projection column, not re-evaluated per transform
    element).
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    step1 = df.select(F.col(id_col), toks.alias("__toks"))
    n = F.size(F.col("__toks"))
    n_chunks = F.ceil(n / F.lit(float(chunk_tokens))).cast("int")
    chunks_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.slice(F.col("__toks"), i * chunk_tokens + 1, chunk_tokens),
    )
    return (
        step1.select(
            id_col, F.posexplode(chunks_arr).alias("chunk_id", "__chunk_toks")
        )
        .filter(F.size("__chunk_toks") > 0)
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size("__chunk_toks").cast("long").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.col("__chunk_toks")).alias("chunk"),
        )
    )


def next_fit_pack(sizes: list[int], budget: int) -> list[int]:
    """The packing walk shared by ``pack_chunks`` and its oracle: greedy
    next-fit over an ordered size sequence. Returns the example id per
    position: append to the current example unless that would exceed
    ``budget``, else open the next one (an item alone above budget gets a
    singleton example). Factored out so its invariants are property-
    testable without Spark."""
    ids: list[int] = []
    ex, fill = 0, 0
    for i, s in enumerate(sizes):
        if i == 0:
            fill = s
        elif fill + s <= budget:
            fill += s
        else:
            ex += 1
            fill = s
        ids.append(ex)
    return ids


def pack_chunks(
    chunks: DataFrame,
    context_tokens: int,
    num_shards: int = 64,
    id_col: str = "doc_id",
    chunk_id_col: str = "chunk_id",
    n_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Pack ``chunk_documents`` / ``bpe_chunk_documents`` output into
    fixed-budget training examples (the second half of example packing —
    closes the IOU in ``chunk_documents``'s docstring).

    Sequential greedy (next-fit) packing: within a shard, walk the chunks
    in deterministic hash order — ``(md5-prefix(doc id), doc id, chunk
    id)``, the same portable ordering family as ``token_budget_quota``, so
    a doc's chunks stay adjacent and in order — and append each chunk to
    the current example unless that would push it past ``context_tokens``,
    in which case a new example starts. Every example is ≤ the budget
    (an oversized single chunk — impossible when ``chunk_tokens <=
    context_tokens`` upstream — becomes a singleton example: it cannot be
    split here), every chunk lands in exactly one example, and the
    assignment is a pure function of (doc id, chunk id, sizes) — stable
    under repartitioning, task retry, and cluster layout.

    Scale shape: one shuffle (hash-partition by shard), then the packing
    walk is per-shard-local inside ``applyInPandas`` — O(rows) with O(1)
    state, no driver materialization. ``num_shards`` bounds per-task
    group size; at 100 TB raise it so each shard's chunk metadata fits a
    task (the walk only needs ids + sizes + text, the same rows it
    returns). Examples are keyed (shard, example_id) — globally unique
    without any cross-shard coordination.

    Output: the input columns plus ``shard`` and ``example_id``.
    """
    import pandas as pd

    out_schema = T.StructType(
        chunks.schema.fields
        + [
            T.StructField("shard", T.IntegerType(), False),
            T.StructField("example_id", T.LongType(), False),
        ]
    )
    in_cols = [f.name for f in chunks.schema.fields]

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["__h", id_col, chunk_id_col], kind="mergesort"
        ).reset_index(drop=True)
        pdf["example_id"] = pd.Series(
            next_fit_pack(list(pdf[n_col]), context_tokens), dtype="int64"
        )
        return pdf[in_cols + ["shard", "example_id"]]

    prepared = chunks.withColumn(
        "shard", _hash_bucket(F.col(id_col), num_shards).cast("int")
    ).withColumn(
        "__h",
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long"),
    )
    # NOTE on task fan-out (r08): do NOT "fix" task balance with an
    # explicit repartition(num_shards, "shard") — hashing a
    # num_shards-valued key into num_shards partitions collides
    # (measured: 64→64 left tasks holding 0-4 shards, task-row ratio
    # 4.0). Let AQE coalesce the groupBy exchange instead: with shards
    # FINER than the expected task count it bin-packs several per task
    # and per-task rows even out; at scale, shards exceed the advisory
    # partition size, coalescing stops, and balance converges to the
    # md5 hash balance (pinned ~1.0 by the shard-balance unit test).
    return prepared.groupBy("shard").applyInPandas(pack, schema=out_schema)


def assemble_examples(
    packed: DataFrame,
    id_col: str = "doc_id",
    chunk_id_col: str = "chunk_id",
    n_col: str = "n_chunk_tokens",
    chunk_col: str = "chunk",
) -> DataFrame:
    """Emit one row per training example from ``pack_chunks`` output:
    member chunks concatenated in the packing walk's order — ``(md5-prefix
    (doc id), doc id, chunk id)``, recomputed here so the assembly order
    is identical to the assignment order — plus chunk count and token
    total.

    One shuffle (groupBy the example key). The sort is per-example via
    ``array_sort`` over collected structs: example sizes are bounded by
    ``context_tokens``/``chunk_tokens`` chunks, so per-group state is a
    few KB regardless of corpus size. Output: ``(shard, example_id,
    n_chunks, example_tokens, example_text)``.
    """
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    member = F.struct(
        h.alias("h"),
        F.col(id_col).alias("id"),
        F.col(chunk_id_col).alias("cid"),
        F.col(chunk_col).alias("chunk"),
    )
    return (
        packed.groupBy("shard", "example_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(n_col).cast("long").alias("example_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(member)), lambda m: m.chunk
                ),
            ).alias("example_text"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """Flag corpus documents sharing any word ``shingle_k``-gram with a
    benchmark/eval set (training-set decontamination).

    Returns ``(id_col, n_hits)`` — corpus docs with >= 1 contaminated
    shingle and how many DISTINCT benchmark shingles they contain. Join the
    result back anti-style to drop them.

    Scale shape: eval benchmarks are tiny next to a 100 TB corpus, so the
    benchmark's distinct shingle set BROADCASTS and the corpus side never
    shuffles its text — gram explosion is map-side, the broadcast hash join
    is map-side, and the only exchange is the per-doc hit count keyed by
    doc id. If the "benchmark" is itself huge, swap the broadcast for an
    equi-join on the shingle hash (same plan as LSH bucket joins).
    """
    from py_etl_spark.operators.dedup import exploded_shingles

    bench_sh = (
        exploded_shingles(benchmark, text_col, id_col, shingle_k)
        .select("shingle")
        .distinct()
    )
    corpus_sh = exploded_shingles(corpus, text_col, id_col, shingle_k)
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.countDistinct("shingle").cast("long").alias("n_hits"))
    )


def sample_mixture(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Mixture-weighted downsampling: keep each row with its source's
    probability, decided by a hash of the row id — the "20 % of web, 100 %
    of books" step that turns a curated pool into a training mix.

    Like every sampling choice in this module the decision is
    ``hash(id, salt)``, never ``rand()``: task retries, repartitioning and
    re-runs keep the exact same rows, and a different ``salt`` yields an
    independent draw (the hash is salted so the decision is uncorrelated
    with ``deterministic_split``'s buckets over the same ids). Rates are
    quantized to millionths and compared as integers, so any engine
    computing md5 reproduces the sample bit-for-bit.

    Map-side only: no shuffle, no sampling nondeterminism; the filter
    composes with scan pruning upstream of any expensive operator.
    """
    thresholds = {
        s: int(round(r * 1_000_000)) for s, r in rates.items()
    }
    for s, t in thresholds.items():
        if not 0 <= t <= 1_000_000:
            raise ValueError(f"rate for {s!r} outside [0, 1]")
    bucket = _hash_bucket(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)), 1_000_000
    )
    thr = None
    for s, t in thresholds.items():
        cond = F.when(F.col(source_col) == s, F.lit(t))
        thr = cond if thr is None else thr.when(F.col(source_col) == s, F.lit(t))
    default_thr = F.lit(int(round(default_rate * 1_000_000)))
    thr = default_thr if thr is None else thr.otherwise(default_thr)
    return df.filter(bucket < thr)


def sample_stratified_exact(
    df: DataFrame,
    n_per_stratum: int,
    strata_cols: tuple[str, ...] = ("source",),
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exact-count stratified sampling: the ``n_per_stratum`` rows of
    each stratum with the smallest salted id-hashes — a uniform draw
    without replacement, but with a GUARANTEED per-stratum count
    (eval-set construction wants "exactly 500 per language", which
    rate-based :func:`sample_mixture` can only hit in expectation).

    Same determinism doctrine as every sampler here: the order key is
    ``md5(id:salt)``, never ``rand()`` — task retries, repartitioning and
    re-runs pick the identical sample, a different salt draws an
    independent one, and any engine reproduces it bit-for-bit.
    Ties are impossible for distinct ids (hash injective on the 15-hex
    prefix up to astronomically unlikely collisions, and ``id`` breaks
    even those).

    One shuffle: the per-stratum top-n window. At extreme per-stratum
    cardinality the same refactor as KMV applies: local per-partition
    top-n, then re-top-n — safe because "n smallest of n-smallest
    unions" composes.

    Output: the sampled rows (all input columns) plus ``sample_rank``
    (1-based within the stratum).
    """
    from pyspark.sql import Window as W

    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    w = W.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def sample_weighted(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wrs",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    exponential keys: each row gets ``key = u^(1/w)`` with ``u`` a
    deterministic hash-uniform in [0,1) from ``md5(id:salt)``, and the
    sample is the global top-k by key (inclusion probability ∝ weight,
    exactly the A-ES result). The curation use: sample a token-weighted
    or quality-weighted subset of a corpus reproducibly — task retries,
    repartitioning, and re-runs all see the same sample because the
    "randomness" is a hash of the row id, never ``rand()``.

    Scale: the key is map-side arithmetic; top-k compiles to
    TakeOrderedAndProject (per-partition heaps of k, one k-row merge on
    the driver side of the exchange) — no global sort, no shuffle of
    the corpus. Rows with NULL or non-positive weight are excluded (they
    have zero inclusion probability in A-ES semantics).

    Ordering note: the float key is used ONLY for selection/ordering;
    ties are broken by id so the emitted id set is stable cross-engine
    (a 1-ulp ``pow`` divergence would need two keys within 1 ulp to
    flip membership — measure-zero with continuous weights).
    """
    w = F.col(weight_col).cast("double")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = h.cast("double") / F.lit(float(1 << 60))
    key = F.pow(u, F.lit(1.0) / w)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__wrs_key", key)
        .orderBy(F.col("__wrs_key").desc(), F.col(id_col))
        .limit(k)
        .drop("__wrs_key")
    )


def interleave_sources(
    df: DataFrame,
    weights: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic stride-scheduled interleaving — the training-order
    mixer: emit documents so that over any prefix of the stream each
    source appears in proportion to its integer weight (src weight 4 :
    weight 1 ⇒ 4 docs of the former per 1 of the latter, evenly spread,
    not front-loaded the way sorting by source would be).

    Classic stride scheduling in EXACT integer arithmetic: within each
    source, docs get a hash-shuffled rank r (md5(id:salt) — stable under
    retries/repartition, never ``rand()``); the global order key is
    ``pass = r · (L / w_source)`` with ``L = lcm(weights)``, all BIGINT,
    ties broken (source, r). Sources absent from ``weights`` are
    excluded (weight 0).

    Plan: one per-source rank window (hash-partitioned by source — the
    single shuffle), then the order key is map-side arithmetic. The
    ordered stream is emitted with ``mix_pos`` via a second window over
    the already-computed key; at 100 TB you'd instead write sorted
    by ``mix_key`` (range exchange + streaming write) and let the
    trainer read in file order — the key, not the materialized
    ordinal, is the contract.
    """
    import math

    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive integers")
    lcm = math.lcm(*weights.values())
    stride = F.create_map(
        *[
            x
            for s, w in sorted(weights.items())
            for x in (F.lit(s), F.lit(lcm // w))
        ]
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    rw = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    ranked = (
        df.filter(F.col(source_col).isin(list(weights)))
        .withColumn("__r", F.row_number().over(rw).cast("long"))
        .withColumn("__stride", stride[F.col(source_col)])
        .withColumn("mix_key", F.col("__r") * F.col("__stride"))
    )
    return ranked.select(
        id_col, source_col, F.col("__r").alias("source_rank"), "mix_key"
    )


def augment_word_dropout(
    df: DataFrame,
    p_pct: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "aug",
    out_col: str = "aug_text",
) -> DataFrame:
    """Deterministic word-dropout augmentation — the text-side analog of
    feature dropout: token i of document d is dropped iff
    ``md5(d:i:salt) % 100 < p_pct``. Hash-keyed, never ``rand()``, so
    the augmented corpus is bit-reproducible (same rows on retry /
    repartition / regeneration) and a different ``salt`` yields an
    independent augmentation epoch — N salts = N deterministic epochs.

    Map-side only: the drop decision is an index-aware array filter
    (Spark's two-argument lambda), zero shuffles at any scale. Appends
    ``n_tokens``, ``n_dropped``, ``out_col``.
    """
    toks = F.split(F.col(text_col), " ")

    def keep(tok, i):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col(id_col).cast("string"),
                        i.cast("string"),
                        F.lit(salt),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return h % 100 >= p_pct

    kept = F.filter(toks, keep)
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_dropped", F.size(toks) - F.size(kept))
        .withColumn(out_col, F.array_join(kept, " "))
    )


def truncate_head_tail(
    df: DataFrame,
    head_tokens: int,
    tail_tokens: int,
    text_col: str = "text",
    out_col: str = "trunc_text",
    marker: str = " ... ",
) -> DataFrame:
    """Head+tail truncation to a token budget — the standard long-doc
    strategy when the middle is the least informative part (beats
    head-only on documents whose conclusions matter): keep the first
    ``head_tokens`` and last ``tail_tokens`` whitespace tokens joined by
    ``marker``; documents within budget pass through verbatim.

    Pure array-slice Column expressions — map-side, zero shuffles,
    deterministic. Appends ``n_tokens``, ``was_truncated``, ``out_col``.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    budget = head_tokens + tail_tokens
    head = F.slice(toks, 1, head_tokens)
    tail = F.slice(toks, -tail_tokens, tail_tokens)
    truncated = F.concat(
        F.array_join(head, " "), F.lit(marker), F.array_join(tail, " ")
    )
    return (
        df.withColumn("n_tokens", n)
        .withColumn("was_truncated", n > budget)
        .withColumn(
            out_col,
            F.when(n > budget, truncated).otherwise(F.col(text_col)),
        )
    )
