"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these):

- **Exact**: one hash-shuffle on a 16-byte fingerprint — the minimum
  possible; at 100 TB the shuffle carries only (fingerprint, doc_id).
- **MinHash+LSH**: signatures are computed map-side (one pass over tokens,
  k hash functions via the standard (a·x+b) mod p family over a single md5
  base hash); candidate generation shuffles on (band_id, band_hash) buckets
  only — never all-pairs. Verification joins only within buckets.
- **SimHash**: 64-bit signature map-side; near-dup candidates via banding
  the signature into 4×16-bit chunks (Hamming ≤ 3 ⟹ one chunk equal).
- All-pairs Jaccard is O(n²) and exists only as a small-n verification
  path — the LSH bucket join is the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from py_etl_spark.functions.numeric import float_round
from py_etl_spark.operators.textstats import fingerprint_md5

# Permutation modulus for the MinHash affine family: a prime JUST ABOVE
# the 32-bit base-hash domain, not the classic Mersenne 2^61-1.
#
# r11 fix (found by the hash-family structure unit): with p = 2^61-1 and
# h < 2^32, (a*h + b) mod p NEVER WRAPS for a*h + b < p — i.e. for every
# h below ~2^31 under a < 2^30 — so on that half of the domain every
# "permutation" is the SAME monotone map and all k signature slots are
# decided by the one globally-minimum base hash. Measured on a seeded
# J=0.77 near-dup corpus: signature agreement was all-or-nothing (32/32
# when the min-hash shingle was shared, 6/32 when not; expectation under
# independent permutations is ~J*k = 24.6), and 2 of 6 seeded pairs had
# ZERO matching LSH bands — silent recall loss that only worsens with
# corpus scale. With p = 2^32 + 15 (prime) and a in [1, 2^31), a*h
# wraps ~a/2 times across the domain, decorrelating the permutations;
# measured agreement lands within a few slots of J*k for both hash
# families. Overflow-safe: (2^31-1)*(2^32-1) + (p-1) < 2^63, on Spark
# ANSI longs and DuckDB BIGINTs alike (the oracle replays the same
# arithmetic — queries._affine_coeffs/_minhash_lsh_oracle_sql share
# these constants via affine_coeffs/PERM_PRIME).
PERM_PRIME = (1 << 32) + 15


def affine_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """The (a, b) coefficients of the MinHash permutation family —
    the single source of truth shared by minhash_signatures and the
    DuckDB oracle builders. a in [1, 2^31) (overflow bound, see
    PERM_PRIME), b in [0, PERM_PRIME)."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 31), rng.randrange(0, PERM_PRIME))
        for _ in range(num_hashes)
    ]


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup groups: fingerprint → (keeper=min id, n_dupes).

    One shuffle on the md5 fingerprint; map-side partial aggregation makes
    the shuffle per-distinct-key, not per-row.
    """
    return (
        df.select(fingerprint_md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).cast("long").alias("keeper"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def deduplicate_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one doc (min id) per exact-duplicate group."""
    w_keep = exact_duplicates(df, text_col, id_col).select(
        F.col("keeper").alias(id_col)
    )
    return df.join(w_keep, id_col, "left_semi")


def _norm_tokens(text_col: str) -> F.Column:
    """Normalized word tokens: maximal ``[a-z0-9]`` runs of the lowered
    text, in order; a text with NO such runs yields ``[""]``; NULL stays
    NULL. Oracle spelling (DuckDB, all 4 shingle-family oracles):
    ``coalesce(nullif(list_filter(string_split_regex(lower(text),
    '[^a-z0-9]+'), x -> x <> ''), []), [''])`` under a NULL-passthrough
    CASE.

    r09: this replaced the r02–r08 spelling
    ``split(trim(regexp_replace(lower(trim(text)), '[^a-z0-9\\s]', ' ')),
    '\\s+')`` on BOTH sides of the contract at once. The regexp_replace
    idiom is a hidden full rewrite pass over every corpus byte —
    measured at the 100× replica: 21.2 s vs 1.45 s for the identical
    26M-token stream (the r07 `_alpha_tokens` lesson on the `[a-z0-9]`
    alphabet); lower() still runs FIRST, so chars whose lowercase maps
    into the class (U+212A → k) are kept exactly as before. The old
    spelling also had a wart the new contract drops: SQL ``trim`` strips
    spaces only, so text made of other whitespace ('\\t\\n') tokenized
    to ['',''] instead of ['']. Token streams are identical for every
    text containing ≥1 alnum char (verified corpus-wide at sf10: zero
    diffs) and pinned for random Unicode by
    test_norm_tokens_matches_contract_spelling."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )
    return F.when(F.size(toks) == 0, F.array(F.lit(""))).otherwise(toks)


def _shingles(text_col: str, k: int = 3) -> F.Column:
    """Word k-shingles of normalized text as array<string> (small-array
    path; the hot path is :func:`exploded_shingles` below)."""
    toks = _norm_tokens(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def exploded_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, shingle) rows, fully MAP-SIDE: k whole-array slices zipped
    and exploded (the lm._pairs idiom, generalized to k).

    r12 (guide §2.3/§2.4): the r09–r11 shape was posexplode + a doc-keyed
    lead window — one exchange AND a per-doc sort of the ENTIRE TOKEN
    STREAM (~corpus bytes on the wire) before any shingle exists; SCALING
    §11 attributed 46% of minhash sf10 cost to it. Slicing the token
    array k ways at the top level and zipping is all codegen'd JVM
    (Slice/ArraysZip/Generate — NOT the per-element interpreted
    transform+slice HOF that r09 measured 8× slower), produces the
    identical shingle multiset in the identical order, and leaves the
    downstream signature aggregation free to do MAP-SIDE partial
    aggregation — its exchange then carries per-(task, doc) partials
    instead of every token.

    Contract (unchanged, oracle-pinned): docs with ≥ k tokens emit one
    shingle per window position; docs with 1 ≤ n < k tokens emit exactly
    one shingle (all tokens joined); NULL text emits nothing.
    """
    # Materialize the token array in its own projection: the expensive
    # tokenizer is referenced k+2 times below, and a separate Project
    # keeps it evaluated once per row (CollapseProject does not re-inline
    # non-cheap multiply-referenced aliases).
    base = df.select(F.col(id_col), _norm_tokens(text_col).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    zipped = F.arrays_zip(
        *[
            F.slice(toks, i + 1, n - (k - 1)).alias(f"w{i}")
            for i in range(k)
        ]
    )
    shingle_arr = (
        F.when(n >= k, zipped)
        # 1 ≤ n < k: one struct whose fields cover the whole doc (the
        # concat below skips NULL fields, matching concat_ws over all
        # tokens); n is NULL for NULL text → neither branch → NULL →
        # explode emits nothing, same as posexplode of a NULL array.
        .when(
            n >= 1,
            F.array(
                F.struct(
                    *[
                        # try_: index may exceed n here by construction
                        # (n < k); ANSI element_at would throw
                        F.try_element_at(toks, F.lit(i + 1)).alias(f"w{i}")
                        for i in range(k)
                    ]
                )
            ),
        )
    )
    ex = base.select(F.col(id_col), F.explode(shingle_arr).alias("p"))
    return ex.select(
        id_col,
        F.concat_ws(" ", *[F.col(f"p.w{i}") for i in range(k)]).alias(
            "shingle"
        ),
    )


def _base_hash(col, family: str = "xxhash64"):
    """32-bit base hash of a shingle.

    - ``xxhash64`` (production): JVM-native, codegen'd, folded to 32 bits so
      the affine permutations can't overflow a long.
    - ``md5`` (portable): first 8 hex chars of md5 — reproducible in any
      engine (DuckDB: ``('0x' || substr(md5(x),1,8))::BIGINT``), used by the
      oracle-checked registry queries. ~6× slower; same plan shape.
    """
    if family == "md5":
        return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    return F.pmod(F.xxhash64(col), F.lit(1 << 32)).cast("long")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per doc: array<long> of length ``num_hashes``.

    Entirely map-side: shingle → base hash → k affine permutations → min.
    """
    coeffs = affine_coeffs(num_hashes, seed)

    # explode → hash → groupBy(min × k): a small (doc_id, k·long) shuffle
    # with map-side combine; far cheaper to codegen than k nested
    # array-transform trees, and the shuffle payload is exactly the
    # signature. Scales linearly in corpus size. Duplicate shingles don't
    # affect min(), so no distinct pass is needed.
    exploded = exploded_shingles(df, text_col, id_col, shingle_k).select(
        id_col, _base_hash(F.col("shingle"), hash_family).alias("h")
    )
    aggs = [
        F.min((F.col("h") * a + b) % PERM_PRIME).alias(f"mh_{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    per_doc = exploded.groupBy(id_col).agg(*aggs)
    return per_doc.select(
        F.col(id_col),
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("minhash"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    seed: int = 42,
    hash_family: str = "xxhash64",
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding.

    Shuffle key = (band, hash-of-band-slice): only docs agreeing on a full
    band co-locate. Returns distinct (id_a < id_b) candidate pairs.

    **Skew guard**: a degenerate bucket (e.g. every empty/boilerplate doc
    hashing identically) turns the self-join into O(n²) on one task. Buckets
    larger than ``max_bucket_size`` are dropped before the join (one window
    count on the join key — no extra shuffle). Members of a dropped bucket
    are near-identical to each other, so they still pair up in their other
    ``bands - 1`` buckets, and true full duplicates are exact-dedup's job
    (:func:`exact_duplicates`), not LSH's. ``None`` disables the cap.

    With ``hash_family="md5"`` the bucket key is the raw band slice (an
    array equi-join key) instead of its xxhash64 — collision-free and
    reproducible in the cross-engine oracle; the production path keeps the
    compact 8-byte bucket hash for the shuffle.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_k, seed, hash_family
    )

    def band_key(b):
        vals = [
            F.element_at("minhash", b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        if hash_family == "md5":
            return F.array(*vals).alias("bucket")
        return F.xxhash64(*vals).alias("bucket")

    banded = sigs.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), band_key(b)) for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    if max_bucket_size is not None:
        from pyspark.sql import Window as W

        bucket_n = F.count(F.lit(1)).over(W.partitionBy("band", "bucket"))
        banded = (
            banded.withColumn("__bn", bucket_n)
            .filter(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
        )
    lhs = banded.alias("l")
    rhs = banded.alias("r")
    return (
        lhs.join(
            rhs,
            (F.col(f"l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster candidate pairs into duplicate groups: (node, cluster_id)
    where cluster_id = min node id reachable in the undirected pair graph.

    Min-label propagation over the edge-incident subgraph: each iteration
    every node takes the min of its own label and its neighbours' labels.
    The edge list is materialized hash-partitioned on the probe key and
    labels stay hash-partitioned on node (localCheckpoint preserves
    outputPartitioning), so an iteration costs ONE exchange bounded by
    2·|E| rows (the neighbour-min groupBy) — the two label joins are
    co-partitioned. Isolated nodes never ride the loop; they are attached
    once at the end as singletons. Converges in O(component diameter)
    iterations; near-dup graphs are unions of small cliques (diameter
    ≲ 2), so the loop exits after 2–3 rounds in practice. Lineage is cut
    with a LAZY ``localCheckpoint`` per iteration so the plan stays
    bounded and the convergence-sum job doubles as the materialization
    job — one driver round trip per iteration (on a cluster:
    ``checkpoint`` against the checkpoint dir). The first min-round is
    fused into label initialization (``least(node, min(nbr))`` — exactly
    what one propagate round over identity labels computes), so
    ``max_iter`` bounds the rounds AFTER that fused one.

    Convergence witness: labels are MONOTONE non-increasing (every
    update is a min), so Σ labels strictly decreases on any effective
    iteration and ``sum(new) == sum(old)`` ⟺ fixed point. One 1-row
    decimal(38,0) aggregate per iteration (exact for any n·|id|, no
    int64 wrap) — cheaper than the old two-label-set join + count.

    ``nodes``: one-column DataFrame of all node ids; isolated nodes (no
    edges) become singleton clusters and edge endpoints outside ``nodes``
    are dropped (it defines the output universe). Defaults to the ids
    present in ``edges``.
    """
    und = edges.select(
        F.col(src).cast("long").alias("node"), F.col(dst).cast("long").alias("nbr")
    ).union(
        edges.select(
            F.col(dst).cast("long").alias("node"), F.col(src).cast("long").alias("nbr")
        )
    ).repartition(F.col("nbr")).localCheckpoint(eager=False)
    # ^ materialized once: edges are typically the output of an expensive
    # candidate pipeline (LSH banding); without the checkpoint every
    # iteration's action would re-run that whole lineage. Partitioned by
    # ``nbr`` — the propagate join's key — and localCheckpoint PRESERVES
    # outputPartitioning (LogicalRDD keeps it), so the edge side never
    # re-shuffles inside the loop.
    #
    # r09 shape: propagation runs over EDGE-INCIDENT nodes only. An
    # isolated node can never change its label, yet the r08 union-based
    # propagate shuffled every corpus node's label row through every
    # iteration (n + 2|E| rows per groupBy). Now each iteration is one
    # co-partitioned join (und by nbr ⋈ labels by node, no exchange) +
    # one groupBy over ≤2|E| rows + one co-partitioned left join back —
    # a single bounded-by-the-edge-set exchange per iteration; isolated
    # nodes from ``nodes`` are attached once at the end as singletons.
    #
    # r12 driver-round-trip pass (guide §5 — the loop's wall at bench
    # scale was DRIVER job dispatch, build 2.8 s vs exec 0.09 s at
    # sf0.1, not executor work):
    # - iteration 1 is FUSED into label initialization: from identity
    #   labels, one propagate round computes exactly
    #   least(node, min(nbr)) — so initialize with that directly. The
    #   label trajectory from here on is bit-identical to the old
    #   (identity-init + first propagate) sequence, one round earlier.
    #   (``max_iter`` now counts rounds AFTER the fused first one; the
    #   convergence contract is unchanged because the budget grew by
    #   exactly the round that init absorbed.)
    # - every localCheckpoint is LAZY (eager=False): the lineage is
    #   truncated immediately, and the convergence-witness sum job
    #   below doubles as the materialization job — one driver round
    #   trip per iteration instead of two (and the candidate pipeline
    #   behind ``edges`` still executes exactly once, now inside the
    #   first sum job rather than a separate eager checkpoint job).
    labels = (
        und.groupBy("node")
        .agg(F.min("nbr").alias("__nl"))
        .select("node", F.least("node", F.col("__nl")).alias("label"))
        .localCheckpoint(eager=False)
    )
    # Name-based (USING) joins throughout: labels and und share lineage,
    # and column-expression joins on same-exprId attributes fail Spark's
    # ambiguous-self-join check; USING joins are auto-deduplicated.

    def label_sum(lbl: DataFrame):
        return lbl.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    def propagate(lbl: DataFrame) -> DataFrame:
        nbr_min = (
            und.join(
                lbl.select(
                    F.col("node").alias("nbr"), F.col("label").alias("nl")
                ),
                "nbr",
            )
            .groupBy("node")
            .agg(F.min("nl").alias("nl"))
        )
        return (
            lbl.join(nbr_min, "node", "left")
            # least() skips NULLs, so a node whose neighbours are all
            # higher-labelled (or absent) keeps its own label
            .select("node", F.least("label", "nl").alias("label"))
            # lazy: label_sum's one job materializes the blocks (r12)
            .localCheckpoint(eager=False)
        )

    def finish(lbl: DataFrame) -> DataFrame:
        out = lbl.select("node", F.col("label").alias("cluster_id"))
        if nodes is not None:
            id_col = nodes.columns[0]
            # singletons attached ONCE here instead of riding every
            # iteration; ``nodes`` also bounds the output universe (edge
            # endpoints outside it are dropped)
            out = (
                nodes.select(F.col(id_col).cast("long").alias("node"))
                .join(out, "node", "left")
                .select(
                    "node",
                    F.coalesce("cluster_id", F.col("node")).alias(
                        "cluster_id"
                    ),
                )
            )
        return out

    prev_sum = label_sum(labels)
    for _ in range(max_iter):
        labels = propagate(labels)
        new_sum = label_sum(labels)
        if new_sum == prev_sum:
            return finish(labels)
        prev_sum = new_sum
    # The last allowed iteration still changed labels — but it may have
    # been the one that COMPLETED propagation (converged, just not yet
    # verified by a no-change round). One confirmation iteration settles
    # it: unchanged → the labels are correct, return them; changed →
    # the diameter genuinely exceeds the budget.
    confirm = propagate(labels)
    if label_sum(confirm) == prev_sum:
        return finish(confirm)
    # A quiet fall-through here would hand back PARTIALLY propagated
    # labels — components larger than max_iter hops would be silently
    # split into several clusters, and a dedup consumer would keep
    # duplicates with no signal anything went wrong. Fail loudly
    # instead; near-dup graphs are unions of small cliques (diameter
    # ≲ 2), so hitting this means the input is not the expected shape.
    raise RuntimeError(
        f"connected_components did not converge in max_iter={max_iter} "
        "iterations (confirmation round still changed labels — the "
        "component diameter exceeds the bound); raise max_iter (cost "
        "is 2 shuffles per extra iteration)"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Jaccard over word k-shingles for candidate pairs.

    With ``candidates`` (from LSH) the join is bucket-pruned; without, it
    falls back to all-pairs — correct but O(n²), small-n verification only.
    """
    sh = exploded_shingles(df, text_col, id_col, shingle_k).groupBy(id_col).agg(
        F.collect_set("shingle").alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    if candidates is not None:
        pairs = candidates.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.select(
            "id_a",
            "id_b",
            # int-ratio lattice → bit-reproducible float round
            # (functions/numeric.py), not F.round
            float_round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """60-bit SimHash per doc from token hashes, map-side only.

    For each bit position, sum ±1 over token hashes; sign → bit.

    ``hash_family``: ``xxhash64`` (production, JVM codegen'd, masked to 60
    bits) or ``md5`` (portable: first 15 hex chars — reproducible in DuckDB
    as ``('0x' || substr(md5(tok),1,15))::BIGINT`` for the oracle).
    """
    # explode tokens → 60-bit hash → per-bit ±1 votes aggregated map-side;
    # same shuffle shape as minhash. (Unigram shingles ⇒ plain explode, no
    # window needed; simhash counts multiplicity.)
    if hash_family == "md5":
        h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(F.col("tok")).bitwiseAND(F.lit((1 << 60) - 1))
    exploded = df.select(
        F.col(id_col), F.explode(_norm_tokens(text_col)).alias("tok")
    ).select(id_col, h.alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{i}")
        for i in range(60)
    ]
    per_doc = exploded.groupBy(id_col).agg(*votes)
    sim = F.lit(0).cast("long")
    for i in range(60):
        sim = sim + F.shiftleft(
            F.when(F.col(f"v_{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0)), i
        )
    return per_doc.select(F.col(id_col), sim.alias("simhash"))


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunks: int = 4,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Hamming-≤(chunks-1) candidates by banding the simhash into chunks
    (pigeonhole: close signatures share at least one exact chunk).

    Same hot-bucket cap as :func:`minhash_lsh_candidates` — a degenerate
    chunk value shared by n docs would otherwise make an O(n²) task."""
    sigs = simhash64(df, text_col, id_col)
    width = 60 // chunks
    mask = (1 << width) - 1
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftright("simhash", c * width).bitwiseAND(F.lit(mask)).alias("piece"),
                )
                for c in range(chunks)
            ])
        ).alias("cc"),
    ).select(id_col, "cc.chunk", "cc.piece")
    if max_bucket_size is not None:
        from pyspark.sql import Window as W

        n = F.count(F.lit(1)).over(W.partitionBy("chunk", "piece"))
        banded = (
            banded.withColumn("__bn", n)
            .filter(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
        )
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.piece") == F.col("r.piece"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    segment_words: int = 10,
    max_occurrences: int = 1,
) -> DataFrame:
    """Corpus-wide duplicated-segment removal (the CCNet/RefinedWeb
    line-level dedup, generalized to corpora without line structure).

    Web-pipeline line dedup drops every LINE that repeats across the
    corpus (boilerplate navigation, cookie banners, license headers)
    while keeping the documents themselves. Here a "segment" is a fixed
    run of ``segment_words`` whitespace tokens — for line-structured text,
    split on newlines upstream and pass ``segment_words`` large enough to
    keep each line whole.

    A segment occurring more than ``max_occurrences`` times corpus-wide is
    removed from EVERY document; the survivors are re-joined in original
    order. Output: ``(id_col, n_segments, n_kept, text_dedup)``.

    Plan (r12 shape):
      1. segmentation is map-side (whitespace split → explode block index
         → slice), memory bounded by the largest single document;
      2. the corpus-wide occurrence count is a map-side-combined
         ``groupBy(seg)`` whose exchange carries one (seg, n) partial
         per task; only segments with occ > ``max_occurrences`` (the
         duplicated set — boilerplate-scale, far below the corpus)
         survive into a LEFT join against the payload, which AQE
         converts to broadcast-hash when the set fits (r11's q5 rule:
         AQE owns the data-dependent broadcast decision);
      3. reassembly groups by doc id — the one unavoidable payload
         shuffle — collecting surviving ``(seg_idx, seg)`` structs and
         re-joining in index order; duplicated segments are dropped by
         the collect's null-skip, so kept/total counts ride the same
         aggregate.
    vs the r02–r11 window-over-seg shape this removes the payload's
    second full exchange-and-SORT by the segment string; the join
    attaches the same membership bit with a hash probe. At 100 TB the
    count key can be swapped for ``md5(seg)`` to aggregate 16-byte
    fingerprints instead of raw strings; the plain-text key stays the
    portable spelling the DuckDB oracle reproduces verbatim.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_segs = F.ceil(F.size(toks) / F.lit(float(segment_words))).cast("int")
    segs = (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_segs - 1, F.lit(0)))
            ).alias("seg_idx"),
        )
        .select(
            id_col,
            F.col("seg_idx").cast("long").alias("seg_idx"),
            F.concat_ws(
                " ",
                F.slice(
                    F.col("__toks"),
                    F.col("seg_idx") * segment_words + 1,
                    F.lit(segment_words),
                ),
            ).alias("seg"),
        )
        .filter(F.col("seg") != "")
    )
    # r12 (guide §2.3 "aggregate before you shuffle" + §3.2 semi-join
    # pruning): the corpus-wide count was a WINDOW over the segment text
    # — the full (doc, idx, seg) payload exchanged AND sorted by the
    # segment string just to attach a count. Only membership in the
    # DUPLICATED set (occ > max_occurrences) matters downstream, so:
    # count per segment with map-side partial aggregation (the exchange
    # carries one (seg, n) partial per task, not every row), keep the
    # heavy hitters, and LEFT-join the payload against that set. The
    # duplicated-segment set is orders of magnitude smaller than the
    # corpus (boilerplate, not content) — AQE sizes it at runtime and
    # converts the join to broadcast-hash when it fits (the q5 lesson:
    # AQE owns that decision; a static broadcast hint of a side that
    # grows with the corpus is the §3.1 anti-pattern). The payload's
    # seg-keyed sort is gone either way — the join is hash, not window.
    dups = (
        segs.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("__occ"))
        .filter(F.col("__occ") > max_occurrences)
        .select("seg", F.lit(True).alias("__dup"))
    )
    kept = F.when(F.col("__dup").isNull(), F.struct("seg_idx", "seg"))
    return (
        segs.join(dups, "seg", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.count(kept).alias("n_kept"),
            F.concat_ws(
                " ", F.array_sort(F.collect_list(kept)).getField("seg")
            ).alias("text_dedup"),
        )
    )


def duplicate_span_mask(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 5,
    max_occurrences: int = 1,
) -> DataFrame:
    """Substring-level duplicate removal (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" — ExactSubstr): mask every
    token that lies inside a ``span_words``-token window occurring more
    than ``max_occurrences`` times corpus-wide.

    Differs from :func:`segment_dedup` (CCNet-style line/block dedup) in
    granularity: blocks there are DISJOINT, so a duplicated passage that
    straddles a block boundary survives; here shingles slide at stride 1,
    so any duplicated run of ≥ ``span_words`` tokens is caught wherever
    it starts, and partially-duplicated documents keep their unique
    remainder — the suffix-array semantics, reached by sliding n-grams
    instead of a suffix array (which doesn't distribute).

    Removal policy matches segment_dedup: a duplicated span is removed
    from EVERY document (boilerplate semantics), not all-but-one.

    Output: ``(id_col, n_tokens, n_dup_tokens, text_dedup)`` where
    ``n_dup_tokens`` counts distinct masked positions and ``text_dedup``
    re-joins the surviving tokens in order.

    Plan: shingling is posexplode + a doc-keyed lead window (the same
    shape exploded_shingles uses — r09: the previous
    explode-start-indices + per-row ``slice``/``concat_ws`` build was
    measured 4.3× slower at the 100× replica, 11.8 vs 2.7 s for the
    identical 25M span rows: the dynamic-offset array ops run outside
    whole-stage codegen, while posexplode+lead is fully codegen'd and
    its doc-keyed exchange carries one token per row); the corpus-wide
    occurrence count is one window shuffle keyed on the shingle text;
    coverage explodes only DUPLICATED instances (×span_words on the
    duplicated subset, not the corpus) into one doc-keyed agg; one
    doc-keyed join re-attaches coverage to the full corpus. None of the
    exchanges carries more than one token (or one duplicated position)
    per row. At 100 TB swap the occurrence-window key for ``md5(seg)``
    exactly as segment_dedup documents.
    """
    from pyspark.sql import Window as W

    t = F.trim(F.col(text_col))
    toks = F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    n = F.size(toks)
    ex = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    w_doc = W.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("tok", i).over(w_doc) for i in range(1, span_words)]
    n_toks = F.count(F.lit(1)).over(W.partitionBy(id_col))
    spans = (
        ex.select(
            id_col,
            "pos",
            F.concat_ws(" ", "tok", *leads).alias("seg"),
            n_toks.alias("__n"),
        )
        .filter(F.col("pos") <= F.col("__n") - span_words)
        .select(
            id_col, F.col("pos").cast("long").alias("start"), "seg"
        )
    )
    # r12 (same rewrite as segment_dedup, guide §2.3/§3.2): duplicated-
    # span membership via a map-side-combined groupBy(seg) + inner join
    # against the (small) duplicated set, instead of windowing the full
    # span payload over the seg key (which exchanged AND sorted every
    # span row by its text). AQE broadcasts the dup set at runtime when
    # it fits.
    dups = (
        spans.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("__occ"))
        .filter(F.col("__occ") > max_occurrences)
        .select("seg")
    )
    covered = (
        spans.join(dups, "seg")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("start"), F.col("start") + span_words - 1)
            ).alias("pos"),
        )
        .groupBy(id_col)
        .agg(
            F.array_sort(F.array_distinct(F.collect_list("pos"))).alias(
                "__cov"
            )
        )
    )
    cov = F.coalesce(F.col("__cov"), F.array().cast("array<long>"))
    # pyspark passes (element, index) to a 2-arg lambda — here that's
    # exactly what we want: keep tokens whose 0-based index is unmasked
    keep = F.filter(
        toks, lambda x, i: ~F.array_contains(cov, i.cast("long"))
    )
    return (
        df.join(covered, id_col, "left")
        .select(
            id_col,
            n.cast("long").alias("n_tokens"),
            F.size(cov).cast("long").alias("n_dup_tokens"),
            F.concat_ws(" ", keep).alias("text_dedup"),
        )
    )


def incremental_exact_dedup(
    batch: DataFrame,
    ledger: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Daily-crawl dedup: admit only batch docs whose fingerprint is new
    BOTH within the batch (min-id wins) and against the corpus ledger.

    ``ledger`` is the running set of admitted fingerprints (one column,
    ``fingerprint``). Returns ``(fresh, updated_ledger)`` where ``fresh``
    is the admitted (fingerprint, id) pairs and ``updated_ledger`` the
    ledger to persist for the next batch (e.g. via VersionedState).

    Scale: both sides key on the 16-byte fingerprint — the batch pays one
    groupBy shuffle (map-side partial min) and the anti-join co-partitions
    with the ledger's layout; the full corpus TEXT is never re-read, only
    the fingerprint ledger, which is what makes day-N dedup O(day) instead
    of O(corpus).
    """
    batch_best = (
        batch.select(
            fingerprint_md5(F.col(text_col)).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(F.min(id_col).cast("long").alias(id_col))
    )
    fresh = batch_best.join(
        ledger.select("fingerprint"), "fingerprint", "left_anti"
    )
    updated = ledger.select("fingerprint").union(
        fresh.select("fingerprint")
    ).distinct()
    return fresh, updated


def keep_canonical_per_cluster(
    clusters: DataFrame,
    docs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Canonical-representative selection — the step after clustering
    that near-dup dedup exists for: in each cluster keep exactly one
    document (highest ``quality_col``, ties to the smallest id — a total
    order, so the survivor set is deterministic) and mark the rest as
    drops. Feeding a quality score here (Gopher gate, LM bits,
    compression ratio) is what turns "dedup" into "dedup keeping the
    BEST copy" instead of an arbitrary one.

    Plan: one cluster-keyed window shuffle over the (id, cluster,
    quality) triples — the document TEXT is never shuffled; join the
    surviving ids back to the corpus afterwards (hash or broadcast
    depending on survivor count). Appends ``is_canonical``.
    """
    scored = clusters.join(
        docs.select(F.col(id_col), F.col(quality_col)), id_col
    )
    w = Window.partitionBy(cluster_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return scored.withColumn(
        "is_canonical", F.row_number().over(w) == 1
    )
