"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: exact baseline. Queries are broadcast (they are
  small by construction); the corpus scan stays partitioned, so the plan is
  a broadcast-nested-loop + per-partition top-k — no corpus shuffle. At
  100 TB this is the pattern for "score everything against k probes".
- LSH-bucketed (random hyperplane signs) and IVF (coarse centroids) variants
  prune the candidate set with an equi-join on bucket id — the scale path
  when the query set is large.

Dot products use built-in higher-order functions (zip_with + aggregate) in
double precision — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from py_etl_spark.plans.width import exchange_width


def _dot(a, b, dim: int | None = None):
    """Dot product in double precision.

    Default: zip_with + aggregate fold — correct for any lengths, but
    higher-order functions are INTERPRETED (CodegenFallback): every pair
    allocates a zipped array and folds it element-by-element outside
    whole-stage codegen. With ``dim`` (r12, guide §1.2 step 2 / §4.1
    "prefer built-ins with codegen"): a statically unrolled
    ``0.0 + a[1]·b[1] + … + a[dim]·b[dim]`` — the identical IEEE-754
    addition sequence the fold runs (acc starts at 0.0, terms in index
    order, each ``cast(double)·cast(double)``), so values are
    bit-identical; fully codegen'd, measured ~several× cheaper per pair.
    Rows where either array's length ≠ dim keep the interpreted fold
    (per-row guard), so ragged/NULL inputs behave exactly as before.
    """
    hof = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    if not dim:
        return hof
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + (
            F.element_at(a, i).cast("double")
            * F.element_at(b, i).cast("double")
        )
    return F.when((F.size(a) == dim) & (F.size(b) == dim), acc).otherwise(hof)


def _dot_coeffs(vec, coeffs: list[float]):
    """Dot of a VECTOR COLUMN against CONSTANT coefficients, unrolled
    with scalar literals: ``0.0 + vec[1]·c₁ + … + vec[dim]·c_dim``.

    The generic ``_dot(vec, F.array(*lits), dim)`` unroll would embed a
    COPY of the 64-literal CreateArray tree inside every element_at term
    (64 × 64 literal nodes per dot — measured as multi-second Catalyst
    build time and a slower interpreted stage on the ivf/semantic-dedup
    paths); scalar literals keep the term at two nodes. Values are
    bit-identical to the fold (same IEEE order; each element cast to
    double then multiplied by the same double literal). Rows whose
    vector length ≠ len(coeffs) fall back to the interpreted fold
    against the literal array — the exact pre-r12 semantics.
    """
    dim = len(coeffs)
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + (
            F.element_at(vec, i).cast("double")
            * F.lit(float(coeffs[i - 1]))
        )
    hof = F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(float(c)) for c in coeffs]),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc_, v: acc_ + v,
    )
    return F.when(F.size(vec) == dim, acc).otherwise(hof)


def _norm(a, dim: int | None = None):
    """√Σx² — same unrolled-with-guard treatment as :func:`_dot`."""
    hof = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    if not dim:
        return F.sqrt(hof)
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        x = F.element_at(a, i).cast("double")
        acc = acc + x * x
    return F.sqrt(F.when(F.size(a) == dim, acc).otherwise(hof))


def _py_norm(vec) -> float:
    """Driver-side replay of ``_norm`` for CONSTANT vectors (centroid /
    hyperplane literals): a sequential left-fold of x*x in float64 then
    sqrt — the identical IEEE-754 operation sequence the JVM fold runs,
    so substituting ``F.lit(_py_norm(v))`` for ``_norm(F.array(*lits))``
    is bit-exact while deleting a dim-step interpreted fold PER ROW
    (HOFs over literal arrays are not constant-folded by Catalyst —
    lambda-bearing expressions are never foldable)."""
    import math

    acc = 0.0
    for x in vec:
        fx = float(x)
        acc += fx * fx
    return math.sqrt(acc)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Plan shape: broadcast(queries) ⋈ corpus (no shuffle of the corpus), then
    one shuffle keyed by query_id for the global top-k window — the shuffle
    carries only (query_id, neighbor_id, score), k·|queries| rows after
    AQE's partial top-k via WindowGroupLimit pushdown.

    Norms are materialized ONCE PER INPUT ROW in the projections below
    the pair join (the semantic_dedup lesson: dot + two norms per pair
    is 3× the HOF fold work of dot alone — a Project under a join never
    collapses above it, so ``__qn``/``__cn`` are computed |queries| +
    |corpus| times, not |pairs| times). The cosine stays the oracle's
    exact formula dot / (norm_q · norm_c) on the SAME doubles — a norm's
    value does not depend on which row evaluates it — so results are
    bit-identical to the per-pair spelling.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col), dim).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col), dim).alias("__cn"),
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("q_vec"), F.col("c_vec"), dim)
         / (F.col("__qn") * F.col("__cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    if round_to is not None:
        out = out.withColumn("cosine", F.round("cosine", round_to))
    return out


def hyperplane_coords(
    dim: int, planes: int, seed: int = 42, integer_planes: bool = False
) -> list[list[float]]:
    """Deterministic hyperplane coordinates shared by the Spark path and
    the SQL oracle generator."""
    import random

    rng = random.Random(seed)
    if integer_planes:
        return [
            [float(rng.randint(-9, 9)) for _ in range(dim)] for _ in range(planes)
        ]
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def hyperplane_lsh_buckets(
    df: DataFrame,
    dim: int,
    planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    integer_planes: bool = False,
) -> DataFrame:
    """Random-hyperplane LSH: sign pattern over ``planes`` hyperplanes →
    bucket id. Map-side only; equal vectors share buckets w.h.p.

    ``integer_planes=True`` draws seeded integer coordinates instead of
    Gaussians — same locality property (only the hyperplane's direction
    matters), but reproducible as literal arrays in an ANSI-SQL oracle
    (see :func:`hyperplane_coords`)."""
    hyperplanes = hyperplane_coords(dim, planes, seed, integer_planes)
    bucket = F.lit(0).cast("long")
    for i, hp in enumerate(hyperplanes):
        s = _dot_coeffs(F.col(vec_col), hp)
        bucket = bucket + F.shiftleft(
            F.when(s >= 0, F.lit(1).cast("long")).otherwise(F.lit(0)), i
        )
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    integer_planes: bool = False,
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket are
    scored. Equi-join on bucket replaces the cross product — the 100 TB
    path (recall traded via ``planes``)."""
    qb = hyperplane_lsh_buckets(
        queries, dim, planes, id_col, vec_col, seed, integer_planes
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col), dim).alias("__qn"),
        "bucket",
    )
    cb = hyperplane_lsh_buckets(
        corpus, dim, planes, id_col, vec_col, seed, integer_planes
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col), dim).alias("__cn"),
        "bucket",
    )
    # Norms once per input row below the join (see cosine_topk_bruteforce)
    scored = cb.join(F.broadcast(qb), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("q_vec"), F.col("c_vec"), dim)
            / (F.col("__qn") * F.col("__cn")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_train(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Train IVF coarse centroids with Lloyd's k-means, Spark-side.

    Per iteration: assignment is a map-side expression over centroid
    literals (k is small by construction); the update is one
    posexplode + groupBy((cell, dim)) average — a shuffle of k·dim cells,
    independent of corpus size. Only the k×dim centroid matrix ever
    reaches the driver."""
    seed_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col) + seed), F.lit(97)), id_col)
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seed_rows]
    for _ in range(iters):
        assigned = ivf_assign(df, centroids, id_col, vec_col)
        stats = (
            assigned.select(
                "ivf_cell", F.posexplode(vec_col).alias("dim", "x")
            )
            .groupBy("ivf_cell", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = {c: dict() for c in range(len(centroids))}
        for r in stats:
            new[r.ivf_cell][r.dim] = r.m
        centroids = [
            [new[c][d] for d in sorted(new[c])] if new.get(c) else centroids[c]
            for c in range(len(centroids))
        ]
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """IVF probe search: each query scores only corpus vectors whose coarse
    cell is among the query's ``nprobe`` nearest centroids.

    Scale shape: corpus cell assignment is map-side (centroids are plan
    literals); at rest the corpus would be written partitioned/bucketed by
    ``ivf_cell`` so the probe join prunes partitions at the source. Query
    probes explode to (query, cell) rows and broadcast; candidate selection
    is an equi-join on cell — no corpus shuffle, no cross product. Scored
    candidates shuffle once on query_id for the top-k window (rows =
    candidates, bounded by nprobe/k·|corpus| · |queries| ≪ all-pairs).
    """
    dim = len(centroids[0]) if centroids else None
    c = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col), dim).alias("__cn"),
        "ivf_cell",
    )
    # Per-query ranked centroid list: array of (−cos, cell) structs sorted
    # ascending ⇒ cos descending with ties broken by lowest cell (matches
    # ivf_assign's argmax tie rule), then the first nprobe exploded.
    # The query-vector norm folds once per query row (``__qn``), the
    # centroid norms once on the driver (``_py_norm`` — bit-exact
    # literal), so the k-centroid rank list costs k dot folds per query
    # instead of 3k.
    entries = []
    for ci, cvec in enumerate(centroids):
        s = _dot_coeffs(F.col("q_vec"), cvec) / (
            F.col("__qn") * F.lit(_py_norm(cvec))
        )
        entries.append(
            F.struct((-s).alias("neg_cos"), F.lit(ci).cast("long").alias("cell"))
        )
    probes = F.slice(F.array_sort(F.array(*entries)), 1, nprobe)
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            _norm(F.col(vec_col), dim).alias("__qn"),
        )
        .select(
            "query_id", "q_vec", "__qn", F.explode(probes).alias("p")
        )
        .select(
            "query_id", "q_vec", "__qn", F.col("p.cell").alias("ivf_cell")
        )
    )
    scored = (
        c.join(F.broadcast(q), "ivf_cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("q_vec"), F.col("c_vec"), dim)
                / (F.col("__qn") * F.col("__cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    if round_to is not None:
        out = out.withColumn("cosine", F.round("cosine", round_to))
    return out


# Above this many literal nodes (k·dim) the map-side literal argmax is
# routed to the broadcast-join path: Catalyst analysis/codegen cost on
# a plan with 10^5+ literals dominates wall time long before execution.
# Literal-vs-join routing point for ivf_assign, in k·dim expression
# nodes. MEASURED (sf1 replica, 20k × 64-dim vectors, local[32], min of
# 2): the literal path's Catalyst/codegen compile cost grows linearly
# with k (k=8: 1.5 s, k=16: 2.8 s, k=32: 5.7 s, k=79: 13.5 s) while the
# join path stays ~1-5 s flat — so anything past k ≈ 32 at dim 64
# belongs on the join path locally. The literal path's remaining edge
# is ZERO shuffle (the join path exchanges ~n rows for the per-id
# argmax), which matters at cluster scale where n is 10^9+ and the
# compile cost amortizes — hence a budget that keeps genuinely small k
# (probe fixtures, 4-16 coarse cells) literal instead of routing
# everything to the join.
_IVF_LITERAL_BUDGET = 2_048


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (by dot product over normalized centroids).

    Two physically different plans, ONE contract (identical output —
    pinned by test_ivf_assign_join_path_matches_literal_path):

    - **small k** (k·dim ≤ ``_IVF_LITERAL_BUDGET``): centroids are plan
      literals, scores an array build, argmax via
      array_position(array_max) — O(k·dim) expression nodes, zero
      shuffle, zero extra jobs. (A folded when-chain, the obvious
      alternative, embeds the running best TWICE per step — O(2^k)
      nodes; it OOMs Catalyst around k ≈ 20.)
    - **larger k** (trained cells, k from tens to 10⁴ — k·dim literals
      cost Catalyst compile time linearly in k, measured 13.5 s at
      k=79·dim=64, and would stall analysis outright at 10⁵–10⁶ nodes):
      centroids become a broadcast DataFrame; assignment is a broadcast
      nested-loop expand (rows × k, map-side, nothing shuffles but the
      k·dim centroid matrix) and the argmax one groupBy(max(struct)).

    Both paths: ties keep the FIRST (lowest-index) centroid; a
    zero-norm vector divides by zero against every centroid —
    try_divide maps that to NULL (never an ANSI-mode exception) and it
    lands in the explicit -1 sentinel cell.
    """
    if not centroids:
        # empty centroid list otherwise degrades to a null/odd cell per
        # row (array_max over an empty array) — a caller error; say so
        raise ValueError("ivf_assign: centroids must be non-empty "
                         "(ivf_train on an empty corpus returns [])")
    dim = len(centroids[0])
    if len(centroids) * dim > _IVF_LITERAL_BUDGET:
        return _ivf_assign_join(df, centroids, id_col, vec_col)
    # Row norm folds once per row (Project below the argmax projection),
    # centroid norms once on the driver: the k-way argmax costs k dot
    # folds per row instead of 3k (values bit-identical — see _py_norm).
    pre = df.select(
        F.col(id_col), F.col(vec_col), _norm(F.col(vec_col), dim).alias("__vn")
    )
    score_cols = []
    neg_inf = F.lit(float("-inf"))
    for cvec in centroids:
        s = F.try_divide(
            _dot_coeffs(F.col(vec_col), cvec),
            F.col("__vn") * F.lit(_py_norm(cvec)),
        )
        score_cols.append(F.coalesce(F.nanvl(s, neg_inf), neg_inf))
    scores = F.array(*score_cols)
    mx = F.array_max(scores)
    best = (
        F.when(mx == F.lit(float("-inf")), F.lit(-1))
        .otherwise(F.array_position(scores, mx) - 1)
        .cast("long")
    )
    return pre.select(F.col(id_col), F.col(vec_col), best.alias("ivf_cell"))


def _ivf_assign_join(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Large-k assignment: broadcast the centroid matrix as DATA, not as
    plan literals. One broadcast expand (rows × k, map-side) + one
    per-id max(struct(score, -index)) aggregate — the partial max
    collapses the k copies per id inside each task, so the exchange
    carries ~n rows, not n·k. Struct ordering compares the score first
    and the negated index second, so the winner is the max score with
    FIRST-index tie-break — identical to the literal path's
    array_position semantics (null scores sort below every real score
    in struct comparison, so a zero-norm CENTROID can never win). The
    groupBy keys on the id only and carries the vector via first()
    (every expanded copy holds the identical vector, so first() is
    value-deterministic).

    **id_col must be row-unique.** The groupBy collapses duplicate ids
    to one output row, while the literal path keeps one row per input
    row — the two plans' "identical output" contract silently breaks
    on duplicates, and WHICH plan runs flips at the k·dim literal
    budget. Callers with non-unique ids must aggregate to a row-unique
    key first (every registry caller uses the table PK)."""
    spark = df.sparkSession
    # Centroid norms ride as DATA beside the centroid vectors (computed
    # once on the driver via the bit-exact _py_norm replay); the row
    # norm folds once per input row below the expand. The n·k expanded
    # rows then pay one dot fold each instead of dot + two norms.
    cdf = spark.createDataFrame(
        [
            (ci, [float(x) for x in cvec], _py_norm(cvec))
            for ci, cvec in enumerate(centroids)
        ],
        "__ci int, __cv array<double>, __cn double",
    )
    dim = len(centroids[0])
    s = F.nanvl(
        F.try_divide(
            _dot(F.col(vec_col), F.col("__cv"), dim),
            F.col("__vn") * F.col("__cn"),
        ),
        F.lit(float("-inf")),
    )
    scored = (
        df.select(id_col, vec_col, _norm(F.col(vec_col), dim).alias("__vn"))
        .crossJoin(F.broadcast(cdf))
        .select(
            id_col,
            vec_col,
            F.struct(s.alias("s"), (-F.col("__ci")).alias("nci")).alias(
                "__sc"
            ),
        )
    )
    best = scored.groupBy(id_col).agg(
        F.first(vec_col).alias(vec_col), F.max("__sc").alias("__sc")
    )
    cell = (
        F.when(
            F.col("__sc.s").isNull()
            | (F.col("__sc.s") == F.lit(float("-inf"))),
            F.lit(-1),
        )
        .otherwise(-F.col("__sc.nci"))
        .cast("long")
    )
    return best.select(F.col(id_col), F.col(vec_col), cell.alias("ivf_cell"))


def quantize_embeddings_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_col: str = "q_scale",
    out_col: str = "q_vec",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: ``scale = 127 /
    max|v|``, ``q_i = clamp(round(v_i * scale), ±127)``; the scale rides
    along for dequantization (``v ≈ q / scale``).

    The memory/IO lever for ANN at corpus scale: a 1024-dim float32
    embedding shrinks 4× (4 KiB → 1 KiB), which at 10^10 vectors is the
    difference between an in-cluster-memory index and one that spills.
    Dot products on int8 with a per-pair scale correction preserve cosine
    ranking to ~1e-2, plenty for the candidate-generation stage (exact
    re-rank reads the float vectors for the survivors only).

    Pure Column higher-order functions — JVM-side, zero shuffle, linear
    map pass; all arithmetic in double so the DuckDB oracle replays it
    bit-for-bit. All-zero vectors get scale 0 and an all-zero q_vec.

    The scale must NOT be referenced inside the clamp lambda's body: a
    lambda-captured expression is re-evaluated PER ELEMENT, so the
    scale's array_max(transform(abs)) pass becomes a hidden O(dim²)
    quadratic (measured: the quantize pass alone was 4.4 s on 200k
    64-dim rows, ~70% of the whole int8 top-k query — and a separate
    projection does not survive CollapseProject, which re-inlines any
    single-use alias into the lambda). zip_with with an
    array_repeat(scale, dim) ARGUMENT pins the O(dim) shape: arguments
    evaluate once per row wherever the optimizer inlines them.
    """
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0))
    q = F.zip_with(
        v,
        F.array_repeat(F.col(scale_col), F.size(v)),
        lambda x, s: F.least(
            F.lit(127),
            F.greatest(
                F.lit(-127), F.round(x.cast("double") * s).cast("int")
            ),
        ),
    )
    return df.withColumn(scale_col, scale).withColumn(out_col, q)


def cosine_topk_int8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """Top-k cosine candidates scored entirely on int8-quantized vectors —
    the candidate-generation stage quantization buys: 4x less data scanned
    per probe, with the exact float re-rank (``cosine_topk_bruteforce`` on
    the survivors) reading full vectors only for k·|queries| rows.

    The per-vector scale cancels out of the cosine, so ranking differs
    from float cosine only by int8 rounding error (~1e-2); ties break on
    neighbor id. Same plan shape as the exact path: broadcast(queries) ⋈
    corpus, one top-k shuffle keyed by query id. Integer dot products are
    exact in doubles (|q| ≤ 127), so the score is bit-reproducible across
    engines.
    """
    cq = quantize_embeddings_int8(queries, vec_col=vec_col)
    cc = quantize_embeddings_int8(corpus, vec_col=vec_col)
    # Quantize AND norm once per input row below the pair join (see
    # cosine_topk_bruteforce — bit-identical, 1 fold per pair not 3)
    q = cq.select(
        F.col(id_col).alias("query_id"),
        F.col("q_vec").alias("qq"),
        _norm(F.col("q_vec"), dim).alias("__qn"),
    )
    c = cc.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("q_vec").alias("cq"),
        _norm(F.col("q_vec"), dim).alias("__cn"),
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qq"), F.col("cq"), dim)
         / (F.col("__qn") * F.col("__cn"))).alias("cosine_i8"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_i8"), F.asc("neighbor_id")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    if round_to is not None:
        out = out.withColumn("cosine_i8", F.round("cosine_i8", round_to))
    return out


def cosine_topk_twostage(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    candidate_k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """The production ANN shape: int8 candidate generation (stage 1,
    scans the 4x-smaller quantized vectors) followed by exact float
    re-ranking of the ``candidate_k`` survivors (stage 2, reads full
    vectors for only ``candidate_k * |queries|`` rows).

    Stage 2's join drives off the BROADCAST candidate list, so the
    corpus is never shuffled in either stage; the only exchanges are the
    two per-query top-k windows over (id, id, score) triples.
    """
    cands = cosine_topk_int8(
        corpus, queries, k=candidate_k,
        id_col=id_col, vec_col=vec_col, round_to=None, dim=dim,
    ).select("query_id", "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col), dim).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    # Neighbor norm folds AFTER the candidate semi-join (stage 2 reads
    # only candidate_k·|queries| rows — norming the whole corpus below
    # the join would undo stage 1's pruning) and BEFORE the query join,
    # so a neighbor surfacing in several queries' candidate lists still
    # folds once. Values bit-identical to the per-pair spelling.
    scored = (
        c.join(F.broadcast(cands), "neighbor_id")
        .withColumn("__cn", _norm(F.col("c_vec"), dim))
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q_vec"), F.col("c_vec"), dim)
             / (F.col("__qn") * F.col("__cn"))
             ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    if round_to is not None:
        out = out.withColumn("cosine", F.round("cosine", round_to))
    return out


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int | None = 2048,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings, then drop near-identical
    vectors WITHIN each cluster only.

    Two-stage plan — the whole point is never comparing across clusters:

    1. coarse assignment via :func:`ivf_assign` — map-side argmax over
       literal centroids, zero shuffle;
    2. within-cluster pair generation — a self-equi-join on the cell id,
       so the candidate set is Σ|cell|², not n².

    **Degenerate-cell guard (``cell_cap``, ON by default)**: only the
    first ``cell_cap`` members of each cell (row_number over the cell,
    ordered by ``id_col`` — deterministic) participate in the pair join;
    later members are kept unconditionally. This bounds pair work at
    ``k·cell_cap²/2`` no matter how wrong ``k`` is for the corpus — the
    same posture as the LSH hot-bucket cap
    (``dedup.minhash_lsh_candidates``): a cell that blows past the cap
    means the centroid count is mis-sized, and the guard bounds the
    damage instead of melting a task on an n² self-join. With the
    paper's operating point — FIXED target cell size c ≈ 100–1000, i.e.
    k ≈ n/c (:func:`semantic_dedup_auto`) — healthy cells stay far
    below the cap and the guard never fires. The cell ranking reuses
    the pair join's own hash partitioning on the cell id, so the guard
    adds no extra shuffle. ``None`` disables the cap.

    Drop rule: a vector is dropped when some LOWER-id vector in its cell
    is within ``threshold`` cosine — deterministic and join-expressible.
    (Chained near-dups a-b-c may keep a and c; route the pairs through
    ``dedup.connected_components`` when full transitive grouping is
    worth the extra iterations.)

    Output: ``(id_col, ivf_cell, is_kept)`` — one row per input vector.
    """
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    # Normalize ONCE per vector before the pair join: the join then pays a
    # single dot product per pair instead of dot + two norms (3× the HOF
    # work, measured ~3× the wall time at 1M within-cell pairs). The
    # shuffle materializes the unit vectors, so they are not recomputed
    # per pair. Element-wise division (not reciprocal-multiply) keeps the
    # arithmetic identical to the oracle's formula.
    # The norm must NOT be captured inside the divide lambda's body — a
    # lambda-captured expression re-evaluates PER ELEMENT, turning the
    # O(dim) normalize into a hidden O(dim²) fold-per-element (the same
    # quadratic the int8 quantizer had with its inlined scale; a
    # separate projection does not survive CollapseProject's single-use
    # re-inlining). zip_with with an array_repeat(norm, dim) ARGUMENT
    # pins once-per-row evaluation; element values are the identical
    # x / norm doubles, so the oracle contract is untouched.
    sd_dim = len(centroids[0]) if centroids else None
    unit = assigned.select(
        F.col(id_col),
        F.col("ivf_cell"),
        F.zip_with(
            F.col(vec_col),
            F.array_repeat(
                _norm(F.col(vec_col), sd_dim), F.size(F.col(vec_col))
            ),
            lambda x, n: x.cast("double") / n,
        ).alias("__uv"),
    )
    if cell_cap is not None:
        # Cap BEFORE the self-join (the part_pair_cooccurrence recipe):
        # rank within the cell by id, keep only the first cell_cap rows
        # as pair candidates. The window partitions on ivf_cell — the
        # same key the join shuffles on — so Catalyst reuses one
        # exchange for both.
        rk = F.row_number().over(
            Window.partitionBy("ivf_cell").orderBy(id_col)
        )
        unit = (
            unit.withColumn("__rk", rk)
            .filter(F.col("__rk") <= cell_cap)
            .drop("__rk")
        )
    a = unit.select(
        F.col(id_col).alias("id_a"), F.col("__uv").alias("ua"),
        F.col("ivf_cell").alias("cell_a"),
    )
    b = unit.select(
        F.col(id_col).alias("id_b"), F.col("__uv").alias("ub"),
        F.col("ivf_cell").alias("cell_b"),
    )
    cos = _dot(F.col("ua"), F.col("ub"), sd_dim)
    # Join-strategy routing: the pair join's parallelism under SMJ is
    # the number of DISTINCT cells — fine at the production posture
    # (k ∝ n/c cells), pathological with few centroids (the 4-cell
    # oracle fixture lands all pair work on 4 tasks). When the capped
    # candidate set is provably small (k·cell_cap rows — known at plan
    # time), broadcast the a-side instead: the join then parallelizes
    # over the b-side's scan partitions with zero shuffle, and the
    # per-task work is b_rows/tasks · cap dot products regardless of
    # how few cells there are.
    # Row count alone is the wrong broadcast gate for vector payloads:
    # 65536 rows of 768-dim doubles is ~400 MB on the wire — past any
    # sane driver/executor broadcast budget even though the row count
    # looks tiny. Budget BYTES: rows x dim x 8 (the unit vector is the
    # payload; id/cell are noise next to it) against 64 MB, with the
    # old 65536-row cap kept as a secondary bound so degenerate tiny
    # dims can't push row counts into the millions.
    dim = len(centroids[0]) if centroids else 0
    max_rows = len(centroids) * cell_cap if cell_cap is not None else 0
    small_a = (
        cell_cap is not None
        and max_rows <= 65536
        and max_rows * max(dim, 1) * 8 <= 64 * 1024 * 1024
    )
    pair_a = F.broadcast(a) if small_a else a
    if small_a:
        # The cap window left b in (#cells) non-empty hash partitions —
        # with few cells every pair lands on a handful of tasks. The
        # b-side is bounded (k·cell_cap rows), so a round-robin
        # repartition is a cheap bounded shuffle that restores full
        # parallelism for the broadcast join (width derivation +
        # dynamic-allocation caveat: plans/width.py).
        b = b.repartition(exchange_width(df.sparkSession))
    dropped = (
        pair_a.join(
            b,
            (F.col("cell_a") == F.col("cell_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(cos >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        assigned.join(dropped, id_col, "left")
        .select(
            id_col,
            "ivf_cell",
            F.col("__dup").isNull().alias("is_kept"),
        )
    )


def semantic_dedup_auto(
    df: DataFrame,
    threshold: float = 0.95,
    target_cell_size: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
    seed: int = 42,
    cell_cap: int | None = 2048,
    max_k: int = 65536,
) -> tuple[DataFrame, list[list[float]]]:
    """:func:`semantic_dedup` at the SemDeDup paper's production
    operating point: a FIXED target cell size ``c`` (Abbas et al. 2023
    use tens of thousands of clusters over LAION so cells stay in the
    hundreds), i.e. ``k = ceil(n / c)`` trained centroids — NOT
    ``k = √n``. The distinction is the asymptote: with k ∝ n/c the
    within-cell pair work is Σ|cell|² ≈ k·c² = n·c — LINEAR in the
    corpus; with k = √n it is n^1.5. At 100 TB the √n posture is a
    scale-killer, the fixed-c posture is one more linear pass.

    Runs one ``count()`` to size k, Lloyd-trains via :func:`ivf_train`
    (assignment cost n·k·dim per iteration, map-side; only the k×dim
    centroid matrix reaches the driver), then dedups with the
    degenerate-cell guard still armed. Returns ``(result, centroids)``
    so callers can persist the trained centroids for incremental reuse.
    """
    n = df.count()
    if n == 0:
        raise ValueError("semantic_dedup_auto: empty input")
    k = min(max_k, max(1, -(-n // target_cell_size)))
    cents = ivf_train(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col, seed=seed
    )
    out = semantic_dedup(
        df, cents, threshold, id_col, vec_col, cell_cap=cell_cap
    )
    return out, cents


# ---- Exact integer moment matrix / PCA feed -------------------------------


def embedding_moments_int(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: float = 100000.0,
) -> DataFrame:
    """Exact second-moment matrix of an embedding column in scaled-integer
    arithmetic — the distributed statistics feed for PCA / whitening /
    covariance-based outlier scoring over a 100 TB corpus.

    Every element is quantized once (``q = round(x·scale)`` as BIGINT,
    same half-away-from-zero rounding in Spark and DuckDB), and all
    sums are integer sums — order-free, partitioning-free, so the
    moment matrix is bit-identical on any cluster AND any engine (the
    float-dot-product alternative would differ per shuffle order).
    Output rows, all BIGINT ``s``:

    - ``(i, j, s)`` for 0 ≤ i ≤ j < dim: Σ qᵢ·qⱼ (upper triangle);
    - ``(i, -1, s)``: first moments Σ qᵢ;
    - ``(-1, -1, n)``: the row count.

    Driver-side :func:`pca_from_moments` turns this into mean/cov/PCA.

    Null handling: rows whose vector is NULL, contains a NULL element,
    or is not exactly ``dim`` long are DROPPED (listwise) before the
    numpy stage. Arrow surfaces null array elements as float NaN, and
    ``astype(np.int64)`` would silently turn NaN into INT64_MIN garbage
    (and ``np.stack`` raises on ragged input) — the guard makes the
    non-null/fixed-width precondition explicit and keeps every moment
    row (sums AND count) consistent over the same filtered population.

    Plan: quantization stays a Spark Column expression (F.round's
    half-away-from-zero is the cross-engine contract; numpy's round is
    banker's and must NOT touch the values), then an Arrow-batched
    ``mapInPandas`` accumulates one integer Gram matrix per TASK —
    ``G += Qᵀ·Q`` in numpy int64, a vectorized C loop — and emits
    d(d+1)/2 + d + 1 partial rows; the only shuffle is the (i, j)
    partial sum, bounded by tasks·d² rows, independent of row count
    (same posture as the CM/HLL sketch builds). This replaced the r07
    shape (per-row nested-transform explode of d(d+1)/2 structs): the
    interpreted-HOF struct build dominated at scale — sf10 same-session
    A/B min-of-2: 23.4 s → 2.9 s, parity exact (SCALING.md §5).
    Overflow bound: n·(scale·max|x|)² must stay below 2^63 — at
    scale=1e5 and |x| ≤ 1 that allows ~9×10⁸ rows per job;
    shard-and-merge (the moment rows are plain-sum mergeable) or lower
    the scale beyond that.
    """
    import numpy as np
    import pandas as pd

    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * F.lit(scale)).cast("long"),
    )
    base = df.select(q.alias("__q")).where(
        F.col("__q").isNotNull()
        & (F.size("__q") == dim)
        & ~F.exists("__q", lambda e: e.isNull())
    )

    def gram_partials(batches):
        G = np.zeros((dim, dim), dtype=np.int64)
        s1 = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack(pdf["__q"].to_numpy()).astype(np.int64)
            G += Q.T @ Q
            s1 += Q.sum(axis=0)
            n += len(Q)
        iu = np.triu_indices(dim)
        yield pd.concat(
            [
                pd.DataFrame(
                    {
                        "i": iu[0].astype("int32"),
                        "j": iu[1].astype("int32"),
                        "s": G[iu],
                    }
                ),
                pd.DataFrame(
                    {
                        "i": np.arange(dim, dtype="int32"),
                        "j": np.full(dim, -1, dtype="int32"),
                        "s": s1,
                    }
                ),
                pd.DataFrame({"i": [-1], "j": [-1], "s": [n]}),
            ],
            ignore_index=True,
        )

    partials = base.mapInPandas(gram_partials, schema="i int, j int, s long")
    return partials.groupBy("i", "j").agg(F.sum("s").alias("s"))


def pca_from_moments(
    rows, dim: int, scale: float = 100000.0
):
    """Driver-side PCA from collected :func:`embedding_moments_int` rows
    (d² + d + 1 integers — metadata, never data). Returns
    ``(mean, cov, eigvals, components)`` as numpy arrays; eigenvectors
    are sorted by descending eigenvalue. Deterministic: the integer
    moments fix cov exactly (up to quantization), and ``numpy.linalg.eigh``
    on an identical matrix is reproducible."""
    import numpy as np

    n = 0
    s1 = np.zeros(dim)
    s2 = np.zeros((dim, dim))
    for r in rows:
        i, j, s = r["i"], r["j"], r["s"]
        if i == -1:
            n = s
        elif j == -1:
            s1[i] = s
        else:
            s2[i, j] = s
            s2[j, i] = s
    if n == 0:
        raise ValueError("moment rows contain no count row / empty input")
    mean = s1 / (n * scale)
    cov = s2 / (n * scale * scale) - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    return mean, cov, vals[order], vecs[:, order].T


def label_centroids_int(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
    scale: float = 100000.0,
) -> DataFrame:
    """Per-label class centroids in EXACT integer space — the
    nearest-centroid classifier / per-class drift feed: each vector is
    quantized once (``round(x·scale)`` BIGINT) and summed element-wise
    per label, so the centroid numerators are order-free integer sums —
    bit-identical on any cluster/engine (mean = sum/(n·scale) is one
    deterministic division away, done by the consumer).

    Plan: (label, i, q) explode map-side; ONE (label, i) sum shuffle
    whose map-side partials bound volume at tasks·labels·d rows; array
    assembly per label is metadata. Output: ``label, n, sums`` (BIGINT
    array). Same overflow contract as embedding_moments_int at first
    power: n·scale·max|x| < 2^63 — effectively unbounded.

    Malformed vectors (``size != dim`` or null elements) are dropped
    BEFORE the explode — consistent with the error-channel contract of
    the other operators — so per-dimension counts are uniform by
    construction; a ``raise_error`` guard on min(c) == max(c) (one
    scalar expression per label row, metadata-sized) makes any residual
    divergence fail loudly instead of silently zero-filling the
    centroid (ADVICE r04).
    """
    vec = F.col(vec_col).cast("array<double>")
    q = F.transform(vec, lambda x: F.round(x * F.lit(scale)).cast("long"))
    cells = (
        df.filter(F.col(label_col).isNotNull())
        .filter(
            (F.size(vec) == dim) & ~F.exists(vec, lambda x: x.isNull())
        )
        .select(F.col(label_col).alias("label"), F.posexplode(q).alias("i", "q"))
        .groupBy("label", "i")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    entries = F.map_from_entries(
        F.collect_list(F.struct(F.col("i"), F.col("s")))
    )
    sums = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.try_element_at(entries, i.cast("int")), F.lit(0).cast("long")
        ),
    )
    return (
        cells.groupBy("label")
        .agg(
            F.max("c").alias("n"),
            F.min("c").alias("__n_min"),
            sums.alias("sums"),
        )
        .select(
            "label",
            F.when(F.col("n") == F.col("__n_min"), F.col("n"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("label_centroids_int: non-uniform per-dim "
                              "counts for label "),
                        F.col("label").cast("string"),
                    )
                ).cast("long")
            )
            .alias("n"),
            "sums",
        )
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k most-similar vectors with a DIFFERENT label — the pairs that
    teach an embedding model the most. Same plan as the brute-force ANN
    baseline (broadcast probes ⋈ corpus, per-query top-k window over
    (id, id, score) triples); the label filter happens BEFORE ranking,
    map-side. Swap the scorer for the IVF/LSH candidate paths at corpus
    scale — the ranking contract is identical.
    """
    # Norms once per input row below the pair join (see
    # cosine_topk_bruteforce — bit-identical, 1 fold per pair not 3)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_label"),
        _norm(F.col(vec_col), dim).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("n_label"),
        _norm(F.col(vec_col), dim).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .filter(~F.col("n_label").eqNullSafe(F.col("q_label")))
        .select(
            "query_id",
            "neighbor_id",
            "n_label",
            (
                _dot(F.col("q_vec"), F.col("c_vec"), dim)
                / (F.col("__qn") * F.col("__cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    out = scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)
    if round_to is not None:
        out = out.withColumn("cosine", F.round("cosine", round_to))
    return out
