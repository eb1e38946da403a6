"""Iterative graph analytics beyond connected components: PageRank in
integer fixed-point arithmetic.

Float PageRank does not hash-match across engines: per-node sums of
double contributions depend on reduction order. Storing ranks in
integer MICRO-units (1e6 ≙ 1.0) fixes that — per-edge contributions are
integer floor-divisions (``rank // out_degree``), per-node sums are
exact BIGINT additions (commutative, shuffle-order-free), and every
engine replays the identical sequence of integers. The quantization
error is ≤ out_degree micro-units per node per iteration — noise for a
ranking — and buys bit-exact reproducibility, the same doctrine as the
bigram LM's integer code lengths.

Scale shape (same class as dedup's connected components): each
iteration joins ranks to a GROUPED adjacency (one out-neighbor array
row per source node — |V| probe/emit rows, the per-edge share computed
once per node) and fans shares out with one explode into the
destination groupBy — the only per-iteration exchange carrying edge
volume is that aggregation's, and AQE reuses the node partitioning
across iterations. Fixed
iteration counts (the common production choice for ranking signals)
keep the plan statically analyzable; convergence-driven runs (high
iteration counts) truncate lineage every ``checkpoint_every``
iterations with the same localCheckpoint pattern connected_components
uses, so the nested-join plan never compounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int | None = 5,
    hub_degree_cap: int | None = None,
) -> DataFrame:
    """PageRank over a directed edge list, ``iterations`` fixed steps,
    all arithmetic in integer micro-units, in the N-SCALED form (rank of
    the uniform distribution ≙ 1.0 per node, not 1/N):

        rank_0(v)   = MICRO
        rank_t+1(v) = (MICRO - d_micro)
                      + (d_micro * Σ_{u→v} (rank_t(u) // deg(u))) // MICRO

    The N-scaling matters at scale: the conventional 1/N form would
    quantize init to ``1e6 // N`` micro-units — zero beyond a million
    nodes, rank collapse long before that. Per-node ranks here stay
    O(MICRO) regardless of graph size (ranking order is identical; divide
    by N·MICRO for the normalized view), quantization error stays ≤
    out-degree micro-units per node per iteration, and no driver-side
    N scalar is needed at all — the plan is fully lazy.

    Nodes = every id appearing as src or dst. Dangling nodes (no
    out-edges) contribute nothing (their mass leaks — the standard
    simplification when ranking is the goal). Output:
    ``(node, rank_micro)``.

    ``checkpoint_every``: cut the lineage with ``localCheckpoint`` every
    k iterations (the connected_components recipe). At the default fixed
    3 iterations the plan is small and no checkpoint fires; past ~5 the
    nested-join lineage makes Catalyst analysis/AQE replanning cost
    compound per iteration, so convergence-driven runs (iterations 10+)
    get a bounded plan instead.

    ``hub_degree_cap``: OPT-IN skew guard (ADVICE r09) — sources whose
    out-degree exceeds the cap are excluded from the grouped adjacency
    and processed in AQE-splittable flat edge form instead of one
    unsplittable collect_list array row; values are bit-identical
    (unit-pinned). Default ``None`` because the guard costs a measured
    2.1× on hub-free TPC-H-shaped graphs (see the inline comment);
    enable it for scale-free graphs where one hub's array row would
    OOM the aggregation buffer.

    Unless ``checkpoint_every=None``, loop invariants (the grouped
    adjacency and node set, r11) and the in-loop lineage cut every
    ``checkpoint_every`` iterations use ``localCheckpoint`` — LAZY
    since r12: no jobs run at plan-build time any more; the blocks
    materialize once inside the first action over the result, and the
    lineage (hence the bounded per-iteration plan and the preserved
    hash-partitioning) truncates immediately at build. Plan-audit /
    ``explain`` / dry-run consumers still pass ``checkpoint_every=None``
    for a checkpoint-free plan. localCheckpoint is non-reliable
    storage: on a real cluster prefer ``checkpoint`` against a
    checkpoint dir for executor-loss resilience; the truncation
    economics are identical.
    """
    d_micro = int(round(damping * MICRO))
    init = MICRO
    base = MICRO - d_micro
    # Loop-INVARIANT GROUPED adjacency: one array row per source node
    # (out-neighbor list + degree) instead of |E| flat edge rows. The
    # per-iteration rank join then probes and emits |V| rows — the
    # per-edge share floor(rank/deg) is computed ONCE PER NODE and
    # fanned out by the explode — where the flat form probed and
    # emitted |E| rows and divided per edge (same integers either way;
    # the bit-exact replay property pins equality — verified
    # exceptAll-empty both directions against the flat form, and
    # measured −40% at the 100× replica: 74→48 s interleaved min-of-2).
    # The adjg subtree is identical across iterations, so Catalyst's
    # ReusedExchange materializes its shuffle once; ranks leaves every
    # iteration hash-partitioned on node (the contrib groupBy + nodes
    # join), so the join reuses that partitioning too — per-iteration
    # data motion is exactly one |E|-row map-side-combined aggregation
    # exchange (the exploded shares).
    # Memory boundary (ADVICE r09): one adjacency array per source node
    # is a single UNSPLITTABLE row — its aggregation buffer and its
    # explode both land in one task, and AQE skew-join splitting can
    # split streamed edge rows but never one array row. The OPT-IN
    # ``hub_degree_cap`` lever splits sources at a degree threshold:
    # out-degree ≤ cap keeps the grouped form (|V| probe/emit rows,
    # share computed once per node); a scale-free hub stays in FLAT
    # edge form — its per-edge rows stream through the join, AQE can
    # split them, and the share floor(rank/deg) uses the hub's TOTAL
    # degree, so the integer sequence is identical to the ungrouped
    # computation (pinned by an exceptAll-both-ways unit test with
    # cap=2 vs cap=None). The lever defaults OFF because it is NOT
    # free: degrees must exist BEFORE grouping, which costs a second
    # pass over the edges subtree (a degree aggregation + an edges⋈deg
    # join), and in a lazy iterative plan that join subtree re-executes
    # per iteration — measured 2.1× on the registry's part↔supplier
    # workload at the 10× replica (old_min 9.1 s vs guarded 19.0 s,
    # interleaved same-session min-of-2; the guarded plan carries 13
    # SortMergeJoins vs 0). TPC-H-shaped degrees (≤ low hundreds) never
    # need it; enable it (cap ~2^20 ≈ 8–16 MB of array buffer) for
    # graphs with known scale-free hubs — web links, social follows —
    # where one hub row would OOM the aggregation buffer or pin the
    # whole explode in one task. Shuffle-hash hints keep the lever's
    # edges⋈deg join sort-free.
    if hub_degree_cap is not None:
        deg_df = edges.groupBy(F.col(src_col).alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        edges_d = (
            edges.select(
                F.col(src_col).alias("node"), F.col(dst_col).alias("__dst")
            )
            .hint("shuffle_hash")
            .join(deg_df.hint("shuffle_hash"), "node")
        )
        flat_src = edges_d.filter(F.col("deg") > hub_degree_cap)
        adjg = (
            edges_d.filter(F.col("deg") <= hub_degree_cap)
            .groupBy("node", "deg")
            .agg(F.collect_list(F.col("__dst")).alias("__dsts"))
        )
    else:
        flat_src = None
        adjg = edges.groupBy(F.col(src_col).alias("node")).agg(
            F.collect_list(F.col(dst_col)).alias("__dsts"),
            F.count(F.lit(1)).alias("deg"),
        )
    # Materialize the LOOP INVARIANTS once (the connected_components
    # recipe, r11): without this, every iteration's lazy plan re-inlines
    # the whole edges subtree — the registry's part↔supplier query plans
    # the lineitem scan + pair-distinct 28 times for 3 iterations, with
    # ZERO ReusedExchange nodes in the initial plan (AQE stage reuse
    # recovers some of it at runtime, but each re-planned subtree still
    # pays analysis, and any miss re-executes a fact-table distinct).
    # One eager localCheckpoint of the grouped adjacency and the node
    # set bounds the per-iteration plan to the loop body, and both
    # invariants keep their hash-partitioning on ``node``
    # (localCheckpoint preserves outputPartitioning), so the rank join
    # and the contrib aggregation stay co-partitioned across iterations
    # REGARDLESS of AQE's per-branch coalescing decisions — the lazy
    # form could end the nodes/adjg branches at different AQE-coalesced
    # widths and silently re-exchange one side every iteration.
    # The caller's edge pipeline executes exactly ONCE (for adjg): the
    # node set src∪dst is then derived FROM the checkpointed adjacency
    # (sources = its keys, destinations = its exploded arrays — the same
    # set by construction), so no second execution of the upstream and
    # no |E|-row raw-edge cache (an eager edges.localCheckpoint was
    # measured to heap-OOM the 16 g local driver at the 100× replica —
    # 32 concurrent tasks each unrolling MEMORY_AND_DESER blocks of a
    # fact-distinct output is NOT metadata-scale; the adjacency is).
    # Gated on ``checkpoint_every`` exactly like the in-loop truncation:
    # ``checkpoint_every=None`` keeps the fully lazy plan that
    # explain/plan-audit consumers are documented to use; on a cluster,
    # ``checkpoint`` against a checkpoint dir has the same economics
    # plus executor-loss resilience.
    if checkpoint_every is not None:
        # lazy (r12): lineage truncates immediately; the blocks
        # materialize inside the first downstream job instead of a
        # separate eager driver round trip per invariant
        adjg = adjg.localCheckpoint(eager=False)
        if flat_src is not None:
            flat_src = flat_src.localCheckpoint(eager=False)
        srcs = adjg.select("node")
        dsts = adjg.select(F.explode("__dsts").alias("node"))
        if flat_src is not None:
            srcs = srcs.unionByName(flat_src.select("node"))
            dsts = dsts.unionByName(
                flat_src.select(F.col("__dst").alias("node"))
            )
        nodes = srcs.unionByName(dsts).distinct().localCheckpoint(
            eager=False
        )
    else:
        nodes = (
            edges.select(F.col(src_col).alias("node"))
            .unionByName(edges.select(F.col(dst_col).alias("node")))
            .distinct()
        )
    ranks = nodes.withColumn("rank_micro", F.lit(init).cast("long"))
    for it in range(iterations):
        contrib = ranks.join(adjg, "node").select(
            F.floor(F.col("rank_micro") / F.col("deg"))
            .cast("long")
            .alias("__share"),
            F.explode("__dsts").alias("node"),
        )
        if flat_src is not None:
            contrib = contrib.unionByName(
                ranks.join(flat_src, "node").select(
                    F.floor(F.col("rank_micro") / F.col("deg"))
                    .cast("long")
                    .alias("__share"),
                    F.col("__dst").alias("node"),
                )
            )
        contrib = contrib.groupBy("node").agg(
            F.sum("__share").alias("in_micro")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.floor(
                        F.lit(d_micro)
                        * F.coalesce(F.col("in_micro"), F.lit(0))
                        / F.lit(MICRO)
                    ).cast("long")
                ).alias("rank_micro"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0 and (
            it + 1
        ) < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
