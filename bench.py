#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

The FINAL stdout line is ONE compact JSON record (≤ ~1 KB — the r04
lesson: the full per-query dict overflowed the driver's tail capture and
left the round with no machine-readable bench):
  {"metric": ..., "value": <total sec>, "unit": "sec", "sf": ...,
   "n_queries": N, "mean_sec_per_query": ..., "worst5": {...},
   "sf1": {"total": ..., "worst5": {...}}, "detail_file": ...}
The full per-query min+median detail is written to BENCH_DETAIL.json at
the repo root (committed each round).

Noise posture (the r03 lesson: single samples on a busy 32-way box swing
>2x run-to-run): every query runs SPARK_GRAFT_BENCH_REPS times (default
3); per-query MIN (the least-interference estimate of the plan's true
cost) and the median both land in the detail file, so a real regression
separates from scheduler noise.

Scale blocks: when benchmarking sf0.1, a 10x replica (~sf1) is
materialized once under /tmp by unioning 10 key-offset copies of each
table — offsets keep join fan-outs realistic instead of creating 10-deep
duplicate keys. Document TEXT is Caesar-rotated per copy and embedding
vectors are cyclically rotated per copy, so replicas are NOT
byte-identical and the content-dedup family (MinHash-LSH, connected
components, canonical-per-cluster, SemDeDup) gets a real 10x scale
curve instead of a quadratic duplicate-pair pathology. The FULL headline
set runs at sf1 with per-query ratios; a second decade (10x replica of
the sf1 replica, ~sf10) runs the worst-ratio subset once and flags any
query whose second-decade ratio exceeds the 10x data growth itself
(super-linear). Disable with SPARK_GRAFT_SF1=0 / SPARK_GRAFT_SF10=0.

Also in the detail file: the SemDeDup posture block (sqrt(n) vs fixed-
cell-size centroid operating points at both scales) and a measured
skew-join demonstration (90% hot-key join, plain vs AQE vs salted, with
rows-per-reducer-partition evidence).

The compact line is (re)printed after every completed block, each time
more complete, so a mid-run kill still leaves a parseable last line.

Each query is fully materialized via the no-op sink (forces the whole
plan, no driver collect). Set SPARK_GRAFT_CPUS to bound parallelism.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from py_etl_spark import queries as Q
from py_etl_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customers",
    "cdc_merge_scd1",
    "a3_last_writer_wins",
    "st_tumbling_window_agg",
    "j2_event_entity_lookup",
    "sessionize_events",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "text_stats",
    "ann_cosine_topk",
    # round 2 additions (headline set was 14 queries in BENCH_r01):
    "q2_min_cost_supplier",
    "q4_order_priority_exists",
    "q10_returned_revenue",
    "o2_case_insensitive_sort",
    "a5_partition_boundaries",
    "ivf_assign_fixed",
    # round 2, second batch:
    "q13_order_count_distribution",
    "quality_filter_gopher",
    "dedup_cc_clusters",
    "ann_ivf_topk_fixed",
    "q8_market_share",
    "q21_last_shipper",
    "range_join_followup_events",
    "q9_product_profit",
    "doc_winnow_fingerprints",
    # round 4 additions:
    "bpe_token_count_fixed",
    "corpus_pack_examples",
    "corpus_assemble_examples",
    "quality_repetition_metrics",
    "embedding_quantize_int8",
    "key_skew_profile_lineitem",
    # round 4, second batch:
    "dedup_segments_corpus",
    "scd2_history_from_events",
    "funnel_signup_click_purchase",
    "quality_score_hashed_linear",
    "kmv_distinct_users",
    "zorder_key_orders",
    # round 4, third batch:
    "corpus_curation_pipeline",
    "events_rolling_7d",
    "fuzzy_join_part_names",
    "dedup_incremental_batch",
    "kmv_distinct_rollup",
    # round 4, fourth batch:
    "cm_sketch_events",
    "lm_fluency_bits",
    "bm25_search_topk",
    "dedup_duplicate_spans",
    # round 4, fifth batch:
    "hist_quantile_prices",
    "pagerank_part_supplier",
    "interval_overlap_signup_purchase",
    "agg_incremental_monthly_revenue",
    # round 4, sixth batch:
    "hll_distinct_event_ids",
    "st_session_window_agg",
    "quality_boilerplate_lines",
    "events_anomaly_days",
    "dq_check_orders",
    "quality_compression_ratio",
    # round 4, seventh batch:
    "corpus_sample_weighted",
    "trending_event_types_hourly",
    "audio_window_features_synthetic",
    # round 4, eighth batch:
    "embedding_moments_matrix",
    "hll_grouping_sets_docs",
    "fuzzy_rerank_levenshtein",
    # round 4, ninth batch:
    "corpus_interleave_sources",
    "dq_drift_doc_lengths",
    "dq_check_star_fks",
    # round 4, tenth batch:
    "user_event_sequences",
    "corpus_top_bigrams",
    "feature_bucketize_order_prices",
    # round 4, eleventh batch:
    "dedup_keep_canonical",
    "asof_next_order_within_30d",
    # round 4, twelfth batch:
    "scd2_point_in_time_features",
    "split_leakage_report",
    "part_pair_cooccurrence",
    # round 4, thirteenth batch:
    "embedding_label_centroids",
    "ann_hard_negatives",
    "knn_label_agreement",
    # round 4, fourteenth batch:
    "corpus_augment_word_dropout",
    "vocab_coverage_report",
    # round 4, fifteenth batch:
    "quality_rank_ensemble",
    "embedding_outlier_scores",
    # round 4, sixteenth batch:
    "exact_median_price",
    # round 4, seventeenth batch:
    "safety_blocklist_filter",
    "partition_gap_report",
    # round 4, eighteenth batch:
    "search_posting_lists",
    "last_n_events_per_user",
    # round 4, nineteenth batch:
    "event_transition_matrix",
    "token_pmi_pairs",
    # round 4, twentieth batch:
    "rolling_7d_distinct_users_hll",
    # round 4, twenty-first batch:
    "pareto_frontier_docs",
    # round 4, twenty-second batch:
    "corpus_truncate_head_tail",
    "posting_lists_incremental_merge",
    # round 4, twenty-third batch:
    "retrieval_rrf_fusion",
    # round 4, twenty-fourth batch:
    "stable_row_ids_docs",
    # round 4, twenty-fifth batch:
    "events_cusum_alarm",
    "source_similarity_matrix",
    # round 4, twenty-sixth batch:
    "privacy_k_anonymity_report",
    # round 6: headline-eligible since the default per-cell cap +
    # broadcast-routed pair join removed the 4-cell fixture's
    # parallelism pathology (r05 kept it out because its wall time
    # measured the fixture, not the plan)
    "semantic_dedup_fixed",
]

# Second-decade (100x sf0.1) subset: the queries whose first-decade
# ratio was worst in r05 plus the capped SemDeDup fixture — the ones
# whose scale curve most needs a second data point. One rep; ratios
# land in the detail file and anything whose second-decade ratio
# exceeds the 10x data growth itself gets flagged as super-linear.
SF10_SUBSET = [
    "semantic_dedup_fixed",
    "pagerank_part_supplier",
    "dedup_keep_canonical",
    "dedup_cc_clusters",
    "dedup_minhash_lsh",
    "bm25_search_topk",
    "corpus_pack_examples",
    # top sf1 entries once the FULL headline set ran there (r06): all
    # three have a fixed probe/model side against a scaling corpus
    # side, so their first-decade ratio ~10x is linear-in-data by
    # construction — the second decade adjudicates that claim
    "fuzzy_join_part_names",
    "fuzzy_rerank_levenshtein",
    "lm_fluency_bits",
    # highest remaining first-decade ratios after the r06 fuzzy fix
    # (8.4x/7.3x — bigram explodes, expected linear): second-decade
    # watch
    "token_pmi_pairs",
    "corpus_top_bigrams",
    # r08 widening (VERDICT r07 item 3): the highest-shuffle / heaviest-
    # sf1 plans that had never seen 10x data — the 100x claim should
    # rest on measured trajectories, not plan arguments
    "q21_last_shipper",          # sf1 worst-5 (7.2 s), 4-way self-join
    "dq_check_star_fks",         # 10 shuffles (FK sweep over all dims)
    "hll_grouping_sets_docs",    # 12 shuffles (grouping-set rollups)
    "quality_rank_ensemble",     # 6 shuffles, 3.9 s at sf0.1
    "retrieval_rrf_fusion",      # rank fusion, multi-branch window
    "embedding_moments_matrix",  # d^2 map-side partials
    "ann_cosine_topk_twostage",  # int8 prefilter + exact rerank
    "scd2_apply_incremental",    # interval-partitioned merge
    # second r08 widening: one representative per remaining plan family
    # that had no measured second decade — the 100x claim should rest
    # on trajectories across ALL plan shapes, not just the worst-cost
    # ones (each smoked at sf10 first: every warm ratio <= ~6x)
    "q9_product_profit",            # 5-way star join + profit agg
    "q13_order_count_distribution", # outer join + count distribution
    "user_event_sequences",         # per-user ordered event arrays
    "sessionize_events",            # gap-based sessionization windows
    "range_join_followup_events",   # time-range self join
    "st_session_window_agg",        # session windows (streaming semantics)
    "privacy_k_anonymity_report",   # k-anon grouping (r07 noise regressor)
    "cm_sketch_events",             # count-min sketch build
    "rolling_7d_distinct_users_hll",# rolling HLL distinct
    # r09 widening: the top absolute line items from the r09 smoke pass
    # (1-rep, cold-cache) graduate to min-of-2 + task-skew so r10 has
    # corroborated numbers for them
    "doc_winnow_fingerprints",      # 22.4 s smoke
    "dedup_duplicate_spans",        # 21.3 s smoke
    "part_pair_cooccurrence",       # r09 bounded-group rewrite (-22%)
    "q18_large_volume_customers",   # 14.1 s smoke, ratio 8.55
    "corpus_curation_pipeline",     # 12.1 s smoke, multi-op chain
]

# Historical note (r02-r05): the sf1 block ran a hand-picked
# "scale-sensitive subset" (46 of ~100). From r06 the block runs the
# FULL headline set: 54 queries had no measured scale curve at all,
# which mattered more than excluding the handful whose inputs are
# scale-invariant by construction (audio_window_features_synthetic's
# fixed synthetic corpus, fuzzy reranks bounded by a <300-key probe
# side) — those simply show ratio ~1 and are self-documenting in the
# per-query ratio table. semantic_dedup_fixed (4 pinned centroids —
# the wrong k at scale, kept for oracle determinism) is no longer a
# pathology entry: the default per-cell cap bounds its pair work, so
# its sf1 cost measures assignment + a bounded join (r05: 64.3 s
# uncapped; capped+broadcast-routed: ~8 s).


def _semantic_dedup_sqrtk(spark, sf_dir):
    """Bench-local (NOT a registry query — no fixed-centroid oracle):
    SemDeDup with k = sqrt(n) trained centroids. Kept for cross-round
    comparison with r04/r05's posture block, but this operating point
    is the DOCUMENTED-WRONG one at corpus scale: within-cell pair work
    is n^1.5/k-ish and Lloyd training with a sqrt(n) literal argmax
    dominates. The production posture is _semantic_dedup_fixedcell."""
    import math

    from py_etl_spark.operators.similarity import ivf_train, semantic_dedup
    from py_etl_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    k = min(128, max(8, math.isqrt(n)))
    cents = ivf_train(emb, k=k, iters=3)
    return semantic_dedup(emb, cents)


def _semantic_dedup_fixedcell(spark, sf_dir):
    """Bench-local: SemDeDup at the paper's production operating point —
    FIXED target cell size (k = ceil(n/256) trained centroids,
    similarity.semantic_dedup_auto), so within-cell pair work stays
    linear in the corpus. Lloyd training cost included."""
    from py_etl_spark.operators.similarity import semantic_dedup_auto
    from py_etl_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out, _ = semantic_dedup_auto(emb, target_cell_size=256, iters=3)
    return out

# key columns to offset per replica copy so FK relationships replicate
# without creating 10-deep duplicate keys (which would inflate join
# fan-outs quadratically instead of scaling them linearly)
_KEY_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_COPIES = 10
_OFFSET = 100_000_000


def _build_replica(
    spark, src_dir: str, dst_dir: str, offset: int = _OFFSET,
    decade: int = 1,
) -> None:
    """Materialize a 10x key-offset replica of src_dir under dst_dir.

    offset must exceed the largest key in src_dir: the sf0.1->sf1 build
    uses 1e8; the sf1->sf10 build uses 1e10 so the second decade's
    offsets clear the first's (keys up to 9e8 + 1e8-range ids).

    ``decade`` selects the content-perturbation FAMILY, and the two
    decades must use ORTHOGONAL families: composing two Caesar shifts
    gives (r_i + r_j) mod 26 — only 26 states for 100 copies, so a
    second decade of shifts would recreate byte-identical documents
    across copies and the duplicate-pair pathology the perturbation
    exists to kill. Decade 1 uses letter SHIFTS (x -> x + r_j) and
    embedding ROTATIONS; decade 2 uses letter MULTIPLIERS
    (x -> k_i * x, k_i coprime to 26 — compositions k_i*x + k_i*r_j
    are 100 DISTINCT affine maps) and Walsh sign-flip masks on the
    embeddings (masks pairwise flip exactly half the dims, so
    cross-copy cosines drop to ~0 instead of compounding rotations
    mod dim)."""
    import shutil

    from pyspark.sql import functions as F

    from py_etl_spark.schemas import load_table

    # cache-bust when the driver regenerates the source data (it did so
    # mid-round in r03) OR when the builder recipe changes: key the
    # replica on source file mtimes+sizes plus a builder version
    stamp = json.dumps(
        {
            "_builder": 3,  # v3: decade-orthogonal perturbation families
            "_offset": offset,
            "_decade": decade,
            **{
                n: [
                    round(os.path.getmtime(p), 3),
                    os.path.getsize(p),
                ]
                for n in _KEY_COLS
                if os.path.exists(p := os.path.join(src_dir, f"{n}.parquet"))
            },
        },
        sort_keys=True,
    )
    marker = os.path.join(dst_dir, "_source_stamp.json")
    if os.path.exists(marker) and open(marker).read() != stamp:
        shutil.rmtree(dst_dir)
        os.makedirs(dst_dir, exist_ok=True)
    for name, keys in _KEY_COLS.items():
        out = os.path.join(dst_dir, f"{name}.parquet")
        if os.path.exists(out):
            continue
        base = load_table(spark, src_dir, name)
        if not keys:  # tiny dims: copy once
            base.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for i in range(_COPIES):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * offset))
            # Perturb CONTENT per copy so replicas are not byte-identical
            # (byte-identical copies make every doc a 10-deep duplicate →
            # content-dedup candidate pairs explode quadratically and the
            # bench measures pathology, not plan cost). Caesar-rotating
            # the alphabet keeps length/token/line structure identical —
            # the workload shape is preserved, only cross-copy shingle
            # equality is destroyed.
            if name == "documents" and i > 0:
                import string

                lo, up = string.ascii_lowercase, string.ascii_uppercase
                if decade == 1:
                    r = i % 25 + 1  # never the identity rotation
                    tgt = lo[r:] + lo[:r] + up[r:] + up[:r]
                else:
                    # affine multiplier map x -> k*x mod 26; k coprime
                    # to 26 so it is a permutation, k != 1 so it is
                    # never the identity
                    k = [3, 5, 7, 9, 11, 15, 17, 19, 21][(i - 1) % 9]
                    perm = "".join(lo[(k * x) % 26] for x in range(26))
                    tgt = perm + perm.upper()
                c = c.withColumn("text", F.translate("text", lo + up, tgt))
            # Cyclically rotate embedding vectors per copy: norm and
            # value distribution are preserved, cross-copy cosines drop
            # from 1.0 to noise — SemDeDup sees 10x corpus, not 10-deep
            # duplicate vectors.
            if name == "embeddings" and i > 0:
                if decade == 1:
                    r = i % 63 + 1  # never the identity rotation
                    c = c.withColumn(
                        "embedding",
                        F.expr(
                            f"concat(slice(embedding, {r + 1}, "
                            f"size(embedding)), slice(embedding, 1, {r}))"
                        ),
                    )
                else:
                    # Walsh sign flip: negate dim d iff popcount(d & i)
                    # is odd. For masks m1 != m2 the flip patterns
                    # differ on exactly half the dims (parity of
                    # d & (m1^m2)), so cross-copy cosines are ~0 —
                    # norms and value distributions untouched.
                    c = c.withColumn(
                        "embedding",
                        F.expr(
                            "transform(embedding, (x, d) -> CASE WHEN "
                            f"bit_count(CAST(d AS INT) & {i}) % 2 = 1 "
                            "THEN -x ELSE x END)"
                        ),
                    )
            parts.append(c)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(out)
    with open(os.path.join(dst_dir, "_source_stamp.json"), "w") as fh:
        fh.write(stamp)


def _skew_posture(spark, sf_dir: str) -> dict:
    """Measured skew-join demonstration at the sf1 replica (VERDICT r05
    ask #6): lineitem ⋈ supplier with 90% of fact rows remapped to ONE
    hot supplier key (deterministic hash bucket, never rand()).

    Three timed runs, broadcast disabled throughout (a broadcastable dim
    hides the skew; at 100 TB the build side often is not broadcastable):

    - ``plain_noaqe``  — SMJ with AQE off: the hot key's ~90% of rows
      land on ONE reducer task — the 100 TB failure mode, measured.
    - ``plain_aqe``    — AQE skew-join splitting on (the runtime fix).
    - ``salted_noaqe`` — operators.skew.salted_join, salt_factor 32
      (the static fix): the hot key spreads over 32 reducer sub-keys.

    Reducer-balance evidence (the "max task input" proxy without the
    Spark UI, which the session factory disables): rows per join-output
    partition, max and median, for the plain and salted no-AQE plans —
    plain concentrates ~90% of output rows in one partition, salted
    spreads them within ~2x of the median.
    """
    from pyspark.sql import functions as F

    from py_etl_spark.operators.skew import salted_join
    from py_etl_spark.schemas import load_table

    fact = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "supplier")
    hot = dim.agg(F.min("s_suppkey").alias("m")).collect()[0]["m"]
    fact = fact.withColumn(
        "j_suppkey",
        F.when(
            F.pmod(
                F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)
            ) < 9,
            F.lit(hot).cast("long"),
        ).otherwise(F.col("l_suppkey")),
    )

    def plain():
        return fact.join(dim, fact["j_suppkey"] == dim["s_suppkey"])

    def salted():
        return salted_join(
            fact, dim, "j_suppkey", "s_suppkey",
            salt_from="l_orderkey", salt_factor=32,
        )

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    out: dict = {"hot_key_share": 0.9, "salt_factor": 32}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for key, aqe, mk in (
            ("plain_noaqe_sec", "false", plain),
            ("plain_aqe_sec", "true", plain),
            ("salted_noaqe_sec", "false", salted),
        ):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            out[key] = round(time.time() - t0, 3)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        for key, mk in (
            ("plain_partition_rows", plain),
            ("salted_partition_rows", salted),
        ):
            rows = (
                mk()
                .select(F.spark_partition_id().alias("pid"))
                .groupBy("pid")
                .count()
                .collect()
            )
            counts = sorted(int(r["count"]) for r in rows)
            out[key] = {
                "n_partitions": len(counts),
                "max": counts[-1],
                "median": counts[len(counts) // 2],
            }
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


def _rest_json(spark, path: str):
    """Spark monitoring REST API (needs spark.ui.enabled=true)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=15) as r:
        return json.loads(r.read().decode())


def _max_stage_id(spark) -> int:
    try:
        return max(
            (s["stageId"] for s in _rest_json(spark, "/stages")), default=-1
        )
    except Exception:
        return -1


def _task_skew_since(spark, after_stage: int):
    """Per-TASK input balance of everything run since ``after_stage``:
    for the stage whose busiest task read the most rows (input +
    shuffle), report that stage's max and median task read and their
    ratio — the per-query analogue of skew_posture's partition-row
    evidence, from the UI status store (no re-execution, no extra jobs).
    A ratio near 1 means reducers are balanced; a large ratio is the
    100 TB straggler signature."""
    try:
        stages = _rest_json(spark, "/stages")
    except Exception:
        return None
    worst = None
    for s in stages:
        if s.get("stageId", -1) <= after_stage:
            continue
        if s.get("status") != "COMPLETE":
            continue
        try:
            ts = _rest_json(
                spark,
                f"/stages/{s['stageId']}/{s.get('attemptId', 0)}"
                "/taskSummary?quantiles=0.5,1.0",
            )
        except Exception:
            continue
        # Keep the input-read and shuffle-read families SEPARATE: a sum
        # of per-family medians is not the median of per-task totals, so
        # a combined ratio is distorted for stages doing both kinds of
        # read. Judge the stage by its worse family.
        md = mx = 0.0
        ratio = None
        for key, sub in (
            ("inputMetrics", "recordsRead"),
            ("shuffleReadMetrics", "readRecords"),
        ):
            q = ts.get(key, {}).get(sub)
            if q and len(q) == 2 and q[1]:
                fam_ratio = (q[1] / q[0]) if q[0] else None
                if q[1] > mx:
                    md, mx = q[0], q[1]
                if fam_ratio is not None and (ratio is None or fam_ratio > ratio):
                    ratio = fam_ratio
        if mx and (worst is None or mx > worst["max_task_rows"]):
            worst = {
                "stage": s["stageId"],
                "n_tasks": s.get("numCompleteTasks"),
                "max_task_rows": int(mx),
                "median_task_rows": int(md),
                "ratio": round(ratio, 2) if ratio is not None else None,
            }
    return worst


def _fresh_anchor(name: str, sf_dir: str, reps: int = 2,
                  timeout: int = 1800):
    """Fresh-session anchor for one query: a subprocess JVM runs ONLY
    this query ``reps`` times (JIT warms on it alone — none of the
    closing sweep's 230-query session state) and the in-JVM min is the
    anchor. r09 closing-bench lesson (SCALING.md §10/§11): in-session
    state inflates heavy queries irrecoverably (pagerank 58.5 s fresh
    vs 96.7 s late-session) and corroboration can't catch it because
    later reps inflate together; one-sample-per-JVM over-corrects by
    ~5× JIT interpretation cost. Returns min/exec split + samples, or
    an error record."""
    import subprocess

    tool = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools",
        "fresh_anchor.py",
    )
    try:
        p = subprocess.run(
            [sys.executable, tool, "--child", name, sf_dir, str(reps)],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"timeout>{timeout}s"}
    samples = [
        json.loads(line[len("SAMPLE "):])
        for line in p.stdout.splitlines()
        if line.startswith("SAMPLE ")
    ]
    if not samples:
        # keep the crash diagnosable (ADVICE r10): a child that OOMs or
        # can't read a table leaves its stderr tail in the record, like
        # tools/fresh_anchor.run_child does on its own path
        return {
            "error": f"child rc={p.returncode}",
            "stderr_tail": p.stderr[-2000:],
        }
    return {
        "min_wall": min(s["wall"] for s in samples),
        "min_exec": min(s["exec"] for s in samples),
        "n": len(samples),
        "samples": samples,
    }


def _loadavg() -> dict:
    """1/5/15-minute load averages. In a container these are HOST-wide
    (shared kernel), which is exactly why they matter here: the r10
    closing sweep was polluted by external host load (loadavg 12-20
    with zero container processes) that nothing in the record guarded
    against (VERDICT r10 item 4)."""
    with open("/proc/loadavg") as fh:
        parts = fh.read().split()
    return {
        "load1": float(parts[0]),
        "load5": float(parts[1]),
        "load15": float(parts[2]),
    }


def _cpu_busy_steal() -> tuple[int, int]:
    """(busy, steal) jiffies from the aggregate /proc/stat cpu line.
    busy = everything except idle+iowait."""
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    vals = [int(x) for x in f[1:]]
    # user nice system idle iowait irq softirq steal guest guest_nice
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals) - idle, steal


def _self_tree_jiffies() -> int:
    """CPU jiffies consumed by THIS process tree: self + every live
    descendant (the py4j JVM, anchor subprocesses) via a /proc walk,
    plus reaped-children time (cutime/cstime — where completed anchor
    JVMs land). A process is either alive in /proc or folded into its
    reaper's cutime, so the sum never double-counts."""
    procs: dict[int, tuple[int, int]] = {}  # pid -> (ppid, jiffies)
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit():
            continue
        try:
            with open(f"/proc/{pid_s}/stat") as fh:
                st = fh.read()
        except OSError:
            continue
        # comm can contain spaces/parens; fields start after the last ')'
        f = st[st.rindex(")") + 2:].split()
        # post-comm indices (0-based): 1=ppid 11=utime 12=stime
        # 13=cutime 14=cstime
        procs[int(pid_s)] = (
            int(f[1]),
            int(f[11]) + int(f[12]) + int(f[13]) + int(f[14]),
        )
    me = os.getpid()
    mine = {me}
    changed = True
    while changed:
        changed = False
        for pid, (ppid, _) in procs.items():
            if pid not in mine and ppid in mine:
                mine.add(pid)
                changed = True
    return sum(procs[p][1] for p in mine if p in procs)


class _LoadMeter:
    """External-CPU meter for one bench block.

    loadavg alone can't adjudicate pollution DURING a run — it is a
    1-minute EWMA that our own 32-thread blocks saturate. The precise
    signal is a /proc/stat delta: external busy cores over the block =
    (total busy jiffies - this process tree's jiffies) / elapsed. On a
    quiet box that's ~0 regardless of what the bench itself is doing;
    the r10 burst (external loadavg 12-20) would read as ~12-20
    external cores and stamp the block.
    """

    def __init__(self) -> None:
        self.hz = os.sysconf("SC_CLK_TCK")
        self.t0 = time.time()
        self.busy0, self.steal0 = _cpu_busy_steal()
        self.self0 = _self_tree_jiffies()
        self.load_before = _loadavg()

    def stop(self, threshold: float) -> dict:
        elapsed = max(time.time() - self.t0, 1e-9)
        busy1, steal1 = _cpu_busy_steal()
        self1 = _self_tree_jiffies()
        ext = max(0.0, (busy1 - self.busy0) - (self1 - self.self0)) / (
            self.hz * elapsed
        )
        rec = {
            "elapsed_sec": round(elapsed, 1),
            "external_busy_cores": round(ext, 2),
            "steal_cores": round(
                (steal1 - self.steal0) / (self.hz * elapsed), 2
            ),
            "loadavg_before": self.load_before,
            "loadavg_after": _loadavg(),
            "load_polluted": bool(ext > threshold),
        }
        return rec


def _burn(_i: int) -> float:
    t0 = time.time()
    x = 0
    for i in range(8_000_000):
        x += i * i
    return time.time() - t0


def _machine_probe(n_procs: int = 0) -> dict:
    """Absolute machine-speed calibration — the meter the r11 closing
    attempt proved necessary. That record's UNTOUCHED-path sf10 anchors
    inflated 46-272% (q21 7.08 → 12.9 s in-bench, 16-18 s solo, SAME
    code checkout A/B'd both ways) while /proc/stat external cores
    (≤1.5), steal (≤1.2) and loadavg all stayed under threshold: a
    hypervisor-level neighbor degrades PARALLEL throughput in a way the
    guest's counters cannot attribute. Fix is calibration, not
    attribution: record (a) the single-core wall of a fixed arithmetic
    loop and (b) the all-cores wall of the same loop in n_procs
    concurrent processes. On a quiet box parallel_wall ≈ single_wall;
    contention shows as parallel_ratio > ~1.3 and/or single_wall far
    off its committed trend — comparable ACROSS records, so a slow
    phase is visible next to the committed baseline even when it is
    invisible in-row."""
    import subprocess

    n = n_procs or (os.cpu_count() or 8)
    single = min(_burn(0) for _ in range(3))
    loop = "x=0\nfor i in range(8_000_000): x+=i*i\n"
    t0 = time.time()
    procs = [
        subprocess.Popen([sys.executable, "-c", loop])
        for _ in range(n)
    ]
    for p in procs:
        p.wait()
    wall = time.time() - t0
    return {
        "n_procs": n,
        "single_wall_sec": round(single, 3),
        # includes ~40 ms/proc interpreter startup — constant across
        # records, so the cross-record comparison still holds
        "parallel_wall_sec": round(wall, 3),
        "parallel_ratio": round(wall / max(single, 1e-9), 2),
    }


def _gate_on_quiet(max_load: float, wait_s: int) -> dict:
    """Hold the bench start until host load1 drops under ``max_load``
    (poll every 30 s up to ``wait_s``); record the gate either way. At
    bench START loadavg is a clean external signal — this process has
    not burned CPU yet."""
    t0 = time.time()
    waited = 0.0
    load = _loadavg()
    while load["load1"] > max_load and (time.time() - t0) < wait_s:
        print(
            f"load gate: load1={load['load1']} > {max_load}, waiting...",
            file=sys.stderr, flush=True,
        )
        time.sleep(30)
        load = _loadavg()
        waited = round(time.time() - t0, 1)
    return {
        "max_load1": max_load,
        "waited_sec": waited,
        "loadavg_at_start": load,
        "passed": load["load1"] <= max_load,
    }


def _free_leaked_storage(spark) -> None:
    """Drop storage blocks left behind by the query that just finished.

    Several queries eagerly ``localCheckpoint`` a narrow invariant frame
    (o2, stable_row_ids, quality_rank, lm_fluency, pagerank adjacency);
    the blocks are only reclaimed when the Python frame is GC'd (py4j
    finalizer → ContextCleaner), so over a 101-query sweep they pile up
    in executor storage and inflate LATER queries — the session-state-
    inflation mechanism SCALING §10/§11 kept adjudicating against fresh
    anchors (ADVICE r11). Runs BETWEEN queries, outside every timed
    region: nothing a finished query produced is ever reused (each rep
    rebuilds from parquet), so this removes no legitimate caching and is
    measurement hygiene, not methodology change.
    """
    import gc

    gc.collect()  # drop py4j refs so the JVM sees the RDDs as unreferenced
    try:
        jsc = spark.sparkContext._jsc
        for rdd_id in list(jsc.getPersistentRDDs().keySet().toArray()):
            jvm_rdd = jsc.getPersistentRDDs().get(rdd_id)
            if jvm_rdd is not None:
                jvm_rdd.rdd().unpersist(False)
    except Exception:
        pass  # hygiene only — never fail a bench block over cleanup


def _run_block(
    qs, names, sf_dir: str, reps: int, spark, skew=None,
    stable_ratio: float = 1.3, extra_reps: int = 4, meta=None,
):
    """Time each query; per-query min and median.

    Adaptive-rep protocol (r09, VERDICT r08 item 1): a fixed min-of-3
    could not adjudicate multi-action queries — fns that run driver-side
    jobs while BUILDING the DataFrame (IVF training collects, boundary
    samples) pay per-rep Catalyst compile + orchestration whose noise
    floor exceeds the signal (ivf_assign_fixed recorded 1.04 s in r07
    and 5.74 s in r08 with zero code change on its path; fresh-session
    reps spanned 6.6 -> 2.6 s). The fix: a min is only reported as
    STABLE when a second sample corroborates it within ``stable_ratio``;
    until then keep running extra reps (up to ``reps + extra_reps``).
    Cheap stable queries still run exactly ``reps`` times; only noisy
    ones pay extra. Per-query rep counts, corroboration flags, and the
    build-vs-execute split of the best rep land in ``meta`` so an
    uncorroborated min is visible in the detail file instead of being
    silently compared across rounds.
    """
    mins: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in names:
        samples: list[float] = []
        builds: list[float] = []
        i = 0
        while True:
            watermark = _max_stage_id(spark) if (
                skew is not None and i == reps - 1
            ) else None
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            builds.append(t1 - t0)
            if watermark is not None:
                skew[name] = _task_skew_since(spark, watermark)
            i += 1
            if i < reps:
                continue
            s = sorted(samples)
            if (
                reps == 1
                or s[1] <= s[0] * stable_ratio
                or i >= reps + extra_reps
            ):
                break
        mins[name] = round(min(samples), 3)
        medians[name] = round(statistics.median(samples), 3)
        _free_leaked_storage(spark)
        if meta is not None:
            s = sorted(samples)
            best = samples.index(min(samples))
            meta[name] = {
                "n_reps": i,
                "min_corroborated": bool(
                    reps > 1 and s[1] <= s[0] * stable_ratio
                ),
                # fn-call time of the best rep: driver-side orchestration
                # (plan build + any collect-backed sub-jobs) vs the noop
                # write that executes the returned plan
                "build_sec": round(builds[best], 3),
                "exec_sec": round(samples[best] - builds[best], 3),
            }
    return mins, medians


_T_BENCH_START = time.time()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # UI on for this session only: the monitoring REST API is what feeds
    # the per-query task-skew column (taskSummary quantiles) without
    # re-running anything. The library session factory keeps it off.
    spark = get_spark("bench", extra_conf={
        "spark.ui.enabled": "true",
        # The closing sweep runs 230+ queries x reps in this one JVM and
        # the UI store's default retention (1000 jobs/stages, 100k tasks)
        # accumulates listener state for ALL of them — a plausible driver
        # of the §10 late-session inflation. The skew capture only reads
        # taskSummary for stages of the LAST rep of the current query
        # (a heavy sf10 query is ~50 stages x 48 tasks), so tight
        # retention loses nothing. Periodic GC at 10min (default 30min)
        # lets the ContextCleaner actually release broadcast/shuffle
        # state mid-sweep instead of piling it to the end.
        "spark.ui.retainedJobs": "100",
        "spark.ui.retainedStages": "300",
        "spark.ui.retainedTasks": "30000",
        "spark.sql.ui.retainedExecutions": "100",
        "spark.cleaner.periodicGC.interval": "10min",
    })

    qs = dict(Q.queries())
    # bench-local entries (scale-posture variants, not registry queries)
    qs["semantic_dedup_sqrtk"] = _semantic_dedup_sqrtk
    qs["semantic_dedup_fixedcell"] = _semantic_dedup_fixedcell
    # warm the JVM/codegen paths once with a trivial action
    spark.range(1).count()
    # load guard (VERDICT r10 item 2): hold the start until the host is
    # quiet, then stamp every block with its measured EXTERNAL cpu so a
    # burst mid-run pollutes a labeled block, not silently the trend
    # line. Threshold 3.0: the meter's noise floor is ~1-1.5 cores
    # during anchor-heavy blocks (short-lived JVM subtrees lose some
    # worker jiffies to init even with the fresh_anchor reap fix, and
    # ambient tenant load fluctuates), while the bursts the guard exists
    # for measured 12-20 external cores in r10 — unmistakable at 3.0.
    ext_thresh = float(os.environ.get("SPARK_GRAFT_EXT_CORES_MAX", "3.0"))
    load_guard = _gate_on_quiet(
        float(os.environ.get("SPARK_GRAFT_LOAD_MAX", "8")),
        int(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "900")),
    )
    load_guard["machine_probe_start"] = _machine_probe()
    block_load: dict = {}
    meter = _LoadMeter()
    rep_meta: dict = {}
    mins, medians = _run_block(
        qs, HEADLINE, sf_dir, reps, spark, meta=rep_meta
    )
    block_load["sf0.1"] = meter.stop(ext_thresh)
    total = round(sum(mins.values()), 3)

    def worst5(d: dict[str, float]) -> dict[str, float]:
        return dict(sorted(d.items(), key=lambda kv: -kv[1])[:5])

    detail = {
        "metric": "headline_query_runtime",
        "value": total,
        "unit": "sec",
        "queries": mins,
        "queries_median": medians,
        "reps": reps,
        "sf": sf,
        # the headline list GROWS each round (14 in r01, 27 in r02, 29 in
        # r03, 95 now) — compare totals across rounds per-query or via
        # this normalized mean, not raw totals
        "n_queries": len(mins),
        "mean_sec_per_query": round(total / max(len(mins), 1), 3),
        # r09 protocol: per-query adaptive-rep evidence — n_reps,
        # whether the min was corroborated by a second sample within
        # 1.3x, and the build(fn-call)/execute(noop write) split of the
        # best rep. An uncorroborated min is NOT comparable across
        # rounds (the r08 ivf_assign_fixed lesson).
        "rep_meta": rep_meta,
        # machine_probe_start/end: absolute speed calibration (see
        # _machine_probe) — compare across records, not within one
        "load_guard": load_guard,
        # per-block /proc/stat external-cpu deltas + loadavg samples;
        # load_polluted flips if ANY block saw external load above the
        # threshold (SPARK_GRAFT_EXT_CORES_MAX, default 3 cores)
        "block_load": block_load,
        "external_cores_threshold": ext_thresh,
    }

    detail_file = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
    )

    def flush() -> None:
        """Write the detail file and print the compact line NOW.

        Called after every completed block, so a mid-run kill (driver
        timeout, OOM) still leaves (a) a committed-able detail file and
        (b) a parseable compact JSON as the last stdout line — the r04
        lesson was that an unparseable tail costs the whole round's
        bench evidence. Stage-progress noise goes to stderr, so stdout
        is exactly these JSON lines; the driver's tail parse picks up
        the last (most complete) one.
        """
        detail["load_polluted"] = bool(
            not load_guard["passed"]
            or any(b.get("load_polluted") for b in block_load.values())
        )
        # one absolute-speed probe per completed block (~2 s): the
        # cross-record comparison that catches hypervisor-level
        # slow phases the in-row counters can't (see _machine_probe)
        detail.setdefault("machine_probes", []).append(
            {"t_rel_sec": round(time.time() - _T_BENCH_START, 1),
             **_machine_probe()}
        )
        with open(detail_file, "w") as fh:
            json.dump(detail, fh, indent=2, sort_keys=True)
        compact = {
            "metric": detail["metric"],
            "value": total,
            "unit": "sec",
            "sf": sf,
            "reps": reps,
            "n_queries": len(mins),
            "mean_sec_per_query": detail["mean_sec_per_query"],
            "load_polluted": detail["load_polluted"],
            # driver contract keeps a "queries" dict; truncated to the
            # 5 most expensive so the line stays tail-capture-safe —
            # the full dict lives in detail_file
            "queries": worst5(mins),
            "queries_truncated_to": "worst5",
            "detail_file": os.path.basename(detail_file),
        }
        if "sf1" in detail:
            compact["sf1"] = {
                "sf": 1.0,
                "total": detail["sf1"]["total"],
                "n_queries": len(detail["sf1"]["queries"]),
                "worst5": worst5(detail["sf1"]["queries"]),
            }
        if "sf10" in detail:
            compact["sf10"] = {
                "total": detail["sf10"]["total"],
                "n_queries": len(detail["sf10"]["queries"]),
                "n_smoke": len(detail["sf10"].get("smoke_queries", {})),
                "superlinear_flags": detail["sf10"]["superlinear_flags"],
            }
            if "fresh_anchors" in detail["sf10"]:
                compact["sf10"]["fresh_anchors"] = {
                    n: a.get("min_wall", a.get("error"))
                    for n, a in detail["sf10"]["fresh_anchors"].items()
                }
                compact["sf10"]["flags_cleared_by_fresh_anchor"] = (
                    detail["sf10"][
                        "superlinear_flags_cleared_by_fresh_anchor"
                    ]
                )
        for k in ("semdedup_sqrtk_posture", "semdedup_fixedcell_posture"):
            if k in detail:
                compact[k.replace("_posture", "_ratio_10x")] = detail[k][
                    "ratio_10x"
                ]
        if "skew_posture" in detail:
            compact["skew"] = {
                kk: detail["skew_posture"][kk]
                for kk in ("plain_noaqe_sec", "plain_aqe_sec",
                           "salted_noaqe_sec")
            }
        if "cdc_throughput" in detail:
            compact["cdc_events_per_sec"] = detail["cdc_throughput"][
                "events_per_sec"
            ]
        print(json.dumps(compact), flush=True)

    flush()

    if sf == 0.1 and os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        sf1_dir = os.environ.get(
            "SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1"
        )
        t0 = time.time()
        os.makedirs(sf1_dir, exist_ok=True)
        _build_replica(spark, sf_dir, sf1_dir)
        build_sec = round(time.time() - t0, 3)
        sf1_reps = max(2, reps - 1)
        sf1_meta: dict = {}
        meter = _LoadMeter()
        s_mins, s_medians = _run_block(
            qs, HEADLINE, sf1_dir, sf1_reps, spark, meta=sf1_meta
        )
        block_load["sf1"] = meter.stop(ext_thresh)
        # per-query first-decade ratio: sf1 min / sf0.1 min. Floor the
        # denominator at 50 ms — below that the "ratio" measures job
        # launch overhead, not the plan
        ratios1 = {
            n: round(s_mins[n] / max(mins[n], 0.05), 2)
            for n in s_mins
            if n in mins
        }
        detail["sf1"] = {
            "sf": 1.0,
            "dir": sf1_dir,
            "note": "10x key-offset replica of sf0.1 (built once, "
                    f"{build_sec}s; text Caesar-rotated / embeddings "
                    "rotated per copy); FULL headline set from r06 "
                    "(r02-r05 ran a 46-query subset)",
            "reps": sf1_reps,
            "queries": s_mins,
            "queries_median": s_medians,
            "rep_meta": sf1_meta,
            "ratio_vs_sf0.1": ratios1,
            "total": round(sum(s_mins.values()), 3),
        }
        flush()

        # Second decade: 10x replica OF THE sf1 REPLICA (~sf10, 100x
        # the sf0.1 base) for the queries with the worst first-decade
        # ratios. One rep — the point is curvature, not noise floors:
        # a query whose sf1->sf10 ratio exceeds its sf0.1->sf1 ratio
        # is super-linear and gets flagged.
        if os.environ.get("SPARK_GRAFT_SF10", "1") != "0":
            sf10_dir = os.environ.get(
                "SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10"
            )
            t0 = time.time()
            os.makedirs(sf10_dir, exist_ok=True)
            _build_replica(
                spark, sf1_dir, sf10_dir, offset=10_000_000_000,
                decade=2,
            )
            build10_sec = round(time.time() - t0, 3)
            # min-of-2 minimum (VERDICT r06: reps=1 could not adjudicate
            # a 2x single-sample swing on the shared box — the pagerank
            # 19.6x-vs-9.66x conflict), plus per-query task skew from
            # the UI store, captured on the last rep.
            sf10_reps = max(
                2, int(os.environ.get("SPARK_GRAFT_SF10_REPS", "2"))
            )
            sf10_skew: dict = {}
            sf10_meta: dict = {}
            meter = _LoadMeter()
            t_mins, _ = _run_block(
                qs, SF10_SUBSET, sf10_dir, sf10_reps, spark,
                skew=sf10_skew, extra_reps=2, meta=sf10_meta,
            )
            ratios2 = {
                n: round(t_mins[n] / max(s_mins[n], 0.05), 2)
                for n in t_mins
                if n in s_mins
            }
            # Super-linear = worse than the data growth itself. A
            # LINEAR operator's decade ratio climbs toward 10 as fixed
            # overhead stops dominating — so comparing ratio2 against
            # ratio1 mis-flags every healthy query whose first decade
            # was overhead-dominated (ratio1 of 2-3 is the overhead
            # signature, not an efficiency bound). Flag only a ratio
            # that exceeds 10x data growth plus a 15% single-rep noise
            # margin; ratio2/ratio1 curvature still lands in the detail
            # for trend reading.
            flags = sorted(n for n in ratios2 if ratios2[n] > 11.5)
            # Smoke pass (VERDICT r08 item 3): one rep at sf10 for EVERY
            # remaining headline query, so the 100x claim rests on a
            # measured trajectory for all of them, not a family-sampling
            # argument. One rep is enough for the cheap tail; anything
            # whose single-rep decade ratio flags gets a confirming
            # min-of-2 before judging (the first sf10 touch of a table
            # is always cold — st_session measured 23 s cold / 2.8 s
            # warm in r08). Disable with SPARK_GRAFT_SF10_SMOKE=0.
            smoke_mins: dict = {}
            smoke_ratios: dict = {}
            if os.environ.get("SPARK_GRAFT_SF10_SMOKE", "1") != "0":
                smoke_names = [
                    n for n in HEADLINE if n not in SF10_SUBSET
                ]
                smoke_mins, _ = _run_block(
                    qs, smoke_names, sf10_dir, 1, spark
                )
                suspects = [
                    n for n in smoke_names
                    if smoke_mins[n] / max(s_mins.get(n, 0.0), 0.05)
                    > 11.5
                ]
                if suspects:
                    re_mins, _ = _run_block(
                        qs, suspects, sf10_dir, 2, spark, extra_reps=2
                    )
                    for n in suspects:
                        smoke_mins[n] = min(smoke_mins[n], re_mins[n])
                smoke_ratios = {
                    n: round(
                        smoke_mins[n] / max(s_mins.get(n, 0.0), 0.05), 2
                    )
                    for n in smoke_names
                    if n in s_mins
                }
                flags = sorted(
                    set(flags)
                    | {n for n in smoke_ratios if smoke_ratios[n] > 11.5}
                )
            detail["sf10"] = {
                "sf": 10.0,
                "dir": sf10_dir,
                "note": "10x key-offset replica of the sf1 replica "
                        f"(built once, {build10_sec}s; offset 1e10 so "
                        "second-decade keys clear first-decade ones); "
                        "min-of-N reps, worst-first-decade subset; "
                        "task_skew = busiest stage's max/median task "
                        "input+shuffle rows (UI taskSummary, last rep)",
                "reps": sf10_reps,
                "queries": t_mins,
                "task_skew": sf10_skew,
                "rep_meta": sf10_meta,
                "smoke_queries": smoke_mins,
                "smoke_ratio_vs_sf1": smoke_ratios,
                "smoke_note": "1 rep (cold-cache caveat; min-of-2 "
                              "confirm for any flag) — every headline "
                              "query now has an sf10 data point",
                "ratio_vs_sf1": ratios2,
                "ratio_vs_sf0.1_decade1": {
                    n: ratios1.get(n) for n in t_mins
                },
                "superlinear_flags": flags,
                "total": round(sum(t_mins.values()), 3),
            }
            block_load["sf10"] = meter.stop(ext_thresh)
            flush()

            # Fresh-session anchors (r10 protocol, VERDICT r09 item 3):
            # the top-10 heaviest sf10 queries re-run in a FRESH
            # subprocess JVM each (in-JVM min-of-2). These are the
            # comparable round-over-round numbers for heavy queries —
            # the single-session sweep above stays for coverage only.
            # Any superlinear flag additionally gets an anchor.
            #
            # r11 (VERDICT r10 item 1): BOTH arms of the decade ratio
            # are fresh-JVM now. r10 divided a fresh sf10 min by the
            # IN-SWEEP page-cache-hot sf1 min — the exact mixed-protocol
            # trap SCALING §11's standing rule names — which kept
            # adjudicated-linear queries flagged at 15.5×/13.4× when the
            # same-protocol ratios are 7.4×/~4×. The two arms of one
            # query run back-to-back (sf10 then sf1) so box-load drift
            # hits both; a flag whose SAME-PROTOCOL decade ratio clears
            # the 11.5 threshold is recorded as cleared (the part_pair
            # r09 lesson: in-session arms inflate together, so the flag
            # threshold fires on session state, not curvature).
            if os.environ.get("SPARK_GRAFT_FRESH_ANCHORS", "1") != "0":
                meter = _LoadMeter()
                all10 = {**smoke_mins, **t_mins}
                anchor_names = sorted(
                    all10, key=lambda n: -all10[n]
                )[:10]
                anchor_names += [
                    n for n in flags if n not in anchor_names
                ]
                anchors: dict = {}
                anchors1: dict = {}
                for n in anchor_names:
                    anchors[n] = _fresh_anchor(n, sf10_dir)
                    anchors1[n] = _fresh_anchor(n, sf1_dir)
                anchor_ratios = {
                    n: round(
                        anchors[n]["min_wall"]
                        / max(anchors1[n].get("min_wall", 0.05), 0.05),
                        2,
                    )
                    for n in anchors
                    if "min_wall" in anchors[n]
                    and "min_wall" in anchors1[n]
                }
                detail["sf10"]["fresh_anchors"] = anchors
                detail["sf10"]["fresh_anchors_sf1"] = anchors1
                detail["sf10"]["fresh_anchor_ratio_vs_sf1"] = (
                    anchor_ratios
                )
                detail["sf10"]["fresh_anchor_ratio_note"] = (
                    "same-protocol: fresh-JVM in-JVM-min in BOTH "
                    "positions (sf10 anchor / sf1 anchor), arms "
                    "back-to-back per query; r10's ratio mixed a fresh "
                    "numerator over an in-sweep denominator"
                )
                detail["sf10"][
                    "superlinear_flags_cleared_by_fresh_anchor"
                ] = sorted(
                    n for n in flags
                    if n in anchor_ratios and anchor_ratios[n] <= 11.5
                )
                block_load["fresh_anchors"] = meter.stop(ext_thresh)
                flush()

        # SemDeDup posture block, BOTH operating points at both scales,
        # Lloyd training cost included, outside the headline total so
        # training does not skew the cross-round mean_sec_per_query:
        #   sqrtk     — k = sqrt(n): the r04/r05-comparable point, kept
        #               to show the documented-wrong asymptote
        #   fixedcell — k = ceil(n/256): the SemDeDup paper posture;
        #               pair work linear in the corpus
        for key, qname in (
            ("semdedup_sqrtk_posture", "semantic_dedup_sqrtk"),
            ("semdedup_fixedcell_posture", "semantic_dedup_fixedcell"),
        ):
            p_small, _ = _run_block(qs, [qname], sf_dir, 1, spark)
            p_big, _ = _run_block(qs, [qname], sf1_dir, 1, spark)
            s01 = p_small[qname]
            s10 = p_big[qname]
            detail[key] = {
                "sf0.1_sec": s01,
                "sf1_sec": s10,
                "ratio_10x": round(s10 / max(s01, 1e-9), 2),
            }
        flush()

        detail["skew_posture"] = _skew_posture(spark, sf1_dir)
        flush()

        # CDC throughput posture: the reference's main loop is
        # single-threaded row-at-a-time with an implied steady-state
        # ceiling of <=5 events/s (BASELINE.md: 100-event micro-batch /
        # 20 s poll, one ODBC+LDAP round-trip per record). Measure the
        # set-oriented CDC merge end-to-end (latest-event-per-key window
        # + join-based SCD1 apply) over the sf1 replica's full event log
        # and record events/s — the single-node-throughput comparison
        # the rebuild is graded on, as a measured number.
        meter = _LoadMeter()
        n_events = spark.read.parquet(
            os.path.join(sf1_dir, "events.parquet")
        ).count()
        cdc_meta: dict = {}
        cdc_mins, _ = _run_block(
            qs, ["cdc_merge_scd1"], sf1_dir, 2, spark, meta=cdc_meta
        )
        cdc_wall = cdc_mins["cdc_merge_scd1"]
        detail["cdc_throughput"] = {
            "events": n_events,
            "wall_sec": cdc_wall,
            "rep_meta": cdc_meta["cdc_merge_scd1"],
            "events_per_sec": round(n_events / max(cdc_wall, 1e-9)),
            "reference_ceiling_events_per_sec": 5,
            "note": "cdc_merge_scd1 (window + merge kernel) over the "
                    "sf1 replica's whole event log, adaptive min; "
                    "reference ceiling from BASELINE.md (100-event "
                    "batch / 20 s poll, row-at-a-time). The sf1 figure "
                    "carries a ~0.5 s fixed plan-compile floor on a "
                    "~1 s query (r07 1.29M vs r08 1.18M was THAT, not "
                    "a regression — adjudicated r09); the sf10 block "
                    "below is the cleaner steady-state number.",
        }
        # steady-state variant at 10x the events (when the sf10 replica
        # exists): the fixed ~0.5 s driver compile is ~5 % of wall here
        # instead of ~45 %, so this is the number that tracks per-event
        # cost across rounds. r09 solo measurement: 10M events,
        # wall 2.78 s -> 3.6M ev/s (exec-only 4.45M).
        if os.environ.get("SPARK_GRAFT_SF10", "1") != "0":
            sf10_dir = os.environ.get(
                "SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10"
            )
            ev10 = os.path.join(sf10_dir, "events.parquet")
            if os.path.exists(ev10):
                n10 = spark.read.parquet(ev10).count()
                m10: dict = {}
                c10, _ = _run_block(
                    qs, ["cdc_merge_scd1"], sf10_dir, 2, spark, meta=m10
                )
                w10 = c10["cdc_merge_scd1"]
                x10 = m10["cdc_merge_scd1"]["exec_sec"]
                detail["cdc_throughput"]["sf10"] = {
                    "events": n10,
                    "wall_sec": w10,
                    "rep_meta": m10["cdc_merge_scd1"],
                    "events_per_sec": round(n10 / max(w10, 1e-9)),
                    "events_per_sec_exec_only": round(
                        n10 / max(x10, 1e-9)
                    ),
                }
        block_load["cdc"] = meter.stop(ext_thresh)
        flush()

    spark.stop()



if __name__ == "__main__":
    main()
