"""Physical-plan hygiene: the scale properties the engine promises.

These assert *plan shape*, not results: predicates and projections reach
the parquet scan, dimensions broadcast, shuffle counts stay at the
semantic minimum. A regression here is a 100 TB performance bug even when
sf0.01 results stay correct.
"""

from __future__ import annotations

import py_etl_spark.queries as Q
from py_etl_spark.plans import (
    broadcast_join_count,
    has_pushed_filters,
    node_count,
    scan_read_schema,
    shuffle_count,
    single_partition_exchange_count,
)
from tests.conftest import SF_MED


def test_filter_pushdown_reaches_scan(spark):
    df = Q.REGISTRY["s2_keyset_range_scan"].fn(spark, SF_MED)
    assert has_pushed_filters(df, "o_orderkey")


def test_point_lookup_pushdown(spark):
    df = Q.REGISTRY["s3_point_lookup"].fn(spark, SF_MED)
    assert has_pushed_filters(df, "o_orderkey")


def test_column_pruning(spark):
    df = Q.REGISTRY["s1_full_scan_projection"].fn(spark, SF_MED)
    assert set(scan_read_schema(df)) == {
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    }


def test_q1_prunes_and_pushes(spark):
    df = Q.REGISTRY["q1_pricing_summary"].fn(spark, SF_MED)
    cols = set(scan_read_schema(df))
    # only the 7 referenced columns are read, not all 16
    assert "l_partkey" not in cols and "l_suppkey" not in cols
    assert has_pushed_filters(df, "l_shipdate")
    # one shuffle for the groupBy, nothing else
    assert shuffle_count(df) == 1


def test_q5_broadcasts_dimensions(spark):
    df = Q.REGISTRY["q5_local_supplier_volume"].fn(spark, SF_MED)
    assert broadcast_join_count(df) >= 3  # region⋈nation, dims, supplier


def test_lookup_join_broadcasts(spark):
    df = Q.REGISTRY["j2_event_entity_lookup"].fn(spark, SF_MED)
    assert broadcast_join_count(df) == 1
    assert shuffle_count(df) == 0  # broadcast ⇒ no exchange on the fact side


def test_semi_join_pushes_projection(spark):
    df = Q.REGISTRY["p6_keyset_semi_join"].fn(spark, SF_MED)
    # the orders side reads only its join+filter columns
    schemas = [set(scan_read_schema(df))]
    assert {"l_orderkey", "l_partkey", "l_quantity"} <= schemas[0]


def test_cdc_merge_shuffle_budget(spark):
    df = Q.REGISTRY["cdc_merge_scd1"].fn(spark, SF_MED)
    # latest-per-key agg (1) + merge join keyed on uid; broadcast keeps
    # the rest shuffle-free. Budget: ≤4 exchanges. r11: latest-per-key is
    # a max(struct) hash aggregate (map-side partial combine), never a
    # row_number window sort of the full event stream.
    assert shuffle_count(df) <= 4
    assert node_count(df, "Window") == 0


def test_a3_latest_per_key_is_aggregate_not_window(spark):
    df = Q.REGISTRY["a3_last_writer_wins"].fn(spark, SF_MED)
    # r11 rewrite: last-writer-wins = max(struct(ts, event_id, payload))
    # — one partially-aggregated exchange, no event-stream sort
    assert node_count(df, "Window") == 0
    assert shuffle_count(df) <= 1


def test_scan_projection_is_codegen(spark):
    from py_etl_spark.plans import wholestage_codegen_spans

    df = Q.REGISTRY["s1_full_scan_projection"].fn(spark, SF_MED)
    # AQE hides subtree counts for multi-stage plans pre-execution; a plain
    # scan+project must still report ≥1 codegen span (no interpreted path).
    assert wholestage_codegen_spans(df) >= 1


def test_q3_topk_is_take_ordered_not_global_window(spark):
    df = Q.REGISTRY["q3_shipping_priority"].fn(spark, SF_MED)
    # top-10 must be TakeOrderedAndProject (per-partition top-k + driver
    # merge), never a row_number() window with no PARTITION BY
    assert node_count(df, "TakeOrderedAndProject") == 1
    assert node_count(df, "Window") == 0
    assert single_partition_exchange_count(df) == 0


def test_o2_global_rank_no_exchange_to_one(spark):
    df = Q.REGISTRY["o2_case_insensitive_sort"].fn(spark, SF_MED)
    # zipWithIndex pattern: windows are partitioned by range bucket; no
    # operator funnels all rows into one partition
    assert single_partition_exchange_count(df) == 0


def test_a5_boundaries_no_exchange_to_one(spark):
    df = Q.REGISTRY["a5_partition_boundaries"].fn(spark, SF_MED)
    assert single_partition_exchange_count(df) == 0


def test_q10_topk_is_take_ordered(spark):
    df = Q.REGISTRY["q10_returned_revenue"].fn(spark, SF_MED)
    assert node_count(df, "TakeOrderedAndProject") == 1
    assert node_count(df, "Window") == 0
    assert broadcast_join_count(df) >= 1  # customer dim broadcast


def test_q2_argmin_window_is_partitioned(spark):
    df = Q.REGISTRY["q2_min_cost_supplier"].fn(spark, SF_MED)
    # the argmin partitions by l_partkey — never exchange-to-one; r11:
    # argmin is min(struct(unit_cost, l_suppkey)) — a hash aggregate
    # with map-side partial combine, not a fact-wide window sort
    assert single_partition_exchange_count(df) == 0
    assert broadcast_join_count(df) >= 2  # part + supplier dims
    assert node_count(df, "Window") == 0


def test_q4_exists_aggregates_fact_below_join(spark):
    from py_etl_spark.plans import executed_plan

    df = Q.REGISTRY["q4_order_priority_exists"].fn(spark, SF_MED)
    plan = executed_plan(df)
    # r11 shape: EXISTS(l_shipdate > o_orderdate) is evaluated as
    # max(l_shipdate) > o_orderdate per order key, so lineitem is
    # aggregated (map-side combined) BEFORE the orders join instead of
    # riding a fact-wide semi join; the derived l_shipdate lower bound
    # must reach the parquet scan.
    assert "LeftSemi" not in plan
    assert "GreaterThan(l_shipdate" in plan  # PushedFilters at the scan
    assert single_partition_exchange_count(df) == 0
    # the only fact-sized exchange is the per-orderkey max partial agg +
    # the join/agg downstream of metadata-sized survivors
    assert shuffle_count(df) <= 3


def test_minhash_signature_single_shuffle_per_stage(spark):
    from py_etl_spark.operators import dedup
    from py_etl_spark.schemas import load_table

    docs = load_table(spark, SF_MED, "documents")
    sigs = dedup.minhash_signatures(docs)
    # shingle window + signature groupBy hash-partition on the same key;
    # budget: ≤2 exchanges
    assert shuffle_count(sigs) <= 2

def test_q7_broadcasts_dims_and_limits_shuffles(spark):
    df = Q.REGISTRY["q7_nation_volume"].fn(spark, SF_MED)
    # supplier + both nation aliases broadcast; only the fact-side joins
    # (lineitem⋈orders⋈customer) and the final groupBy may shuffle
    assert broadcast_join_count(df) >= 3
    assert single_partition_exchange_count(df) == 0
    assert has_pushed_filters(df, "l_shipdate")


def test_q12_pushes_date_range_single_agg_shuffle(spark):
    df = Q.REGISTRY["q12_priority_lineclass"].fn(spark, SF_MED)
    assert has_pushed_filters(df, "l_shipdate")
    cols = set(scan_read_schema(df))
    assert "l_extendedprice" not in cols  # pruned: only keys + status read
    assert single_partition_exchange_count(df) == 0


def test_q19_envelope_filters_reach_scans(spark):
    df = Q.REGISTRY["q19_disjunctive_brand_revenue"].fn(spark, SF_MED)
    # the hoisted conjunctive envelopes must be pushed into BOTH scans
    assert has_pushed_filters(df, "l_quantity")
    assert has_pushed_filters(df, "p_brand")
    assert broadcast_join_count(df) == 1


def test_token_count_stays_jvm_side(spark):
    from py_etl_spark.plans import executed_plan

    df = Q.REGISTRY["token_count_bpe"].fn(spark, SF_MED)
    plan = executed_plan(df)
    # regexp tokenization must not fall back to a Python worker
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert shuffle_count(df) == 1  # the 20-key groupBy only


def test_q13_preaggregates_orders_before_outer_join(spark):
    df = Q.REGISTRY["q13_order_count_distribution"].fn(spark, SF_MED)
    # orders-per-custkey agg + join + distribution agg: bounded shuffles,
    # and the raw order rows never shuffle un-aggregated (partial count
    # runs map-side before the custkey exchange)
    assert shuffle_count(df) <= 4
    assert single_partition_exchange_count(df) == 0


def test_q15_scalar_max_broadcasts(spark):
    df = Q.REGISTRY["q15_top_supplier"].fn(spark, SF_MED)
    # 1-row max aggregate and the supplier dim both broadcast back onto
    # the revenue view — no second lineitem scan shuffle
    assert broadcast_join_count(df) >= 2
    assert has_pushed_filters(df, "l_shipdate")


def test_q17_part_prune_before_avg(spark):
    df = Q.REGISTRY["q17_small_quantity_revenue"].fn(spark, SF_MED)
    # brand/type filter reaches the part scan; both the part prune and the
    # per-part threshold join broadcast
    assert has_pushed_filters(df, "p_brand")
    assert broadcast_join_count(df) >= 2


def test_q22_pushes_date_and_broadcasts_scalar(spark):
    df = Q.REGISTRY["q22_idle_customer_balance"].fn(spark, SF_MED)
    assert has_pushed_filters(df, "o_orderdate")
    assert broadcast_join_count(df) >= 1  # 1-row avg via broadcast NLJ


def test_quality_filter_is_mapside_only(spark):
    from py_etl_spark.plans import executed_plan

    df = Q.REGISTRY["quality_filter_gopher"].fn(spark, SF_MED)
    plan = executed_plan(df)
    assert shuffle_count(df) == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivf_topk_no_cartesian_no_corpus_shuffle(spark):
    from py_etl_spark.plans import executed_plan

    df = Q.REGISTRY["ann_ivf_topk_fixed"].fn(spark, SF_MED)
    plan = executed_plan(df)
    # candidate selection is a broadcast equi-join on cell — never a
    # cross product; the only exchange is the top-k window on query_id
    assert "CartesianProduct" not in plan
    assert broadcast_join_count(df) >= 1
    assert shuffle_count(df) <= 1


def test_q21_single_orderkey_shuffle_family(spark):
    df = Q.REGISTRY["q21_last_shipper"].fn(spark, SF_MED)
    # per-order agg + join back share the orderkey partitioning; supplier
    # broadcasts; nothing funnels to one partition
    assert broadcast_join_count(df) >= 1
    assert single_partition_exchange_count(df) == 0


def test_pii_scrub_mapside_no_python(spark):
    from py_etl_spark.plans import executed_plan

    df = Q.REGISTRY["pii_scrub_stats"].fn(spark, SF_MED)
    plan = executed_plan(df)
    assert shuffle_count(df) == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_range_join_is_banded_equi_join(spark):
    from py_etl_spark.plans import executed_plan

    df = Q.REGISTRY["range_join_followup_events"].fn(spark, SF_MED)
    plan = executed_plan(df)
    # the hour-bucket banding must make this a hash/merge EQUI join — a
    # theta-only join would appear as BroadcastNestedLoopJoin or cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q8_broadcasts_all_dims(spark):
    df = Q.REGISTRY["q8_market_share"].fn(spark, SF_MED)
    # part, n1(region⋈nation), supplier, n2 all broadcast; only the fact
    # joins shuffle
    assert broadcast_join_count(df) >= 4
    assert has_pushed_filters(df, "o_orderdate")


def test_q16_anti_join_broadcasts_and_two_phase_distinct(spark):
    df = Q.REGISTRY["q16_supplier_part_counts"].fn(spark, SF_MED)
    assert broadcast_join_count(df) >= 2  # excluded suppliers + part dim
    assert shuffle_count(df) <= 2         # partial-distinct, then final agg
    assert has_pushed_filters(df, "p_brand")


def test_q20_semi_join_consumes_aggregate(spark):
    df = Q.REGISTRY["q20_heavy_part_suppliers"].fn(spark, SF_MED)
    assert broadcast_join_count(df) >= 2  # part prefix set + heavy-supplier set
    assert single_partition_exchange_count(df) == 0


def test_q9_broadcasts_all_dims_one_fact_shuffle(spark):
    df = Q.REGISTRY["q9_product_profit"].fn(spark, SF_MED)
    # part, supplier, nation broadcast; only lineitem⋈orders + agg shuffle
    assert broadcast_join_count(df) >= 3
    assert shuffle_count(df) <= 2
    assert has_pushed_filters(df, "p_name")


def test_q11_scalar_threshold_broadcasts(spark):
    df = Q.REGISTRY["q11_important_stock"].fn(spark, SF_MED)
    # nation→supplier dim and the 1-row threshold both broadcast; the
    # scalar never forces the part-keyed aggregate to one partition
    assert broadcast_join_count(df) >= 3
    assert single_partition_exchange_count(df) == 0
    # both branches (output + threshold) hang off the same part-keyed
    # aggregate: AQE must reuse that exchange so lineitem scans ONCE
    from py_etl_spark.plans import executed_plan

    df.collect()
    assert "ReusedExchange" in executed_plan(df)


def test_winnow_fingerprints_single_shuffle(spark):
    df = Q.REGISTRY["doc_winnow_fingerprints"].fn(spark, SF_MED)
    # gram explode + hash are map-side; the doc_id window partitioning is
    # reused by the distinct AND the per-doc aggregate — exactly 1 Exchange
    assert shuffle_count(df) == 1
    assert single_partition_exchange_count(df) == 0


def test_split_op_is_shuffle_free(spark):
    from py_etl_spark.operators.corpus import deterministic_split
    from py_etl_spark.schemas import load_table

    df = deterministic_split(load_table(spark, SF_MED, "documents"))
    assert shuffle_count(df) == 0  # pure map-side hash bucketing


def test_quota_single_window_shuffle(spark):
    df = Q.REGISTRY["corpus_token_budget_quota"].fn(spark, SF_MED)
    assert shuffle_count(df) == 1
    assert single_partition_exchange_count(df) == 0


def test_decontaminate_broadcasts_benchmark(spark):
    df = Q.REGISTRY["corpus_decontaminate_vs_benchmark"].fn(spark, SF_MED)
    # the benchmark shingle set broadcasts; the corpus text never shuffles
    # (its only exchanges are doc_id-keyed: shingle window + hit count)
    assert broadcast_join_count(df) >= 1
    assert shuffle_count(df) <= 3
    assert single_partition_exchange_count(df) == 0


def test_chunking_is_map_side_only(spark):
    df = Q.REGISTRY["corpus_chunk_tokens"].fn(spark, SF_MED)
    assert shuffle_count(df) == 0  # tokenize + explode + slice: no exchange


def test_pack_examples_single_shard_shuffle(spark):
    df = Q.REGISTRY["corpus_pack_examples"].fn(spark, SF_MED)
    # chunking is map-side; packing costs exactly one exchange (hash
    # partition by shard) feeding the applyInPandas walk
    assert shuffle_count(df) == 1
    assert single_partition_exchange_count(df) == 0


def test_repetition_metrics_zero_shuffle(spark):
    df = Q.REGISTRY["quality_repetition_metrics"].fn(spark, SF_MED)
    # per-doc Counters need no cross-row data: pure map-side mapInPandas
    assert shuffle_count(df) == 0


def test_quantize_int8_zero_shuffle(spark):
    df = Q.REGISTRY["embedding_quantize_int8"].fn(spark, SF_MED)
    assert shuffle_count(df) == 0  # pure Column HOFs over the scan


def test_skew_profile_no_global_window(spark):
    df = Q.REGISTRY["key_skew_profile_lineitem"].fn(spark, SF_MED)
    # totals via broadcast scalar, top-k via TakeOrderedAndProject:
    # nothing funnels all rows into one partition
    assert node_count(df, "TakeOrderedAndProject") == 1
    assert node_count(df, "Window") == 0
    assert single_partition_exchange_count(df) == 0


def test_assemble_examples_shuffle_budget(spark):
    df = Q.REGISTRY["corpus_assemble_examples"].fn(spark, SF_MED)
    # chunking map-side + pack shard exchange + example groupBy: <=2
    assert shuffle_count(df) <= 2
    assert single_partition_exchange_count(df) == 0


def test_mix_report_single_shuffle(spark):
    df = Q.REGISTRY["corpus_mix_report"].fn(spark, SF_MED)
    # split + token count map-side; only the (source, split) groupBy moves
    assert shuffle_count(df) == 1
    assert single_partition_exchange_count(df) == 0


def test_segment_dedup_two_shuffles_no_python(spark):
    df = Q.REGISTRY["dedup_segments_corpus"].fn(spark, SF_MED)
    # semantic minimum: one window shuffle on the segment (corpus-wide
    # occurrence count) + one groupBy shuffle on doc_id (reassembly)
    assert shuffle_count(df) == 2
    assert single_partition_exchange_count(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # JVM-only: split/explode/slice/window/agg


def test_scd2_history_single_exchange(spark):
    df = Q.REGISTRY["scd2_history_from_events"].fn(spark, SF_MED)
    # no-op filter sits between two identically-partitioned windows, so
    # Spark plans ONE exchange + sort for the whole history build
    assert shuffle_count(df) == 1
    assert single_partition_exchange_count(df) == 0


def test_sample_mixture_zero_shuffle_pruned_scan(spark):
    df = Q.REGISTRY["corpus_sample_mixture"].fn(spark, SF_MED)
    assert shuffle_count(df) == 0  # pure map-side hash-threshold filter
    assert set(scan_read_schema(df)) == {"doc_id", "source", "lang", "n_chars"}


def test_semantic_dedup_no_cartesian(spark):
    df = Q.REGISTRY["semantic_dedup_fixed"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # pair generation must be a cell-id equi-join, never a cross product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_cap_precedes_pair_join(spark):
    # the degenerate-cell guard must be IN the plan: a row_number window
    # + rank filter upstream of the pair join, so per-cell pair work is
    # bounded at cell_cap^2/2 however degenerate the cell
    df = Q.REGISTRY["semantic_dedup_fixed"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "row_number" in plan
    i_win = plan.index("row_number")
    joins = [
        i for i in range(len(plan))
        if plan.startswith("SortMergeJoin", i)
        or plan.startswith("BroadcastHashJoin", i)
    ]
    # executedPlan prints top-down: the cap window sits BELOW (after, in
    # string order) the pair join it feeds
    assert joins and i_win > min(joins)
    # the 4-centroid fixture routes the capped a-side through a
    # broadcast, so the pair work parallelizes over b-side partitions
    # instead of 4 join keys
    assert "BroadcastHashJoin" in plan


def test_quality_score_hashed_linear_zero_shuffle(spark):
    df = Q.REGISTRY["quality_score_hashed_linear"].fn(spark, SF_MED)
    assert shuffle_count(df) == 0  # literal weights + Column HOFs only
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_funnel_single_shuffle(spark):
    df = Q.REGISTRY["funnel_signup_click_purchase"].fn(spark, SF_MED)
    # sorted-array fold: ONE groupBy shuffle regardless of step count
    assert shuffle_count(df) == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_kmv_two_shuffles_no_exchange_to_one(spark):
    df = Q.REGISTRY["kmv_distinct_users"].fn(spark, SF_MED)
    # distinct on (group, hash) + per-group top-k window/agg; never a
    # global sort or exchange-to-one
    assert shuffle_count(df) == 2
    assert single_partition_exchange_count(df) == 0


def test_cohort_retention_bounded_shuffles(spark):
    df = Q.REGISTRY["cohort_retention_weekly"].fn(spark, SF_MED)
    # first-activity agg + activity distinct (both user-keyed) + the tiny
    # (cohort, offset) rollup
    assert shuffle_count(df) == 3
    assert single_partition_exchange_count(df) == 0


def test_zorder_key_zero_shuffle(spark):
    df = Q.REGISTRY["zorder_key_orders"].fn(spark, SF_MED)
    assert shuffle_count(df) == 0  # pure shift/mask arithmetic over the scan


def test_fuzzy_join_no_cartesian(spark):
    df = Q.REGISTRY["fuzzy_join_part_names"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_build_two_shuffles(spark):
    df = Q.REGISTRY["bloom_build_users"].fn(spark, SF_MED)
    # explode is map-side; (group, word) bit_or + per-group array assembly
    assert shuffle_count(df) == 2
    assert single_partition_exchange_count(df) == 0


def test_dedup_incremental_no_exchange_to_one(spark):
    df = Q.REGISTRY["dedup_incremental_batch"].fn(spark, SF_MED)
    assert single_partition_exchange_count(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_cm_sketch_bounded_shuffles(spark):
    df = Q.REGISTRY["cm_sketch_events"].fn(spark, SF_MED)
    # depth-way explode is map-side; (group, d, pos) count is the only
    # data-sized shuffle, then two metadata-sized assembly aggs
    assert shuffle_count(df) == 3
    assert single_partition_exchange_count(df) == 0


def test_lm_score_no_cartesian_no_exchange_to_one(spark):
    df = Q.REGISTRY["lm_fluency_bits"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # model joins are equi-joins (broadcast or shuffled), never a cross
    # product; per-doc totals never collapse to one partition
    assert "CartesianProduct" not in plan
    assert single_partition_exchange_count(df) == 0


def test_bm25_scorer_is_map_side_plus_topk(spark):
    df = Q.REGISTRY["bm25_search_topk"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # corpus stats collapse into ONE broadcast-scalar agg row; the
    # per-doc scorer is a map-side expression over the scan and top-k is
    # TakeOrderedAndProject (per-partition heaps), not a global sort
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")
    # the only aggregation shuffle is the single-row stats agg
    assert shuffle_count(df) <= 1


def test_duplicate_span_mask_bounded_shuffles(spark):
    df = Q.REGISTRY["dedup_duplicate_spans"].fn(spark, SF_MED)
    # shingle-occurrence window + doc coverage agg + doc join-back
    assert shuffle_count(df) <= 4
    assert single_partition_exchange_count(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_hist_sketch_two_shuffles_quantile_walk_free(spark):
    df = Q.REGISTRY["hist_quantile_prices"].fn(spark, SF_MED)
    # bin assignment map-side; (group, bin) count + per-group assembly;
    # the quantile estimate is a pure Column walk over the counts array
    assert shuffle_count(df) == 2
    assert single_partition_exchange_count(df) == 0


def test_analyze_table_bounded_shuffles_no_cartesian(spark):
    df = Q.REGISTRY["analyze_stats_orders"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # global 1-row agg + KMV distinct/top-k over the unpivot + the tiny
    # per-column join — never a data-sized exchange-to-one beyond the
    # single-row stats aggregate
    assert shuffle_count(df) <= 5


def test_interval_overlap_join_no_cartesian_no_dedup_agg(spark):
    df = Q.REGISTRY["interval_overlap_signup_purchase"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # banded equi-join with the max-start anchor: no cross product AND no
    # dedup aggregate anywhere (pairs are emitted exactly once by
    # construction); one exchange per join side at most
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Aggregate" not in plan
    assert shuffle_count(df) <= 2


def test_hll_sketch_two_shuffles_no_exchange_to_one(spark):
    df = Q.REGISTRY["hll_distinct_event_ids"].fn(spark, SF_MED)
    # bucket/rank map-side on the hash; one (group, bucket) max-shuffle
    # (map-side partial — shuffle volume ≤ groups·m rows); one per-group
    # register assembly agg. Estimator is a Column walk, shuffle-free.
    assert shuffle_count(df) == 2
    assert single_partition_exchange_count(df) == 0


def test_hll_rollup_merges_metadata_not_data(spark):
    df = Q.REGISTRY["hll_rollup_doc_ids"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two sketch builds (2 shuffles each) + the register-wise-max merge
    # over groups·m metadata rows + the 1-row × 1-row broadcast join —
    # never a cross product over data, never Python
    assert "CartesianProduct" not in plan
    assert broadcast_join_count(df) == 1
    assert shuffle_count(df) <= 6


def test_session_window_single_shuffle(spark):
    df = Q.REGISTRY["st_session_window_agg"].fn(spark, SF_MED)
    # one exchange on the session-window grouping; gap-merge is a
    # sort-based within-partition pass (same plan under readStream)
    assert shuffle_count(df) == 1
    assert single_partition_exchange_count(df) == 0


def test_boilerplate_filter_mapside_jvm_only(spark):
    df = Q.REGISTRY["quality_boilerplate_lines"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # pure Column HOFs over the scan: zero shuffles, zero Python workers
    assert shuffle_count(df) == 0
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_anomaly_days_windows_daily_rollup_only(spark):
    df = Q.REGISTRY["events_anomaly_days"].fn(spark, SF_MED)
    # raw events see exactly ONE shuffle (the map-side-combined daily
    # count); the trailing-baseline window then runs over ≤ one row per
    # day — the global sort is metadata-scale by construction
    assert shuffle_count(df) == 2
    assert single_partition_exchange_count(df) == 0


def test_dq_report_minimal_passes(spark):
    df = Q.REGISTRY["dq_check_orders"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # 4 row checks fold into ONE conditional-sum scan; unique() adds one
    # key-count shuffle; fk() is a broadcast anti-join (fact table never
    # shuffles for the referential check)
    assert "CartesianProduct" not in plan
    assert broadcast_join_count(df) == 1
    assert shuffle_count(df) <= 5


def test_compression_ratio_arrow_batched_no_shuffle(spark):
    df = Q.REGISTRY["quality_compression_ratio"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the zlib pass is Arrow-batched (never row-at-a-time Python) and
    # fully map-side
    assert shuffle_count(df) == 0
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_weighted_sample_is_take_ordered_no_shuffle(spark):
    df = Q.REGISTRY["corpus_sample_weighted"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # A-ES key is map-side arithmetic; top-k compiles to
    # TakeOrderedAndProject (per-partition heaps) — the corpus is never
    # globally sorted or shuffled
    assert "TakeOrderedAndProject" in plan
    assert shuffle_count(df) == 0
    assert single_partition_exchange_count(df) == 0


def test_trending_ranks_over_rollup_not_raw_events(spark):
    df = Q.REGISTRY["trending_event_types_hourly"].fn(spark, SF_MED)
    # one map-side-combined (window, type) count; the rank window then
    # partitions by window over the rollup (metadata-scale) — 2 total
    assert shuffle_count(df) == 2
    assert single_partition_exchange_count(df) == 0


def test_audio_windows_arrow_batched_single_bucketing_shuffle(spark):
    df = Q.REGISTRY["audio_window_features_synthetic"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only exchange is the size-bucket repartition bounding task
    # payloads; the codec runs in Arrow batches, never row-Python
    assert "MapInPandas" in plan
    assert shuffle_count(df) == 1
    assert "BatchEvalPython" not in plan


def test_embedding_moments_bounded_shuffles_no_python(spark):
    df = Q.REGISTRY["embedding_moments_matrix"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # ONE shuffle: the (i, j) partial-Gram sum, bounded at tasks·d² rows.
    # The Gram accumulation itself is an Arrow-batched mapInPandas
    # (vectorized numpy int64 — r08, replaced the 3-agg nested-transform
    # explode that was 8x slower at sf10); quantization stays a JVM
    # Column expression so rounding semantics never touch numpy.
    assert shuffle_count(df) == 1
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_hll_grouping_sets_no_cartesian_bounded(spark):
    df = Q.REGISTRY["hll_grouping_sets_docs"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # three rollup levels over the shared finest-grain sketch; Spark's
    # exchange reuse collapses the common base at execution — statically
    # each level shows its build + merge pair
    assert "CartesianProduct" not in plan
    assert shuffle_count(df) <= 12
    assert single_partition_exchange_count(df) == 0


def test_fuzzy_rerank_single_extra_shuffle_no_python(spark):
    df = Q.REGISTRY["fuzzy_rerank_levenshtein"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # candidate stage reuses fuzzy_join's plan; the re-rank's string
    # joins broadcast (candidates are small), Levenshtein is a JVM
    # expression — no Python, no cross product
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert shuffle_count(df) <= 3


def test_interleave_single_source_window_shuffle(spark):
    df = Q.REGISTRY["corpus_interleave_sources"].fn(spark, SF_MED)
    # per-source rank window is the only exchange; stride key is
    # map-side BIGINT arithmetic
    assert shuffle_count(df) == 1
    assert single_partition_exchange_count(df) == 0


def test_drift_report_reuses_hist_shuffles(spark):
    df = Q.REGISTRY["dq_drift_doc_lengths"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two hist_sketch builds (2 shuffles each); the TV/KS comparison is
    # a zip_with walk over the two single-row sketches (their join is a
    # 1-row broadcast, not a data cross product)
    assert shuffle_count(df) == 4
    assert single_partition_exchange_count(df) == 0
    assert "CartesianProduct" not in plan


def test_star_fk_audit_broadcasts_small_dims_only(spark):
    df = Q.REGISTRY["dq_check_star_fks"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # part/supplier/customer/nation anti-joins broadcast; the
    # lineitem→orders edge is declared broadcast=False (both sides
    # key-shuffled at scale — AQE may still locally convert at sf0.01)
    assert "CartesianProduct" not in plan
    assert broadcast_join_count(df) >= 4
    assert shuffle_count(df) <= 10


def test_event_sequences_single_user_shuffle(spark):
    df = Q.REGISTRY["user_event_sequences"].fn(spark, SF_MED)
    # one user-keyed exchange with map-side partial collect_list; the
    # total (ts, event_id) sort key orders arrays deterministically
    assert shuffle_count(df) == 1
    assert single_partition_exchange_count(df) == 0


def test_top_bigrams_one_count_shuffle_then_topk(spark):
    df = Q.REGISTRY["corpus_top_bigrams"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # adjacent-pair explode map-side; ONE count shuffle; top-k is
    # per-partition heaps, never a global sort
    assert shuffle_count(df) == 1
    assert "TakeOrderedAndProject" in plan


def test_bucketizer_broadcasts_cuts_row(spark):
    df = Q.REGISTRY["feature_bucketize_order_prices"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # hist build (2) + final per-bucket agg (1); the quantile-cut row
    # reaches the data side as a 1-row broadcast, assignment map-side
    assert shuffle_count(df) == 3
    assert broadcast_join_count(df) == 1
    assert "CartesianProduct" not in plan


def test_keep_canonical_windows_metadata_not_text(spark):
    df = Q.REGISTRY["dedup_keep_canonical"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the canonical-pick window shuffles only (id, cluster, quality)
    # triples (CC stages are localCheckpoint-bounded upstream); the
    # clusters↔quality join broadcasts. r09: +1 exchange for CC's
    # singleton-attach join (corpus ids ⋈ edge-node labels) — the trade
    # that removed the CORPUS-sized label rows from every propagate
    # iteration; one n-row join once beats n rows per iteration.
    assert "CartesianProduct" not in plan
    assert shuffle_count(df) <= 3
    assert single_partition_exchange_count(df) == 0


def test_asof_forward_equi_join_with_residual_range(spark):
    df = Q.REGISTRY["asof_next_order_within_30d"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # customer equi-join with the 30-day bound as residual — hash join,
    # never a nested-loop over dates; argmin window partitioned by line
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert broadcast_join_count(df) == 2
    assert shuffle_count(df) <= 2


def test_pit_join_key_equi_with_residual_bounds(spark):
    df = Q.REGISTRY["scd2_point_in_time_features"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the interval bounds ride the user-keyed equi-join as residuals —
    # never a nested loop over time; history build + join co-partition
    # on the key so one exchange family serves both
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert shuffle_count(df) <= 2


def test_split_leakage_single_fp_shuffle_then_metadata(spark):
    df = Q.REGISTRY["split_leakage_report"].fn(spark, SF_MED)
    # split assignment is map-side hash arithmetic; ONE fingerprint
    # count shuffle; the report is a metadata rollup
    assert shuffle_count(df) <= 3
    assert single_partition_exchange_count(df) == 0


def test_cooccurrence_bounded_basket_no_self_join(spark):
    df = Q.REGISTRY["part_pair_cooccurrence"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # r09 bounded-group shape (the q21 recipe): one order-keyed
    # collect_list with the 16-smallest cap as sort_array+slice, pairs
    # exploded in-row — the fact table is scanned ONCE and there is NO
    # self-join left in the plan (the old shape scanned lineitem twice
    # and sorted both sides for the SMJ)
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    # basket groupBy + pair-count groupBy, both map-side combined
    assert shuffle_count(df) == 2


def test_label_centroids_bounded_sum_shuffle(spark):
    df = Q.REGISTRY["embedding_label_centroids"].fn(spark, SF_MED)
    # (label, i) explode map-side; one sum shuffle bounded at
    # tasks·labels·d partials; per-label assembly agg
    assert shuffle_count(df) == 2
    assert single_partition_exchange_count(df) == 0


def test_hard_negatives_same_plan_as_ann_baseline(spark):
    df = Q.REGISTRY["ann_hard_negatives"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # broadcast probes ⋈ corpus with the label filter BEFORE ranking;
    # one top-k window shuffle over (id, id, score) triples
    assert broadcast_join_count(df) == 1
    assert shuffle_count(df) == 1
    assert "CartesianProduct" not in plan


def test_knn_agreement_vote_windows_on_metadata(spark):
    df = Q.REGISTRY["knn_label_agreement"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # r11 shape: the broadcast sides are the METADATA frames (k·|probes|
    # topk rows, |probes| q-labels) — never the corpus-sized label
    # table, which now streams map-side through the neighbor join with
    # zero exchange. The two extra exchanges vs the old pin (vote
    # groupBy + winner window) carry ≤ k·|probes| rows; the only
    # data-sized exchange remains the ANN top-k window.
    assert "CartesianProduct" not in plan
    assert broadcast_join_count(df) >= 2
    assert shuffle_count(df) <= 4


def test_word_dropout_mapside_zero_shuffle(spark):
    df = Q.REGISTRY["corpus_augment_word_dropout"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # index-aware array filter is pure JVM map-side work
    assert shuffle_count(df) == 0
    assert "BatchEvalPython" not in plan


def test_vocab_report_two_token_shuffles(spark):
    df = Q.REGISTRY["vocab_coverage_report"].fn(spark, SF_MED)
    # vocab count + the token↔vocab join/source rollup — both keyed on
    # the token/source; AQE broadcasts the vocab when it fits
    assert shuffle_count(df) <= 4
    assert single_partition_exchange_count(df) == 0


def test_rank_ensemble_no_exchange_to_one(spark):
    df = Q.REGISTRY["quality_rank_ensemble"].fn(spark, SF_MED)
    # three bucketed global ranks (with_global_position) + two id joins
    # — bounded exchanges, and crucially ZERO single-partition sorts
    assert single_partition_exchange_count(df) == 0
    assert shuffle_count(df) <= 8


def test_outlier_scores_broadcast_centroids(spark):
    df = Q.REGISTRY["embedding_outlier_scores"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # centroid build (2 bounded shuffles) + per-label top-5 window; the
    # vector↔centroid join is a labels-sized broadcast, the distance an
    # integer array walk map-side
    assert broadcast_join_count(df) == 1
    assert shuffle_count(df) <= 3
    assert "CartesianProduct" not in plan


def test_blocklist_gate_single_token_shuffle(spark):
    df = Q.REGISTRY["safety_blocklist_filter"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # token explode map-side; ONE doc-keyed rollup + the doc join (AQE
    # broadcasts the hit table when it fits)
    assert "CartesianProduct" not in plan
    assert shuffle_count(df) <= 3


def test_partition_gap_grid_is_metadata(spark):
    df = Q.REGISTRY["partition_gap_report"].fn(spark, SF_MED)
    # the only data-sized shuffle is the daily count; the day grid is a
    # sequence() over one bounds row
    assert shuffle_count(df) <= 3
    assert single_partition_exchange_count(df) == 0


def test_posting_lists_two_bounded_shuffles(spark):
    df = Q.REGISTRY["search_posting_lists"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert shuffle_count(df) == 2


def test_last_n_uses_window_group_limit(spark):
    df = Q.REGISTRY["last_n_events_per_user"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the rank ≤ N filter pushes into the sort as WindowGroupLimit —
    # each task keeps ≤N rows per key BEFORE the exchange
    assert shuffle_count(df) == 1
    assert "WindowGroupLimit" in plan


def test_transition_matrix_two_bounded_shuffles(spark):
    df = Q.REGISTRY["event_transition_matrix"].fn(spark, SF_MED)
    # user-keyed lead window + the |types|²-sized pair rollup
    assert shuffle_count(df) == 2
    assert single_partition_exchange_count(df) == 0


def test_pmi_counts_join_token_keyed_no_cartesian(spark):
    df = Q.REGISTRY["token_pmi_pairs"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # unigram + bigram count shuffles; token-keyed count joins (AQE
    # broadcasts); the single-row total joins as a 1-row broadcast;
    # the ratio is exact BIGINT DIV — no float in the ordering
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert shuffle_count(df) <= 6


def test_rolling_hll_no_range_nested_loop(spark):
    df = Q.REGISTRY["rolling_7d_distinct_users_hll"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # ONE data-sized shuffle (the daily (day, bucket) max); the 7-day
    # window merge is a ≤7x map-side explode of metadata cells + a
    # broadcast day filter — never a nested-loop range join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert broadcast_join_count(df) == 1
    assert shuffle_count(df) <= 4


def test_pareto_skyline_no_all_pairs(spark):
    df = Q.REGISTRY["pareto_frontier_docs"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # per-q collapse + suffix-max over |distinct q| rows — the O(n²)
    # dominance join lives only in the oracle
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert shuffle_count(df) <= 3


def test_truncate_head_tail_zero_shuffle(spark):
    df = Q.REGISTRY["corpus_truncate_head_tail"].fn(spark, SF_MED)
    assert shuffle_count(df) == 0


def test_posting_merge_index_sized_shuffles(spark):
    df = Q.REGISTRY["posting_lists_incremental_merge"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two index builds + the (tok, doc) merge sum + per-term assembly —
    # all over index-sized rows, never re-reading corpus text
    assert "CartesianProduct" not in plan
    assert shuffle_count(df) <= 8


def test_rrf_fusion_over_rank_metadata(spark):
    df = Q.REGISTRY["retrieval_rrf_fusion"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both rankers' plans (broadcast probes, 1 top-k window each); the
    # fusion full-outer join + final rank window ride k·|queries| rank
    # rows — metadata, not corpus
    assert "CartesianProduct" not in plan
    assert shuffle_count(df) <= 5
    assert single_partition_exchange_count(df) == 0


def test_stable_row_ids_no_exchange_to_one(spark):
    df = Q.REGISTRY["stable_row_ids_docs"].fn(spark, SF_MED)
    # the whole point: exact global 1..N WITHOUT a single-partition sort
    assert single_partition_exchange_count(df) == 0
    assert shuffle_count(df) <= 4


def test_cusum_single_daily_shuffle(spark):
    df = Q.REGISTRY["events_cusum_alarm"].fn(spark, SF_MED)
    # raw events pay ONE count shuffle; the ordered fold runs over the
    # ≤days-long rollup array
    assert shuffle_count(df) <= 2


def test_source_similarity_pairs_are_metadata(spark):
    df = Q.REGISTRY["source_similarity_matrix"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # per-source sketch build (corpus scanned once); the all-pairs join
    # carries sources² rows of 128 longs — metadata (the inequality
    # join plans as a tiny nested loop over those rows, which is fine;
    # what must never happen is a corpus-sized cross product)
    assert shuffle_count(df) <= 5
    assert single_partition_exchange_count(df) == 0


def test_privacy_audit_single_group_pass(spark):
    df = Q.REGISTRY["privacy_k_anonymity_report"].fn(spark, SF_MED)
    # one quasi-identifier group shuffle (count + count-distinct with
    # map-side partials) + the single-row metadata rollup
    assert shuffle_count(df) <= 3
