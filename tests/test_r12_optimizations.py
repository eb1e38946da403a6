"""Focused pins for the r12 optimization rewrites (bit-equality of the
fast paths against the reference spellings they replaced)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from py_etl_spark.operators import dedup, similarity
from py_etl_spark.operators.ranking import (
    with_global_position,
    with_global_positions,
)


# ---------------------------------------------------------------------
# similarity._dot/_norm: unrolled-codegen path ≡ interpreted HOF fold
# ---------------------------------------------------------------------

def test_dot_unrolled_matches_hof_bitwise(spark):
    """The dim-unrolled dot/norm must reproduce the zip_with+aggregate
    fold BIT-FOR-BIT (same IEEE addition order), including the per-row
    guard's fallback on ragged rows: length ≠ dim keeps the interpreted
    fold's semantics exactly."""
    rows = [
        (1, [1.5, -2.25, 3.0, 0.125], [4.0, 0.5, -1.75, 2.0]),
        (2, [0.1, 0.2, 0.3, 0.4], [0.7, 0.11, 0.13, 0.17]),
        (3, [1e-300, 1e300, -1e300, 1.0], [1.0, 1.0, 1.0, 1.0]),
        (4, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),  # ragged: len 3 ≠ dim 4
        (5, None, [1.0, 2.0, 3.0, 4.0]),  # NULL vector
        (6, [-0.0, -0.0, -0.0, -0.0], [1.0, 1.0, 1.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )
    out = df.select(
        "id",
        similarity._dot(F.col("a"), F.col("b")).alias("hof"),
        similarity._dot(F.col("a"), F.col("b"), 4).alias("fast"),
        similarity._norm(F.col("a")).alias("nhof"),
        similarity._norm(F.col("a"), 4).alias("nfast"),
    ).collect()
    for r in out:
        for x, y in ((r["hof"], r["fast"]), (r["nhof"], r["nfast"])):
            if x is None or y is None:
                assert x is None and y is None, r
            else:
                assert math.copysign(1.0, x) == math.copysign(1.0, y), r
                assert x == y and str(x) == str(y), r


def test_dot_unrolled_float_inputs(spark):
    """array<float> inputs cast per element exactly as the fold does."""
    df = spark.createDataFrame(
        [(1, [0.1, 0.7, -0.3], [1.1, 2.2, 3.3])],
        "id long, a array<float>, b array<float>",
    )
    r = df.select(
        similarity._dot(F.col("a"), F.col("b")).alias("hof"),
        similarity._dot(F.col("a"), F.col("b"), 3).alias("fast"),
    ).collect()[0]
    assert r["hof"] == r["fast"]


# ---------------------------------------------------------------------
# dedup.exploded_shingles: zip-slice map-side build ≡ window-lead build
# ---------------------------------------------------------------------

def _old_exploded_shingles(df, text_col="text", id_col="doc_id", k=3):
    """The r09–r11 posexplode+lead spelling, kept here as the reference
    semantics for the map-side rewrite."""
    from pyspark.sql import Window as W

    ex = df.select(
        F.col(id_col), F.posexplode(dedup._norm_tokens(text_col)).alias("pos", "tok")
    )
    w = W.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, k)]
    n = F.count(F.lit(1)).over(W.partitionBy(id_col))
    return (
        ex.select(
            id_col,
            "pos",
            F.concat_ws(" ", "tok", *leads).alias("shingle"),
            n.alias("__n"),
        )
        .filter(
            (F.col("pos") <= F.col("__n") - k)
            | ((F.col("__n") < k) & (F.col("pos") == 0))
        )
        .select(id_col, "shingle")
    )


def test_exploded_shingles_matches_window_spelling(spark):
    rows = [
        (1, "the quick brown fox jumps"),
        (2, "a b"),                      # n < k → one joined shingle
        (3, "single"),                   # n = 1
        (4, ""),                         # normalizes to [''] → one '' token
        (5, None),                       # NULL → no rows
        (6, "x " * 50),                  # longer doc
        (7, "Dup dup DUP dup dup"),      # repeated tokens keep multiplicity
        (8, "!!! ??"),                   # no alnum → [''] → one row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (2, 3, 5):
        new = dedup.exploded_shingles(df, k=k)
        old = _old_exploded_shingles(df, k=k)
        assert new.exceptAll(old).count() == 0, f"k={k}: new ⊄ old"
        assert old.exceptAll(new).count() == 0, f"k={k}: old ⊄ new"


def test_exploded_shingles_is_mapside(spark):
    """The shingle build must carry NO exchange of the token stream —
    the downstream signature aggregation supplies the only shuffle."""
    from tests.conftest import SF_SMALL
    from py_etl_spark.schemas import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    plan = dedup.exploded_shingles(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------
# segment_dedup / duplicate_span_mask: dup-set join ≡ occurrence window
# ---------------------------------------------------------------------

def test_segment_dedup_matches_window_occurrence_semantics(spark):
    b = "one two three four five"          # a 5-word block
    rows = [
        (1, b + " unique tail here now ok"),
        (2, b + " other words entirely different"),
        (3, "totally fresh text with no repeats"),
        (4, ""),                             # empty doc
        (5, b),                              # doc == the duplicated block
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(df, segment_words=5, max_occurrences=1)
        .collect()
    }
    # block b occurs in docs 1, 2, 5 → dropped everywhere
    assert out[1]["n_segments"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["text_dedup"] == "unique tail here now ok"
    assert out[2]["n_kept"] == 1
    assert out[3]["n_kept"] == 2  # both its segments unique
    assert out[5]["n_kept"] == 0 and out[5]["text_dedup"] == ""


def test_duplicate_span_mask_still_masks_cross_doc_spans(spark):
    span = "alpha beta gamma delta epsilon"
    rows = [
        (1, "start words " + span + " ending bits"),
        (2, span + " unrelated continuation text here"),
        (3, "no duplicated content in this document"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.duplicate_span_mask(df, span_words=5).collect()
    }
    assert out[1]["n_dup_tokens"] == 5
    assert "gamma" not in out[1]["text_dedup"]
    assert out[1]["text_dedup"].startswith("start words")
    assert out[2]["n_dup_tokens"] == 5
    assert out[3]["n_dup_tokens"] == 0


# ---------------------------------------------------------------------
# ranking.with_global_positions: fused multi-rank ≡ N single ranks
# ---------------------------------------------------------------------

def test_with_global_positions_matches_single_rank_operator(spark):
    from tests.conftest import SF_SMALL
    from py_etl_spark.schemas import load_table

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "n_chars", F.length("text").alias("tlen")
    )
    fused = with_global_positions(
        docs,
        [
            ("p_len", [(-F.col("n_chars")).alias("neg"), F.col("doc_id")]),
            ("p_tlen", [(-F.col("tlen")).alias("neg"), F.col("doc_id")]),
        ],
    ).select("doc_id", "p_len", "p_tlen")
    single_a = with_global_position(
        docs, [(-F.col("n_chars")).alias("neg"), F.col("doc_id")],
        position_col="p_len",
    ).select("doc_id", "p_len")
    single_b = with_global_position(
        docs, [(-F.col("tlen")).alias("neg"), F.col("doc_id")],
        position_col="p_tlen",
    ).select("doc_id", "p_tlen")
    joined = single_a.join(single_b, "doc_id")
    assert fused.exceptAll(joined).count() == 0
    assert joined.exceptAll(fused).count() == 0


def test_with_global_positions_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, v long")
    out = with_global_positions(df, [("p", [F.col("v"), F.col("doc_id")])])
    assert out.count() == 0
    assert "p" in out.columns


# ---------------------------------------------------------------------
# connected_components: fused first round + lazy checkpoints
# ---------------------------------------------------------------------

def test_connected_components_fused_init_trajectory(spark):
    """Star + chain + singleton: labels must equal min-reachable-id, and
    the fused least(node, min(nbr)) init must not change convergence
    detection (a 1-round graph converges with sum unchanged on the
    first loop round)."""
    edges = spark.createDataFrame(
        [(5, 9), (9, 7), (1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in dedup.connected_components(edges).collect()
    }
    assert got == {5: 5, 9: 5, 7: 5, 1: 1, 2: 1, 3: 1, 4: 1}
