"""N-gram language-model fluency scoring — the CCNet-family quality
filter (Wenzek et al. 2020 trains a KenLM 5-gram and drops
high-perplexity documents; reference parity: py-etl has no LM, this is
part of the LLM-pipeline surface this engine adds).

Reduced to its Spark-native, engine-portable core: a bigram model with
stupid backoff (Brants et al. 2007 — "Large language models in machine
translation" showed the un-normalized backoff loses almost nothing at
corpus scale and needs no discount bookkeeping), scored in INTEGER code
lengths:

    bits(w2 | w1) = ⌊log2(c(w1) / c(w1,w2))⌋          if bigram seen
                  = B + ⌊log2(N / c(w2))⌋             else if w2 seen
                  = B + OOV + ⌊log2 N⌋                else

⌊log2 k⌋ is ``length(bin(k)) - 1`` — a pure integer/string computation
both Spark and DuckDB evaluate identically, so per-document totals are
exact BIGINT sums (order-independent, hash-matchable) rather than
float log-sums whose last-ulp behavior differs per libm. Quantizing
log2 to whole bits costs <1 bit of resolution per token — irrelevant
for a keep/drop gate — and buys bit-exact reproducibility on any
engine, the same doctrine as the sigmoid-free hashed-linear gate
(textstats.quality_score_hashed_linear). B ≙ -log2 α of stupid
backoff (B=2 ⟺ α=0.25); OOV adds a vocabulary-escape penalty.

Scale shape: training is two groupBy counts over exploded tokens/pairs
(map-side partial agg; the model tables are vocabulary-sized, orders of
magnitude below the corpus). Scoring is two equi-joins of the exploded
pair stream against the model (AQE broadcasts them when they fit) plus
one per-doc sum — no Python, no UDF, no driver materialization beyond
the single total-token scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_etl_spark.functions.numeric import float_round
from py_etl_spark.operators.corpus import TOKEN_RE

# Stupid-backoff penalty in bits (2 bits ⟺ backoff weight alpha = 0.25)
BACKOFF_BITS = 2
# Extra escape penalty for out-of-vocabulary continuations
OOV_BITS = 4


def _tokens(text_col: str) -> F.Column:
    """Lowercased corpus pre-tokens (the corpus TOKEN_RE family)."""
    return F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_RE), F.lit(0)
    )


def tokenize_docs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, toks)``: the corpus pre-tokenization as a narrow frame.

    Train + score together walk the token stream four times (unigram
    counts, bigram pairs, the total-token scalar, the scoring pairs);
    with lazy plans each walk re-runs the TOKEN_RE regex over every
    corpus byte — the dominant cost at scale (~4 full regex passes of
    45.9 s total at sf10). Materialize this frame ONCE
    (``tokenize_docs(df).localCheckpoint(eager=True)``) and pass it as
    ``toks_df`` to :func:`train_bigram_lm` / :func:`lm_score`: every
    pass then re-reads serialized token arrays (no regex, no parquet
    decode) from executor-local block storage. The frame is
    corpus-sized but narrow — (id, array<string>) — and spills to local
    disk if it outgrows storage memory."""
    return df.select(F.col(id_col), _tokens(text_col).alias("toks"))


def _toks_frame(
    df: DataFrame | None,
    toks_df: DataFrame | None,
    id_col: str,
    text_col: str,
) -> DataFrame:
    if toks_df is not None:
        return toks_df
    return tokenize_docs(df, id_col, text_col)


def _pairs(
    df: DataFrame | None,
    id_col: str,
    text_col: str,
    toks_df: DataFrame | None = None,
) -> DataFrame:
    """(id, w1, w2) for every adjacent token pair; docs with <2 tokens
    contribute nothing. Explode is map-side; the token array lives only
    inside one task's row scope."""
    base = _toks_frame(df, toks_df, id_col, text_col)
    toks = F.col("toks")
    n = F.size(toks)
    zipped = F.arrays_zip(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )
    return base.select(
        F.col(id_col), F.explode(zipped).alias("p")
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def train_bigram_lm(
    df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks_df: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Count model: returns ``(unigrams, bigrams)`` where unigrams is
    ``(w, c)`` and bigrams is ``(w1, w2, c12, c1)`` — c1 denormalized
    onto the bigram row at train time so scoring's seen-bigram branch
    needs ONE join, not two. One count-shuffle each, both with map-side
    partial aggregation; output is vocabulary-sized. Pass ``toks_df``
    (a materialized :func:`tokenize_docs` frame) to avoid re-running
    the tokenizer regex over the corpus per count family."""
    base = _toks_frame(df, toks_df, id_col, text_col)
    toks = base.select(F.explode(F.col("toks")).alias("w"))
    unigrams = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    bigrams = (
        _pairs(df, id_col, text_col, toks_df=toks_df)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .join(
            unigrams.select(F.col("w").alias("w1"), F.col("c").alias("c1")),
            "w1",
        )
    )
    return unigrams, bigrams


def _ilog2(col: F.Column) -> F.Column:
    """⌊log2 k⌋ for k ≥ 1 as an exact integer: highest-set-bit position
    = length of the binary string minus one. No float log anywhere."""
    return (F.length(F.bin(col)) - 1).cast("long")


def lm_score(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    total_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_avg_bits: float = 8.0,
    toks_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document fluency: total/average stupid-backoff code length in
    bits over adjacent-pair transitions.

    Output: ``(id_col, n_pairs, total_bits, avg_bits, is_fluent)``;
    ``avg_bits`` is NULL for docs with <2 tokens (nothing to score) and
    those are not fluent. ``total_tokens`` is the training-corpus token
    count — a single driver scalar (bounded metadata, same class as the
    broadcast-scalar subquery patterns). Pass ``toks_df`` (materialized
    :func:`tokenize_docs` output for ``docs``) to score from the
    already-tokenized frame instead of re-running the regex.
    """
    pairs = _pairs(docs, id_col, text_col, toks_df=toks_df)
    scored = (
        pairs.join(bigrams, ["w1", "w2"], "left")
        .join(
            unigrams.select(F.col("w").alias("w2"), F.col("c").alias("c2")),
            "w2",
            "left",
        )
        .withColumn(
            "bits",
            F.when(
                F.col("c12").isNotNull(),
                _ilog2(F.floor(F.col("c1") / F.col("c12")).cast("long")),
            )
            .when(
                F.col("c2").isNotNull(),
                F.lit(BACKOFF_BITS)
                + _ilog2(
                    F.floor(F.lit(total_tokens) / F.col("c2")).cast("long")
                ),
            )
            .otherwise(
                F.lit(BACKOFF_BITS + OOV_BITS)
                + _ilog2(F.lit(total_tokens).cast("long"))
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("bits").alias("total_bits"),
    )
    # left join back so token-poor docs still appear (with NULL score)
    # int-ratio lattice -> bit-reproducible float round
    avg = float_round(F.col("total_bits") / F.col("n_pairs"), 6)
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
            F.coalesce(F.col("total_bits"), F.lit(0)).alias("total_bits"),
            avg.alias("avg_bits"),
            F.coalesce(avg <= max_avg_bits, F.lit(False)).alias("is_fluent"),
        )
    )
