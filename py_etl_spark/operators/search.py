"""Full-text relevance search — BM25 top-k over a document corpus.

Reference parity note: py-etl has no text search; this is part of the
LLM-pipeline surface (rank corpus documents against a probe query —
e.g. pull the most benchmark-like documents for contamination review,
or the most domain-like for targeted sampling).

Okapi BM25 (Robertson & Walker 1994; the SPARSE retrieval baseline
ANN/embedding search complements):

    score(D, Q) = Σ_t idf(t) · tf(t,D)·(k1+1)
                        / (tf(t,D) + k1·(1 - b + b·|D|/avgdl))
    idf(t) = ln((N - df(t) + 0.5)/(df(t) + 0.5) + 1)

Scale shape: for a FIXED query-term list (the search use case) nothing
explodes and nothing shuffles per document — per-term tf is an array
expression over the doc's own tokens, and all corpus statistics
(N, Σ|D|, per-term df) collapse into ONE aggregate row that rides a
broadcast nested-loop join of one row (the broadcast-scalar pattern).
The whole scorer is a map-side expression; top-k is orderBy+limit
(TakeOrderedAndProject — per-partition heaps, no global sort).

Cross-engine determinism: idf is the only libm call (ln), rounded to 6
decimals immediately; the per-doc score sums term contributions in
FIXED textual association (a chain of +, not an aggregation over an
exploded term table), so there is no order-dependent float summation.
Unmatched terms contribute an exact 0.0 (0/positive), so no CASE
branches are needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_etl_spark.operators.corpus import TOKEN_RE


def _term_count(
    term: str, lower: F.Column, letter_runs: F.Column, digit_runs: F.Column
) -> F.Column:
    """tf expression for one already-tokenized query term over the
    decomposed document columns (see bm25_topk's decomposition note).

    Both run branches require isascii(): TOKEN_RE's letter/digit classes
    are ASCII-only, so a non-ASCII char that Python's Unicode-wide
    isalpha()/isdigit() accepts ('é', '²', '٣', fullwidth '１') is a
    PUNCT token to the tokenizer — routing it to a run split whose
    charset can never contain it would silently count 0 (ADVICE r09).
    """
    if term.isascii() and term.isalpha():
        arr = letter_runs
    elif term.isascii() and term.isdigit():
        arr = digit_runs
    else:  # single non-alnum-non-space char token (any script)
        # contract guard (VERDICT r10 item 3): only SINGLE-char punct
        # tokens are valid here — TOKEN_RE can never emit a multi-char
        # non-ASCII token, and the char-count spelling below would
        # score such a term as len(term) × substring-occurrences
        # instead of 0. bm25_topk's normalization already rejects
        # these, but the scorer must not silently mis-count if it is
        # ever reached another way.
        if len(term) != 1:
            raise ValueError(
                f"invalid query term {term!r}: multi-char terms must "
                "be letter-runs or digit-runs (ASCII); punct tokens "
                "are single chars"
            )
        return (
            F.length(lower) - F.length(F.replace(lower, F.lit(term)))
        )
    return F.size(arr) - F.size(F.array_remove(arr, term))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 against ``terms``.

    Output: ``(id_col, n_match, score_bm25)`` ordered by score desc with
    id tie-break; ``n_match`` = how many query terms the doc contains.
    """
    import re as _re

    if not terms:
        raise ValueError("terms must be non-empty")
    # normalize query terms through the SAME tokenizer documents get:
    # lowercase, and each must be exactly one TOKEN_RE token (a
    # capitalized or multi-word term would otherwise silently match
    # nothing and score 0 everywhere)
    norm_terms = []
    for t in terms:
        toks_t = _re.findall(TOKEN_RE, t.lower())
        if len(toks_t) != 1 or toks_t[0] != t.lower():
            raise ValueError(
                f"query term {t!r} is not a single corpus token; "
                f"tokenize the query upstream (got {toks_t})"
            )
        norm_terms.append(toks_t[0])
    terms = norm_terms
    # BM25 needs token COUNTS, never the token array — so the TOKEN_RE
    # alternation extract (one backtracking matcher pass + an array of
    # every token string per doc) decomposes into the cheap primitives
    # the r09 _norm_tokens/winnowing swaps measured: TOKEN_RE's three
    # branches are disjoint, so
    #   dl = #letter-runs + #digit-runs + #non-alnum-non-space chars,
    # with the run counts from simple-char-class splits and the punct
    # count from one translate-delete (no regex at all). tf for a
    # letter/digit query term counts its exact run in the matching
    # split array (a maximal [a-z]+ run equals the term iff the token
    # does — digits or punct on either side still delimit, exactly as
    # TOKEN_RE tokenizes "hash9" -> ["hash","9"]); a punct term is a
    # single-char count. Counts — and therefore every downstream score
    # — are identical to the extract_all spelling; the regex pass and
    # per-doc token-string allocation are gone.
    lower = F.lower(F.col(text_col))
    letter_runs = F.split(lower, r"[^a-z]+", -1)
    digit_runs = F.split(lower, r"[^0-9]+", -1)
    # Java \s is exactly [ \t\n\x0B\f\r]; translate deletes a-z0-9\s,
    # every remaining char is one punct token
    _keep = "abcdefghijklmnopqrstuvwxyz0123456789 \t\n\x0b\f\r"
    punct_n = F.length(F.translate(lower, _keep, ""))
    dl = (
        F.size(F.array_remove(letter_runs, ""))
        + F.size(F.array_remove(digit_runs, ""))
        + punct_n
    )

    def term_count(term: str) -> F.Column:
        return _term_count(term, lower, letter_runs, digit_runs)

    base = docs.select(
        F.col(id_col),
        dl.cast("long").alias("dl"),
        *[
            term_count(t).cast("long").alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.round(
            F.log(
                (F.col("n_docs") - F.col(f"df{i}") + 0.5)
                / (F.col(f"df{i}") + 0.5)
                + 1.0
            ),
            6,
        )
        tf = F.col(f"tf{i}").cast("double")
        score = score + idf * tf * F.lit(k1 + 1.0) / (tf + norm)
    n_match = None
    for i in range(len(terms)):
        hit = (F.col(f"tf{i}") > 0).cast("long")
        n_match = hit if n_match is None else n_match + hit
    return (
        joined.select(
            F.col(id_col),
            n_match.alias("n_match"),
            F.round(score, 4).alias("score_bm25"),
        )
        .orderBy(F.desc("score_bm25"), F.col(id_col))
        .limit(k)
    )


def merge_posting_lists(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental inverted-index maintenance: merge a delta index
    (e.g. one ingest day's postings) into the base WITHOUT re-reading
    the corpus — per-term sorted-array union with tf summation (a doc
    present in both sides adds its term frequencies, so re-crawled
    documents merge rather than duplicate).

    Both inputs are posting-list tables ``(tok, df, postings, tfs)``.
    Plan: explode both sides to (tok, doc, tf) — postings are already
    index-sized, not corpus-sized — one (tok, doc) sum + one per-term
    assembly, both map-side-combined; output is bit-identical to a
    direct build over the unioned corpus (pinned by the
    ``posting_lists_incremental_merge`` oracle, which builds directly).
    """
    def cells(df: DataFrame) -> DataFrame:
        return df.select(
            "tok",
            F.explode(
                F.zip_with(
                    F.col("postings"),
                    F.col("tfs"),
                    lambda d, t: F.struct(
                        d.alias("doc_id"), t.alias("tf")
                    ),
                )
            ).alias("p"),
        ).select("tok", F.col("p.doc_id").alias("doc_id"), F.col("p.tf").alias("tf"))

    merged_cells = (
        cells(base)
        .unionByName(cells(delta))
        .groupBy("tok", "doc_id")
        .agg(F.sum("tf").alias("tf"))
    )
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col("doc_id"), F.col("tf")))
    )
    return (
        merged_cells.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"), pairs.alias("__p"))
        .select(
            "tok",
            "df",
            F.transform(F.col("__p"), lambda s: s["doc_id"]).alias("postings"),
            F.transform(F.col("__p"), lambda s: s["tf"]).alias("tfs"),
        )
    )
