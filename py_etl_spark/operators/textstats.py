"""Text-analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd) — language-ID heuristic,
quality scoring, token counting, document fingerprinting — except
``repetition_metrics``, which is an Arrow ``mapInPandas`` pass (see its
docstring for why Python wins there). Designed for 100 TB-scale corpora:
no shuffles; every operator runs map-side over the scan, so it
parallelizes linearly with input splits.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small, fixed stopword inventory per language for the n-gram/stopword
# language heuristic. Deliberately tiny + deterministic (the point is the
# Spark plumbing; swap in fastText/CLD3 via pandas_udf for production use).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}


def _tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text (empty → empty array)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(text)).cast("long")


def word_token_count(text: Column) -> Column:
    """BPE-ish word tokens: count of maximal ``[a-z0-9]`` runs of the
    lowered text. Counted as a single split on the complement class —
    equivalent to the r02–r08 ``token_count(regexp_replace(lower(trim),
    '[^a-z0-9]+', ' '))`` spelling for every input (both count exactly
    the alnum runs; NULL→NULL, run-less→0) without the regexp_replace
    full-rewrite pass over the corpus (the r07/r09 tokenizer lesson)."""
    runs = F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != F.lit("")
    )
    return F.size(runs).cast("long")


def punct_count(text: Column) -> Column:
    """Count of ``.,;:!?'"-`` chars, as a length difference under
    ``translate`` (a char-map pass) — equivalent to the prior
    ``length(regexp_replace(text, '[^.,;:!?\\'"-]', ''))`` for every
    input, without running a regex over every byte."""
    return (
        F.length(text) - F.length(F.translate(text, ".,;:!?'\"-", ""))
    ).cast("long")


def stopword_count(text: Column, lang: str = "en") -> Column:
    """Occurrences of the language's marker stopwords as standalone
    tokens. Counted as Σ per-marker ``size(toks) -
    size(array_remove(toks, m))`` — all native codegen array ops (the
    bm25 term-count recipe; markers are distinct so the sum never
    double-counts), replacing an interpreted filter-with-array_contains
    HOF pass per language."""
    toks = _tokens(F.lower(text))
    n = F.size(toks)
    count = F.lit(0)
    for m in LANG_MARKERS[lang]:
        count = count + (n - F.size(F.array_remove(toks, m)))
    return count.cast("long")


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: length, punct and word-shape
    ratios (the standard cheap pre-filter before LLM training)."""
    n_chars = F.length(text).cast("double")
    n_tok = token_count(text).cast("double")
    punct_ratio = punct_count(text).cast("double") / F.greatest(n_chars, F.lit(1.0))
    avg_tok_len = n_chars / F.greatest(n_tok, F.lit(1.0))
    len_ok = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(0.3)
    tok_ok = F.when((avg_tok_len >= 2.5) & (avg_tok_len <= 12.0), 1.0).otherwise(0.4)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.5)
    return F.round(len_ok * 0.4 + tok_ok * 0.4 + punct_ok * 0.2, 4)


def lang_guess(text: Column) -> Column:
    """Tiny deterministic language-ID: most marker-stopword hits wins;
    ties and zero-hit rows → 'und' (undetermined)."""
    scores = [(lang, stopword_count(text, lang)) for lang in LANG_MARKERS]
    best = F.greatest(*[s for _, s in scores])
    guess = F.lit("und")
    # Later languages only win with a strictly higher score, so evaluation
    # order makes the tie-break deterministic (first language in dict wins).
    for lang, score in reversed(scores):
        guess = F.when((score == best) & (score > 0), F.lit(lang)).otherwise(guess)
    return guess


def fingerprint_md5(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-normalized lowercase text."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals (the Gopher-family rep filters):
    for n in (2, 3, 4), the count of the most frequent token n-gram
    (``rep{n}_top``), the number of n-gram INSTANCES belonging to grams
    occurring ≥2 times (``rep{n}_dup``), the total instance count
    (``rep{n}_total`` = max(tokens - n + 1, 0)), and the derived
    ``_frac`` ratios. High top/dup fractions flag boilerplate and
    degenerate repetition that length/punct heuristics miss.

    Per-doc metrics need no cross-row data, so this is a ZERO-shuffle
    Arrow ``mapInPandas`` pass — a Python ``Counter`` per doc is O(tokens)
    where the pure-Column alternative (filter-count per gram over the
    gram array) is O(tokens²) per doc; at 100 TB the linear map-side pass
    wins and parallelizes with input splits. Integer counts are exact, so
    the DuckDB oracle compares integers — no float-hash fragility.
    Tokenization is the corpus TOKEN_RE family (same as the token-count
    and chunking ops).
    """
    import re
    from collections import Counter
    from typing import Iterator

    from pyspark.sql import types as T

    from py_etl_spark.operators.corpus import TOKEN_RE

    ns = (2, 3, 4)
    fields = [df.schema[id_col]]
    for n in ns:
        fields += [
            T.StructField(f"rep{n}_top", T.LongType(), False),
            T.StructField(f"rep{n}_dup", T.LongType(), False),
            T.StructField(f"rep{n}_total", T.LongType(), False),
            T.StructField(f"rep{n}_top_frac", T.DoubleType(), False),
            T.StructField(f"rep{n}_dup_frac", T.DoubleType(), False),
        ]
    schema = T.StructType(fields)
    token_re = re.compile(TOKEN_RE)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            cols: dict[str, list] = {f.name: [] for f in fields[1:]}
            for text in pdf[text_col].fillna(""):
                toks = token_re.findall(text)
                for n in ns:
                    grams = Counter(
                        " ".join(toks[i : i + n])
                        for i in range(len(toks) - n + 1)
                    )
                    total = max(len(toks) - n + 1, 0)
                    top = max(grams.values(), default=0)
                    dup = sum(c for c in grams.values() if c > 1)
                    cols[f"rep{n}_top"].append(top)
                    cols[f"rep{n}_dup"].append(dup)
                    cols[f"rep{n}_total"].append(total)
                    cols[f"rep{n}_top_frac"].append(
                        top / total if total else 0.0
                    )
                    cols[f"rep{n}_dup_frac"].append(
                        dup / total if total else 0.0
                    )
            out = {id_col: pdf[id_col]}
            for k, v in cols.items():
                out[k] = pd.Series(
                    v, dtype="float64" if k.endswith("_frac") else "int64"
                )
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stat column family to a documents DataFrame."""
    t = F.col(text_col)
    return df.select(
        "*",
        F.length(t).cast("long").alias("stat_n_chars"),
        token_count(t).alias("stat_n_tokens"),
        word_token_count(t).alias("stat_n_words"),
        punct_count(t).alias("stat_n_punct"),
        stopword_count(t).alias("stat_n_stopwords"),
        quality_score(t).alias("stat_quality"),
        lang_guess(t).alias("stat_lang_guess"),
        fingerprint_md5(t).alias("stat_fingerprint"),
    )


def quality_score_hashed_linear(
    df: "DataFrame",
    weights: list[float],
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> "DataFrame":
    """Model-based quality scoring with a hashing-trick linear classifier —
    the fastText-shaped filter (Joulin et al. 2016) modern pipelines run
    over every document (e.g. DCLM's fastText quality gate), reduced to
    its Spark-native core: mean-pooled bag-of-words logits over a
    hash-bucketed weight vector.

    ``logit = bias + mean(weights[h(token) mod D])`` with the portable
    md5-prefix hash, so ANY engine reproduces the score bit-for-bit —
    the weights are a plan literal (D doubles, broadcast-by-construction),
    tokens never leave their row, and the whole scorer is zero-shuffle
    Column HOFs (no Python, no UDF). Swap in real trained weights by
    passing them; the math is identical.

    The sigmoid is deliberately NOT applied: ``exp()`` rounding is
    libm-specific, while +,*,/ are IEEE-exact, so the logit (and the
    ``logit >= 0`` ⟺ ``p >= 0.5`` decision) is cross-engine
    deterministic. Output: ``(id_col, n_tokens, logit, is_quality)``.
    """
    d = len(weights)
    wlit = F.array(*[F.lit(float(w)) for w in weights])
    # split('') yields [''] — drop empty tokens so an empty document scores
    # bias-only with n_tokens=0 instead of hashing the empty string
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    idx = lambda t: F.pmod(
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"), F.lit(d)
    ).cast("int")
    ws = F.transform(toks, lambda t: F.element_at(wlit, idx(t) + 1))
    # ONE walk computing (sum, count) in a struct accumulator, and the
    # n_tokens/logit/is_quality outputs all read the SAME __st column
    # from the projection below: lambda-bearing HOFs are excluded from
    # codegen common-subexpression elimination, so the previous
    # spelling (size(ws) + aggregate(ws) + size(ws) inside logit, with
    # logit itself inlined twice) re-ran the split+md5+lookup pipeline
    # up to FIVE times per row. __st is referenced four times by the
    # consuming projection, so CollapseProject's single-use re-inlining
    # can never push the pipeline back into the outputs. Fold order and
    # arithmetic are unchanged — s accumulates acc+v over the same
    # element sequence, n counts the same elements size() counted — so
    # every output is bit-identical.
    st = F.aggregate(
        ws,
        F.struct(
            F.lit(0.0).alias("s"), F.lit(0).cast("long").alias("n")
        ),
        lambda acc, v: F.struct(
            (acc["s"] + v).alias("s"), (acc["n"] + 1).alias("n")
        ),
    )
    scored = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], st.alias("__st")
    )
    n = F.col("__st.n")
    logit = F.lit(float(bias)) + F.col("__st.s") / F.when(
        n > 0, n
    ).otherwise(F.lit(1))
    # keep_cols ride along so a downstream filter/join doesn't need to
    # re-join the source table (one scan, not a self-join)
    #
    # `+ 0.0` normalizes IEEE negative zero: a tiny negative logit
    # (|logit| < 5e-7) rounds to -0.0 under sign-preserving float
    # rounding (DuckDB) but to +0.0 under BigDecimal HALF_UP (Spark) —
    # the one bit-pattern split the r11 sf0.1 sweep caught. x + 0.0 is
    # the identity for every double except -0.0 → +0.0, so both engines
    # emit the same bits for every score.
    return scored.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n.cast("long").alias("n_tokens"),
        (F.round(logit, 6) + F.lit(0.0)).alias("logit"),
        (logit >= 0).alias("is_quality"),
    )


# ---- Unicode text normalization ------------------------------------------

# Control chars (minus \t\n\r), zero-width & BOM — dropped outright
_CTRL_RE = ("[\x00-\x08\x0B\x0C\x0E-\x1F\x7F"
            "\u200b\u200c\u200d\ufeff]")
# Unicode space family — folded to ASCII space before collapsing
_USPACE_RE = "[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]"


def clean_text_exprs(text: Column) -> Column:
    """Column-side text cleanup (everything except NFC): drop control and
    zero-width characters, fold unicode spaces, straighten smart quotes
    and long dashes, collapse whitespace runs, trim. Pure JVM regex —
    zero shuffles, codegen'd."""
    # Both char classes are FINITE literal sets, so the drop and the
    # space-fold are translate passes (single table lookup per char),
    # not regex rewrites of every byte; only the variable-length \s+
    # collapse genuinely needs the matcher.
    ctrl_chars = (
        "".join(chr(c) for c in range(0x00, 0x09))
        + "\x0b\x0c"
        + "".join(chr(c) for c in range(0x0E, 0x20))
        + "\x7f\u200b\u200c\u200d\ufeff"
    )
    uspace_chars = (
        "\u00a0\u1680"
        + "".join(chr(c) for c in range(0x2000, 0x200B))
        + "\u202f\u205f\u3000"
    )
    t = F.translate(text, ctrl_chars, "")
    t = F.translate(t, uspace_chars, " " * len(uspace_chars))
    t = F.translate(t, "‘’‚“”„–—",
                    "'''\"\"\"--")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "text_clean"
) -> DataFrame:
    """Full normalization: Unicode NFC composition (Python
    ``unicodedata`` via an Arrow-batched pandas UDF — Spark has no
    builtin NFC; DuckDB's ``nfc_normalize`` reproduces it exactly, which
    the oracle exploits) followed by :func:`clean_text_exprs`.

    NFC first, cleanup second: composition can only merge combining
    marks into precomposed forms, never create the control/space/quote
    code points the cleanup targets, so the order is confluent — and
    running the regex family on composed text means offsets seen by
    downstream tokenizers match what any NFC-normalizing trainer sees.

    Map-side only (the pandas UDF is a scalar batch transform — no
    grouping, no shuffle); appends ``out_col`` and a ``changed`` flag.
    """
    import unicodedata

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def nfc(col: pd.Series) -> pd.Series:
        return col.map(
            lambda s: unicodedata.normalize("NFC", s)
            if s is not None
            else None
        )

    cleaned = clean_text_exprs(nfc(F.col(text_col)))
    return df.withColumn(out_col, cleaned).withColumn(
        "changed", ~F.col(out_col).eqNullSafe(F.col(text_col))
    )


def boilerplate_line_filter(
    df: DataFrame,
    text_col: str = "text",
    min_line_chars: int = 10,
    out_col: str = "clean_text",
) -> DataFrame:
    """Line-level boilerplate removal — the jusText/RefinedWeb-shaped
    cleanup step between raw extraction and document-level dedup: split
    the document into lines, drop navigation/chrome lines (too short, or
    less than half alphabetic after trimming), and re-join the survivors.

    Complements ``dedup.segment_dedup`` (which removes lines *repeated
    across documents*): this gate is purely intra-document, needs no
    corpus statistics, and therefore runs map-side with ZERO shuffles —
    at 100 TB it parallelizes linearly with input splits and belongs in
    the same single scan as the Gopher quality gate.

    Integer-only predicate (2·alpha ≥ len, not a float ratio) so the
    keep decision is bit-identical in any engine. Appends
    ``n_lines`` / ``n_kept`` / ``out_col``.
    """
    lines = F.split(F.col(text_col), "\n")

    _letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

    def _keep(line: Column) -> Column:
        t = F.trim(line)
        # alpha count as a translate-DELETE length delta — the regex
        # spelling rewrote every line byte through the matcher; counts
        # are identical (#letters = len - len(line minus A-Za-z))
        alpha = F.length(t) - F.length(F.translate(t, _letters, ""))
        return (F.length(t) >= min_line_chars) & (
            alpha * 2 >= F.length(t)
        )

    kept = F.filter(lines, _keep)
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_kept", F.size(kept))
        .withColumn(out_col, F.array_join(kept, "\n"))
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Deflate-compressibility quality signal — the classic "too
    repetitive / too random" corpus gate (boilerplate and template spam
    compress far below natural prose; encrypted/binary junk barely
    compresses at all). Appends ``n_bytes`` (UTF-8 length), ``c_bytes``
    (zlib level-``level`` deflate size) and the integer percentage
    ``ratio_pct = 100·n_bytes // c_bytes``.

    Arrow-batched scalar pandas UDF (zlib is C-speed; the per-row Python
    overhead is one dict lookup), map-side only — no shuffle, linear in
    input splits at 100 TB. Integer ratio so downstream threshold
    predicates are engine-exact; deflate output itself is
    zlib-version-dependent, which is why this ships as a rows-only gate
    entry with property-based unit coverage instead of a byte-level
    DuckDB oracle (DuckDB has no deflate).
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def csize(s: pd.Series) -> pd.Series:
        import zlib

        return s.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level))
            if t is not None
            else None
        )

    out = df.withColumn("n_bytes", F.octet_length(F.col(text_col)).cast("long"))
    out = out.withColumn("c_bytes", csize(F.col(text_col)))
    return out.withColumn(
        "ratio_pct",
        F.floor(F.lit(100) * F.col("n_bytes") / F.col("c_bytes")).cast("long"),
    )
