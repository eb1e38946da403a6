"""Real merges-table BPE tokenizer behind the token-accounting seam.

``corpus.token_budget_quota`` / ``corpus.chunk_documents`` count tokens with
a BPE-style *pre-tokenizer* regex (corpus.TOKEN_RE). That is honest for
rough budgeting but can drift >20% vs an actual trained tokenizer on a real
training mix. This module adds the missing half: a pure-Python, GPT-2-style
merges-table BPE encoder

- loadable from the public GPT-2 ``merges.txt`` format
  (``#version`` header, then one ``left right`` pair per line, rank =
  line order),
- applied distributed via Arrow-batched ``mapInPandas`` — the merges
  table is a small driver-side object captured in the UDF closure
  (serialized once into the task binary; Spark deserializes it per task,
  never per row); the hot loop is per-pre-token with a memo cache, so
  each task pays the Python cost once per distinct word it sees (Zipf
  makes that a small fraction of rows),
- and wired back into the corpus ops: ``token_budget_quota(...,
  n_tokens_col=...)`` accepts the precomputed BPE counts.

Algorithm: the classic min-rank-first loop (identical to the public GPT-2
``bpe()`` reference): repeatedly find the lowest-rank adjacent pair present
in the word, merge ALL its occurrences left-to-right, repeat until no
known pair remains. Pre-tokenization uses the same ``TOKEN_RE`` family as
corpus.py so the two counters are interchangeable.

Oracle strategy (queries.bpe_token_count_fixed): for a LAYERED merges
table — every pair's members are produced only by strictly earlier-rank
merges — min-rank-first is equivalent to sequentially replaying the merges
in rank order, and each replay step is exactly SQL ``replace(word_with_
space_separated_symbols, 'a b', 'ab')``. DuckDB can therefore reproduce
the token count exactly; tests/test_bpe.py proves the equivalence over the
whole corpus vocabulary.

Reference scope: the reference engine has no tokenizer; this belongs to
the LLM-training-data operator family (reference need: the token counts
feeding corpus quotas/chunking, py_etl_spark/operators/corpus.py:90,124).
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Same pre-token family as corpus.TOKEN_RE: letter runs | digit runs |
# single punctuation. Whitespace never enters a pre-token, so BPE merges
# cannot cross word boundaries.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# ---------------------------------------------------------------------------
# The fixed demo merges table (layered => SQL-replayable, see module doc).
# Layer 1 merges single chars; layer 2+ pairs may include earlier outputs.
# This is the table behind the oracle query; production use loads a real
# trained merges.txt via BPETokenizer.from_merges_file.
# ---------------------------------------------------------------------------
FIXED_MERGES: list[tuple[str, str]] = [
    # layer 1: char + char
    ("t", "h"),
    ("i", "n"),
    ("a", "n"),
    ("e", "r"),
    ("r", "o"),
    ("o", "w"),
    ("s", "c"),
    ("c", "h"),
    ("a", "s"),
    ("o", "r"),
    ("a", "l"),
    ("u", "e"),
    ("s", "t"),
    ("a", "t"),
    ("l", "u"),
    ("e", "y"),
    # layer 2: uses layer-1 outputs (every member produced earlier or a char)
    ("th", "e"),
    ("r", "ow"),
    ("sc", "an"),
    ("h", "as"),
    ("j", "o"),
    ("in", "e"),
    ("b", "at"),
    ("v", "al"),
    ("d", "at"),
    # layer 3
    ("jo", "in"),
    ("bat", "ch"),
    ("val", "ue"),
    ("dat", "a"),
]


class BPETokenizer:
    """Byte-pair-encoding tokenizer from an ordered merges table.

    ``merges`` is an ordered list of (left, right) symbol pairs; earlier =
    higher priority, exactly the public GPT-2 ``merges.txt`` convention.
    """

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks: dict[tuple[str, str], int] = {
            tuple(p): i for i, p in enumerate(merges)
        }
        self._token_re = re.compile(TOKEN_RE)
        # per-instance cache: distinct-word memoization is the whole
        # performance story for natural-language corpora (Zipf). A plain
        # dict (not functools.lru_cache) so the tokenizer pickles into
        # mapInPandas closures; bounded to keep executor memory flat.
        self._cache: dict[str, tuple[str, ...]] = {}

    def _bpe(self, pretoken: str) -> tuple[str, ...]:
        cached = self._cache.get(pretoken)
        if cached is None:
            cached = self._bpe_uncached(pretoken)
            if len(self._cache) < 65536:
                self._cache[pretoken] = cached
        return cached

    @classmethod
    def from_merges_file(cls, path: str) -> "BPETokenizer":
        """Load the public GPT-2 ``merges.txt`` format: optional
        ``#version: ...`` first line, then one ``left right`` pair per
        line; blank lines ignored; rank = file order."""
        merges: list[tuple[str, str]] = []
        with open(path, encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                line = line.rstrip("\n")
                if not line or (i == 0 and line.startswith("#")):
                    continue
                left, sep, right = line.partition(" ")
                if not sep:
                    raise ValueError(f"malformed merges line: {line!r}")
                merges.append((left, right))
        return cls(merges)

    def _bpe_uncached(self, pretoken: str) -> tuple[str, ...]:
        word = tuple(pretoken)
        while len(word) > 1:
            pairs = set(zip(word, word[1:]))
            best = min(
                pairs, key=lambda p: self.ranks.get(p, float("inf"))
            )
            if best not in self.ranks:
                break
            # merge ALL occurrences of `best`, left to right
            merged: list[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == best[0]
                    and word[i + 1] == best[1]
                ):
                    merged.append(word[i] + word[i + 1])
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        return word

    def pretokenize(self, text: str) -> list[str]:
        return self._token_re.findall(text or "")

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for pre in self.pretokenize(text):
            out.extend(self._bpe(pre))
        return out

    def count(self, text: str) -> int:
        n = 0
        for pre in self.pretokenize(text):
            n += len(self._bpe(pre))
        return n

    # ---- SQL replay (oracle double-entry bookkeeping) -------------------
    #
    # Symbol representation: every symbol is wrapped \x02sym\x03. Distinct
    # begin/end delimiters make whole-symbol matching structural:
    #   - a merge pattern \x02a\x03\x02b\x03 can only match at a symbol
    #     start (\x02 appears nowhere else), must cover symbol `a` exactly
    #     (the \x03\x02 seam), and must end at `b`'s end — so 'ro'+'w' can
    #     never be hit by the ('o','w') rule, and 'a'+'bc' never by
    #     ('a','b');
    #   - adjacent matches share NO characters (unlike a single space
    #     separator, where replace() consuming the shared boundary skips
    #     every other occurrence in runs like 'a a a a').
    # Token count = number of \x02 delimiters remaining after replay.
    _SB, _SE = "\x02", "\x03"

    @staticmethod
    def _sql_symbol(sym: str) -> str:
        """Escape a merge symbol for interpolation into a DuckDB ``e'...'``
        literal. Control characters are rejected outright — \\x02/\\x03
        would collide with the structural delimiters, and the rest have no
        business in a merges table."""
        if any(ord(c) < 0x20 or ord(c) == 0x7F for c in sym):
            raise ValueError(
                f"merge symbol contains a control character: {sym!r}"
            )
        return sym.replace("\\", "\\\\").replace("'", "\\'")

    def replay_sql(self, col_expr: str) -> str:
        """DuckDB expression computing this tokenizer's token COUNT for one
        pre-token string ``col_expr`` by sequential merge replay
        (replace() in rank order over delimiter-wrapped symbols).

        Valid only for LAYERED tables (see module doc); tests/test_bpe.py
        asserts equivalence with the Python encoder over the corpus
        vocabulary. Robustness: merge symbols are escaped (and control
        chars rejected) before interpolation into the SQL literal, and
        \\x02/\\x03 in the INPUT are remapped to \\x01 up front — a lone
        non-alnum char is always a single-char pre-token contributing
        exactly one token on both sides (no merge symbol may contain
        control chars), so the remap is count-preserving rather than
        delimiter-corrupting.
        """
        sb, se = "\\x02", "\\x03"
        src = f"regexp_replace({col_expr}, e'[{sb}{se}]', e'\\x01', 'g')"
        expr = f"regexp_replace({src}, '(.)', e'{sb}\\\\1{se}', 'g')"
        for left, right in self.ranks:  # dict preserves insertion order
            l, r = self._sql_symbol(left), self._sql_symbol(right)
            pat = f"e'{sb}{l}{se}{sb}{r}{se}'"
            rep = f"e'{sb}{l}{r}{se}'"
            expr = f"replace({expr}, {pat}, {rep})"
        return f"(length({expr}) - length(replace({expr}, e'{sb}', '')))"

    def replay_python(self, pretoken: str) -> list[str]:
        """Python mirror of replay_sql's algorithm (sequential rank-order
        replace over delimiter-wrapped symbols, including the \\x02/\\x03
        input remap) — used by tests to prove the SQL replay equals the
        min-rank-first encoder."""
        pretoken = pretoken.replace(self._SB, "\x01").replace(self._SE, "\x01")
        s = "".join(self._SB + c + self._SE for c in pretoken)
        for left, right in self.ranks:
            s = s.replace(
                self._SB + left + self._SE + self._SB + right + self._SE,
                self._SB + left + right + self._SE,
            )
        return [
            t.rstrip(self._SE) for t in s.split(self._SB) if t
        ]


def with_bpe_token_counts(
    df: DataFrame,
    tokenizer: BPETokenizer,
    text_col: str = "text",
    out_col: str = "n_tokens",
) -> DataFrame:
    """Append ``out_col`` = exact BPE token count of ``text_col``.

    Arrow-batched ``mapInPandas``: the tokenizer (a dict of merge ranks —
    KBs even for a 50k-merge GPT-2 table) rides the task closure to each
    executor once; rows never move, no shuffle. The result df is a drop-in
    upstream for ``corpus.token_budget_quota(..., n_tokens_col=out_col)``.
    """
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.LongType(), False)]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                tokenizer.count(t) for t in pdf[text_col].fillna("")
            ]
            yield pdf

    return df.mapInPandas(run, schema=schema)


def bpe_chunk_documents(
    df: DataFrame,
    tokenizer: BPETokenizer,
    chunk_tokens: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``corpus.chunk_documents`` with EXACT BPE boundaries: split each doc
    into runs of ``chunk_tokens`` BPE tokens.

    Output matches chunk_documents: ``(id_col, chunk_id, n_chunk_tokens,
    chunk)``. Chunk text is reconstructed by concatenating the BPE token
    strings, inserting a single space at pre-token boundaries (the corpus
    pre-token family never contains whitespace, so this is lossless up to
    whitespace normalization — same contract as chunk_documents'
    ``concat_ws``). Entirely map-side; memory bounded by the largest doc.
    """
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("chunk_id", T.LongType(), False),
            T.StructField("n_chunk_tokens", T.LongType(), False),
            T.StructField("chunk", T.StringType(), False),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, cids, ns, chunks = [], [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col].fillna("")):
                # (pretoken_index, token) pairs so chunk text can restore
                # the space between pre-tokens even when a chunk splits
                # one pre-token's tokens from the next's.
                toks: list[tuple[int, str]] = []
                for wi, pre in enumerate(tokenizer.pretokenize(text)):
                    toks.extend((wi, t) for t in tokenizer._bpe(pre))
                for ci in range(0, len(toks), chunk_tokens):
                    part = toks[ci : ci + chunk_tokens]
                    buf: list[str] = []
                    prev_wi = part[0][0]
                    for wi, t in part:
                        if wi != prev_wi:
                            buf.append(" ")
                            prev_wi = wi
                        buf.append(t)
                    ids.append(rid)
                    cids.append(ci // chunk_tokens)
                    ns.append(len(part))
                    chunks.append("".join(buf))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "chunk_id": pd.Series(cids, dtype="int64"),
                    "n_chunk_tokens": pd.Series(ns, dtype="int64"),
                    "chunk": pd.Series(chunks, dtype="object"),
                }
            )

    return df.mapInPandas(run, schema=schema)


def bpe_train(
    df: DataFrame,
    num_merges: int = 100,
    text_col: str = "text",
    max_vocab_words: int = 65536,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn a merges table from a corpus (the classic BPE trainer over a
    word-frequency dictionary, Sennrich-style).

    Scale shape — the two-phase pattern every corpus-statistics trainer
    here uses (cf. ``similarity.ivf_train`` centroids):

    1. DISTRIBUTED: pre-token frequencies via explode + groupBy (one
       shuffle over the corpus, combiner-friendly), truncated to the
       ``max_vocab_words`` most frequent words. Zipf makes this cap
       nearly lossless (at 100 TB the top 64k words cover the vast
       majority of tokens) and bounds driver materialization to a small
       word→count dict — the corpus text itself never reaches the
       driver.
    2. DRIVER: the merge loop runs on the compressed word-frequency
       dict — O(vocab) per merge, independent of corpus size. Ties are
       broken lexicographically, so training is fully deterministic
       under repartitioning and retries.

    The learned table is LAYERED BY CONSTRUCTION (every pair member is a
    char or an earlier merge's output, because words only ever contain
    symbols produced so far) — i.e. trained tables are always valid for
    the sequential SQL replay oracle (see module doc).

    Stops early when no remaining pair reaches ``min_pair_freq``.
    Returns an ordered merges list ready for ``BPETokenizer``.
    """
    from collections import Counter

    word_rows = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(TOKEN_RE), F.lit(0)
                )
            ).alias("w")
        )
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), F.asc("w"))
        .limit(max_vocab_words)
        .collect()
    )
    word_freqs: dict[tuple[str, ...], int] = {
        tuple(r.w): int(r["count"]) for r in word_rows
    }

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        for word, freq in word_freqs.items():
            for pair in zip(word, word[1:]):
                pair_counts[pair] += freq
        if not pair_counts:
            break
        best, best_n = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_n < min_pair_freq:
            break
        merges.append(best)
        merged_sym = best[0] + best[1]
        next_freqs: dict[tuple[str, ...], int] = {}
        for word, freq in word_freqs.items():
            out: list[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == best[0]
                    and word[i + 1] == best[1]
                ):
                    out.append(merged_sym)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            w2 = tuple(out)
            next_freqs[w2] = next_freqs.get(w2, 0) + freq
        word_freqs = next_freqs
    return merges
