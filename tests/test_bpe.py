"""Proofs behind the BPE oracle (queries.bpe_token_count_fixed).

The DuckDB oracle replays the merges table sequentially in rank order
(``BPETokenizer.replay_sql``); the Spark-side encoder is the classic
min-rank-first loop (``_bpe_uncached``). The two agree only for LAYERED
merge tables — every pair member is a single character or the output of a
strictly earlier-rank merge. This file pins that equivalence (corpus
vocabulary + adversarial words + fuzz), the layering invariant itself, the
``merges.txt`` loader, and the exact-BPE chunker's partition contract.
"""

from __future__ import annotations

import os
import random
import string

import duckdb
import pytest

from py_etl_spark.functions.bpe import (
    BPETokenizer,
    FIXED_MERGES,
    bpe_chunk_documents,
    with_bpe_token_counts,
)

DATA = os.path.join(os.path.dirname(__file__), "data")
SF_MED_DOCS = "/root/testdata/sf0.01/documents.parquet"

TOK = BPETokenizer(FIXED_MERGES)

ADVERSARIAL = [
    "aaaa",
    "aaaaaaa",
    "thth",
    "ththth",
    "thethe",
    "ininin",
    "banana",
    "scanscan",
    "database",
    "databases",
    "batched",
    "value",
    "values",
    "joining",
    "rejoin",
    "throw",
    "thrown",
    "hashas",
    "atat",
    "stat",
    "status",
    "luey",
    "x",
    "",
    "0123456789",
    "aaabbbaaa",
    "erererer",
    "rowrowrow",
]


def test_fixed_merges_is_layered():
    """The precondition replay_sql's validity rests on: every pair member
    is a single char or was produced by an earlier-rank merge. A future
    non-layered edit to FIXED_MERGES would silently desync the oracle from
    the encoder — this test turns that into a loud failure."""
    produced: set[str] = set()
    for rank, (left, right) in enumerate(FIXED_MERGES):
        for member in (left, right):
            assert len(member) == 1 or member in produced, (
                f"rank {rank}: member {member!r} is multi-char but not the "
                f"output of any earlier merge — FIXED_MERGES is no longer "
                f"layered and the SQL replay oracle is invalid"
            )
        produced.add(left + right)


def _corpus_vocab(limit: int | None = None) -> set[str]:
    import pyarrow.parquet as pq

    texts = pq.read_table(SF_MED_DOCS, columns=["text"]).column("text")
    vocab: set[str] = set()
    for t in texts:
        vocab.update(TOK.pretokenize(t.as_py()))
    if limit:
        vocab = set(sorted(vocab)[:limit])
    return vocab


def test_replay_python_equals_encoder_over_corpus_vocabulary():
    vocab = _corpus_vocab()
    assert len(vocab) > 20  # the corpus really loaded (synthetic word set)
    for word in vocab:
        assert TOK.replay_python(word) == list(TOK._bpe_uncached(word)), word


def test_replay_python_equals_encoder_adversarial_and_fuzz():
    for word in ADVERSARIAL:
        assert TOK.replay_python(word) == list(TOK._bpe_uncached(word)), word
    rng = random.Random(0xB9E)
    alphabet = sorted({c for p in FIXED_MERGES for c in p[0] + p[1]})
    for _ in range(2000):
        word = "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(1, 14))
        )
        assert TOK.replay_python(word) == list(TOK._bpe_uncached(word)), word


def _duckdb_counts(tok: BPETokenizer, words: list[str]) -> list[int]:
    """Evaluate tok.replay_sql over ``words`` in real DuckDB, words bound
    as parameters (never interpolated — some contain quotes/backslashes)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE words(i INTEGER, w VARCHAR)")
    con.executemany(
        "INSERT INTO words VALUES (?, ?)", list(enumerate(words))
    )
    rows = con.execute(
        f"SELECT i, {tok.replay_sql('w')} FROM words ORDER BY i"
    ).fetchall()
    assert [i for i, _ in rows] == list(range(len(words)))
    return [n for _, n in rows]


def test_replay_sql_matches_encoder_in_duckdb():
    """The actual SQL string, evaluated by the actual DuckDB, against the
    actual encoder — over adversarial words and a corpus sample."""
    words = [w for w in ADVERSARIAL if w] + sorted(_corpus_vocab(limit=500))
    got = _duckdb_counts(TOK, words)
    for w, n in zip(words, got):
        assert n == len(TOK._bpe_uncached(w)), w


def test_replay_sql_escapes_quote_and_backslash_symbols():
    """A real merges.txt may contain ' or \\ as symbols; the generated SQL
    must stay syntactically valid and semantically right."""
    tok = BPETokenizer([("'", "'"), ("\\", "a"), ("''", "\\a")])
    cases = [
        ("''", 1),  # ' + ' -> ''
        ("\\a", 1),  # \ + a -> \a
        ("''\\a", 1),  # '' + \a -> ''\a  (layer-2 merge)
        ("'\\", 2),  # no rule matches
        ("'''", 2),  # leftmost-first: ('') then lone '
    ]
    got = _duckdb_counts(tok, [w for w, _ in cases])
    for (w, expect), n in zip(cases, got):
        assert n == expect, repr(w)
        assert len(tok._bpe_uncached(w)) == expect, repr(w)


def test_replay_sql_rejects_control_char_symbols():
    with pytest.raises(ValueError, match="control"):
        BPETokenizer([("a", "\x02")]).replay_sql("w")


def test_replay_handles_control_chars_in_input():
    """\\x02/\\x03 in the INPUT are remapped, not delimiter-corrupting:
    a lone control char counts as exactly one token on both sides."""
    words = ["\x02", "\x03", "\x02\x03", "a\x02b"]
    got = _duckdb_counts(TOK, words)
    for w, n in zip(words, got):
        assert len(TOK._bpe_uncached(w)) == len(w)
        assert n == len(w), repr(w)


def test_from_merges_file_roundtrip():
    tok = BPETokenizer.from_merges_file(os.path.join(DATA, "mini_merges.txt"))
    assert tok.ranks == TOK.ranks  # file content mirrors FIXED_MERGES
    # known vectors through the full pipeline (pretokenize + encode)
    assert tok.tokenize("the database") == ["the", "data", "b", "as", "e"]
    assert tok.count("batch value join") == 3
    assert tok.tokenize("throw") == ["th", "ro", "w"]
    assert tok.count("") == 0


def test_from_merges_file_rejects_malformed(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("#version: 0.2\nnospace\n")
    with pytest.raises(ValueError, match="malformed"):
        BPETokenizer.from_merges_file(str(p))


def test_bpe_chunk_documents_partitions_token_stream(spark):
    rows = [
        ("d1", "the database has a value in the batch join row " * 7),
        ("d2", "scan the throw"),
        ("d3", ""),
        ("d4", None),
        ("d5", "x" * 40),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    budget = 10
    out = bpe_chunk_documents(
        df, TOK, chunk_tokens=budget, id_col="doc_id", text_col="text"
    ).collect()

    by_doc: dict[str, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # empty/null docs produce no chunks
    assert "d3" not in by_doc and "d4" not in by_doc
    for doc_id, text in rows:
        expected = TOK.count(text or "")
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_id)
        # chunk ids are consecutive from 0
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        # every chunk within budget; all full except possibly the last
        assert all(c.n_chunk_tokens <= budget for c in chunks)
        assert all(c.n_chunk_tokens == budget for c in chunks[:-1])
        # chunks partition the token stream exactly
        assert sum(c.n_chunk_tokens for c in chunks) == expected
        # chunk text re-tokenizes to its own token count (whitespace
        # normalization aside, no tokens are lost or invented)
        for c in chunks:
            assert TOK.count(c.chunk) == c.n_chunk_tokens


def test_with_bpe_token_counts_matches_driver_side(spark):
    rows = [("a", "the batch has data"), ("b", None), ("c", "row row row")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r.doc_id: r.n_tokens
        for r in with_bpe_token_counts(df, TOK).collect()
    }
    assert got == {
        doc_id: TOK.count(text or "") for doc_id, text in rows
    }


def _sennrich_corpus(spark):
    # the classic BPE training example: low x5, lower x2, newest x6, widest x3
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )


def test_bpe_train_hand_computed_merges(spark):
    from py_etl_spark.functions.bpe import bpe_train

    merges = bpe_train(_sennrich_corpus(spark), num_merges=5)
    # pair counts round 1: es=9, st=9 (tie -> lexicographic), lo=7, ow=7,
    # we=8 ... full hand derivation in the git history of this test
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("l", "o"),
        ("lo", "w"),
        ("e", "w"),
    ]


def test_bpe_train_deterministic_under_repartition(spark):
    from py_etl_spark.functions.bpe import bpe_train

    a = bpe_train(_sennrich_corpus(spark), num_merges=8)
    b = bpe_train(_sennrich_corpus(spark).repartition(7), num_merges=8)
    assert a == b


def test_bpe_train_output_is_layered_and_encodes(spark):
    from py_etl_spark.functions.bpe import bpe_train

    merges = bpe_train(_sennrich_corpus(spark), num_merges=12)
    # layered by construction: every member is a char or an earlier output
    produced: set[str] = set()
    for left, right in merges:
        for member in (left, right):
            assert len(member) == 1 or member in produced, (left, right)
        produced.add(left + right)
    tok = BPETokenizer(merges)
    # trained table compresses its own corpus below char count
    assert tok.count("newest") < len("newest")
    # and the trained table is valid for the SQL replay oracle
    for w in ["low", "lower", "newest", "widest", "lowest"]:
        assert tok.replay_python(w) == list(tok._bpe_uncached(w)), w


def test_bpe_train_min_freq_stop(spark):
    from py_etl_spark.functions.bpe import bpe_train

    df = spark.createDataFrame([(1, "abc xyz")], "doc_id long, text string")
    # every pair occurs once < min_pair_freq=2 -> no merges learned
    assert bpe_train(df, num_merges=10) == []


def test_replay_equals_encoder_for_random_layered_tables():
    """The oracle's validity claim quantified over TABLES, not just
    FIXED_MERGES: for any LAYERED merges table (every pair member a char
    or an earlier output), sequential rank-order replay must equal the
    min-rank-first encoder on every word. Generate random layered tables
    and fuzz words over each."""
    rng = random.Random(0x1A7E)
    for trial in range(30):
        alphabet = list("abcde")[: rng.randrange(2, 6)]
        symbols = list(alphabet)
        merges: list[tuple[str, str]] = []
        seen_pairs: set[tuple[str, str]] = set()
        for _ in range(rng.randrange(3, 18)):
            pair = (rng.choice(symbols), rng.choice(symbols))
            if pair in seen_pairs:
                continue
            seen_pairs.add(pair)
            merges.append(pair)
            symbols.append(pair[0] + pair[1])  # layered by construction
        tok = BPETokenizer(merges)
        for _ in range(120):
            word = "".join(
                rng.choice(alphabet) for _ in range(rng.randrange(0, 12))
            )
            assert tok.replay_python(word) == list(
                tok._bpe_uncached(word)
            ), (trial, merges, word)
