"""Driver-contract sanity: registry shape + flagship smoke at sf0.001."""

from __future__ import annotations

import pytest

import py_etl_spark.queries as Q
from tests.conftest import SF_SMALL


def test_registry_shape():
    qs = Q.queries()
    oracles = Q.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # the vast majority must carry a SQL oracle (strong check)
    assert len(oracles) >= len(qs) - 6


def test_entry_smoke(spark):
    df = Q.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"uid", "name", "segment", "acctbal"} <= set(df.columns)


def test_each_query_runs_small(spark):
    """Every registered query executes and yields a stable schema at sf0.001.

    Also enforces the driver-canonicalizer contract: the external gate's
    pandas ``sort_values`` crashes on list-valued cells, so no registry
    query may emit ArrayType/MapType/StructType — arrays are serialized
    to canonical strings at the registry layer (queries._arr_csv).
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    failures = {}
    for name, fn in Q.queries().items():
        try:
            df = fn(spark, SF_SMALL)
            assert df.columns, "no columns"
            complex_cols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            assert not complex_cols, f"complex output columns {complex_cols}"
            df.limit(5).collect()
        except Exception as e:  # noqa: BLE001
            failures[name] = str(e).splitlines()[0][:120]
    assert not failures, failures


def test_rotation_window_exactly_fifty_and_valid():
    """The driver caps its check at the first 50 registry entries; the
    priority roster must fill that window exactly — no phantom names, no
    silent overflow pushing 'prioritized' queries out of the window."""
    from py_etl_spark.queries import _FRONT, _TAIL, REGISTRY

    assert len(_FRONT) == 50
    unknown = [n for n in _FRONT + _TAIL if n not in REGISTRY]
    assert not unknown, f"roster names not in registry: {unknown}"
    assert len(set(_FRONT)) == 50 and not set(_FRONT) & set(_TAIL)


def test_exact_money_sum_idiom(spark):
    """Pin the exact money-aggregate helpers (_xc/_xr2/_fr, r11):

    1. _xc recovers the EXACT decimal integer for s-decimal inputs, so
       decimal(20,0) sums are true decimal money math, not approximation.
    2. The sum is order-free: reversing the rows changes nothing (the
       whole point — float sums are reduction-order dependent).
    3. _fr is a float-space round-half-up whose results are pinned on a
       genuine tie (0.03125 at 4 decimals), the case where the engines'
       native round() semantics disagree.
    """
    from pyspark.sql import functions as F

    from py_etl_spark.queries import _fr, _xc, _xr2

    vals = [("a", 147.70), ("b", 0.01), ("c", 9999.99), ("d", 123.45)]
    df = spark.createDataFrame(vals, "k string, price double")
    cents = {
        r.k: r.c
        for r in df.select("k", _xc(F.col("price"), 2).alias("c")).collect()
    }
    assert {k: int(c) for k, c in cents.items()} == {
        "a": 14770, "b": 1, "c": 999999, "d": 12345,
    }

    fwd = df.agg(_xr2(F.sum(_xc(F.col("price"), 2)), 2).alias("s")).collect()
    rev = (
        spark.createDataFrame(list(reversed(vals)), "k string, price double")
        .agg(_xr2(F.sum(_xc(F.col("price"), 2)), 2).alias("s"))
        .collect()
    )
    assert fwd[0].s == rev[0].s == 10271.15

    ties = spark.createDataFrame([(0.03125,), (-0.03125,)], "x double")
    got = [r.y for r in ties.select(_fr(F.col("x"), 4).alias("y")).collect()]
    # floor(x*1e4 + 0.5)/1e4: half-toward-+inf on exact ties, pure IEEE
    assert got == [0.0313, -0.0312]


def test_alpha_tokens_equals_oracle_tokenizer_on_adversarial_text(spark):
    """queries._alpha_tokens (the fast split-based corpus tokenizer) must
    produce the EXACT token stream of the oracle spelling —
    list_filter(string_split(lower(regexp_replace(text, '[^A-Za-z ]',
    ' ', 'g')), ' '), t -> t <> '') — proven three ways on adversarial
    inputs (unicode letters, digits glued to words, edge whitespace,
    empty/None, all-delimiter strings): against Spark's old
    regexp_replace idiom AND against DuckDB evaluating the literal
    oracle expression. Hash matches pin this corpus-wide; this pins the
    edge cases a synthetic corpus never exercises."""
    import duckdb

    from pyspark.sql import functions as F

    from py_etl_spark.queries import _alpha_tokens

    texts = [
        "Hello, World!  X1y2z3 end",
        "  leading and trailing  ",
        "ALLCAPS mixedCase lower",
        "digits123inside and 456 alone",
        "punct-only !!! ... ---",
        "",
        "   ",
        "café naïve Über straße",  # é/ï/Ü/ß are delimiters
        "tab\tnewline\nmix\r\nend",
        "a",
        "1",
        # The class that breaks lower-then-split: Unicode chars whose
        # lower() maps INTO [a-z]. They must be DELIMITERS (stripped
        # before lowering, as the oracle does), not token characters.
        "xKy",          # U+212A KELVIN SIGN, lower -> 'k'
        "Xİ",           # U+0130 I-WITH-DOT, lower -> 'i' (+combining dot)
        "5KC café İstanbul",
        "ſs longſ",  # U+017F LONG S (lower() fixpoint, casefolds to s)
        "KİK",  # all-divergent-delimiter string
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    old = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col("text"), "[^A-Za-z ]", " ")), " "
        ),
        lambda t: t != "",
    )
    rows = df.select("i", _alpha_tokens().alias("new"), old.alias("old")).collect()
    for r in rows:
        assert r.new == r.old, (texts[r.i], r.new, r.old)

    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT list_filter(string_split(lower(regexp_replace(?,"
            " '[^A-Za-z ]', ' ', 'g')), ' '), t -> t <> '')",
            [t],
        ).fetchone()[0]
        got = next(r.new for r in rows if r.i == i)
        assert got == want, (t, got, want)


# ---------------------------------------------------------------------------
# Hypothesis property: the fixed adversarial list above missed the U+212A /
# U+0130 divergence for a full round because it sampled exactly the
# non-divergent Unicode class. Random text over explicit Unicode categories
# plus the known-treacherous singletons can't be gamed the same way: the
# three-way equality (fast kernel == old Spark idiom == DuckDB literal
# oracle) must hold per generated string. This property FAILS in seconds if
# _alpha_tokens regresses to the lower-before-split spelling.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_TREACHEROUS = st.sampled_from(
    list("KİſKIiıẞß \taZ0Éé.’-_\n")
)
_UNI_CHARS = st.characters(
    categories=["Lu", "Ll", "Lt", "Lo", "Nd", "Po", "Zs"],
    exclude_characters="\x00",
)
_UNI_TEXT = st.text(
    alphabet=st.one_of(_TREACHEROUS, _UNI_CHARS), min_size=0, max_size=40
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)
@given(texts=st.lists(_UNI_TEXT, min_size=8, max_size=24))
def test_alpha_tokens_property_random_unicode(spark, texts):
    """Three-way tokenizer equality on random Unicode text (one Spark job
    per example batch, one DuckDB eval per string)."""
    import duckdb

    from pyspark.sql import functions as F

    from py_etl_spark.queries import _alpha_tokens

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    old = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col("text"), "[^A-Za-z ]", " ")), " "
        ),
        lambda t: t != "",
    )
    rows = {
        r.i: (r.new, r.old)
        for r in df.select(
            "i", _alpha_tokens().alias("new"), old.alias("old")
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        new, old_toks = rows[i]
        assert new == old_toks, (repr(t), new, old_toks)
        want = con.execute(
            "SELECT list_filter(string_split(lower(regexp_replace(?,"
            " '[^A-Za-z ]', ' ', 'g')), ' '), t -> t <> '')",
            [t],
        ).fetchone()[0]
        assert new == want, (repr(t), new, want)
    con.close()


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)
@given(texts=st.lists(_UNI_TEXT, min_size=8, max_size=24))
def test_norm_tokens_matches_contract_spelling(spark, texts):
    """dedup._norm_tokens (single split on [^a-z0-9]+ — the r09 swap,
    14x cheaper than the regexp_replace idiom) must equal the contract
    spelling every MinHash/SimHash oracle now uses (DuckDB
    list_filter/string_split_regex with the [''] fallback) on random
    Unicode. The DuckDB leg is gated on lower() agreement: engines
    legitimately disagree on e.g. U+0130 (JVM/Python lower -> i +
    combining dot; DuckDB -> i), which no contract can reconcile — and
    the corpus is ASCII, so the oracle gate never sees those. Also pins
    the r08->r09 contract change directly: all-whitespace text is ['']
    (the old trim-spaces-only spelling gave ['',''] for '\\t\\n')."""
    import duckdb

    from py_etl_spark.operators.dedup import _norm_tokens

    # force the edge cases into every run
    texts = list(texts) + ["", "!!! ?? ..", " \t\n", "7am—Ok", "x  y"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    rows = {
        r.i: r.new
        for r in df.select(
            "i", _norm_tokens("text").alias("new")
        ).collect()
    }
    con = duckdb.connect()
    oracle = (
        "SELECT CASE WHEN t IS NULL THEN NULL ELSE "
        "coalesce(nullif(list_filter(string_split_regex(lower(t),"
        " '[^a-z0-9]+'), x -> x <> ''), []::VARCHAR[]),"
        " ['']::VARCHAR[]) END FROM (SELECT ? AS t)"
    )
    for i, t in enumerate(texts):
        duck_lower = con.execute(
            "SELECT lower(?)", [t]
        ).fetchone()[0]
        if duck_lower != t.lower():
            continue  # cross-engine lower() divergence; see docstring
        want = con.execute(oracle, [t]).fetchone()[0]
        assert rows[i] == want, (repr(t), rows[i], want)
    con.close()
    assert rows[len(texts) - 4] == [""]  # ' \t\n' -> [''] (r09 contract)
    assert rows[len(texts) - 5] == [""]  # '!!! ?? ..' -> ['']


def test_session_lever_defaults_are_spark_defaults(spark):
    """The r11 production levers (SPARK_GRAFT_IO_CODEC /
    SPARK_GRAFT_PREFER_SMJ) must default to Spark's own defaults so the
    driver's bench stays protocol-comparable across rounds; flipping a
    default is a measured, documented decision, not a drive-by.

    The pin guards the DEFAULT code path only: when the suite itself runs
    under a lever (e.g. SPARK_GRAFT_IO_CODEC=zstd, the documented
    production value), the session-scoped fixture legitimately inherits
    it — skip rather than forbid lever use during test runs (ADVICE r11).
    """
    import os

    levers = {
        k: v
        for k, v in os.environ.items()
        if k in ("SPARK_GRAFT_IO_CODEC", "SPARK_GRAFT_PREFER_SMJ")
    }
    if levers:
        pytest.skip(f"session levers set in environment: {levers}")
    assert spark.conf.get("spark.io.compression.codec") == "lz4"
    assert spark.conf.get("spark.sql.join.preferSortMergeJoin") == "true"
