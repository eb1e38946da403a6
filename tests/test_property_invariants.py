"""Property-based checks of paper-stated operator invariants (hypothesis).

These pin the guarantees the scale story leans on, for ARBITRARY inputs
rather than fixtures:

- winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): any substring of
  length >= k + w - 1 shared by two documents contributes at least one
  common fingerprint — the whole point of using fingerprint overlap as
  a near-dup signal;
- KMV (Bar-Yossef et al.): merge(sketch(A), sketch(B)) == sketch(A ∪ B)
  — the homomorphism that legitimizes the rollup tree (oracle queries
  pin specific instances; this pins random ones);
- HLL (Flajolet et al.): register-wise max merge of per-part sketches
  is bit-identical to the sketch of the union.

Example counts are small (each example runs Spark jobs); the point is
randomized structure, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from py_etl_spark.operators.fingerprint import winnow_fingerprints
from py_etl_spark.operators.sketch import (
    cm_merge_sketches,
    cm_sketch,
    equi_depth_buckets,
    hll_merge,
    hll_sketch,
    kmv_distinct,
    kmv_estimate,
    kmv_merge_sketches,
)

_SETTINGS = dict(
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

K, W = 8, 4  # winnowing gram size / window — the operator defaults
letters = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", max_size=24)
core_text = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz", min_size=K + W - 1, max_size=40
)


@settings(max_examples=10, **_SETTINGS)
@given(pre_a=letters, suf_a=letters, pre_b=letters, suf_b=letters, core=core_text)
def test_winnowing_shared_substring_yields_common_fp(
    spark, pre_a, suf_a, pre_b, suf_b, core
):
    """Two docs embedding the same >= k+w-1 substring in arbitrary
    contexts must share at least one fingerprint."""
    docs = spark.createDataFrame(
        [("a", pre_a + core + suf_a), ("b", pre_b + core + suf_b)],
        "doc_id string, text string",
    )
    fps = winnow_fingerprints(docs, k=K, w=W).collect()
    a = {r.fp for r in fps if r.doc_id == "a"}
    b = {r.fp for r in fps if r.doc_id == "b"}
    assert a & b, "shared substring produced no common fingerprint"


values = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=120
)


@settings(max_examples=8, **_SETTINGS)
@given(vals=values, cut=st.integers(min_value=0, max_value=120))
def test_kmv_merge_matches_union_sketch(spark, vals, cut):
    """kmv_merge_sketches over an arbitrary 2-way split reproduces the
    union's sketch array AND its estimate."""
    k = 8
    cut = min(cut, len(vals))
    rows = [(("p1" if i < cut else "p2"), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "part string, v long")

    whole = kmv_distinct(df, "v", k=k).collect()[0]
    parts = kmv_distinct(df, "v", k=k, group_cols=("part",)).collect()
    merged = kmv_merge_sketches([list(r.sketch) for r in parts], k)

    assert merged == list(whole.sketch)
    assert kmv_estimate(merged, k) == float(whole.estimate)


@settings(max_examples=8, **_SETTINGS)
@given(vals=values, cut=st.integers(min_value=0, max_value=120))
def test_hll_merge_matches_union_sketch(spark, vals, cut):
    """Register-wise max over per-part HLL sketches is bit-identical to
    the sketch built directly over the union."""
    cut = min(cut, len(vals))
    rows = [(("p1" if i < cut else "p2"), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "part string, v long")

    whole = hll_sketch(df, "v").collect()[0]
    parts = hll_sketch(df, "v", group_cols=("part",))
    merged = hll_merge(parts).collect()[0]

    assert list(merged.registers) == list(whole.registers)
    assert merged.estimate == whole.estimate


@settings(max_examples=8, **_SETTINGS)
@given(vals=values, cut=st.integers(min_value=0, max_value=120))
def test_cm_merge_matches_union_sketch(spark, vals, cut):
    """Count-min counters are linear: elementwise sum of per-part
    sketches equals the union's sketch cell-for-cell (Cormode &
    Muthukrishnan), and item counts are additive."""
    cut = min(cut, len(vals))
    rows = [(("p1" if i < cut else "p2"), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "part string, v long")

    whole = cm_sketch(df, "v", width=16, depth=3).collect()[0]
    parts = cm_sketch(df, "v", width=16, depth=3, group_cols=("part",)).collect()
    merged = cm_merge_sketches([[list(r) for r in p.cm] for p in parts])

    assert merged == [list(r) for r in whole.cm]
    assert sum(p.n_items for p in parts) == whole.n_items


doubles = st.lists(
    st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
    min_size=1,
    max_size=150,
)


@settings(max_examples=8, **_SETTINGS)
@given(vals=doubles, n_buckets=st.integers(min_value=1, max_value=6))
def test_equi_depth_buckets_monotone_and_in_range(spark, vals, n_buckets):
    """Bucket assignment is monotone in the value and always lands in
    [0, n_buckets): a larger value can never get a smaller bucket."""
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = (
        equi_depth_buckets(df, "x", lo=0.0, hi=100.0, bins=32, n_buckets=n_buckets)
        .select("x", "bucket")
        .collect()
    )
    assert all(0 <= r.bucket < n_buckets for r in out)
    by_val = sorted(out, key=lambda r: r.x)
    assert all(
        a.bucket <= b.bucket for a, b in zip(by_val, by_val[1:])
    ), "bucket not monotone in value"


# printable payloads incl. the delimiter, quotes, unicode, and edge
# whitespace — everything except newlines (those need multiLine=True on
# the reader, pinned separately below)
payload = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\n\r", exclude_categories=("Cs",)
    ),
    max_size=20,
)


@settings(max_examples=8, **_SETTINGS)
@given(vals=st.lists(payload, min_size=1, max_size=20))
def test_csv_sink_roundtrips_arbitrary_payloads(spark, vals):
    """write_csv → read back preserves every non-empty value
    byte-for-byte — delimiters, quotes, unicode, leading/trailing
    whitespace (writer trimming pinned off). The ONLY lossy mapping is
    the reference's documented empty ≡ NULL semantics."""
    import tempfile

    from py_etl_spark.sources.csv_io import write_csv

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, s string")
    out = tempfile.mkdtemp() + "/payloads"
    write_csv(df, out)
    back = {
        int(r.id): r.s
        for r in spark.read.csv(out, sep=";", header=True, encoding="utf-8")
        .collect()
    }
    for i, v in rows:
        expected = None if v == "" else v
        assert back[i] == expected, (i, repr(v), repr(back[i]))


def test_csv_sink_roundtrips_embedded_newlines(spark):
    """Embedded newlines survive the sink and a multiLine=True read —
    the documented non-splittable opt-in for newline-bearing corpora."""
    import tempfile

    from py_etl_spark.sources.csv_io import write_csv

    df = spark.createDataFrame(
        [(1, "line\nbreak"), (2, "a;b"), (3, ' pad '), (4, 'q"uote')],
        "id long, s string",
    )
    out = tempfile.mkdtemp() + "/newlines"
    write_csv(df, out)
    back = {
        int(r.id): r.s
        for r in spark.read.csv(
            out, sep=";", header=True, encoding="utf-8", multiLine=True
        ).collect()
    }
    assert back == {1: "line\nbreak", 2: "a;b", 3: " pad ", 4: 'q"uote'}


texts = st.lists(
    st.text(alphabet="abcdef ghij", min_size=3, max_size=30),
    min_size=1,
    max_size=8,
    unique=True,
)


@settings(max_examples=8, **_SETTINGS)
@given(docs=texts, dup_idx=st.integers(min_value=0, max_value=7))
def test_lsh_recall_on_identical_docs(spark, docs, dup_idx):
    """Exact-duplicate recall guarantee: two documents with IDENTICAL
    text have identical MinHash signatures, land in every band bucket
    together, and MUST appear as a candidate pair (cap disabled)."""
    from py_etl_spark.operators.dedup import minhash_lsh_candidates

    dup_idx = dup_idx % len(docs)
    rows = [(f"d{i}", t) for i, t in enumerate(docs)]
    rows.append(("dup", docs[dup_idx]))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            df, num_hashes=8, bands=4, shingle_k=2, max_bucket_size=None
        ).collect()
    }
    assert (f"d{dup_idx}", "dup") in pairs


@settings(max_examples=8, **_SETTINGS)
@given(docs=texts, dup_idx=st.integers(min_value=0, max_value=7))
def test_simhash_recall_on_identical_docs(spark, docs, dup_idx):
    """Same recall guarantee for the SimHash banding: identical text →
    identical 60-bit signature → every chunk collides → candidate pair."""
    from py_etl_spark.operators.dedup import simhash_candidates

    dup_idx = dup_idx % len(docs)
    rows = [(f"d{i}", t) for i, t in enumerate(docs)]
    rows.append(("dup", docs[dup_idx]))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in simhash_candidates(df, max_bucket_size=None).collect()
    }
    assert (f"d{dup_idx}", "dup") in pairs


edge_lists = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=30
)


@settings(max_examples=10, **_SETTINGS)
@given(es=edge_lists)
def test_connected_components_matches_union_find(spark, es):
    """Min-label propagation on ANY random undirected graph (self-loops
    and parallel edges included) produces exactly the union-find
    components, with cluster_id == min node id of the component."""
    from py_etl_spark.operators.dedup import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in es:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    # canonical: min node id per component
    comp_min = {}
    for n, r in expected.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    expected = {n: comp_min[find(n)] for n in parent}

    df = spark.createDataFrame(es, "id_a long, id_b long")
    got = {
        r.node: r.cluster_id
        for r in connected_components(df, max_iter=20).collect()
    }
    assert got == expected


@settings(max_examples=8, **_SETTINGS)
@given(
    es=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=20,
    ),
    iters=st.integers(min_value=1, max_value=3),
)
def test_pagerank_bit_exact_vs_python_replay(spark, es, iters):
    """The integer fixed-point doctrine, proven on ANY directed graph:
    a naive driver-side replay of the micro-unit recurrence matches the
    distributed result to the last micro-unit (floor-div quantization
    and all) — the reproducibility float PageRank cannot give."""
    from py_etl_spark.operators.graph import MICRO, pagerank_fixed_point

    d_micro = int(round(0.85 * MICRO))
    nodes = sorted({n for e in es for n in e})
    out_edges = {}
    deg = {}
    for a, b in es:
        out_edges.setdefault(a, []).append(b)
        deg[a] = deg.get(a, 0) + 1
    ranks = {n: MICRO for n in nodes}
    for _ in range(iters):
        incoming = {n: 0 for n in nodes}
        for u, targets in out_edges.items():
            share = ranks[u] // deg[u]
            for v in targets:
                incoming[v] += share
        ranks = {
            n: (MICRO - d_micro) + (d_micro * incoming[n]) // MICRO
            for n in nodes
        }

    df = spark.createDataFrame(es, "src long, dst long")
    got = {
        r.node: r.rank_micro
        for r in pagerank_fixed_point(df, iterations=iters).collect()
    }
    assert got == ranks


ids = st.lists(
    st.text(alphabet="abcdefghij0123456789", min_size=1, max_size=12),
    min_size=1,
    max_size=40,
    unique=True,
)


@settings(max_examples=8, **_SETTINGS)
@given(doc_ids=ids, nparts=st.integers(min_value=1, max_value=7))
def test_deterministic_split_stable_under_repartition(spark, doc_ids, nparts):
    """The split assignment depends ONLY on the id hash: repartitioning
    (or any physical layout change) assigns every row identically, and
    every row gets exactly one of the declared split names."""
    from py_etl_spark.operators.corpus import deterministic_split

    df = spark.createDataFrame([(d,) for d in doc_ids], "doc_id string")
    splits = {"train": 80, "val": 10, "test": 10}
    a = {
        r.doc_id: r.split for r in deterministic_split(df, splits=splits).collect()
    }
    b = {
        r.doc_id: r.split
        for r in deterministic_split(
            df.repartition(nparts), splits=splits
        ).collect()
    }
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}


@settings(max_examples=8, **_SETTINGS)
@given(
    doc_ids=ids,
    n_per=st.integers(min_value=1, max_value=6),
    nparts=st.integers(min_value=1, max_value=7),
)
def test_stratified_sample_exact_count_and_stable(spark, doc_ids, n_per, nparts):
    """Exact-count stratified sampling: each stratum yields exactly
    min(n_per, |stratum|) rows, and the drawn SET is identical under
    repartitioning (determinism doctrine: md5 order key, never rand)."""
    from py_etl_spark.operators.corpus import sample_stratified_exact

    rows = [(d, "s" + str(len(d) % 3)) for d in doc_ids]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = sample_stratified_exact(df, n_per).collect()
    by_stratum = {}
    for r in out:
        by_stratum.setdefault(r.source, set()).add(r.doc_id)
    sizes = {}
    for d, s in rows:
        sizes[s] = sizes.get(s, 0) + 1
    for s, n in sizes.items():
        assert len(by_stratum.get(s, set())) == min(n_per, n)
    again = {
        (r.source, r.doc_id)
        for r in sample_stratified_exact(df.repartition(nparts), n_per).collect()
    }
    assert again == {(r.source, r.doc_id) for r in out}


# ---- funnel: aggregate fold vs sequential replay --------------------------

funnel_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=12),  # ts (dense -> many ties)
        st.sampled_from(["a", "b", "c", "x"]),  # event type (x = noise)
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, **_SETTINGS)
@given(evs=funnel_events, nparts=st.integers(min_value=1, max_value=5))
def test_funnel_matches_python_replay(spark, evs, nparts):
    """funnel()'s single-pass aggregate fold equals the obvious sequential
    replay for ARBITRARY event soups: strict ordered advancement, ties
    broken by tie_col, equal timestamps never advancing two steps, and
    the result independent of physical partitioning."""
    from py_etl_spark.operators.funnel import funnel

    steps = ["a", "b", "c"]
    rows = [(u, t, ty, i) for i, (u, t, ty) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_type string, eid long"
    ).repartition(nparts)
    got = {
        r.user_id: (r.reached, r.t_step1, r.t_step2, r.t_step3)
        for r in funnel(df, steps, tie_col="eid").collect()
    }

    expect = {}
    for u in {r[0] for r in rows}:
        seq = sorted((t, i, ty) for (uu, t, ty, i) in rows if uu == u)
        stage, t_last, times = 0, None, []
        for t, _i, ty in seq:
            if stage < 3 and ty == steps[stage] and (stage == 0 or t > t_last):
                stage, t_last = stage + 1, t
                times.append(t)
        pad = times + [None] * (3 - len(times))
        expect[u] = (stage, pad[0], pad[1], pad[2])
    assert got == expect


# ---- bloom: split-OR merge homomorphism + no false negatives --------------

bloom_vals = st.lists(
    st.integers(min_value=0, max_value=1_000_000), min_size=1, max_size=80
)


@settings(max_examples=8, **_SETTINGS)
@given(vals=bloom_vals, cut=st.integers(min_value=0, max_value=80))
def test_bloom_split_or_merge_and_no_false_negatives(spark, vals, cut):
    """The two invariants the semi-join pruning leans on: (1) bitwise-OR
    of two half-builds is bit-identical to the one-shot union build (what
    makes per-partition builds legal at 100 TB); (2) every inserted key
    probes True — false positives allowed, false negatives never."""
    from pyspark.sql import functions as F

    from py_etl_spark.operators.sketch import bloom_build, bloom_contains

    cut = min(cut, len(vals))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    union = bloom_build(df, "v").collect()[0]

    halves = spark.createDataFrame(
        [(v, int(i < cut)) for i, v in enumerate(vals)], "v long, g int"
    )
    orred = [0] * len(union.bloom)
    for p in bloom_build(halves, "v", group_cols=("g",)).collect():
        for j, w in enumerate(p.bloom):
            orred[j] |= w
    assert orred == list(union.bloom)

    probe = df.select(
        bloom_contains(list(union.bloom), F.col("v")).alias("hit")
    )
    assert all(r.hit for r in probe.collect())


# ---- compare_trees: self-diff empty + side-swap antisymmetry --------------

state_maps = st.dictionaries(
    keys=st.sampled_from([f"uid=u{i},o=t" for i in range(5)]),
    values=st.tuples(
        st.sampled_from(["x", "y", None]), st.sampled_from(["1", "2", None])
    ),
    max_size=5,
)


@settings(max_examples=10, **_SETTINGS)
@given(a=state_maps, b=state_maps)
def test_compare_trees_self_empty_and_antisymmetric(spark, a, b):
    """Structural-diff sanity for arbitrary states: self-compare reports
    nothing, and swapping the sides exactly mirrors the report
    (only_lhs <-> only_rhs, attr values swapped) — the property the
    reconciliation loop's converged-state check rests on."""
    from py_etl_spark.operators.compare import compare_trees, extra_entries

    def to_df(d):
        return extra_entries(
            spark,
            [{"dn": dn, "cn": cn, "sn": sn} for dn, (cn, sn) in d.items()],
        )

    da, db = to_df(a), to_df(b)
    assert compare_trees(da, da.select(*da.columns)).count() == 0

    key = lambda r: (r.dn, r.kind, r.attr, r.lhs_value, r.rhs_value)
    fwd = {key(r) for r in compare_trees(da, db).collect()}
    rev = {key(r) for r in compare_trees(db, da).collect()}
    flip = {"only_lhs": "only_rhs", "only_rhs": "only_lhs", "attr_diff": "attr_diff"}
    assert {(dn, flip[k], at, rv, lv) for (dn, k, at, lv, rv) in fwd} == rev


# ---- cohort retention: two-aggregate plan vs sequential replay ------------

retention_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=1, max_value=20),  # january day
        st.integers(min_value=0, max_value=23),  # hour
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, **_SETTINGS)
@given(evs=retention_events)
def test_cohort_retention_matches_python_replay(spark, evs):
    """cohort_retention's min-groupBy + distinct + join plan equals the
    obvious replay: cohort = first-activity day, one count per (cohort,
    offset) of the users active on that offset day."""
    import datetime as dt

    from py_etl_spark.operators.funnel import cohort_retention

    rows = [
        (u, dt.datetime(2024, 1, d, h, 30, 0)) for (u, d, h) in evs
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_start.day, r.period_offset): r.n_users
        for r in cohort_retention(df, period="day").collect()
    }

    first = {}
    days = {}
    for u, t in rows:
        first[u] = min(first.get(u, t.date()), t.date())
        days.setdefault(u, set()).add(t.date())
    expect = {}
    for u, cohort in first.items():
        for d in days[u]:
            k = (cohort.day, (d - cohort).days)
            expect[k] = expect.get(k, 0) + 1
    assert got == expect


# ---- SCD2 point-in-time join: interval argmax vs sequential lookup --------

pit_history = st.dictionaries(
    keys=st.integers(min_value=0, max_value=2),  # dimension key
    values=st.lists(  # change times; values derived from position
        st.integers(min_value=0, max_value=50),
        min_size=1,
        max_size=5,
        unique=True,
    ),
    min_size=1,
    max_size=3,
)
pit_facts = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key (3 = never in dim)
        st.integers(min_value=-5, max_value=55),  # fact time
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, **_SETTINGS)
@given(hist=pit_history, facts=pit_facts)
def test_scd2_point_in_time_join_matches_lookup(spark, hist, facts):
    """Leakage-safety for arbitrary interval layouts: every fact picks
    up exactly the attribute valid AT its timestamp (valid_from <= t <
    valid_to, last interval open), NULL before the key's first interval
    or for unknown keys — and exactly one output row per fact."""
    from py_etl_spark.operators.merge import scd2_point_in_time_join

    h_rows = []
    for k, times in hist.items():
        ts = sorted(times)
        for i, t0 in enumerate(ts):
            t1 = ts[i + 1] if i + 1 < len(ts) else None
            h_rows.append((k, t0, t1, f"v{k}_{i}"))
    hdf = spark.createDataFrame(
        h_rows, "k long, valid_from long, valid_to long, attr string"
    )
    f_rows = [(i, k, t) for i, (k, t) in enumerate(facts)]
    fdf = spark.createDataFrame(f_rows, "fid long, k long, t long")

    out = scd2_point_in_time_join(fdf, hdf, ["k"], "t").collect()
    assert len(out) == len(f_rows)
    got = {r.fid: r.pit_attr for r in out}

    expect = {}
    for i, k, t in f_rows:
        val = None
        for hk, t0, t1, v in h_rows:
            if hk == k and t0 <= t and (t1 is None or t < t1):
                val = v
        expect[i] = val
    assert got == expect


# ---- fuzzy join: gram-index plan vs brute-force Jaccard -------------------

fuzzy_names = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=8),
    min_size=1,
    max_size=10,
)


def _py_grams(s: str, n: int = 3) -> set[str]:
    p = " " + s.strip().lower() + " "
    hi = max(len(p) - (n - 1), 1)
    return {p[i : i + n] for i in range(hi)}


@settings(max_examples=10, **_SETTINGS)
@given(
    ls=fuzzy_names,
    rs=fuzzy_names,
    thr=st.sampled_from([0.2, 0.5, 0.8]),
    salt=st.sampled_from([None, 3]),
    bcast=st.booleans(),
    prefix=st.booleans(),
)
def test_fuzzy_join_matches_bruteforce_jaccard(
    spark, ls, rs, thr, salt, bcast, prefix
):
    """With the stop-gram cap off, the gram-index join is EXACT w.r.t.
    n-gram Jaccard >= threshold (a pair above any positive threshold
    shares >= 1 gram, so candidate generation loses nothing), and
    gram_salt / broadcast_left_grams / prefix_filter change the
    physical plan (salted shuffle, broadcast probe, pigeonhole-pruned
    candidates + array_intersect verification), never the output."""
    from py_etl_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ls)], "la long, name string"
    )
    right = spark.createDataFrame(
        [(i, s) for i, s in enumerate(rs)], "rb long, name string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in fuzzy_join(
            left, right, "name", "name", "la", "rb",
            threshold=thr, gram_salt=salt, broadcast_left_grams=bcast,
            prefix_filter=prefix,
        ).collect()
    }

    expect = {}
    for i, a in enumerate(ls):
        ga = _py_grams(a)
        for j, b in enumerate(rs):
            gb = _py_grams(b)
            jac = len(ga & gb) / len(ga | gb)
            if jac >= thr:
                expect[(i, j)] = round(jac, 6)
    assert got.keys() == expect.keys()
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-6


# ---- exact k-th selection: histogram narrowing vs sorted() ----------------

kth_vals = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60
)


@settings(max_examples=10, **_SETTINGS)
@given(vals=kth_vals, kf=st.floats(min_value=0.0, max_value=1.0))
def test_exact_kth_value_matches_sorted(spark, vals, kf):
    """The distributed selection loop (histogram-narrow + direct tail)
    returns EXACTLY sorted(vals)[k-1] for arbitrary duplicates and any
    rank — with bins and the direct threshold forced small so the
    iterative path actually runs."""
    from py_etl_spark.operators.ranking import exact_kth_value

    k = max(1, min(len(vals), 1 + int(kf * (len(vals) - 1))))
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = exact_kth_value(
        df, "x", k, bins=4, direct_threshold=3, max_rounds=64
    )
    assert got == float(sorted(vals)[k - 1])


# ---- banded interval join: anchor-bucket dedup vs brute force -------------

intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # key
        st.integers(min_value=0, max_value=40),  # start
        st.integers(min_value=0, max_value=25),  # length
    ),
    min_size=1,
    max_size=15,
)


@settings(max_examples=10, **_SETTINGS)
@given(ls=intervals, rs=intervals)
def test_interval_overlap_join_matches_bruteforce(spark, ls, rs):
    """The banded plan (explode-to-buckets + anchor-bucket accept) emits
    EXACTLY the closed-overlap pairs, each once — for arbitrary interval
    soups spanning many buckets, zero-length and exact-touch included."""
    from py_etl_spark.operators.timeseries import interval_overlap_join

    ldf = spark.createDataFrame(
        [(k, s, s + w, i) for i, (k, s, w) in enumerate(ls)],
        "key long, start_s long, end_s long, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, s, s + w, i) for i, (k, s, w) in enumerate(rs)],
        "key long, start_s long, end_s long, rid long",
    )
    out = interval_overlap_join(
        ldf, rdf, "key", bucket_seconds=7
    ).collect()
    got = sorted((r.lid_l, r.rid_r) for r in out)

    expect = sorted(
        (i, j)
        for i, (lk, lss, lw) in enumerate(ls)
        for j, (rk, rss, rw) in enumerate(rs)
        if lk == rk and lss <= rss + rw and rss <= lss + lw
    )
    assert got == expect  # exact pair set AND exactly-once multiplicity


# ---- global position: bucketed rank vs sorted enumeration -----------------

rank_vals = st.lists(
    st.integers(min_value=0, max_value=9), min_size=1, max_size=50
)


@settings(max_examples=8, **_SETTINGS)
@given(vals=rank_vals, nparts=st.integers(min_value=1, max_value=5))
def test_with_global_position_is_sorted_enumeration(spark, vals, nparts):
    """The sample-partition-offset rank equals the 1-based index in the
    fully sorted order for ANY value skew (few distinct values force
    ties across bucket boundaries; the unique tiebreaker must keep the
    rank a permutation) and any physical partitioning."""
    from pyspark.sql import functions as F

    from py_etl_spark.operators.ranking import with_global_position

    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v long, uid long").repartition(nparts)
    out = with_global_position(
        df, [F.col("v"), F.col("uid")], num_buckets=4, sample_per_bucket=3
    ).collect()
    got = {(r.v, r.uid): r.position for r in out}
    expect = {
        vu: i + 1 for i, vu in enumerate(sorted(rows))
    }
    assert got == expect


# ---- BM25: JVM column formula vs Python replica ---------------------------

bm25_docs = st.lists(
    st.text(alphabet="ab1. ", min_size=0, max_size=20),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, **_SETTINGS)
@given(texts=bm25_docs)
def test_bm25_scores_match_python_replica(spark, texts):
    """The whole-stage-codegen BM25 column (Robertson/Sparck Jones idf,
    k1/b length normalization, the exact rounding ladder) reproduces a
    direct Python implementation on random corpora — every doc's score,
    match count, and the (score desc, id) ordering."""
    import math
    import re

    from py_etl_spark.operators.corpus import TOKEN_RE
    from py_etl_spark.operators.search import bm25_topk

    texts = texts + ["ab b"]  # ensure a non-empty corpus token-wise
    terms, k1, b = ["ab", "b"], 1.2, 0.75
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = bm25_topk(df, terms, k=len(texts)).collect()

    toks = [re.findall(TOKEN_RE, t.lower()) for t in texts]
    dls = [len(ts) for ts in toks]
    n, avgdl = len(texts), sum(dls) / len(texts)
    expect = {}
    for i, ts in enumerate(toks):
        score, n_match = 0.0, 0
        for term in terms:
            tf = ts.count(term)
            dfreq = sum(1 for o in toks if term in o)
            idf = round(math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0), 6)
            score += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dls[i] / avgdl)
            )
            n_match += tf > 0
        expect[i] = (n_match, score)

    assert len(out) == len(texts)
    for r in out:
        en, es = expect[r.doc_id]
        assert r.n_match == en
        assert abs(r.score_bm25 - es) < 1e-3
    # returned order respects (score desc, id asc) on the REPORTED scores
    keys = [(-r.score_bm25, r.doc_id) for r in out]
    assert keys == sorted(keys)


# ---- anonymize: format contracts on arbitrary inputs ----------------------

raw_ids = st.lists(
    st.one_of(st.none(), st.text(alphabet="aB0@._ -", max_size=14)),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, **_SETTINGS)
@given(vals=raw_ids, year=st.integers(min_value=1940, max_value=2010))
def test_anonymize_format_contracts(spark, vals, year):
    """The pseudonymization strategies' format guarantees hold for
    ARBITRARY inputs: equal plaintexts map to equal pseudonyms (the
    join-key-preserving property), NULL stays NULL everywhere, emails
    keep their domain, numbers stay under 10^digits, and scrambled
    birthdates keep the year with month/day in safe ranges."""
    import datetime as dt

    from pyspark.sql import functions as F

    from py_etl_spark.operators.anonymize import (
        pseudo_email,
        pseudo_number,
        pseudo_word,
        scramble_birthdate,
    )

    rows = [
        (i, v, dt.datetime(year, 6, 15) if v is not None else None)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "i long, v string, d timestamp")
    out = df.select(
        "i",
        "v",
        pseudo_word(F.col("v"), "s", 8).alias("w"),
        pseudo_email(F.col("v"), "s").alias("e"),
        pseudo_number(F.col("v"), "s", 6).alias("n"),
        scramble_birthdate(F.col("d"), "s").alias("b"),
    ).collect()

    by_plain = {}
    for r in out:
        if r.v is None:
            assert r.w is None and r.e is None and r.n is None
            continue
        by_plain.setdefault(r.v, set()).add((r.w, r.e, r.n))
        assert r.w != r.v or len(r.v) != 8  # pseudonym, not identity
        if "@" in r.v:
            assert r.e.endswith("@" + r.v.rsplit("@", 1)[1])
        assert 0 <= r.n < 10**6
        assert r.b.year == year
        assert 1 <= r.b.month <= 12 and 1 <= r.b.day <= 28
    for plain, images in by_plain.items():
        assert len(images) == 1, f"{plain!r} mapped inconsistently"


# ---- head+tail truncation: array slices vs string surgery -----------------

trunc_texts = st.lists(
    st.text(alphabet="ab ", max_size=30), min_size=1, max_size=12
)


@settings(max_examples=10, **_SETTINGS)
@given(
    texts=trunc_texts,
    h=st.integers(min_value=1, max_value=6),
    t=st.integers(min_value=1, max_value=6),
)
def test_truncate_head_tail_matches_python_slices(spark, texts, h, t):
    """The pure-Column head+tail truncation equals direct Python list
    slicing for arbitrary whitespace soups (empty tokens from doubled
    spaces included): verbatim pass-through within budget, first-h +
    marker + last-t beyond it."""
    from py_etl_spark.operators.corpus import truncate_head_tail

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "i long, text string"
    )
    out = {
        r.i: (r.n_tokens, r.was_truncated, r.trunc_text)
        for r in truncate_head_tail(df, h, t).collect()
    }
    for i, s in enumerate(texts):
        toks = s.split(" ")
        n = len(toks)
        if n > h + t:
            want = (n, True, " ".join(toks[:h]) + " ... " + " ".join(toks[-t:]))
        else:
            want = (n, False, s)
        assert out[i] == want


# ---- interleave: stride schedule's exact prefix counts --------------------

mix_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # doc id
        st.sampled_from(["a", "b", "c"]),  # source
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda x: x[0],
)


@settings(max_examples=10, **_SETTINGS)
@given(docs=mix_docs, wa=st.integers(min_value=1, max_value=4),
       wb=st.integers(min_value=1, max_value=4))
def test_interleave_sources_exact_prefix_counts(spark, docs, wa, wb):
    """Stride scheduling's defining invariant, exactly: among all rows
    with mix_key <= K, source s contributes min(floor(K·w_s/L), n_s)
    docs — proportional in every prefix, never front-loaded — and
    unlisted sources are excluded."""
    import math

    from py_etl_spark.operators.corpus import interleave_sources

    weights = {"a": wa, "b": wb}
    df = spark.createDataFrame(list(docs), "doc_id long, source string")
    rows = interleave_sources(df, weights).collect()
    assert all(r.source in weights for r in rows)
    n = {s: sum(1 for _, src in docs if src == s) for s in weights}
    assert len(rows) == n["a"] + n["b"]

    lcm = math.lcm(wa, wb)
    for K in {r.mix_key for r in rows}:
        for s, w in weights.items():
            got = sum(1 for r in rows if r.source == s and r.mix_key <= K)
            assert got == min(K * w // lcm, n[s])


# ---- streaming sessionize: random event soups vs sequential replay --------

sess_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=60),  # ts (epoch seconds)
    ),
    min_size=1,
    max_size=25,
)

_SESS_SEQ = iter(range(10_000))


@settings(max_examples=5, **_SETTINGS)
@given(evs=sess_events, cutf=st.floats(min_value=0.0, max_value=1.0))
def test_streaming_sessionize_matches_replay_on_random_splits(spark, evs, cutf):
    """Stateful stream sessionization equals the sequential gap replay
    for ARBITRARY event soups cut into micro-batches at an arbitrary
    time-ordered point — session state must survive the trigger
    boundary wherever it lands, including mid-session and between
    equal-timestamp events."""
    import datetime as dt
    import os
    import tempfile
    import time as _time

    from py_etl_spark.streaming.sessionize import sessionize_stream

    gap_s = 5
    base = dt.datetime(2024, 3, 1)
    rows = sorted(
        (base + dt.timedelta(seconds=t), u, i)
        for i, (u, t) in enumerate(evs)
    )
    max_ts = max(r[0] for r in rows)
    sentinel_ts = max_ts + dt.timedelta(seconds=gap_s + 2)
    sentinels = [
        (sentinel_ts, u, -1) for u in sorted({u for _, u, _ in rows})
    ]
    cut = min(int(cutf * len(rows)), len(rows))

    tmp = tempfile.mkdtemp()
    batches = [rows[:cut], rows[cut:] + sentinels]
    schema = "user_id long, ts timestamp, event_id long"
    for bi, batch in enumerate(batches):
        if not batch:
            continue
        spark.createDataFrame(
            [(u, ts, i) for ts, u, i in batch], schema
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, f"b{bi}")
        )
        _time.sleep(1.1)  # file source orders triggers by mtime

    name = f"sess_prop_{next(_SESS_SEQ)}"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp + "/*")
    )
    q = (
        sessionize_stream(stream, gap_s=gap_s)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = {
        (r.user_id, r.session_id): (r.n_events, r.session_start_ms)
        for r in spark.table(name).collect()
    }

    expect = {}
    for u in {u for _, u, _ in rows}:
        times = sorted(
            int(ts.timestamp()) for ts, uu, _ in rows if uu == u
        )
        ord_, start, last, n = 0, None, None, 0
        for t in times:
            if start is None or t - last > gap_s:
                if start is not None:
                    expect[(u, ord_)] = (n, start * 1000)
                ord_, start, last, n = ord_ + 1, t, t, 1
            else:
                last, n = t, n + 1
        expect[(u, ord_)] = (n, start * 1000)  # closed by the sentinel
    assert got == expect


# ---- data-skipping: prune_files must never skip a matching file -----------

prune_rows = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
)


@settings(max_examples=8, **_SETTINGS)
@given(
    vs=prune_rows,
    nparts=st.integers(min_value=1, max_value=6),
    lo=st.integers(min_value=-60, max_value=60),
    width=st.integers(min_value=0, max_value=40),
)
def test_prune_files_sound_for_any_layout(spark, vs, nparts, lo, width):
    """SOUNDNESS of min/max file pruning — the dangerous direction: for
    any physical file layout and any range predicate, reading only the
    surviving files yields exactly the rows the full scan yields.
    (Keeping extra files is allowed; dropping a matching row is not.)"""
    import tempfile

    from pyspark.sql import functions as F

    from py_etl_spark.operators.layout import file_minmax_stats, prune_files

    hi = lo + width
    tmp = tempfile.mkdtemp()
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vs)], "i long, v long")
    df.repartition(nparts).write.mode("overwrite").parquet(tmp)

    stats = file_minmax_stats(spark, tmp, ["v"])
    survivors = prune_files(stats, {"v": (lo, hi)})
    want = sorted((i, v) for i, v in enumerate(vs) if lo <= v <= hi)
    if not survivors:
        assert not want
        return
    got = sorted(
        (r.i, r.v)
        for r in spark.read.parquet(*survivors)
        .filter((F.col("v") >= lo) & (F.col("v") <= hi))
        .collect()
    )
    assert got == want


# ---- dq constraints: compiled report vs Python counting -------------------

dq_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=8)),  # a
        st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),  # b
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=8, **_SETTINGS)
@given(rows=dq_rows, fkeys=st.sets(st.integers(min_value=0, max_value=8), max_size=6))
def test_check_constraints_matches_python_counts(spark, rows, fkeys):
    """The minimal-pass violation report equals direct Python counting
    for arbitrary NULL/duplicate soups: not_null counts NULLs, in_range
    and in_set skip NULLs, unique counts rows beyond the first per
    group, foreign_key counts non-NULL orphans — empty tables report
    zero, never NULL."""
    from py_etl_spark.operators.dq import (
        check_constraints,
        foreign_key,
        in_range,
        in_set,
        not_null,
        unique,
    )

    df = spark.createDataFrame(rows, "a int, b string")
    dim = spark.createDataFrame([(k,) for k in sorted(fkeys)], "k int")
    report = check_constraints(
        df,
        [
            not_null("a"),
            in_range("a", 2, 6),
            in_set("b", {"x", "y"}),
            unique("a", "b"),
            foreign_key("a", dim, "k"),
        ],
    ).collect()
    got = {r.check_name: (r.n_violations, r.passed) for r in report}

    from collections import Counter

    nn = sum(1 for a, _ in rows if a is None)
    rng = sum(1 for a, _ in rows if a is not None and (a < 2 or a > 6))
    ins = sum(1 for _, b in rows if b is not None and b not in {"x", "y"})
    dup = sum(c - 1 for c in Counter(rows).values() if c > 1)
    fk = sum(1 for a, _ in rows if a is not None and a not in fkeys)
    expect = {
        "not_null(a)": nn,
        "in_range(a)": rng,
        "in_set(b)": ins,
        "unique(a,b)": dup,
        "fk(a)": fk,
    }
    for name, n in expect.items():
        key = name if name in got else [k for k in got if k.startswith(name.split("(")[0])][0]
        assert got[key] == (n, n == 0), (name, got)


# ---- streaming funnel: random trigger cuts vs strict-advance replay -------

sfunnel_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=10),  # ts seconds
        st.sampled_from(["a", "b", "x"]),  # type
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=5, **_SETTINGS)
@given(evs=sfunnel_events, cutf=st.floats(min_value=0.0, max_value=1.0))
def test_streaming_funnel_matches_replay_on_random_splits(spark, evs, cutf):
    """The stateful streaming funnel emits exactly the completions the
    strict-advance replay predicts, for arbitrary event soups cut into
    micro-batches at an arbitrary time-ordered point — funnel state
    (stage, t_last, completion times) must survive the trigger boundary
    mid-funnel."""
    import datetime as dt
    import os
    import tempfile
    import time as _time

    from py_etl_spark.streaming.funnel_stream import funnel_stream

    steps = ["a", "b"]
    base = dt.datetime(2024, 4, 1)
    rows = sorted(
        (base + dt.timedelta(seconds=t), i, u, ty)
        for i, (u, t, ty) in enumerate(evs)
    )
    cut = min(int(cutf * len(rows)), len(rows))

    tmp = tempfile.mkdtemp()
    schema = "user_id long, ts timestamp, event_type string, event_id long"
    for bi, batch in enumerate((rows[:cut], rows[cut:])):
        if not batch:
            continue
        spark.createDataFrame(
            [(u, ts, ty, i) for ts, i, u, ty in batch], schema
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, f"b{bi}")
        )
        _time.sleep(1.1)  # file source orders triggers by mtime

    name = f"funnel_prop_{next(_SESS_SEQ)}"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp + "/*")
    )
    q = (
        funnel_stream(stream, steps)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = {
        r.user_id: (r.t_step1_ms, r.t_step2_ms)
        for r in spark.table(name).collect()
    }

    expect = {}
    for u in {u for _, _, u, _ in rows}:
        seq = [
            (int(ts.timestamp()) * 1000, i, ty)
            for ts, i, uu, ty in rows
            if uu == u
        ]
        stage, t_last, times = 0, None, []
        for t, _i, ty in sorted(seq):
            if stage < 2 and ty == steps[stage] and (stage == 0 or t > t_last):
                times.append(t)
                stage, t_last = stage + 1, t
        if stage == 2:
            expect[u] = (times[0], times[1])
    assert got == expect


# ---- PNG codec: spec-forward filtering vs the decoder's inverse -----------

png_dims = st.tuples(
    st.integers(min_value=1, max_value=6),  # width
    st.integers(min_value=1, max_value=6),  # height
    st.sampled_from([1, 2, 3, 4]),  # channels
)


@settings(max_examples=20, **_SETTINGS)
@given(dims=png_dims, data=st.data())
def test_png_decoder_inverts_spec_forward_filters(dims, data):
    """parse_png must invert scanlines filtered the way the PNG spec
    (§9) defines the FORWARD direction — implemented here independently
    — for random pixels, dims, channels, and a random filter type
    (None/Sub/Up/Average/Paeth) per row. Catches any off-by-one in the
    decoder's Sub/Average/Paeth neighbor indexing that the filter-0
    roundtrip can never see."""
    import struct
    import zlib

    from py_etl_spark.operators.media_codec import parse_png

    w, h, ch = dims
    stride = w * ch
    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=stride * h,
                max_size=stride * h,
            )
        )
    )
    ftypes = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=4), min_size=h, max_size=h
        )
    )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(stride)
    for y, ft in enumerate(ftypes):
        line = px[y * stride : (y + 1) * stride]
        filt = bytearray()
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, c)}[ft]
            filt.append((line[i] - pred) & 0xFF)
        raw += bytes([ft]) + filt
        prev = line

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    meta = parse_png(png)
    assert (meta["width"], meta["height"], meta["channels"]) == (w, h, ch)
    assert bytes(meta["pixels"]) == px


@settings(max_examples=20, **_SETTINGS)
@given(dims=png_dims, data=st.data())
def test_png_encode_decode_roundtrip(dims, data):
    """encode_png -> parse_png is the identity on random pixel buffers
    (the docstring's contract, pinned for arbitrary inputs)."""
    from py_etl_spark.operators.media_codec import encode_png, parse_png

    w, h, ch = dims
    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h * ch,
                max_size=w * h * ch,
            )
        )
    )
    meta = parse_png(encode_png(px, w, h, ch))
    assert bytes(meta["pixels"]) == px


# ---- WAV parser: RIFF walk vs a directly constructed file -----------------

wav_samples = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=40
)


@settings(max_examples=20, **_SETTINGS)
@given(
    samples=wav_samples,
    nch=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    junk_len=st.integers(min_value=0, max_value=5),
)
def test_wav_parser_matches_constructed_riff(samples, nch, rate, junk_len):
    """parse_wav recovers format, frame count, duration, and RMS from a
    RIFF file built directly from random samples — including an
    odd-length junk chunk before fmt/data, which exercises the spec's
    word-alignment rule in the chunk walk."""
    import struct

    from py_etl_spark.operators.media_codec import parse_wav

    if nch == 2 and len(samples) % 2:
        samples = samples + [0]
    data = b"".join(struct.pack("<h", s) for s in samples)
    junk = b"J" * junk_len
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
    chunks = (
        b"junk" + struct.pack("<I", junk_len) + junk + (b"\x00" if junk_len % 2 else b"")
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    meta = parse_wav(wav)
    n_frames = len(samples) // nch
    assert meta["channels"] == nch and meta["sample_rate"] == rate
    assert meta["bits_per_sample"] == 16 and meta["n_frames"] == n_frames
    assert meta["duration_ms"] == int(1000 * n_frames / rate)
    rms = (sum(s * s for s in samples) / len(samples)) ** 0.5 / 32768.0
    assert abs(meta["rms"] - rms) < 1e-12


# ---- AES hex transport: decrypt inverts encrypt for arbitrary text --------

aes_texts = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
            max_size=24,
        ),
    ),
    min_size=1,
    max_size=15,
)


@settings(max_examples=8, **_SETTINGS)
@given(vals=aes_texts, fixed_iv=st.booleans())
def test_aes_hex_roundtrip_arbitrary_text(spark, vals, fixed_iv):
    """aes_decrypt_from_hex inverts aes_encrypt_hex for arbitrary
    unicode plaintexts (empty string included) under both the pinned-IV
    and random-IV modes, and NULL passes through both directions."""
    from pyspark.sql import functions as F

    from py_etl_spark.functions.crypto import (
        FIXED_TEST_IV_HEX,
        aes_decrypt_from_hex,
        aes_encrypt_hex,
    )

    key = "0123456789abcdef"
    iv = FIXED_TEST_IV_HEX if fixed_iv else None
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v string"
    )
    out = df.select(
        "i",
        "v",
        aes_decrypt_from_hex(
            aes_encrypt_hex(F.col("v"), key, iv_hex=iv), key
        ).alias("back"),
    ).collect()
    for r in out:
        assert r.back == r.v, (repr(r.v), repr(r.back))


# ---- multi-value normalize: permutation invariance + idempotence ----------

mv_parts = st.lists(
    st.text(alphabet="abc0", max_size=4), min_size=1, max_size=6
)


@settings(max_examples=8, **_SETTINGS)
@given(parts=mv_parts, data=st.data())
def test_multi_value_normalize_permutation_invariant(spark, parts, data):
    """The sort-normalization that makes multi-valued attrs comparable
    (F16): any permutation of the ;-joined parts normalizes to the SAME
    string, and normalizing twice equals normalizing once."""
    from pyspark.sql import functions as F

    from py_etl_spark.functions.conversions import multi_value_normalize

    perm = data.draw(st.permutations(parts))
    df = spark.createDataFrame(
        [(";".join(parts), ";".join(perm))], "a string, b string"
    )
    r = df.select(
        multi_value_normalize("a").alias("na"),
        multi_value_normalize("b").alias("nb"),
        multi_value_normalize(multi_value_normalize("a")).alias("naa"),
    ).first()
    assert r.na == r.nb
    assert r.naa == r.na


# ---- posting-list merge: tf-summing union vs a dict model -----------------

posting_side = st.dictionaries(
    keys=st.sampled_from(["t0", "t1", "t2"]),  # term
    values=st.dictionaries(
        keys=st.integers(min_value=0, max_value=8),  # doc_id
        values=st.integers(min_value=1, max_value=5),  # tf
        min_size=1,
        max_size=5,
    ),
    min_size=0,
    max_size=3,
)


@settings(max_examples=10, **_SETTINGS)
@given(a=posting_side, b=posting_side)
def test_merge_posting_lists_matches_dict_model(spark, a, b):
    """merge_posting_lists equals the dictionary model for ARBITRARY
    index pairs — crucially including documents present on BOTH sides
    (the re-crawled-doc tf-summing path, which the disjoint even/odd
    driver oracle never exercises), terms on one side only, and empty
    sides."""
    from py_etl_spark.operators.search import merge_posting_lists

    def to_df(side):
        rows = []
        for tok, docs in side.items():
            ds = sorted(docs)
            rows.append(
                (tok, len(ds), ds, [docs[d] for d in ds])
            )
        return spark.createDataFrame(
            rows, "tok string, df long, postings array<long>, tfs array<long>"
        )

    merged = merge_posting_lists(to_df(a), to_df(b)).collect()
    got = {
        r.tok: (r.df, list(r.postings), list(r.tfs)) for r in merged
    }

    model: dict[str, dict[int, int]] = {}
    for side in (a, b):
        for tok, docs in side.items():
            for d, tf in docs.items():
                model.setdefault(tok, {})
                model[tok][d] = model[tok].get(d, 0) + tf
    expect = {
        tok: (
            len(docs),
            sorted(docs),
            [docs[d] for d in sorted(docs)],
        )
        for tok, docs in model.items()
    }
    assert got == expect


# ---- chunking: map-side slices partition the token stream -----------------

chunk_texts = st.lists(
    st.text(alphabet="ab1. ", max_size=40), min_size=1, max_size=8
)


@settings(max_examples=10, **_SETTINGS)
@given(texts=chunk_texts, sz=st.integers(min_value=1, max_value=7))
def test_chunk_documents_partitions_tokens_exactly(spark, texts, sz):
    """For any corpus and chunk size: chunks re-joined in chunk_id order
    reproduce the document's full token list exactly once, every chunk
    is full except possibly the last, and token-less documents emit no
    rows."""
    import re

    from py_etl_spark.operators.corpus import TOKEN_RE, chunk_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=sz).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.n_chunk_tokens, r.chunk)
        )
    for i, t in enumerate(texts):
        toks = re.findall(TOKEN_RE, t)
        chunks = sorted(by_doc.get(i, []))
        if not toks:
            assert chunks == []
            continue
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        rejoined = [tok for _, _, ch in chunks for tok in ch.split(" ")]
        assert rejoined == toks
        assert all(n == sz for _, n, _ in chunks[:-1])
        assert 1 <= chunks[-1][1] <= sz


# ---- dense resample + trailing mean vs a calendar replay ------------------

ts_events = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.integers(min_value=1, max_value=12),  # march day
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, **_SETTINGS)
@given(evs=ts_events, win=st.integers(min_value=1, max_value=5))
def test_resample_rolling_matches_calendar_replay(spark, evs, win):
    """resample_daily densifies to zero-filled per-(group, day) counts
    over the data's own min..max span, and rolling_mean's trailing
    window (warm-up: average what exists) equals the obvious Python
    replay over that dense series."""
    import datetime as dt

    from py_etl_spark.operators.timeseries import resample_daily, rolling_mean

    rows = [
        (g, dt.datetime(2024, 3, d, 10, 0, 0)) for g, d in evs
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    dense = resample_daily(df)
    out = rolling_mean(dense, window_rows=win).collect()
    got = {
        (r.event_type, r.day.day): (r.n, r.rolling_mean) for r in out
    }

    lo = min(d for _, d in evs)
    hi = max(d for _, d in evs)
    groups = {g for g, _ in evs}
    expect = {}
    for g in groups:
        series = [
            sum(1 for gg, dd in evs if gg == g and dd == d)
            for d in range(lo, hi + 1)
        ]
        for idx, d in enumerate(range(lo, hi + 1)):
            w = series[max(0, idx - win + 1) : idx + 1]
            expect[(g, d)] = (series[idx], round(sum(w) / len(w), 4))
    assert got == expect
