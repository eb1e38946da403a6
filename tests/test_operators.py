"""Unit coverage for dedup / similarity / textstats / anonymize /
sampling / multimodal operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_etl_spark.operators import dedup, sampling, similarity, textstats
from py_etl_spark.operators.anonymize import anonymize, build_mapping
from py_etl_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synthetic_media,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "completely different content about spark engines"),
    (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark):
    groups = dedup.exact_duplicates(_docs(spark)).collect()
    by_keeper = {r.keeper: r.n_docs for r in groups}
    assert by_keeper[1] == 2  # docs 1+4 collapse
    kept = dedup.deduplicate_exact(_docs(spark))
    assert {r.doc_id for r in kept.collect()} == {1, 2, 3}


def test_minhash_lsh_finds_near_dup(spark):
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_candidates(_docs(spark), num_hashes=32, bands=16).collect()
    }
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs  # near-dup shares most shingles


def test_lsh_hot_bucket_cap_bounds_degenerate_corpus(spark):
    # 400 identical docs: without the cap the banded self-join would emit
    # ~80k pairs from one bucket per band. With the cap the degenerate
    # buckets are dropped entirely (exact dedup owns full duplicates) while
    # distinct near-dups still pair up.
    rows = [(i, "all work and no play makes jack a dull boy") for i in range(400)]
    rows += [
        (1000, "the quick brown fox jumps over the lazy dog"),
        (1001, "the quick brown fox jumps over the lazy cat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_candidates(
            df, num_hashes=32, bands=16, max_bucket_size=100
        ).collect()
    }
    assert (1000, 1001) in pairs
    assert len(pairs) <= 2  # degenerate bucket contributed nothing

    sim_pairs = dedup.simhash_candidates(df, max_bucket_size=100).count()
    assert sim_pairs <= 4

    # and the uncapped path on a small corpus still finds everything
    groups = dedup.exact_duplicates(df).filter(F.col("n_docs") > 1).collect()
    assert groups[0].n_docs == 400


def test_ann_lsh_recall_vs_bruteforce(spark):
    from py_etl_spark.schemas import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_lsh(
            emb, queries, dim=64, k=5, planes=2, integer_planes=True
        ).collect()
    }
    # 2 hyperplanes ⇒ 4 buckets ⇒ each query scores ~1/4 of the corpus;
    # recall@5 must beat random by a wide margin
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4


def test_connected_components_clusters(spark):
    # chain 1-2-3 (one component), pair 10-11, isolated node 20
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 20]], "doc_id long")
    cc = {
        r.node: r.cluster_id
        for r in dedup.connected_components(edges, nodes).collect()
    }
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_long_chain_converges(spark):
    # path graph 0-1-…-9: worst-case diameter for min-label propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    rows = dedup.connected_components(edges).collect()
    assert len(rows) == 10
    assert {r.cluster_id for r in rows} == {0}


def test_connected_components_raises_on_iteration_exhaustion(spark):
    """A component whose diameter exceeds max_iter must FAIL LOUDLY —
    the silent alternative returns partially propagated labels that
    split one real component into several clusters, and a dedup
    consumer would keep duplicates with no signal."""
    import pytest as _pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(edges, max_iter=3)


def test_connected_components_converged_on_last_iteration_returns(spark):
    """Labels that change on the LAST allowed iteration but are already
    fully propagated must be RETURNED, not rejected: the confirmation
    round distinguishes converged-but-unverified from genuinely
    exceeding the diameter budget (ADVICE r05)."""
    # path 0-1-2-3: node 3 reaches label 0 exactly at iteration 3
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(3)], "id_a long, id_b long"
    )
    rows = dedup.connected_components(edges, max_iter=3).collect()
    assert len(rows) == 4
    assert {r.cluster_id for r in rows} == {0}


def test_ivf_topk_recall_vs_bruteforce(spark):
    from py_etl_spark.schemas import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    centroids = similarity.ivf_train(emb, k=4, iters=2)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    approx_rows = similarity.ivf_topk(emb, queries, centroids, nprobe=2, k=5).collect()
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    # nprobe=2 of 4 cells ⇒ each query scores ~half the corpus; recall@5
    # must beat random selection by a wide margin
    assert len(exact & approx) / len(exact) >= 0.5
    # every query got a full top-k and ranks are 1..k
    by_q = {}
    for r in approx_rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())


def test_ngram_jaccard(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.0).collect()
    }
    assert pairs[(1, 4)] == 1.0
    assert 0.5 < pairs[(1, 2)] < 1.0
    assert pairs.get((1, 3), 0.0) < 0.1


def test_simhash_close_for_near_dups(spark):
    sigs = {r.doc_id: r.simhash for r in dedup.simhash64(_docs(spark)).collect()}
    assert sigs[1] == sigs[4]
    ham_12 = bin(sigs[1] ^ sigs[2]).count("1")
    ham_13 = bin(sigs[1] ^ sigs[3]).count("1")
    assert ham_12 < ham_13


def test_cosine_topk_exact(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = similarity.cosine_topk_bruteforce(emb, emb.filter("vec_id=1"), k=2).collect()
    ranked = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [2, 3]
    assert abs(out[0].cosine - 0.993884) < 1e-5


def test_lang_and_quality(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is big"),
            (2, "der hund und die katze ist nicht da"),
            (3, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textstats.with_text_stats(df).collect()}
    assert out[1].stat_lang_guess == "en"
    assert out[2].stat_lang_guess == "de"
    assert out[3].stat_lang_guess == "und"
    assert out[1].stat_n_tokens == 10
    assert 0.0 <= out[1].stat_quality <= 1.0


def test_anonymize_consistency(spark):
    df = spark.createDataFrame(
        [("a@x.com", "Ann"), ("a@x.com", "Ann"), ("b@y.org", "Bob")],
        "emailadresse_b string, vorname string",
    )
    rows = anonymize(df, salt="s").collect()
    # same input → same replacement (key consistency)
    assert rows[0].emailadresse_b == rows[1].emailadresse_b
    assert rows[0].vorname == rows[1].vorname
    assert rows[0].emailadresse_b.endswith("@x.com")
    assert rows[2].emailadresse_b.endswith("@y.org")
    assert rows[0].vorname != "Ann"
    mapping = build_mapping(df, "emailadresse_b", salt="s").collect()
    assert len(mapping) == 2


def test_first_n_per_column(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a"), (3, "b"), (4, "c")], "x int, y string"
    )
    out = sampling.first_n_per_column(df, n=2).collect()
    by_col = {}
    for r in out:
        by_col.setdefault(r.column, []).append(r.value)
    assert len(by_col["x"]) == 2
    assert len(by_col["y"]) == 2  # nulls skipped


def _make_png(w=4, h=3, rgb=(10, 200, 30)):
    """Hand-rolled valid RGB8 PNG: row 0 unfiltered, later rows Up-filtered
    (all-equal rows ⇒ Up residuals are zero) — exercises the unfilter path."""
    import binascii
    import struct
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", binascii.crc32(t + d) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    row = bytes(rgb) * w
    raw = b"\x00" + row + (b"\x02" + bytes(len(row))) * (h - 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_wav(rate=8000, n=800, amp=16384):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{n}h", *([amp, -amp] * (n // 2))))
    return buf.getvalue()


def test_media_codec_decodes_real_png_and_wav(spark):
    from py_etl_spark.operators.media_codec import (
        codec_decode_features,
        parse_png,
        parse_wav,
    )

    png = _make_png()
    meta = parse_png(png)
    assert (meta["width"], meta["height"], meta["channels"]) == (4, 3, 3)
    exp_mean = (10 + 200 + 30) / 3 / 255.0
    assert abs(sum(meta["pixels"]) / len(meta["pixels"]) / 255.0 - exp_mean) < 1e-9

    wav = _make_wav()
    m = parse_wav(wav)
    assert m["channels"] == 1 and m["sample_rate"] == 8000
    assert m["duration_ms"] == 100  # 800 frames @ 8 kHz
    assert abs(m["rms"] - 16384 / 32768.0) < 1e-6

    # end-to-end through the Arrow mapInPandas operator with the REAL codec
    from py_etl_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [
        (1, "image", bytearray(png), "image/png", 4, 3, None),
        (2, "audio", bytearray(wav), "audio/wav", None, None, 100),
        (3, "image", bytearray(b"garbage-not-an-image"), "image/png", 0, 0, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r.media_id: r
        for r in extract_features(media, decode_fn=codec_decode_features).collect()
    }
    assert out[1].decode_error is None
    assert out[1].feature[0] == 1.0 and out[1].feature[1] == 4.0
    assert out[2].decode_error is None
    assert out[2].feature[0] == 2.0 and out[2].feature[2] == 8000.0
    assert out[3].feature is None and "unsupported media format" in out[3].decode_error


def test_thumbnail_pipeline_decodes_resizes_reencodes(spark):
    from py_etl_spark.operators.media_codec import (
        encode_png,
        parse_png,
        resize_nearest,
    )
    from py_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        thumbnail_images,
    )

    # 8x4 RGB gradient: every pixel distinct so resampling errors show
    w, h, ch = 8, 4, 3
    px = bytes((y * w + x) * ch + c & 0xFF for y in range(h) for x in range(w) for c in range(ch))
    png = encode_png(px, w, h, ch)
    assert bytes(parse_png(png)["pixels"]) == px  # codec roundtrip

    rows = [
        (1, "image", bytearray(png), "image/png", w, h, None),
        (2, "image", bytearray(b"not a png"), "image/png", 0, 0, None),
        (3, "image", None, "image/png", None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in thumbnail_images(media, max_side=4).collect()}

    t = out[1]
    assert (t.width, t.height, t.thumb_width, t.thumb_height) == (8, 4, 4, 2)
    assert t.thumb_error is None
    m = parse_png(bytes(t.thumb_png))
    assert (m["width"], m["height"]) == (4, 2)
    # pixels equal the reference nearest-neighbor resample exactly
    assert bytes(m["pixels"]) == resize_nearest(px, w, h, ch, 4, 2)
    # error channel, not job failure
    assert out[2].thumb_png is None and "not a PNG" in out[2].thumb_error
    assert out[3].thumb_png is None and "null content" in out[3].thumb_error

    # image already within bounds: re-encoded, pixels unchanged
    small = {r.media_id: r for r in thumbnail_images(media, max_side=16).collect()}
    assert bytes(parse_png(bytes(small[1].thumb_png))["pixels"]) == px


def test_multimodal_features_and_frames(spark):
    media = synthetic_media(spark, 9)
    feats = extract_features(media).collect()
    assert len(feats) == 9
    assert all(r.feature is not None and len(r.feature) == 8 for r in feats)
    assert all(r.sha1 for r in feats)
    frames = frame_sample_plan(media, every_ms=1000)
    vids = media.filter(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == vids


def test_salted_join_matches_plain_join_under_skew(spark):
    from py_etl_spark.operators.skew import salted_join

    # 90%-hot key 7 plus a tail; dim has one row per key
    fact = spark.createDataFrame(
        [(i, 7 if i % 10 else i % 100) for i in range(2000)],
        "row_id long, k long",
    )
    dim = spark.createDataFrame(
        [(k, f"v{k}") for k in range(100)], "dk long, payload string"
    )
    plain = fact.join(dim, fact.k == dim.dk).select("row_id", "k", "payload")
    salted = salted_join(
        fact, dim, "k", "dk", salt_from="row_id", salt_factor=8
    ).select("row_id", "k", "payload")
    assert salted.count() == plain.count() == 2000
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    # the salt must be part of the shuffle key: hash partitioning over
    # (k, __salt) spreads the hot key across salt_factor reducers
    from py_etl_spark.plans import executed_plan

    plan = executed_plan(
        salted_join(fact, dim, "k", "dk", salt_from="row_id", salt_factor=8)
    )
    assert "__salt" in plan


def test_winnowing_shared_substring_guarantee(spark):
    from py_etl_spark.operators.fingerprint import (
        shared_fingerprint_pairs,
        winnow_fingerprints,
    )

    k, w = 8, 4
    shared = "the quick brown fox jumps over the lazy dog near the river"
    docs = spark.createDataFrame(
        [
            (1, f"alpha text one {shared} tail piece"),
            (2, f"completely different preamble {shared} and an ending"),
            (3, "unrelated document about spark physical plans and shuffles"),
        ],
        "doc_id long, text string",
    )
    # winnowing guarantee: a shared substring of length >= k+w-1 yields at
    # least one common fingerprint for the pair that shares it
    pairs = shared_fingerprint_pairs(
        docs, k=k, w=w, min_shared=1, hash_family="md5"
    ).collect()
    keys = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in keys
    # fingerprint density: winnowing keeps far fewer than one fp per gram
    fps = winnow_fingerprints(docs, k=k, w=w, hash_family="md5")
    per_doc = {r.doc_id: r.n for r in fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for did, n in per_doc.items():
        assert 0 < n < 60  # docs are ~60 grams; window-4 min keeps ~1/2


def test_deterministic_split_stability_and_proportions(spark):
    from py_etl_spark.operators.corpus import deterministic_split

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s1 = deterministic_split(df, id_col="doc_id")
    counts = {r.split: r.n for r in
              s1.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 5000 < 0.85
    # stable under repartitioning: identical assignment row-for-row
    s2 = deterministic_split(df.repartition(13), id_col="doc_id")
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0


def test_token_budget_quota_caps_each_group(spark):
    from py_etl_spark.operators.corpus import token_budget_quota

    rows = [(i, f"g{i % 3}", "tok " * (10 + i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = token_budget_quota(df, budget=50)
    for r in kept.groupBy("source").agg(
        F.max("cum_tokens").alias("mx"), F.max("n_tokens").alias("mxd")
    ).collect():
        # greedy quota: overshoot bounded by one document
        assert r.mx < 50 + r.mxd
    # every kept doc started under budget
    assert kept.filter(F.col("cum_tokens") - F.col("n_tokens") >= 50).count() == 0


def test_decontaminate_flags_overlap_only(spark):
    from py_etl_spark.operators.corpus import decontaminate

    bench = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "my training doc leaks the secret benchmark answer here"),
            (2, "a perfectly clean document about spark joins"),
        ],
        "doc_id long, text string",
    )
    hits = {r.doc_id: r.n_hits for r in decontaminate(corpus, bench).collect()}
    assert 1 in hits and hits[1] >= 1
    assert 2 not in hits


def test_chunking_partitions_all_tokens(spark):
    from py_etl_spark.operators.corpus import TOKEN_RE, chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "tok " * 120),         # 120 tokens -> chunks of 50/50/20
            (2, "exactly " * 50),      # one full chunk
            (3, "short text"),
            (4, ""),                   # no tokens -> no chunks
        ],
        "doc_id long, text string",
    )
    ch = chunk_documents(docs, chunk_tokens=50)
    rows = ch.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(len(c.chunk.split()) for c in by_doc[1]) == [20, 50, 50]
    assert [c.n_chunk_tokens for c in by_doc[2]] == [50]
    assert by_doc[3][0].chunk == "short text"
    assert 4 not in by_doc
    # partition property: chunk token counts sum to the doc token count
    n_src = docs.select(
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), F.lit(0))).alias("n")
    ).agg(F.sum("n")).first()[0]
    assert sum(r.n_chunk_tokens for r in rows) == n_src


def test_pack_chunks_budget_exactly_once_and_repartition_stable(spark):
    from py_etl_spark.operators.corpus import chunk_documents, pack_chunks

    docs = spark.createDataFrame(
        [(i, f"word{i} " * (17 + (i * 13) % 90)) for i in range(40)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=25)
    budget = 60
    packed = pack_chunks(chunks, context_tokens=budget, num_shards=4)
    rows = packed.collect()

    # every chunk exactly once
    assert sorted((r.doc_id, r.chunk_id) for r in rows) == sorted(
        (r.doc_id, r.chunk_id) for r in chunks.collect()
    )
    # every example within budget (chunk_tokens <= budget, so no
    # oversized-singleton escape hatch is exercised)
    fills: dict[tuple, int] = {}
    for r in rows:
        fills[(r.shard, r.example_id)] = (
            fills.get((r.shard, r.example_id), 0) + r.n_chunk_tokens
        )
    assert all(v <= budget for v in fills.values())
    # greedy: an example closes only because the NEXT chunk would not fit,
    # so no two consecutive examples in a shard could have been merged
    by_shard: dict[int, dict[int, int]] = {}
    for (shard, ex), v in fills.items():
        by_shard.setdefault(shard, {})[ex] = v
    for exs in by_shard.values():
        assert sorted(exs) == list(range(len(exs)))  # dense ids from 0

    # deterministic under a different input layout
    rows2 = pack_chunks(
        chunks.repartition(13), context_tokens=budget, num_shards=4
    ).collect()
    assert sorted(
        (r.shard, r.doc_id, r.chunk_id, r.example_id) for r in rows2
    ) == sorted((r.shard, r.doc_id, r.chunk_id, r.example_id) for r in rows)


def test_pack_chunks_shard_fanout_and_balance(spark):
    """Scale contract for the packing shuffle: the md5 hash-shard
    assignment must (a) populate every shard once docs >> shards — the
    per-task parallelism lever the docstring promises at 100 TB — and
    (b) balance rows across shards (max/median bounded), so the
    applyInPandas walk has no hot task. The r07 sf10 bench measured
    task-row skew 1.99 on this operator: that was 8 shards being
    AQE-coalesced into 7 tasks (partition-count granularity, not a hot
    key); the registry queries now run num_shards=256 (r08 raised
    64 -> 256 for cluster-scale task granularity)."""
    from py_etl_spark.operators.corpus import pack_chunks

    import statistics

    # ~1250 rows/shard: large enough that md5-bucket Poisson noise sits
    # well under the bound (stddev ~sqrt(1250) => max/median ~1.1); the
    # r07 flag fired at tiny per-shard sizes where count granularity,
    # not hashing, set the ratio.
    n_docs, shards = 40_000, 64
    chunks = spark.range(n_docs).selectExpr(
        "id AS doc_id",
        "explode(array(0L, 1L)) AS chunk_id",
    ).selectExpr(
        "doc_id", "chunk_id", "40 + (doc_id * 7 + chunk_id) % 20 AS n_chunk_tokens"
    )
    packed = pack_chunks(chunks, context_tokens=200, num_shards=shards)
    per_shard = {
        r.shard: r.n
        for r in packed.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert len(per_shard) == shards  # every shard populated
    counts = sorted(per_shard.values())
    ratio = counts[-1] / statistics.median(counts)
    assert ratio <= 1.2, (ratio, counts[-1], statistics.median(counts))


def test_hopping_window_multiplicity(spark):
    from py_etl_spark.schemas import load_table
    from tests.conftest import SF_MED

    import py_etl_spark.queries as Q

    n_events = load_table(spark, SF_MED, "events").count()
    agg = Q.REGISTRY["st_hopping_window_agg"].fn(spark, SF_MED)
    # 1h window / 15min hop: every event belongs to exactly 4 windows
    assert agg.agg(F.sum("n")).first()[0] == 4 * n_events


def test_repetition_metrics_handcrafted_and_edge_cases(spark):
    from py_etl_spark.operators.textstats import repetition_metrics

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_metrics(df).collect()}
    r1 = rows[1]
    # 2-grams of [a b a b a]: {ab:2, ba:2} -> top 2, dup 4 instances, 4 total
    assert (r1.rep2_top, r1.rep2_dup, r1.rep2_total) == (2, 4, 4)
    assert r1.rep2_top_frac == 0.5 and r1.rep2_dup_frac == 1.0
    # 3-grams: {aba:2, bab:1}
    assert (r1.rep3_top, r1.rep3_dup, r1.rep3_total) == (2, 2, 3)
    # 4-grams: {abab:1, baba:1}
    assert (r1.rep4_top, r1.rep4_dup, r1.rep4_total) == (1, 0, 2)
    # single-token / empty / null docs: no grams at any n
    for d in (2, 3, 4):
        r = rows[d]
        for n in (2, 3, 4):
            assert r[f"rep{n}_top"] == 0 and r[f"rep{n}_dup"] == 0
            assert r[f"rep{n}_total"] == 0 and r[f"rep{n}_top_frac"] == 0.0


def test_quantize_embeddings_int8_fidelity(spark):
    import math

    from py_etl_spark.schemas import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings").limit(50)
    rows = similarity.quantize_embeddings_int8(emb).collect()
    assert rows
    for r in rows:
        assert all(abs(x) <= 127 for x in r.q_vec)
        if r.q_scale == 0:
            assert all(x == 0 for x in r.q_vec)
            continue
        v = [float(x) for x in r.embedding]
        dq = [x / r.q_scale for x in r.q_vec]
        dot = sum(a * b for a, b in zip(v, dq))
        na = math.sqrt(sum(a * a for a in v))
        nb = math.sqrt(sum(b * b for b in dq))
        # int8 quantization must preserve direction almost exactly
        assert dot / (na * nb) > 0.995


def test_assemble_examples_roundtrip(spark):
    import re

    from py_etl_spark.operators.corpus import (
        TOKEN_RE,
        assemble_examples,
        chunk_documents,
        pack_chunks,
    )

    docs = spark.createDataFrame(
        [(i, f"word{i} " * (17 + (i * 13) % 90)) for i in range(40)],
        "doc_id long, text string",
    )
    budget = 60
    packed = pack_chunks(
        chunk_documents(docs, chunk_tokens=25), context_tokens=budget,
        num_shards=4,
    )
    rows = assemble_examples(packed).collect()
    token_re = re.compile(TOKEN_RE)
    assert rows
    # token totals within budget and consistent with the assembled text
    for r in rows:
        assert r.example_tokens <= budget
        assert len(token_re.findall(r.example_text)) == r.example_tokens
    # nothing lost: example token grand total == chunk grand total
    total_chunks = packed.groupBy().sum("n_chunk_tokens").first()[0]
    assert sum(r.example_tokens for r in rows) == total_chunks


def test_cosine_topk_int8_recall_vs_float(spark):
    from py_etl_spark.schemas import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_int8(emb, queries, k=5).collect()
    }
    # int8 rounding perturbs cosine by ~1e-2: candidate top-5 must agree
    # with the float top-5 almost everywhere
    assert len(exact & quant) / len(exact) >= 0.9


def test_cosine_topk_twostage_matches_bruteforce(spark):
    from py_etl_spark.schemas import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    two = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_twostage(
            emb, queries, k=5, candidate_k=20
        ).collect()
    }
    # with 20 candidates the exact re-rank recovers the float top-5
    # unless int8 rounding pushed a true neighbor below rank 20
    assert len(exact & two) / len(exact) >= 0.9


def test_segment_dedup_removes_repeated_segments_in_order(spark):
    df = spark.createDataFrame(
        [
            (1, "shared boiler plate one two unique alpha beta"),
            (2, "shared boiler plate one two other gamma delta"),
            (3, "totally fresh words here now and then some more"),
            (4, "shared boiler plate one two"),  # nothing survives
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.segment_dedup(df, segment_words=5, max_occurrences=1).collect()
    }
    assert out[1].text_dedup == "unique alpha beta"
    assert out[2].text_dedup == "other gamma delta"
    assert (out[1].n_segments, out[1].n_kept) == (2, 1)
    # doc 3: both segments unique, original text reassembled verbatim
    assert out[3].text_dedup == "totally fresh words here now and then some more"
    assert (out[3].n_segments, out[3].n_kept) == (2, 2)
    # doc 4 loses its only segment but stays in the output with empty text
    assert out[4].text_dedup == ""
    assert (out[4].n_segments, out[4].n_kept) == (1, 0)


def test_segment_dedup_threshold_and_within_doc_repeat(spark):
    # occurrences are counted corpus-wide INCLUDING within-doc repeats:
    # "x y" appears twice in doc 1 alone, so with max_occurrences=2 it
    # survives nowhere once doc 2 adds a third occurrence.
    df = spark.createDataFrame(
        [(1, "x y x y"), (2, "x y"), (3, "p q")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.segment_dedup(df, segment_words=2, max_occurrences=2).collect()
    }
    assert out[1].text_dedup == "" and out[2].text_dedup == ""
    assert out[3].text_dedup == "p q"


def test_kmv_sketch_accuracy_exact_below_k_and_merge(spark):
    from py_etl_spark.operators.sketch import (
        kmv_distinct,
        kmv_estimate,
        kmv_merge_sketches,
    )

    # 2000 distinct values in group "big", 10 in "small" (exact path)
    rows = [("big", i) for i in range(2000)] * 2 + [
        ("small", i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.g: r for r in kmv_distinct(df, "v", k=64, group_cols=("g",)).collect()}
    assert out["small"].estimate == 10  # below k → exact
    assert out["small"].n_kept == 10
    err = abs(out["big"].estimate - 2000) / 2000
    assert err < 0.30, f"KMV estimate off by {err:.1%}"
    assert out["big"].sketch == sorted(out["big"].sketch)
    assert len(out["big"].sketch) == 64

    # merge property: sketch(A ∪ B) == merge(sketch(A), sketch(B))
    a = spark.createDataFrame([("g", i) for i in range(1000)], "g string, v long")
    b = spark.createDataFrame([("g", i) for i in range(500, 1500)], "g string, v long")
    sa = kmv_distinct(a, "v", k=64, group_cols=("g",)).collect()[0].sketch
    sb = kmv_distinct(b, "v", k=64, group_cols=("g",)).collect()[0].sketch
    su = kmv_distinct(a.union(b), "v", k=64, group_cols=("g",)).collect()[0]
    merged = kmv_merge_sketches([sa, sb], k=64)
    assert merged == su.sketch
    assert kmv_estimate(merged, 64) == float(su.estimate)


def test_file_minmax_stats_and_pruning_with_zorder(spark):
    import tempfile

    from py_etl_spark.operators.layout import (
        file_minmax_stats,
        prune_files,
        zorder_layout,
    )

    rows = [(i % 97, (i * 7) % 89, i) for i in range(20000)]
    df = spark.createDataFrame(rows, "a long, b long, v long")
    tmp = tempfile.mkdtemp()
    zpath = tmp + "/z"
    rpath = tmp + "/r"
    zorder_layout(df, ["a", "b"], bits=8, num_partitions=16).write.parquet(zpath)
    df.repartition(16).write.parquet(rpath)

    zstats = file_minmax_stats(spark, zpath, ["a", "b"])
    rstats = file_minmax_stats(spark, rpath, ["a", "b"])
    assert zstats.agg(F.sum("n_rows")).first()[0] == 20000

    pred = {"a": (10, 20), "b": (10, 20)}
    zkeep = prune_files(zstats, pred)
    rkeep = prune_files(rstats, pred)
    # Z-ordered layout yields tight per-file boxes: the range predicate
    # skips most files; the random layout skips none
    assert len(zkeep) < zstats.count()
    assert len(rkeep) == rstats.count()
    assert len(zkeep) < len(rkeep)

    # pruning is SOUND: scanning only the kept files loses no matching row
    full = (
        spark.read.parquet(zpath)
        .filter("a between 10 and 20 and b between 10 and 20")
        .count()
    )
    pruned = (
        spark.read.parquet(*zkeep)
        .filter("a between 10 and 20 and b between 10 and 20")
        .count()
    )
    assert pruned == full > 0


def test_pagerank_fixed_point_matches_python_reference(spark):
    from py_etl_spark.operators.graph import MICRO, pagerank_fixed_point

    # star: everyone links to hub 0; hub links back to 1
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.rank_micro
        for r in pagerank_fixed_point(df, iterations=3).collect()
    }

    # python replay of the exact integer recurrence
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    deg = {}
    for s_, _ in edges:
        deg[s_] = deg.get(s_, 0) + 1
    d_micro = 850000
    init = MICRO
    base = MICRO - d_micro
    r = {v: init for v in nodes}
    for _ in range(3):
        inm = {v: 0 for v in nodes}
        for s_, t_ in edges:
            inm[t_] += r[s_] // deg[s_]
        r = {v: base + d_micro * inm[v] // MICRO for v in nodes}
    assert got == r
    # hub dominates; total mass stays near n*MICRO (leak-free graph,
    # N-scaled form: uniform rank == MICRO per node)
    assert got[0] == max(got.values())
    assert abs(sum(got.values()) - n * MICRO) < n * 10


def test_pagerank_convergence_run_checkpoints_lineage(spark):
    """iterations=10 exercises the localCheckpoint truncation path
    (fires at 5; NOT after the final iteration): the result must equal
    both the pure-lazy plan (checkpoint_every=None) and the python
    replay — truncation changes plan economics, never values — and the
    checkpointed plan must stay bounded instead of nesting 10 joins."""
    from py_etl_spark.operators.graph import MICRO, pagerank_fixed_point

    edges = [(i, (i * 3 + 1) % 7) for i in range(7)] + [(0, 3), (5, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ck = pagerank_fixed_point(df, iterations=10)  # checkpoint_every=5
    lazy = pagerank_fixed_point(df, iterations=10, checkpoint_every=None)
    got_ck = {r.node: r.rank_micro for r in ck.collect()}
    got_lazy = {r.node: r.rank_micro for r in lazy.collect()}

    nodes = sorted({u for e in edges for u in e})
    deg = {}
    for s_, _ in edges:
        deg[s_] = deg.get(s_, 0) + 1
    d_micro, base = 850000, MICRO - 850000
    r = {v: MICRO for v in nodes}
    for _ in range(10):
        inm = {v: 0 for v in nodes}
        for s_, t_ in edges:
            inm[t_] += r[s_] // deg[s_]
        r = {v: base + d_micro * inm[v] // MICRO for v in nodes}
    assert got_ck == r == got_lazy
    # lineage actually truncated: the analyzed plan of the checkpointed
    # run is much smaller than the 10-deep lazy nest
    ck_plan = ck._jdf.queryExecution().analyzed().toString()
    lazy_plan = lazy._jdf.queryExecution().analyzed().toString()
    assert len(ck_plan) < len(lazy_plan) / 2


def test_pagerank_hub_degree_cap_flat_fallback_bit_exact(spark):
    """ADVICE r09: sources above hub_degree_cap fall back to the FLAT
    edge form (AQE-splittable rows instead of one unsplittable array
    row). The split must be invisible in the values: cap=2 (hub 0 with
    out-degree 6 takes the flat path, everyone else grouped) equals
    cap=None (pure grouped) exceptAll-empty BOTH directions, and both
    equal the python replay of the integer recurrence."""
    from py_etl_spark.operators.graph import MICRO, pagerank_fixed_point

    edges = (
        [(0, i) for i in range(1, 7)]  # hub 0: out-degree 6 > cap
        + [(i, (i % 3) + 1) for i in range(1, 7)]  # deg 1 each
        + [(3, 0), (5, 0)]  # deg(3)=deg(5)=2, still <= cap
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    capped = pagerank_fixed_point(df, iterations=3, hub_degree_cap=2)
    pure = pagerank_fixed_point(df, iterations=3, hub_degree_cap=None)
    assert capped.exceptAll(pure).count() == 0
    assert pure.exceptAll(capped).count() == 0

    nodes = sorted({u for e in edges for u in e})
    deg = {}
    for s_, _ in edges:
        deg[s_] = deg.get(s_, 0) + 1
    d_micro, base = 850000, MICRO - 850000
    r = {v: MICRO for v in nodes}
    for _ in range(3):
        inm = {v: 0 for v in nodes}
        for s_, t_ in edges:
            inm[t_] += r[s_] // deg[s_]
        r = {v: base + d_micro * inm[v] // MICRO for v in nodes}
    assert {x.node: x.rank_micro for x in capped.collect()} == r


def test_sample_stratified_exact_counts_and_salt_independence(spark):
    from py_etl_spark.operators.corpus import sample_stratified_exact

    rows = [(i, "web" if i % 3 else "books") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sample_stratified_exact(df, 20, strata_cols=("source",))
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == {"web": 20, "books": 20}  # EXACT counts, not expected
    ids1 = sorted(r.doc_id for r in out.collect())
    # retry/repartition-stable
    ids2 = sorted(
        r.doc_id
        for r in sample_stratified_exact(
            df.repartition(13), 20, strata_cols=("source",)
        ).collect()
    )
    assert ids1 == ids2
    # a different salt draws a (almost surely) different sample
    ids3 = sorted(
        r.doc_id
        for r in sample_stratified_exact(
            df, 20, strata_cols=("source",), salt="other"
        ).collect()
    )
    assert ids1 != ids3
    # stratum smaller than n: whole stratum kept, ranks 1..|stratum|
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, source string")
    t = sample_stratified_exact(tiny, 20, strata_cols=("source",)).collect()
    assert sorted(r.sample_rank for r in t) == [1, 2]


def test_interval_overlap_join_once_per_pair_closed_endpoints(spark):
    from py_etl_spark.operators.timeseries import interval_overlap_join

    # bucket=10s; the 100s-long intervals share MANY buckets — the
    # max-start anchor must still emit each pair exactly once
    left = spark.createDataFrame(
        [("u", 1, 0, 100), ("u", 2, 50, 60), ("v", 3, 0, 10)],
        "k string, id long, start_s long, end_s long",
    )
    right = spark.createDataFrame(
        [("u", 10, 90, 200),   # overlaps 1 (90..100) but not 2
         ("u", 11, 60, 70),    # touches 2 at 60 (closed) and is inside 1
         ("u", 12, 101, 110),  # disjoint from 1 (starts after end)
         ("w", 13, 0, 100)],   # same times, different key
        "k string, id long, start_s long, end_s long",
    )
    out = interval_overlap_join(
        left, right, key_col="k", bucket_seconds=10
    ).collect()
    pairs = sorted((r.id_l, r.id_r) for r in out)
    assert pairs == [(1, 10), (1, 11), (2, 11)]
    # no duplicate pairs despite multi-bucket overlap spans
    assert len(pairs) == len(set(pairs))


def test_normalize_text_nfc_cleanup_and_idempotence(spark):
    from py_etl_spark.operators.textstats import normalize_text

    rows = [
        (1, "cafe\u0301  du\u00a0parc"),          # decomposed + NBSP + runs
        (2, "\u201csmart\u201d \u2014 quotes\u2019"),
        (3, "bad\x07chars\u200bhere"),
        (4, None),
        (5, "already clean"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in normalize_text(df).collect()}
    assert out[1].text_clean == "caf\u00e9 du parc"      # composed é
    assert out[2].text_clean == "\"smart\" - quotes'"
    assert out[3].text_clean == "badcharshere"
    assert out[4].text_clean is None and not out[4].changed
    assert out[5].text_clean == "already clean" and not out[5].changed
    assert out[1].changed and out[2].changed and out[3].changed

    # idempotence: normalizing the normalized text is the identity
    again = normalize_text(
        spark.createDataFrame(
            [(k, v.text_clean) for k, v in out.items() if v.text_clean],
            "doc_id long, text string",
        )
    )
    assert all(not r.changed for r in again.collect())


def test_incremental_agg_merge_equals_rebuild_on_adversarial_splits(spark):
    from py_etl_spark.operators.maintenance import (
        agg_partial,
        incremental_agg_merge,
    )

    rows = [(i % 5, float(i), i % 3) for i in range(200)]
    df = spark.createDataFrame(rows, "g long, x double, y long")
    kw = dict(keys=["g"], sum_cols=["x"], min_cols=["y"], max_cols=["y"])
    full = {r.g: r for r in agg_partial(df, **kw).collect()}
    # adversarial splits: empty delta, single-group delta, interleaved
    for pred in [F.lit(False), F.col("g") == 2, F.col("x") % 2 == 0]:
        snap = agg_partial(df.filter(~pred), **kw)
        delta = agg_partial(df.filter(pred), **kw)
        merged = {
            r.g: r for r in incremental_agg_merge(snap, delta, ["g"]).collect()
        }
        assert set(merged) == set(full)
        for g in full:
            assert merged[g].n == full[g].n
            assert abs(merged[g].sum_x - full[g].sum_x) < 1e-9
            assert merged[g].min_y == full[g].min_y
            assert merged[g].max_y == full[g].max_y

    # unmergeable columns are rejected loudly, not silently misfolded
    bad = agg_partial(df, keys=["g"]).withColumn("avg_x", F.lit(1.0))
    try:
        incremental_agg_merge(bad, bad, ["g"])
        assert False, "expected ValueError"
    except ValueError as e:
        assert "unmergeable" in str(e)


def test_analyze_table_all_null_column_reports_zero_ndv(spark):
    from py_etl_spark.operators.maintenance import analyze_table

    df = spark.createDataFrame([(1, None), (2, None)], "id long, z string")
    out = {r.column: r for r in analyze_table(df, ["z"], ndv_k=16).collect()}
    assert out["z"].n_nonnull == 0
    assert out["z"].ndv_est == 0 and out["z"].ndv_kept == 0
    assert out["z"].min_value is None and out["z"].max_value is None


def test_analyze_table_stats_and_exact_ndv_below_k(spark):
    from py_etl_spark.operators.maintenance import analyze_table

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, "b", 2.5), (4, None, 2.5)],
        "id long, s string, x double",
    )
    out = {r.column: r for r in analyze_table(df, ["id", "s", "x"], ndv_k=64).collect()}
    assert out["id"].n_rows == 4 and out["id"].n_nonnull == 4
    assert out["id"].ndv_est == 4 and out["id"].min_value == "1"
    assert out["s"].n_nonnull == 3 and out["s"].ndv_est == 2
    assert out["s"].min_value == "a" and out["s"].max_value == "b"
    assert out["x"].n_nonnull == 3 and out["x"].ndv_est == 2
    assert out["x"].min_value == "1.5" and out["x"].max_value == "2.5"


def test_hist_sketch_quantile_error_bounded_by_bin_width(spark):
    from py_etl_spark.operators.sketch import hist_quantiles, hist_sketch

    # skewed values in [0, 1000): quantile estimates must land within
    # one bin width of the exact order statistics
    vals = [float((i * i) % 1000) for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    lo, hi, bins = 0.0, 1000.0, 100
    width = (hi - lo) / bins
    sk = hist_sketch(df, "v", lo, hi, bins)
    out = hist_quantiles(sk, lo, hi, qs=(0.5, 0.95, 0.99)).collect()[0]
    svals = sorted(vals)
    import math

    for q, got in ((0.5, out.q0_5), (0.95, out.q0_95), (0.99, out.q0_99)):
        exact = svals[max(int(math.ceil(q * len(vals))) - 1, 0)]
        assert abs(got - exact) <= width, (q, got, exact)
    assert out.n == len(vals)

    # counters clamp out-of-range values into the edge bins
    oob = spark.createDataFrame([(-5.0,), (1e9,)], "v double")
    c = hist_sketch(oob, "v", lo, hi, bins).collect()[0]
    assert c.counts[0] == 1 and c.counts[bins - 1] == 1
    assert c.min_v == -5.0 and c.max_v == 1e9

    # merge linearity: counts(A ∪ B) == counts(A) + counts(B)
    a = spark.createDataFrame([(float(i % 997),) for i in range(2000)], "v double")
    b = spark.createDataFrame([(float(i % 61),) for i in range(500)], "v double")
    ca = hist_sketch(a, "v", lo, hi, bins).collect()[0].counts
    cb = hist_sketch(b, "v", lo, hi, bins).collect()[0].counts
    cu = hist_sketch(a.union(b), "v", lo, hi, bins).collect()[0].counts
    assert [x + y for x, y in zip(ca, cb)] == list(cu)


def test_kmv_join_size_estimate_accuracy_and_exact_below_k(spark):
    from py_etl_spark.operators.sketch import (
        kmv_distinct,
        kmv_join_size_estimate,
        kmv_set_estimates,
    )

    def sketch(ids, k):
        df = spark.createDataFrame([(i,) for i in ids], "v long")
        return list(kmv_distinct(df, "v", k=k).collect()[0].sketch)

    # saturated path: |A|=1000 keys ×3 rows, |B|=1000 keys ×2 rows,
    # overlap 500 → true join = 500·3·2 = 3000
    k = 128
    sa = sketch(range(1000), k)
    sb = sketch(range(500, 1500), k)
    est = kmv_join_size_estimate(sa, sb, rows_a=3000, rows_b=2000, k=k)
    assert abs(est["est_intersection"] - 500) / 500 < 0.35
    assert abs(est["est_union"] - 1500) / 1500 < 0.30
    assert abs(est["est_join_rows"] - 3000) / 3000 < 0.45

    # below-k path: when even the UNION stays under k, complete sketches
    # make every set estimate EXACT
    k = 128
    sa = sketch(range(50), k)
    sb = sketch(range(30, 80), k)
    est = kmv_set_estimates(sa, sb, k)
    assert est == {
        "est_a": 50, "est_b": 50, "est_union": 80, "est_intersection": 20
    }
    j = kmv_join_size_estimate(sa, sb, rows_a=50, rows_b=50, k=k)
    assert j["est_join_rows"] == 20


def test_duplicate_span_mask_straddles_block_boundaries(spark):
    from py_etl_spark.operators.dedup import duplicate_span_mask

    df = spark.createDataFrame(
        [
            (1, "x1 x2 a b c d e y1 y2"),
            (2, "z1 a b c d e z2 z3"),
            (3, "a b c"),
            (4, ""),
            (5, "a b c d e a b c d e"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicate_span_mask(df, span_words=5).collect()}
    # the shared 5-run is masked in every doc; unique remainders survive
    assert out[1].text_dedup == "x1 x2 y1 y2" and out[1].n_dup_tokens == 5
    assert out[2].text_dedup == "z1 z2 z3" and out[2].n_dup_tokens == 5
    # doc 5 repeats the run twice (and "e a b c d" etc. also recur via
    # doc1/doc2 overlap windows only if duplicated); every covered
    # position is counted once
    assert out[5].n_dup_tokens >= 10 - 4
    # shorter-than-span docs and empty docs pass through untouched
    assert out[3].text_dedup == "a b c" and out[3].n_dup_tokens == 0
    assert out[4].n_tokens == 0 and out[4].text_dedup == ""

    # contrast: disjoint-block segment_dedup MISSES the straddling run
    # (no 5-token block of doc1 equals any block of doc2)
    from py_etl_spark.operators.dedup import segment_dedup

    seg = {
        r.doc_id: r
        for r in segment_dedup(
            df.filter(F.col("doc_id").isin(1, 2)), segment_words=5
        ).collect()
    }
    assert seg[1].n_kept == seg[1].n_segments
    assert seg[2].n_kept == seg[2].n_segments


def test_bigram_lm_hand_computed_bits_and_oov_backoff(spark):
    from py_etl_spark.operators.lm import lm_score, train_bigram_lm

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    unigrams, bigrams = train_bigram_lm(train)
    uni = {r.w: r.c for r in unigrams.collect()}
    assert uni == {"a": 3, "b": 2, "c": 1}
    big = {(r.w1, r.w2): (r.c12, r.c1) for r in bigrams.collect()}
    assert big == {("a", "b"): (2, 3), ("b", "a"): (1, 2), ("a", "c"): (1, 3)}
    total = sum(uni.values())  # 6

    # self-scoring: hand-computed floor-log2 code lengths
    out = {
        r.doc_id: r
        for r in lm_score(train, unigrams, bigrams, total).collect()
    }
    # doc1 pairs (a,b)(b,a)(a,b): ilog2(3//2)=0, ilog2(2//1)=1, 0 → 1 bit
    assert (out[1].n_pairs, out[1].total_bits) == (3, 1)
    assert abs(out[1].avg_bits - 0.333333) < 1e-9
    # doc2 pair (a,c): ilog2(3//1)=1
    assert (out[2].n_pairs, out[2].total_bits) == (1, 1)
    assert out[1].is_fluent and out[2].is_fluent

    # held-out: seen-unigram backoff (2 + ilog2(6//1) = 4) and the OOV
    # escape (6 + ilog2(6) = 8); a 1-token doc scores NULL, not fluent
    held = spark.createDataFrame(
        [(10, "b c"), (11, "c z"), (12, "a")], "doc_id long, text string"
    )
    h = {
        r.doc_id: r
        for r in lm_score(held, unigrams, bigrams, total).collect()
    }
    assert (h[10].total_bits, h[11].total_bits) == (4, 8)
    assert h[12].n_pairs == 0 and h[12].avg_bits is None
    assert not h[12].is_fluent

    # deterministic under repartition (integer sums are order-free)
    rep = {
        r.doc_id: (r.n_pairs, r.total_bits)
        for r in lm_score(
            train.repartition(7), unigrams, bigrams, total
        ).collect()
    }
    assert rep == {k: (v.n_pairs, v.total_bits) for k, v in out.items()}


def test_bm25_normalizes_and_validates_query_terms(spark):
    from py_etl_spark.operators.search import bm25_topk

    df = spark.createDataFrame(
        [(1, "hash join wins"), (2, "scan only")], "doc_id long, text string"
    )
    # capitalized term is folded through the corpus tokenizer, not
    # silently mismatched
    out = {r.doc_id: r for r in bm25_topk(df, ["Hash"], k=2).collect()}
    assert out[1].n_match == 1 and out[2].n_match == 0
    try:
        bm25_topk(df, ["hash join"], k=2)
        assert False, "expected ValueError for multi-token term"
    except ValueError as e:
        assert "single corpus token" in str(e)


def test_bm25_non_ascii_digit_term_routed_to_punct_branch(spark):
    """ADVICE r09: '²' passes Python's Unicode-wide isdigit() but is a
    PUNCT token to the ASCII-only TOKEN_RE — routing it to the [0-9]
    digit-runs split silently counted tf=0. It must count per-char like
    any other punct token (and non-ASCII letters like 'é' likewise)."""
    from py_etl_spark.operators.search import bm25_topk

    df = spark.createDataFrame(
        [(1, "x² plus y² is r²"), (2, "no squares here"), (3, "é é x²")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bm25_topk(df, ["²"], k=3).collect()}
    assert out[1].n_match == 1 and out[1].score_bm25 > 0
    assert out[2].n_match == 0 and out[2].score_bm25 == 0.0
    assert out[3].n_match == 1
    # tf ordering: doc 1 (tf=3) outranks doc 3 (tf=1)
    assert out[1].score_bm25 > out[3].score_bm25
    oute = {r.doc_id: r for r in bm25_topk(df, ["é"], k=3).collect()}
    assert oute[3].n_match == 1 and oute[1].n_match == 0


def test_bm25_topk_matches_python_reference_and_ranks_sensibly(spark):
    import math

    from py_etl_spark.operators.search import bm25_topk

    corpus = {
        1: "spark shuffle join join join",
        2: "spark scan filter scan",
        3: "join elephant spark",
        4: "elephant elephant giraffe",
        5: "filter scan scan scan scan scan",
    }
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    terms = ["join", "elephant"]
    out = bm25_topk(df, terms, k=5).collect()

    # python reference with the same formula/rounding
    toks = {d: t.split() for d, t in corpus.items()}
    n, avgdl = len(toks), sum(len(t) for t in toks.values()) / len(toks)
    k1, b = 1.2, 0.75

    def ref(d):
        s = 0.0
        for t in terms:
            dfreq = sum(1 for tt in toks.values() if t in tt)
            idf = round(math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0), 6)
            tf = toks[d].count(t)
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1 - b + b * len(toks[d]) / avgdl)
            )
        return round(s, 4)

    assert [(r.doc_id, r.score_bm25) for r in out] == sorted(
        ((d, ref(d)) for d in corpus), key=lambda x: (-x[1], x[0])
    )
    by_id = {r.doc_id: r for r in out}
    # doc 3 matches both terms; docs 2/5 match neither (score exactly 0)
    assert by_id[3].n_match == 2
    assert by_id[2].score_bm25 == 0.0 and by_id[5].score_bm25 == 0.0
    # rarer term (elephant, df=2) outweighs common join at equal tf —
    # and doc 3 (both terms) must outrank doc 1 (3x join only)
    assert out[0].doc_id == 3


def test_sketches_ignore_null_values(spark):
    from py_etl_spark.operators.sketch import cm_sketch, hist_sketch

    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (None,)], "v double"
    )
    cm = cm_sketch(df, "v", width=16, depth=2).collect()[0]
    assert cm.n_items == 2 and all(sum(r) == 2 for r in cm.cm)
    h = hist_sketch(df, "v", 0.0, 10.0, 10).collect()[0]
    assert h.n == 2 and h.counts[0] == 0  # NULLs neither counted nor bin-0
    assert sum(h.counts) == 2


def test_cm_sketch_one_sided_error_merge_and_invariants(spark):
    from py_etl_spark.operators.sketch import (
        cm_merge_sketches,
        cm_point_estimate,
        cm_sketch,
    )

    # Zipf-ish multiplicities: value i appears (2000 // (i+1)) times
    rows = [("g", i) for i in range(100) for _ in range(2000 // (i + 1))]
    df = spark.createDataFrame(rows, "g string, v long")
    out = cm_sketch(df, "v", width=64, depth=4, group_cols=("g",)).collect()[0]
    cm = [list(r) for r in out.cm]
    assert len(cm) == 4 and all(len(r) == 64 for r in cm)
    # every depth row sums to n (counters are a partition of the items)
    assert all(sum(r) == len(rows) for r in cm)
    assert out.n_items == len(rows)
    # one-sided error: estimate >= exact for EVERY key, and the heavy
    # keys are estimated within the e*n/width bound
    exact = {i: 2000 // (i + 1) for i in range(100)}
    probe = spark.createDataFrame([(i,) for i in exact], "v long")
    est = {
        r.v: r.e
        for r in probe.select(
            "v", cm_point_estimate(cm, F.col("v")).alias("e")
        ).collect()
    }
    import math

    bound = math.e * len(rows) / 64
    assert all(est[i] >= exact[i] for i in exact)
    assert all(est[i] - exact[i] <= bound for i in exact)

    # merge linearity: cm(A ∪ B) == cm(A) + cm(B), cell for cell
    a = spark.createDataFrame([(i % 7,) for i in range(500)], "v long")
    b = spark.createDataFrame([(i % 11,) for i in range(300)], "v long")
    ca = [list(r) for r in cm_sketch(a, "v", width=32, depth=3).collect()[0].cm]
    cb = [list(r) for r in cm_sketch(b, "v", width=32, depth=3).collect()[0].cm]
    cu = [
        list(r)
        for r in cm_sketch(a.union(b), "v", width=32, depth=3).collect()[0].cm
    ]
    assert cm_merge_sketches([ca, cb]) == cu


def test_sample_mixture_deterministic_rates_and_salt_independence(spark):
    from py_etl_spark.operators.corpus import sample_mixture

    rows = [(i, "web" if i % 2 == 0 else "books") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kw = dict(rates={"web": 0.2, "books": 1.0})
    kept = sample_mixture(df, **kw)
    ids1 = sorted(r.doc_id for r in kept.collect())
    # deterministic: identical under repartitioning and re-run
    ids2 = sorted(r.doc_id for r in sample_mixture(df.repartition(13), **kw).collect())
    assert ids1 == ids2
    by_src = {
        r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["books"] == 1000          # rate 1.0 keeps everything
    assert 130 <= by_src["web"] <= 270      # ~200 expected at rate 0.2
    # a different salt draws an (almost surely) different web subset
    ids_salt = sorted(
        r.doc_id
        for r in sample_mixture(df, rates={"web": 0.2, "books": 1.0}, salt="other").collect()
    )
    assert ids_salt != ids1
    # unknown source falls back to default_rate=0 → dropped entirely
    extra = spark.createDataFrame([(99999, "junk")], "doc_id long, source string")
    assert sample_mixture(extra, **kw).count() == 0


def test_semantic_dedup_drops_within_cluster_only(spark):
    # two well-separated clusters along axes; b/c near-dup of a, e dup of d
    rows = [
        (1, [1.0, 0.0, 0.0]),       # cluster x, keeper
        (2, [0.99, 0.14, 0.0]),     # ~cos 0.990 with 1 → dropped at τ=0.97
        (3, [0.7, 0.7, 0.0]),       # cluster x but dissimilar → kept
        (10, [0.0, 0.0, 1.0]),      # cluster z, keeper
        (11, [0.0, 0.01, 1.0]),     # near-dup of 10 → dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r.vec_id: r
        for r in similarity.semantic_dedup(
            df, centroids=[[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], threshold=0.97
        ).collect()
    }
    assert {k for k, r in out.items() if r.is_kept} == {1, 3, 10}
    assert out[2].ivf_cell == 0 and out[11].ivf_cell == 1
    # cross-cluster near-identical vectors are NOT compared: same vector in
    # different cells survives in both
    rows2 = [(1, [1.0, 0.05, 0.0]), (2, [0.05, 1.0, 0.0])]
    df2 = spark.createDataFrame(rows2, "vec_id long, embedding array<float>")
    out2 = similarity.semantic_dedup(
        df2, centroids=[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], threshold=0.0
    ).collect()
    assert all(r.is_kept for r in out2)


def test_semantic_dedup_cell_cap_guard(spark):
    # 30 identical vectors in one cell; cap=10 → only the first 10 (by id)
    # participate in the pair join: id 1 keeps, ids 2-10 drop, ids 11-30
    # are beyond the cap and kept unconditionally (the documented
    # degenerate-cell tradeoff — bounded work, not exhaustive dedup).
    rows = [(i, [1.0, 0.0]) for i in range(1, 31)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0]]
    out = {
        r.vec_id: r.is_kept
        for r in similarity.semantic_dedup(
            df, cents, threshold=0.9, cell_cap=10
        ).collect()
    }
    assert out[1] is True
    assert all(out[i] is False for i in range(2, 11))
    assert all(out[i] is True for i in range(11, 31))
    # cap=None and a cap larger than the cell agree exactly (guard is a
    # no-op on healthy cells)
    full = sorted(
        similarity.semantic_dedup(
            df, cents, threshold=0.9, cell_cap=None
        ).collect()
    )
    wide = sorted(
        similarity.semantic_dedup(
            df, cents, threshold=0.9, cell_cap=1000
        ).collect()
    )
    assert full == wide
    assert {r.vec_id for r in full if r.is_kept} == {1}


def test_semantic_dedup_auto_fixed_cell_size(spark):
    # k is sized as ceil(n / target_cell_size), NOT sqrt(n); output is one
    # row per input and near-dups within a trained cell are dropped
    # y >= 1 keeps every base point at cosine < 0.99 from the (1, 0)
    # direction, so only the planted pair is a near-dup at 0.9999
    rows = [
        (i, [float(i % 7) + 1.0, float((i * 3) % 5) + 1.0])
        for i in range(40)
    ]
    rows += [(100, [50.0, 0.0]), (101, [50.1, 0.0])]  # near-dup pair
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out, cents = similarity.semantic_dedup_auto(
        df, threshold=0.9999, target_cell_size=8, iters=2
    )
    assert len(cents) == -(-42 // 8)  # ceil(42/8) = 6 trained centroids
    got = {r.vec_id: r.is_kept for r in out.collect()}
    assert len(got) == 42
    assert got[100] is True and got[101] is False  # lower id wins
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty input"):
        similarity.semantic_dedup_auto(df.limit(0))


def test_quality_score_hashed_linear_matches_numpy_reference(spark):
    import hashlib

    w = [0.5, -0.25, 1.0, -1.0]
    docs = [(1, "good words here"), (2, "bad bad bad"), (3, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in textstats.quality_score_hashed_linear(
            df, weights=w, bias=0.1
        ).collect()
    }

    def ref_logit(text):
        toks = text.strip().lower().split() if text.strip() else []
        if not toks:
            return 0.1
        s = sum(
            w[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % len(w)]
            for t in toks
        )
        return 0.1 + s / len(toks)

    for i, text in docs:
        assert abs(out[i].logit - round(ref_logit(text), 6)) < 1e-9
        assert out[i].is_quality == (ref_logit(text) >= 0)
    assert out[3].n_tokens == 0  # empty doc: bias-only logit, no crash


def test_quality_score_never_emits_negative_zero(spark):
    """Cross-engine -0.0 contract (r11 sf0.1 sweep finding): a tiny
    negative logit rounds to -0.0 under sign-preserving float rounding
    (DuckDB) but +0.0 under Spark's BigDecimal round — the scorer
    normalizes with `+ 0.0` so every engine emits the same bits. Pin the
    Spark side: an all-negative-epsilon weight vector must score exactly
    +0.0, not -0.0 (guards against a future float-space round rewrite
    dropping the normalization)."""
    import math

    df = spark.createDataFrame([(1, "any token")], "doc_id long, text string")
    out = textstats.quality_score_hashed_linear(
        df, weights=[-1e-9] * 64, bias=0.0
    ).collect()[0]
    assert out.logit == 0.0
    assert math.copysign(1.0, out.logit) > 0  # +0.0, never -0.0
    # is_quality reads the UNROUNDED logit: -1e-9 < 0 → not quality,
    # even though the displayed (rounded, normalized) logit is 0.0
    assert out.is_quality is False


def test_funnel_strict_ordering_and_ties(spark):
    from datetime import datetime

    from py_etl_spark.operators.funnel import funnel

    t = lambda s: datetime.fromisoformat(s)
    rows = [
        # user 1: full funnel in order
        (1, t("2024-01-01T00:00:00"), "signup", 1),
        (1, t("2024-01-02T00:00:00"), "click", 2),
        (1, t("2024-01-03T00:00:00"), "purchase", 3),
        # user 2: purchase BEFORE click → stops at click (reached 2)
        (2, t("2024-01-01T00:00:00"), "signup", 4),
        (2, t("2024-01-02T00:00:00"), "purchase", 5),
        (2, t("2024-01-03T00:00:00"), "click", 6),
        # user 3: click at the SAME instant as signup does not count
        (3, t("2024-01-01T00:00:00"), "signup", 7),
        (3, t("2024-01-01T00:00:00"), "click", 8),
        # user 4: never signs up
        (4, t("2024-01-01T00:00:00"), "view", 9),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    out = {
        r.user_id: r
        for r in funnel(
            df, ["signup", "click", "purchase"], tie_col="event_id"
        ).collect()
    }
    assert out[1].reached == 3 and out[1].t_step3 == t("2024-01-03T00:00:00")
    assert out[2].reached == 2  # strict ordering: early purchase ignored
    assert out[2].t_step2 == t("2024-01-03T00:00:00")
    assert out[3].reached == 1 and out[3].t_step2 is None
    assert out[4].reached == 0 and out[4].t_step1 is None
    # first-qualifying semantics: a second, later click never moves t_step2
    df2 = df.union(
        spark.createDataFrame(
            [(1, t("2024-01-05T00:00:00"), "click", 10)],
            "user_id long, ts timestamp, event_type string, event_id long",
        )
    )
    out2 = {r.user_id: r for r in funnel(df2, ["signup", "click", "purchase"], tie_col="event_id").collect()}
    assert out2[1].t_step2 == t("2024-01-02T00:00:00")


def test_cohort_retention_triangle(spark):
    from datetime import datetime

    from py_etl_spark.operators.funnel import cohort_retention

    t = lambda s: datetime.fromisoformat(s)
    rows = [
        (1, t("2024-01-01T10:00:00")),  # Mon wk0
        (1, t("2024-01-09T10:00:00")),  # wk1
        (1, t("2024-01-16T10:00:00")),  # wk2
        (2, t("2024-01-02T10:00:00")),  # wk0 cohort
        (2, t("2024-01-17T10:00:00")),  # wk2
        (3, t("2024-01-10T10:00:00")),  # wk1 cohort only
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    tri = {
        (r.cohort_start, r.period_offset): r.n_users
        for r in cohort_retention(df).collect()
    }
    wk0, wk1 = t("2024-01-01T00:00:00"), t("2024-01-08T00:00:00")
    assert tri[(wk0, 0)] == 2
    assert tri[(wk0, 1)] == 1
    assert tri[(wk0, 2)] == 2
    assert tri[(wk1, 0)] == 1
    assert (wk1, 1) not in tri


def test_zorder_key_matches_python_reference_and_locality(spark):
    from py_etl_spark.operators.layout import zorder_key, zorder_layout

    def ref_z(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rows = [(a, b) for a in range(0, 64, 7) for b in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = df.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], 16).alias("z")
    ).collect()
    for r in out:
        assert r.z == ref_z(r.a, r.b), (r.a, r.b)

    # locality: after zorder_layout, each partition's per-column spread is
    # far below the global range for BOTH columns (a single-column sort
    # can only achieve this for one of them)
    big = spark.createDataFrame(
        [(x % 256, (x * 37) % 256) for x in range(4096)], "a long, b long"
    )
    parts = (
        zorder_layout(big, ["a", "b"], bits=8, num_partitions=16)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
        )
        .collect()
    )
    med_sa = sorted(p.sa for p in parts)[len(parts) // 2]
    med_sb = sorted(p.sb for p in parts)[len(parts) // 2]
    assert med_sa <= 128 and med_sb <= 128, (med_sa, med_sb)


def test_incremental_exact_dedup_batch_and_ledger(spark):
    from py_etl_spark.operators.dedup import incremental_exact_dedup
    from py_etl_spark.operators.textstats import fingerprint_md5

    corpus_day0 = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id long, text string"
    )
    ledger = corpus_day0.select(
        fingerprint_md5(F.col("text")).alias("fingerprint")
    ).distinct()
    batch = spark.createDataFrame(
        [
            (10, "seen before"),   # dup vs ledger → rejected
            (11, "brand new"),     # admitted
            (12, "brand new"),     # within-batch dup → min id 11 wins
            (13, "also brand new"),
        ],
        "doc_id long, text string",
    )
    fresh, updated = incremental_exact_dedup(batch, ledger)
    assert sorted(r.doc_id for r in fresh.collect()) == [11, 13]
    # updated ledger admits nothing from a replayed identical batch
    fresh2, _ = incremental_exact_dedup(batch, updated)
    assert fresh2.count() == 0
    assert updated.count() == 4  # 2 old + 2 new fingerprints


def test_compact_parquet_and_state(spark, tmp_path):
    from py_etl_spark.operators.maintenance import (
        compact_parquet,
        compact_state,
    )
    from py_etl_spark.streaming.state_store import VersionedState

    src = str(tmp_path / "frag")
    df = spark.range(10000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(src)
    dst = str(tmp_path / "compact")
    stats = compact_parquet(spark, src, dst, target_bytes=1 << 30)
    assert stats["files_before"] == 40
    back = spark.read.parquet(dst)
    assert back.count() == 10000
    assert back.rdd.getNumPartitions() <= 2  # 40 shards → ~1 scan split
    assert sorted(r.id for r in back.collect()) == list(range(10000))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compact_parquet(spark, src, src)

    store = VersionedState(spark, str(tmp_path / "state"), partition_by=())
    store.commit(df.repartition(40))
    v2 = compact_state(store, target_bytes=1 << 30)
    assert store.current_version() == v2
    assert store.read().count() == 10000
    meta = store._read_manifest(v2)["meta"]
    assert meta["compacted_from"] == v2 - 1


def test_resample_daily_gap_fill_and_rolling_mean(spark):
    from datetime import datetime

    from py_etl_spark.operators.timeseries import resample_daily, rolling_mean

    t = lambda s: datetime.fromisoformat(s)
    rows = [
        ("a", t("2024-03-01T05:00:00")),
        ("a", t("2024-03-01T07:00:00")),
        ("a", t("2024-03-04T12:00:00")),  # 2-day gap (Mar 2, 3 = 0)
        ("b", t("2024-03-02T00:30:00")),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    dense = resample_daily(df)
    got = {
        (r.event_type, r.day.date().isoformat()): r.n for r in dense.collect()
    }
    # full grid: 2 types × 4 days (Mar 1 .. Mar 4)
    assert len(got) == 8
    assert got[("a", "2024-03-01")] == 2
    assert got[("a", "2024-03-02")] == 0
    assert got[("a", "2024-03-03")] == 0
    assert got[("a", "2024-03-04")] == 1
    assert got[("b", "2024-03-02")] == 1
    assert got[("b", "2024-03-04")] == 0

    roll = rolling_mean(dense, window_rows=2)
    r_a = {
        r.day.date().isoformat(): r.rolling_mean
        for r in roll.filter(F.col("event_type") == "a").collect()
    }
    assert r_a["2024-03-01"] == 2.0   # warm-up: single row
    assert r_a["2024-03-02"] == 1.0   # (2+0)/2
    assert r_a["2024-03-03"] == 0.0   # (0+0)/2
    assert r_a["2024-03-04"] == 0.5   # (0+1)/2


def test_fuzzy_join_known_jaccard_and_stop_gram_cap(spark):
    from py_etl_spark.operators.fuzzy import char_ngrams, fuzzy_join

    left = spark.createDataFrame(
        [(1, "red widget"), (2, "blue bolt")], "id long, name string"
    )
    right = spark.createDataFrame(
        [(10, "red widget"), (11, "red widget!"), (12, "green gear")],
        "id long, name string",
    )
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in fuzzy_join(
            left, right, "name", "name", "id", "id", threshold=0.3
        ).collect()
    }
    assert out[(1, 10)] == 1.0          # identical strings
    assert (1, 11) in out and out[(1, 11)] < 1.0  # near-match survives
    assert (2, 12) not in out           # dissimilar pair pruned
    # boundary padding separates "red" from a word merely containing it
    grams = spark.range(1).select(
        char_ngrams(F.lit("red"), 3).alias("g")
    ).first().g
    assert " re" in grams and "ed " in grams
    # stop-gram cap: with every gram capped out, no candidates remain
    none = fuzzy_join(
        left, right, "name", "name", "id", "id",
        threshold=0.1, max_gram_freq=0,
    )
    assert none.count() == 0
    # gram salting spreads hot grams over sub-keys with IDENTICAL
    # output — the (gram, pair) meeting happens exactly once, under
    # the right row's single salt value
    salted = {
        (r.id_a, r.id_b): r.jaccard
        for r in fuzzy_join(
            left, right, "name", "name", "id", "id",
            threshold=0.3, gram_salt=7,
        ).collect()
    }
    assert salted == out


def test_kmv_rollup_equals_direct_global_sketch(spark):
    from py_etl_spark.operators.sketch import kmv_distinct, kmv_rollup

    rows = [("g%d" % (i % 5), i % 700) for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, v long")
    per_group = kmv_distinct(df, "v", k=32, group_cols=("g",))
    merged = kmv_rollup(per_group, k=32).collect()[0]
    direct = kmv_distinct(df, "v", k=32).collect()[0]
    assert merged.sketch == direct.sketch
    assert merged.estimate == direct.estimate
    assert merged.kth_hash == direct.kth_hash


def test_bloom_filter_no_false_negatives_and_sane_fpr(spark):
    from py_etl_spark.operators.sketch import bloom_build, bloom_contains

    members = list(range(200))
    df = spark.createDataFrame([(v,) for v in members], "v long")
    row = bloom_build(df, "v", words=64, k_hashes=4).collect()[0]
    bloom = list(row.bloom)
    assert row.n_bits_set > 0
    probe = spark.createDataFrame(
        [(v,) for v in range(1000)], "v long"
    ).withColumn("hit", bloom_contains(bloom, F.col("v"), k_hashes=4))
    hits = {r.v for r in probe.collect() if r.hit}
    # no false negatives: every member reports present
    assert set(members) <= hits
    # false positives bounded: m=4032 bits, n=200, k=4 → FPR ≈ 0.1 %
    fpr = len(hits - set(members)) / 800
    assert fpr < 0.05, fpr
    # mergeable: OR of two half-filters == filter of the union
    a = bloom_build(df.filter(F.col("v") < 100), "v", words=64).collect()[0]
    b = bloom_build(df.filter(F.col("v") >= 100), "v", words=64).collect()[0]
    assert [x | y for x, y in zip(a.bloom, b.bloom)] == bloom


# ---- batch 6: HLL / boilerplate / compression / DQ ------------------------


def test_hll_estimate_within_error_and_merge_equals_direct(spark):
    from py_etl_spark.operators.sketch import hll_merge, hll_sketch

    df = spark.range(0, 5000).selectExpr(
        "CAST(id AS STRING) AS v",
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS half",
    )
    direct = hll_sketch(df, col="v").collect()[0]
    # m=256 → stderr ~6.5%; assert a generous 4-sigma envelope
    assert abs(direct["estimate"] - 5000) <= 5000 * 0.26
    per_half = hll_sketch(df, col="v", group_cols=("half",))
    merged = hll_merge(per_half.select("registers")).collect()[0]
    assert merged["registers"] == direct["registers"]
    assert merged["estimate"] == direct["estimate"]


def test_hll_linear_counting_branch_small_n(spark):
    from py_etl_spark.operators.sketch import hll_sketch

    df = spark.range(0, 40).selectExpr("CAST(id AS STRING) AS v")
    row = hll_sketch(df, col="v").collect()[0]
    # n=40 ≪ 2.5m → the linear-counting branch, which is near-exact there
    assert row["n_zero"] >= 256 - 40
    assert abs(row["estimate"] - 40) <= 4


def test_hll_ignores_nulls_and_duplicates(spark):
    from py_etl_spark.operators.sketch import hll_sketch

    df = spark.createDataFrame(
        [("x",), ("x",), ("y",), (None,)], ["v"]
    )
    row = hll_sketch(df, col="v").collect()[0]
    assert row["estimate"] == 2


def test_boilerplate_line_filter_keeps_prose_drops_chrome(spark):
    from py_etl_spark.operators.textstats import boilerplate_line_filter

    text = "\n".join(
        [
            "This is a perfectly reasonable sentence of prose.",
            "HOME",  # too short
            ">> | :: 123 456 789 --- |",  # low alpha ratio
            "Another informative line that should survive the gate.",
            "   ",  # blank
        ]
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = boilerplate_line_filter(df).collect()[0]
    assert row["n_lines"] == 5
    assert row["n_kept"] == 2
    assert row["clean_text"].splitlines() == [
        "This is a perfectly reasonable sentence of prose.",
        "Another informative line that should survive the gate.",
    ]


def test_compression_ratio_orders_repetitive_above_random(spark):
    import random

    from py_etl_spark.operators.textstats import compression_ratio

    rng = random.Random(7)
    rand_text = "".join(
        rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(2000)
    )
    rows = [
        (1, "spam " * 400),  # highly repetitive
        (2, "The quick brown fox jumps over the lazy dog. " * 40),
        (3, rand_text),  # incompressible
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r for r in compression_ratio(df).collect()
    }
    assert got[1]["ratio_pct"] > got[2]["ratio_pct"] > got[3]["ratio_pct"]
    # deflate never inflates prose by more than its tiny header
    assert got[2]["ratio_pct"] > 100
    # deterministic across runs
    again = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert {k: v["c_bytes"] for k, v in got.items()} == {
        k: v["c_bytes"] for k, v in again.items()
    }


def test_dq_check_constraints_counts_each_violation_kind(spark):
    from py_etl_spark.operators import dq

    facts = spark.createDataFrame(
        [
            (1, 10, "OK", 100.0),
            (1, 11, "OK", -5.0),     # dup key=1, out-of-range
            (2, None, "OK", 50.0),   # null fk col
            (3, 99, "BAD", 200.0),   # fk orphan, bad status
            (4, 12, "OK", 1500.0),   # out-of-range high
        ],
        ["k", "fk", "status", "amount"],
    )
    dim = spark.createDataFrame([(10,), (11,), (12,)], ["id"])
    rep = {
        r["check_name"]: r
        for r in dq.check_constraints(
            facts,
            [
                dq.not_null("fk"),
                dq.in_range("amount", 0, 1000),
                dq.in_set("status", ["OK"]),
                dq.unique("k"),
                dq.foreign_key("fk", dim, "id"),
            ],
        ).collect()
    }
    assert rep["not_null(fk)"]["n_violations"] == 1
    assert rep["in_range(amount)"]["n_violations"] == 2
    assert rep["in_set(status)"]["n_violations"] == 1
    assert rep["unique(k)"]["n_violations"] == 1
    assert rep["fk(fk)"]["n_violations"] == 1
    assert not any(r["passed"] for r in rep.values())
    # an all-clean table passes everything
    clean = dq.check_constraints(
        facts.filter("k = 1 AND amount = 100.0"),
        [dq.unique("k"), dq.not_null("k")],
    ).collect()
    assert all(r["passed"] for r in clean)
    # and so does an EMPTY one (zero violations, not NULL ones)
    empty = dq.check_constraints(
        facts.filter("k < 0"), [dq.not_null("k"), dq.unique("k")]
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in empty)


def test_audio_window_features_integer_exact_and_error_channel(spark):
    import struct

    from py_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_window_features,
    )

    wav = _make_wav(rate=8000, n=800, amp=16384)  # 100 ms of mono sine
    rows = [
        (1, "audio", bytearray(wav), "audio/wav", None, None, 100),
        (2, "audio", bytearray(b"not audio at all"), "audio/wav",
         None, None, 100),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        (r["media_id"], r["window_idx"]): r
        for r in audio_window_features(media, window_ms=25).collect()
    }
    # 800 samples at 8 kHz = 100 ms → four full 25 ms windows of 200
    wins = [got[(1, i)] for i in range(4)]
    assert all(w["n_samples"] == 200 for w in wins)
    assert (1, 4) not in got
    # integer-exact replay against the same PCM bytes
    data = wav[wav.index(b"data") + 8:]
    samples = struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2])
    for i, w in enumerate(wins):
        seg = samples[i * 200:(i + 1) * 200]
        assert w["sum_sq"] == sum(s * s for s in seg)
        assert w["peak"] == max(abs(s) for s in seg)
        assert w["audio_error"] is None
    bad = got[(2, None)]
    assert bad["audio_error"] is not None and bad["sum_sq"] is None


def test_sample_weighted_deterministic_and_weight_sensitive(spark):
    from py_etl_spark.operators.corpus import sample_weighted

    rows = [(i, 0.000001) for i in range(100)] + [
        (1000, 1e9),
        (1001, None),
        (1002, -5.0),
        (1003, 0.0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = sample_weighted(df, k=10, weight_col="w").collect()
    ids = [r["doc_id"] for r in got]
    assert len(ids) == 10
    # the one enormous weight wins the top slot: u^(1/1e9) ≈ 1 while the
    # tiny weights' keys are u^1e6 ≈ 0
    assert ids[0] == 1000
    # null / zero / negative weights are excluded outright
    assert not {1001, 1002, 1003} & set(ids)
    again = [r["doc_id"] for r in sample_weighted(
        df.repartition(7), k=10, weight_col="w").collect()]
    assert ids == again  # hash-keyed, stable under repartition


def test_embedding_moments_and_pca_recover_principal_axis(spark):
    import numpy as np

    from py_etl_spark.operators.similarity import (
        embedding_moments_int,
        pca_from_moments,
    )

    rng = np.random.RandomState(3)
    d = 8
    axis = np.zeros(d)
    axis[2] = 1.0
    pts = (
        rng.randn(300, 1) * 5.0 * axis  # dominant variance on dim 2
        + rng.randn(300, d) * 0.1
        + 0.5
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    rows = embedding_moments_int(df, dim=d).collect()
    assert len(rows) == d * (d + 1) // 2 + d + 1
    mean, cov, vals, comps = pca_from_moments(rows, dim=d)
    assert np.allclose(mean, pts.mean(axis=0), atol=1e-4)
    assert np.allclose(cov, np.cov(pts.T, bias=True), atol=1e-3)
    assert abs(comps[0] @ axis) > 0.99
    # moments are integer-exact: repartitioning changes nothing at all
    again = embedding_moments_int(df.repartition(13), dim=d).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_embedding_moments_drops_null_and_ragged_vectors(spark):
    """ADVICE r08 (similarity.py): Arrow surfaces null array elements as
    float NaN, and astype(int64) turns NaN into INT64_MIN garbage (a
    fully-null vector makes np.stack raise). The guard must drop rows
    with a NULL vector, a NULL element, or the wrong width — the result
    must equal running on the clean subset alone."""
    from py_etl_spark.operators.similarity import embedding_moments_int

    d = 4
    clean = [
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [0.5, -1.0, 2.5, 0.0]),
        (3, [-2.0, 0.25, 1.0, -0.75]),
    ]
    dirty = clean + [
        (4, None),  # null vector
        (5, [1.0, None, 3.0, 4.0]),  # null element -> NaN via Arrow
        (6, [1.0, 2.0]),  # ragged width -> np.stack would raise
    ]
    schema = "vec_id long, embedding array<double>"
    want = sorted(
        map(tuple, embedding_moments_int(
            spark.createDataFrame(clean, schema), dim=d
        ).collect())
    )
    got = sorted(
        map(tuple, embedding_moments_int(
            spark.createDataFrame(dirty, schema), dim=d
        ).collect())
    )
    assert got == want
    n_row = [s for i, j, s in got if i == -1 and j == -1]
    assert n_row == [len(clean)]


def test_hll_grouped_merge_equals_direct_per_group(spark):
    from py_etl_spark.operators.sketch import hll_merge, hll_sketch

    df = spark.range(0, 3000).selectExpr(
        "CAST(id AS STRING) AS v",
        "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' "
        "ELSE 'c' END AS src",
        "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END AS lang",
    )
    base = hll_sketch(df, col="v", group_cols=("src", "lang"))
    rolled = {
        r["src"]: r["registers"]
        for r in hll_merge(base, ("src",)).collect()
    }
    direct = {
        r["src"]: r["registers"]
        for r in hll_sketch(df, col="v", group_cols=("src",)).collect()
    }
    assert rolled == direct


def test_levenshtein_rerank_known_distances(spark):
    from py_etl_spark.operators.fuzzy import levenshtein_rerank

    left = spark.createDataFrame([(1, "kitten")], ["id", "name"])
    right = spark.createDataFrame(
        [(2, "sitting"), (3, "kitten"), (4, "zzzzzzzzzz")], ["id", "name"]
    )
    cands = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], ["id_a", "id_b"]
    )
    got = {
        r["id_b"]: r
        for r in levenshtein_rerank(
            cands, left, right, "name", "name", "id", "id", max_dist=5
        ).collect()
    }
    assert got[2]["lev"] == 3 and got[3]["lev"] == 0
    assert 4 not in got  # distance 10 > max_dist
    assert abs(got[2]["lev_sim"] - round(1 - 3 / 7, 6)) < 1e-9


def test_interleave_sources_prefix_proportions_and_determinism(spark):
    import pytest as _pytest

    from py_etl_spark.operators.corpus import interleave_sources

    rows = [(i, f"s{i % 3}") for i in range(700)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = interleave_sources(
        df, weights={"s0": 4, "s1": 2, "s2": 1}
    ).orderBy("mix_key", "source").collect()
    # every prefix ending at a full stride cycle carries exactly 4:2:1
    seq = [r["source"] for r in out]
    for cut in (70, 140, 350):
        from collections import Counter

        c = Counter(seq[:cut])
        assert c["s0"] == 4 * cut // 7
        assert c["s1"] == 2 * cut // 7
        assert c["s2"] == 1 * cut // 7
    again = interleave_sources(
        df.repartition(11), weights={"s0": 4, "s1": 2, "s2": 1}
    ).orderBy("mix_key", "source").collect()
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in again]
    with _pytest.raises(ValueError):
        interleave_sources(df, weights={"s0": 0})


def test_distribution_drift_bounds(spark):
    from py_etl_spark.operators.dq import distribution_drift

    same = spark.createDataFrame(
        [(i, "a", float(i % 50)) for i in range(200)]
        + [(i + 1000, "b", float(i % 50)) for i in range(200)],
        ["id", "g", "v"],
    )
    r = distribution_drift(same, "v", "g", "a", "b", 0.0, 50.0, 25).collect()[0]
    assert r["tv_num"] == 0 and r["ks_num"] == 0
    disjoint = spark.createDataFrame(
        [(i, "a", 5.0) for i in range(100)]
        + [(i + 1000, "b", 45.0) for i in range(150)],
        ["id", "g", "v"],
    )
    r = distribution_drift(
        disjoint, "v", "g", "a", "b", 0.0, 50.0, 25
    ).collect()[0]
    # fully separated mass: tv = 1, ks = 1 exactly (integer numerators)
    assert r["tv_num"] == 2 * 100 * 150 and abs(r["tv"] - 1.0) < 1e-12
    assert r["ks_num"] == 100 * 150 and abs(r["ks"] - 1.0) < 1e-12


def test_distribution_drift_overflow_guard_raises_both_sql_modes(spark):
    """The assert_true int64 ceiling must actually FIRE (ADVICE r06: a
    hard-coded literal meant no test exercised the raise path). With the
    parameterized bound lowered below a real numerator, the guard must
    raise under BOTH ANSI and legacy mode — legacy is the dangerous one,
    where a bare decimal->long overflow cast yields silent NULLs."""
    import pytest as _pytest
    from py_etl_spark.operators.dq import distribution_drift

    disjoint = spark.createDataFrame(
        [(i, "a", 5.0) for i in range(100)]
        + [(i + 1000, "b", 45.0) for i in range(150)],
        ["id", "g", "v"],
    )
    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        for mode in ("true", "false"):
            spark.conf.set("spark.sql.ansi.enabled", mode)
            # tv_num = 2*100*150 = 30000 > 9999: the guard trips
            with _pytest.raises(Exception, match="exceeds int64"):
                distribution_drift(
                    disjoint, "v", "g", "a", "b", 0.0, 50.0, 25,
                    int64_guard=9999,
                ).collect()
            # bound just above the true numerator: clean run in both modes
            r = distribution_drift(
                disjoint, "v", "g", "a", "b", 0.0, 50.0, 25,
                int64_guard=30000,
            ).collect()[0]
            assert r["tv_num"] == 30000
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_equi_depth_buckets_balanced_on_uniform_data(spark):
    from py_etl_spark.operators.sketch import equi_depth_buckets

    df = spark.range(0, 1000).selectExpr("CAST(id AS DOUBLE) AS v")
    out = equi_depth_buckets(
        df, "v", lo=0.0, hi=1000.0, bins=100, n_buckets=4
    )
    sizes = {
        r["bucket"]: r["n"]
        for r in out.groupBy("bucket").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert set(sizes) == {0, 1, 2, 3}
    # uniform data → quartiles within one bin width (10 values) of 250
    assert all(abs(n - 250) <= 10 for n in sizes.values())
    # buckets are monotone in the underlying value
    rows = out.select("v", "bucket").collect()
    lo_max = max(r["v"] for r in rows if r["bucket"] == 0)
    hi_min = min(r["v"] for r in rows if r["bucket"] == 3)
    assert lo_max < hi_min


def test_keep_canonical_picks_best_quality_then_smallest_id(spark):
    from py_etl_spark.operators.dedup import keep_canonical_per_cluster

    clusters = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 200), (5, 200), (6, 300)],
        ["doc_id", "cluster_id"],
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 5), (5, 5), (6, 1)],
        ["doc_id", "quality"],
    )
    got = {
        r["doc_id"]: r["is_canonical"]
        for r in keep_canonical_per_cluster(
            clusters, docs, quality_col="quality"
        ).collect()
    }
    # cluster 100: quality tie 99 between 2 and 3 → smallest id (2) wins
    # cluster 200: tie between 4 and 5 → 4; singleton cluster → itself
    assert got == {1: False, 2: True, 3: False, 4: True, 5: False, 6: True}


def test_scd2_point_in_time_join_picks_interval_or_null(spark):
    from py_etl_spark.operators.merge import (
        scd2_history,
        scd2_point_in_time_join,
    )

    changes = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "bronze"),
            (1, "2024-01-10 00:00:00", "silver"),
            (1, "2024-01-20 00:00:00", "gold"),
            (2, "2024-01-05 00:00:00", "bronze"),
        ],
        ["uid", "t", "tier"],
    ).select("uid", F.to_timestamp("t").alias("t"), "tier")
    hist = scd2_history(changes, keys=["uid"], ts_col="t", tracked=["tier"])
    facts = spark.createDataFrame(
        [
            (100, 1, "2023-12-31 23:00:00"),  # before first interval
            (101, 1, "2024-01-01 00:00:00"),  # inclusive start
            (102, 1, "2024-01-10 00:00:00"),  # boundary: new interval
            (103, 1, "2024-01-15 12:00:00"),  # mid-interval
            (104, 1, "2024-06-01 00:00:00"),  # open current interval
            (105, 3, "2024-01-15 00:00:00"),  # unknown key
        ],
        ["fid", "uid", "t"],
    ).select("fid", "uid", F.to_timestamp("t").alias("asof"))
    got = {
        r["fid"]: r["pit_tier"]
        for r in scd2_point_in_time_join(
            facts, hist, keys=["uid"], fact_ts="asof"
        ).collect()
    }
    assert got == {
        100: None,
        101: "bronze",
        102: "silver",
        103: "silver",
        104: "gold",
        105: None,
    }


def test_label_centroids_match_numpy_and_partitioning_invariant(spark):
    import numpy as np

    from py_etl_spark.operators.similarity import label_centroids_int

    rng = np.random.RandomState(11)
    d = 6
    rows = [
        (i, [float(x) for x in rng.randn(d)], int(i % 3)) for i in range(90)
    ] + [(1000, [0.0] * d, None)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        r["label"]: (r["n"], r["sums"])
        for r in label_centroids_int(df, dim=d).collect()
    }
    assert set(got) == {0, 1, 2}  # NULL label excluded
    for lbl in range(3):
        pts = np.array([r[1] for r in rows[:-1] if r[2] == lbl])
        want = np.round(pts * 100000.0).astype(np.int64).sum(axis=0)
        assert got[lbl][0] == len(pts)
        assert list(got[lbl][1]) == [int(x) for x in want]
    again = {
        r["label"]: (r["n"], r["sums"])
        for r in label_centroids_int(df.repartition(7), dim=d).collect()
    }
    assert got == again


def test_label_centroids_drop_malformed_vectors(spark):
    """Vectors with the wrong dimensionality or null elements must be
    dropped BEFORE the sum (the error-channel contract) — the centroid
    over the remaining well-formed rows is unchanged, never silently
    zero-padded (ADVICE r04)."""
    from py_etl_spark.operators.similarity import label_centroids_int

    good = [(1, [1.0, 2.0, 3.0], 0), (2, [3.0, 2.0, 1.0], 0)]
    bad = [
        (3, [9.0, 9.0], 0),              # short
        (4, [9.0, 9.0, 9.0, 9.0], 0),    # long
        (5, [9.0, None, 9.0], 0),        # null element
    ]
    df = spark.createDataFrame(
        good + bad, "vec_id long, embedding array<double>, label int"
    )
    rows = label_centroids_int(df, dim=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] == 2  # only the two well-formed vectors counted
    assert list(r["sums"]) == [400000, 400000, 400000]


def test_hard_negatives_exclude_same_label(spark):
    from py_etl_spark.operators.similarity import hard_negatives

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.99, 0.14], 0),   # same label — must never appear
        (3, [0.95, 0.31], 1),
        (4, [0.0, 1.0], 1),
        (5, [0.9, 0.43], None),  # null label counts as different
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = hard_negatives(df, df.filter("vec_id = 1"), k=2).collect()
    ids = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert ids == [3, 5]  # closest different-label vectors, 2 excluded


def test_word_dropout_deterministic_and_salt_independent(spark):
    from py_etl_spark.operators.corpus import augment_word_dropout

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(200)))], ["doc_id", "text"]
    )
    a = augment_word_dropout(df, p_pct=15).collect()[0]
    assert a["n_tokens"] == 200
    # ~15% drop rate, generous envelope
    assert 10 <= a["n_dropped"] <= 50
    # kept tokens preserve original order
    kept = a["aug_text"].split(" ")
    orig = [f"w{i}" for i in range(200)]
    it = iter(orig)
    assert all(any(t == o for o in it) for t in kept)
    again = augment_word_dropout(
        df.repartition(3), p_pct=15
    ).collect()[0]
    assert again["aug_text"] == a["aug_text"]
    other_salt = augment_word_dropout(df, p_pct=15, salt="aug2").collect()[0]
    assert other_salt["aug_text"] != a["aug_text"]
    # p=0 keeps everything
    full = augment_word_dropout(df, p_pct=0).collect()[0]
    assert full["n_dropped"] == 0 and full["aug_text"] == df.collect()[0]["text"]


def test_outlier_scores_flag_planted_outlier(spark):
    import py_etl_spark.queries as Q

    # plant: the per-label top-5 must include genuinely far vectors and
    # the score must be repartition-invariant (integer arithmetic)
    df1 = Q.REGISTRY["embedding_outlier_scores"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    got = {(r["label"], r["rnk"]): (r["vec_id"], r["d2_scaled"]) for r in df1}
    assert all(r["d2_scaled"] >= 0 for r in df1)
    # ranks are dense 1..k per label
    labels = {r["label"] for r in df1}
    for lbl in labels:
        ranks = sorted(rk for (l, rk) in got if l == lbl)
        assert ranks == list(range(1, len(ranks) + 1))


def test_exact_kth_value_selection_algorithm(spark):
    import random

    from py_etl_spark.operators.ranking import exact_kth_value

    rng = random.Random(5)
    vals = [rng.uniform(-100, 100) for _ in range(5000)] + [7.5] * 200
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    s = sorted(vals)
    # force the histogram-narrowing path with a tiny direct threshold
    for k in (1, 2, 2600, len(vals) // 2, len(vals)):
        got = exact_kth_value(df, "x", k=k, direct_threshold=50)
        assert got == s[k - 1], (k, got, s[k - 1])
    # nulls excluded from ranking
    with_nulls = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (2.0,), (None,)], ["x"]
    )
    assert exact_kth_value(with_nulls, "x", k=2) == 2.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        exact_kth_value(with_nulls, "x", k=4)  # only 3 non-null rows


def test_exact_kth_value_bin_boundary_floats(spark):
    """Adversarial bin-boundary case for the count/filter agreement fix
    (ADVICE r04): every value sits EXACTLY at a bin edge of the first
    round's histogram (lo=0, hi=irrational-ish width), where
    floor((v-lo)/width) and the old range predicates could disagree by
    one ulp. The EXACT contract must hold for every k across the
    boundary cluster."""
    from py_etl_spark.operators.ranking import exact_kth_value

    lo, hi, bins = 0.0, 1.0, 7  # width = 1/7, not representable
    width = (hi - lo) / bins
    # values at every edge, duplicated, plus the ends
    vals = [i * width for i in range(bins + 1)] * 40
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    s = sorted(vals)
    for k in (1, 40, 41, 160, 161, len(vals) // 2, len(vals)):
        got = exact_kth_value(df, "x", k=k, bins=bins, direct_threshold=10)
        assert got == s[k - 1], (k, got, s[k - 1])


def test_pareto_skyline_matches_bruteforce(spark):
    import random

    import py_etl_spark.queries as Q

    # brute-force dominance over the actual sf0.001 output
    rows = Q.REGISTRY["pareto_frontier_docs"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    pts = [(r["q"], r["l"]) for r in rows]
    # no skyline point dominates another
    for a in pts:
        for b in pts:
            if a != b:
                assert not (
                    a[0] >= b[0] and a[1] >= b[1]
                ), (a, b)


def test_histogram_bucketizers_reject_degenerate_ranges(spark):
    """hi <= lo or zero bins must fail at plan-BUILD time with the
    offending parameters, not later as an opaque executor-side ANSI
    divide-by-zero."""
    import pytest as _pytest

    from py_etl_spark.operators.sketch import equi_depth_buckets, hist_sketch

    df = spark.createDataFrame([(1.0,), (2.0,)], ["x"])
    with _pytest.raises(ValueError, match="hi > lo"):
        hist_sketch(df, "x", lo=5.0, hi=5.0)
    with _pytest.raises(ValueError, match="hi > lo"):
        hist_sketch(df, "x", lo=5.0, hi=1.0)
    with _pytest.raises(ValueError, match="bins"):
        hist_sketch(df, "x", lo=0.0, hi=1.0, bins=0)
    with _pytest.raises(ValueError, match="hi > lo"):
        equi_depth_buckets(df, "x", lo=2.0, hi=2.0)


def test_term_count_guard_rejects_multichar_nonascii_terms(spark):
    """VERDICT r10 item 3: a multi-char non-ASCII term ('café') falls to
    the punct branch, whose per-char count spelling would score it as
    len(term) x substring-occurrences instead of 0. The scorer must
    refuse it outright (TOKEN_RE can never emit such a token), and the
    public bm25_topk must reject it at query normalization."""
    import pytest as _pytest

    from pyspark.sql import functions as _F

    from py_etl_spark.operators.search import _term_count, bm25_topk

    lower = _F.lower(_F.col("text"))
    letter_runs = _F.split(lower, r"[^a-z]+", -1)
    digit_runs = _F.split(lower, r"[^0-9]+", -1)
    for bad in ("café", "٣٣"):
        with _pytest.raises(ValueError, match="single chars"):
            _term_count(bad, lower, letter_runs, digit_runs)
    # valid single-char punct terms (any script) still build a column
    for ok in ("²", "é", "#"):
        assert _term_count(ok, lower, letter_runs, digit_runs) is not None
    df = spark.createDataFrame(
        [(1, "café au lait"), (2, "no match")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="single corpus token"):
        bm25_topk(df, ["café"], k=2)


def _seeded_near_dup_corpus(spark):
    """Deterministic corpus with known near-dup structure: 6 bases, each
    with a suffix-appended near-dup copy (word-shingle Jaccard ~0.85, so
    2-row/16-band LSH collides with overwhelming margin under ANY hash
    family) and filler documents that share nothing beyond stopwords."""
    bases = [
        "the quick brown fox jumps over the lazy dog near the old river bank",
        "pack my box with five dozen liquor jugs before the market closes",
        "how vexingly quick daft zebras jump across the frozen northern lake",
        "sphinx of black quartz judge my vow under the pale morning light",
        "the five boxing wizards jump quickly over the crumbling stone wall",
        "bright vixens jump while the dozy fowl quack in the quiet farmyard",
    ]
    rows = []
    expected = set()
    for i, b in enumerate(bases):
        a_id, b_id = 100 + i, 200 + i
        rows.append((a_id, b))
        rows.append((b_id, b + " trailing editor note"))
        expected.add((a_id, b_id))
    for j in range(6):
        rows.append(
            (300 + j, f"filler document number {j} about parquet metadata "
                      f"columnar encodings and shuffle partition number {j}")
        )
    return spark.createDataFrame(rows, "doc_id long, text string"), expected


def test_hash_family_lever_finds_same_near_dup_pairs(spark):
    """VERDICT r10 item 6: hash_family='xxhash64' is the production
    lever (md5 stays the oracle-pinned portable default). The lever must
    be STRUCTURE-preserving: on a seeded near-dup corpus both families
    recover every seeded pair — for MinHash-LSH candidates and for
    winnowing shared-fingerprint pairs. (Candidate sets need not be
    bit-identical across families — banding collisions are
    hash-dependent — but the seeded recall is the contract.)"""
    from py_etl_spark.operators.fingerprint import shared_fingerprint_pairs

    docs, expected = _seeded_near_dup_corpus(spark)
    for fam in ("md5", "xxhash64"):
        lsh = {
            (r.id_a, r.id_b)
            for r in dedup.minhash_lsh_candidates(
                docs, num_hashes=32, bands=16, hash_family=fam
            ).collect()
        }
        assert expected <= lsh, (fam, expected - lsh)
        winnow = {
            (r.id_a, r.id_b)
            for r in shared_fingerprint_pairs(
                docs, k=8, w=4, min_shared=1, hash_family=fam
            ).collect()
        }
        assert expected <= winnow, (fam, expected - winnow)


def test_minhash_permutations_are_decorrelated(spark):
    """Regression for the r11 permutation-modulus fix (dedup.PERM_PRIME):
    with the old p = 2^61-1, (a*h+b) never wrapped for h < 2^31, every
    permutation was the same monotone map, and per-pair signature
    agreement was all-or-nothing on whether the single minimum-base-hash
    shingle was shared (measured 32/32 or ~6/32 on J~0.77 pairs; two of
    six seeded pairs had zero matching LSH bands). Under independent
    permutations agreement concentrates at J*k. Pin that concentration
    for BOTH hash families: a suffix-appended near-dup (J ~ 0.75-0.8)
    must agree on 16..31 of 32 slots — never all 32, never near-zero."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the old "
            "river bank while the miller sleeps"),
        (2, "the quick brown fox jumps over the lazy dog near the old "
            "river bank while the miller sleeps trailing editor note"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for fam in ("md5", "xxhash64"):
        sig = {
            r.doc_id: r.minhash
            for r in dedup.minhash_signatures(
                df, num_hashes=32, hash_family=fam
            ).collect()
        }
        agree = sum(x == y for x, y in zip(sig[1], sig[2]))
        assert 16 <= agree <= 31, (fam, agree)
