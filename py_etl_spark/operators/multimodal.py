"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, with decode/feature/resize/frame-sample stages as Arrow-batched
``mapInPandas`` operators.

The Spark-side contract is fully real — schemas, partitioning, batch
iteration, null handling — and the codec is pluggable: the container has
no image/audio libraries, so the default codec is a deterministic fake
(size/hash-derived features), a REAL pure-Python PNG/WAV decoder lives in
:mod:`py_etl_spark.operators.media_codec` (``codec_decode_features``),
and the heavyweight PIL/ffmpeg paths raise ``NotImplementedError`` until
a real codec is injected.

Scale notes: media rows are large and skewed → ``repartition`` by a size
bucket before the UDF so Arrow batches stay bounded;
``spark.sql.execution.arrow.maxRecordsPerBatch`` caps batch memory; the
UDF is a generator over batches, so one oversized file cannot OOM a task
that streams its batches.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("content", T.BinaryType(), True),      # opaque payload
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha1 string, "
    "feature array<float>, decode_error string"
)


def fake_decode_features(content: bytes | None, dim: int = 8) -> list[float] | None:
    """Deterministic stand-in for a real decoder: hash-derived features.
    Replace with a real codec via ``decode_fn`` injection."""
    if content is None:
        return None
    h = hashlib.sha256(content).digest()
    return [b / 255.0 for b in h[:dim]]


def real_decode_stub(content: bytes | None, dim: int = 8):
    """The real-codec seam. The v1 container ships no PIL/ffmpeg/librosa —
    inject a codec or use :func:`fake_decode_features`."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg/librosa) are not available in this "
        "container; inject decode_fn=... or use fake_decode_features"
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes | None], list[float] | None] = fake_decode_features,
    batch_bucket_bytes: int = 64 << 20,
) -> DataFrame:
    """content → per-item feature vector via mapInPandas (Arrow batches).

    The size-bucket repartition bounds per-task payload so huge media files
    don't skew a single Arrow batch."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, errs, hashes, sizes = [], [], [], []
            for content in pdf["content"]:
                if content is None:
                    feats.append(None)
                    errs.append("null content")
                    hashes.append(None)
                    sizes.append(0)
                    continue
                b = bytes(content)
                sizes.append(len(b))
                hashes.append(hashlib.sha1(b).hexdigest())
                try:
                    feats.append(decode_fn(b))
                    errs.append(None)
                except Exception as e:  # decode failures are data errors →
                    feats.append(None)  # error channel, never a task crash
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "sha1": hashes,
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    bucketed = media.repartition(
        F.floor(
            F.coalesce(F.length("content"), F.lit(0)) / F.lit(batch_bucket_bytes)
        ),
        F.col("media_id"),
    )
    return bucketed.mapInPandas(op, FEATURE_SCHEMA)


def frame_sample_plan(video: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan*: one output row per sampled frame timestamp —
    pure Spark (sequence+explode); the actual pixel decode is the injected
    codec's job downstream."""
    return (
        video.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary fixture (no media libs needed)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (i % 7 + 1)
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i if kind == "image" else None,
                48 + i if kind == "image" else None,
                1000 * (i + 1) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


THUMBNAIL_SCHEMA = (
    "media_id long, width int, height int, thumb_width int, "
    "thumb_height int, thumb_png binary, thumb_error string"
)


def thumbnail_images(
    media: DataFrame, max_side: int = 16, batch_bucket_bytes: int = 64 << 20
) -> DataFrame:
    """Real decode → transform → re-encode media pipeline, end to end in
    pure Python over Arrow batches: PNG rows are decoded
    (:func:`media_codec.parse_png`), nearest-neighbor downsampled so the
    longer side is ≤ ``max_side`` (aspect preserved, never upscaled),
    and re-encoded as valid PNGs (:func:`media_codec.encode_png`).
    Non-PNG / undecodable rows route to the ``thumb_error`` channel
    instead of failing the job — the same error-channel contract as
    ``extract_features``.

    Same scale posture as the feature extractor: size-bucketed
    repartition bounds each task's Arrow payload; the UDF is a generator
    so memory is per-batch; every row is independent (zero shuffles
    beyond the bucketing repartition).
    """
    from py_etl_spark.operators.media_codec import (
        encode_png,
        parse_png,
        resize_nearest,
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "media_id", "width", "height", "thumb_width",
                    "thumb_height", "thumb_png", "thumb_error",
                )
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w = h = tw = th = None
                png = err = None
                try:
                    if content is None:
                        raise ValueError("null content")
                    m = parse_png(bytes(content))
                    if m["pixels"] is None:
                        raise ValueError(
                            "unsupported PNG variant (palette/16-bit/"
                            "interlaced)"
                        )
                    w, h = m["width"], m["height"]
                    scale = max(w, h) / max_side
                    if scale <= 1:
                        tw, th = w, h
                        px = bytes(m["pixels"])
                    else:
                        tw = max(int(w / scale), 1)
                        th = max(int(h / scale), 1)
                        px = resize_nearest(
                            bytes(m["pixels"]), w, h, m["channels"], tw, th
                        )
                    png = encode_png(px, tw, th, m["channels"])
                except Exception as e:  # noqa: BLE001 — error channel
                    err = str(e)[:200]
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["thumb_width"].append(tw)
                out["thumb_height"].append(th)
                out["thumb_png"].append(png)
                out["thumb_error"].append(err)
            yield pd.DataFrame(out)

    bucketed = media.repartition(
        F.ceil(
            F.coalesce(F.length("content"), F.lit(0)) / batch_bucket_bytes
        ).cast("int"),
        F.col("media_id"),
    )
    return bucketed.select("media_id", "content").mapInPandas(
        op, schema=THUMBNAIL_SCHEMA
    )


AUDIO_WINDOW_SCHEMA = (
    "media_id long, window_idx int, n_samples int, sum_sq long, "
    "peak int, audio_error string"
)


def audio_window_features(
    media: DataFrame, window_ms: int = 100, batch_bucket_bytes: int = 64 << 20
) -> DataFrame:
    """Audio analog of :func:`thumbnail_images` — the frame-sample /
    feature-extract step of an audio training pipeline, end to end in
    pure Python over Arrow batches: WAV rows are RIFF-walked
    (:func:`media_codec.parse_wav` semantics), the 16-bit PCM stream is
    cut into fixed ``window_ms`` windows, and each window emits
    INTEGER-EXACT energy features: ``n_samples``, ``sum_sq`` (Σ s², a
    BIGINT — int16² · samples-per-window stays far below 2^63, so the
    sum is exact and order-free) and ``peak`` (max |s|). RMS/dB are a
    downstream Column expression over exact integers — no float
    accumulation inside Python, so results are bit-reproducible under
    any partitioning.

    Undecodable / non-WAV rows route to one ``audio_error`` row
    (window_idx NULL) — the standard error-channel contract. Scale
    posture identical to the thumbnail pipeline: size-bucketed
    repartition bounds task payloads; the generator UDF keeps memory
    per-batch; rows are independent beyond the bucketing repartition.
    """
    import struct as _struct

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from py_etl_spark.operators.media_codec import parse_wav

        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "media_id", "window_idx", "n_samples", "sum_sq",
                    "peak", "audio_error",
                )
            }

            def emit(mid, wi, n, ss, pk, err):
                out["media_id"].append(mid)
                out["window_idx"].append(wi)
                out["n_samples"].append(n)
                out["sum_sq"].append(ss)
                out["peak"].append(pk)
                out["audio_error"].append(err)

            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    if content is None:
                        raise ValueError("null content")
                    m = parse_wav(bytes(content))
                    if m["bits_per_sample"] != 16:
                        raise ValueError("only 16-bit PCM supported")
                    raw = bytes(content)
                    # re-walk for the data chunk (parse_wav returns stats
                    # only); RIFF layout already validated above
                    pos, data = 12, b""
                    while pos + 8 <= len(raw):
                        cid = raw[pos:pos + 4]
                        (ln,) = _struct.unpack("<I", raw[pos + 4:pos + 8])
                        if cid == b"data":
                            data = raw[pos + 8:pos + 8 + ln]
                            break
                        pos += 8 + ln + (ln & 1)
                    n_all = len(data) // 2
                    samples = _struct.unpack(f"<{n_all}h", data[: n_all * 2])
                    per_win = max(
                        1,
                        m["sample_rate"] * m["channels"] * window_ms // 1000,
                    )
                    for wi in range(0, (n_all + per_win - 1) // per_win):
                        w = samples[wi * per_win:(wi + 1) * per_win]
                        emit(
                            mid, wi, len(w),
                            sum(s * s for s in w),
                            max((abs(s) for s in w), default=0),
                            None,
                        )
                except Exception as e:  # noqa: BLE001 — error channel
                    emit(mid, None, None, None, None, str(e)[:200])
            yield pd.DataFrame(out)

    bucketed = media.repartition(
        F.ceil(
            F.coalesce(F.length("content"), F.lit(0)) / batch_bucket_bytes
        ).cast("int"),
        F.col("media_id"),
    )
    return bucketed.select("media_id", "content").mapInPandas(
        op, schema=AUDIO_WINDOW_SCHEMA
    )
