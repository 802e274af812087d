"""Multimodal column plumbing (north-star extension): image/audio/video
as opaque BINARY columns + typed metadata, processed via Arrow-batched
mapInPandas.

Image decode is REAL: PNG and binary PPM/PGM via the stdlib-only codec
in operators/imagecodec.py (zlib inflate + de-filter + nearest-neighbor
resample + deterministic PNG re-encode), with PIL as an optional
fallback for other formats. Audio decode remains STUBBED (no
soundfile/librosa in this container — clearly marked below).
Everything Spark-side is real and tested: schemas, batch iteration,
partitioning, UDF signatures, and a deterministic fake feature kernel
for payloads that aren't decodable media (synthetic fixtures).

Design for 100 TB:
  - binary payloads never pass through Python row-at-a-time — only
    Arrow record batches via mapInPandas;
  - metadata (width/height/duration/codec) lives in a sibling struct
    column so filters prune *before* any decode;
  - frame sampling emits one row per frame (explode pattern) keeping
    per-batch memory bounded by maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def _decode_image(payload: bytes) -> "object":
    """Real image decode. PNG and binary PPM/PGM decode via the
    stdlib-only codec (operators/imagecodec.py — zlib inflate +
    de-filter, no third-party deps), deterministically in every
    environment. Other formats (JPEG, ...) fall back to PIL when
    present, else raise ValueError."""
    from rc_rag_spark.operators import imagecodec

    payload = bytes(payload or b"")
    if payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:2] in (b"P5", b"P6"):
        return imagecodec.decode(payload)
    try:
        import io

        from PIL import Image
    except ImportError:
        raise ValueError(
            "unrecognized image format (stdlib codec handles PNG/P5/P6; "
            "PIL not available for other formats)"
        ) from None
    return Image.open(io.BytesIO(payload))


def _decode_audio(payload: bytes) -> "object":
    """Real audio decode. RIFF/WAVE PCM (8/16/24/32-bit int and
    float32/64) decodes via the stdlib-only codec
    (operators/audiocodec.py — struct-parsed chunk walk, no
    third-party deps), deterministically in every environment. Other
    containers (mp3/ogg/flac, ...) fall back to soundfile when
    present, else raise ValueError — mirroring _decode_image."""
    from rc_rag_spark.operators import audiocodec

    payload = bytes(payload or b"")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return audiocodec.decode(payload)
    try:
        import io

        import soundfile  # noqa: F401
    except ImportError:
        raise ValueError(
            "unrecognized audio container (stdlib codec handles "
            "RIFF/WAVE PCM; soundfile not available for other formats)"
        ) from None
    data, rate = soundfile.read(io.BytesIO(payload))
    return data, rate


def _decode_video(payload: bytes) -> "object":
    """Real video decode. YUV4MPEG2 (.y4m — what `ffmpeg -f yuv4mpeg`
    emits) decodes via the stdlib-only codec
    (operators/videocodec.py), deterministically in every environment;
    frames come back as imagecodec.SimpleImage luma rasters so every
    image op applies per frame. Compressed containers (mp4/webm, ...)
    fall back to PyAV when present, else raise ValueError — mirroring
    _decode_image/_decode_audio."""
    from rc_rag_spark.operators import videocodec

    payload = bytes(payload or b"")
    if payload[:9] == b"YUV4MPEG2":
        return videocodec.decode(payload)
    try:
        import io

        import av  # noqa: F401
    except ImportError:
        raise ValueError(
            "unrecognized video container (stdlib codec handles "
            "YUV4MPEG2; PyAV not available for other formats)"
        ) from None
    return av.open(io.BytesIO(payload))


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding' of a binary payload (stands in
    for the stubbed decoder so the Spark plumbing is fully testable).
    Hashes the payload's hex encoding + '-<i>' (text, not raw bytes) so
    an external SQL oracle can recompute it — DuckDB's sha256() only
    accepts VARCHAR."""
    import hashlib

    hx = (payload or b"").hex()
    return [
        int.from_bytes(
            hashlib.sha256(f"{hx}-{i}".encode()).digest()[:4], "big"
        )
        / 2**32
        for i in range(dim)
    ]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("multimodal_kernel")
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": [
                        _fake_feature(p, dim) for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


REAL_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind_detected", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def extract_features_real(media: DataFrame) -> DataFrame:
    """REAL feature extraction with per-row modality dispatch — the
    one-pass shape of a mixed-modality curation pipeline: a single
    Arrow-batched mapInPandas sniffs each payload's container magic
    and routes it through the matching stdlib codec
    (imagecodec PNG/P5/P6, audiocodec RIFF/WAVE, videocodec
    YUV4MPEG2), emitting a 2-float feature per row:

      image  [mean pixel, max pixel]
      audio  [mean sample, max sample]
      video  [mean luma over all frames, mean abs inter-frame diff]

    Undecodable payloads emit kind_detected='unknown' with a NULL
    feature instead of failing the batch — at 100 TB a poison row
    must quarantine, not kill the stage. All kernels are exact
    integer sums over constants, so a SQL oracle recomputes them.
    Unlike extract_features (the fake-kernel plumbing twin kept for
    q73's oracle), nothing here is a stand-in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("multimodal_kernel")
        from rc_rag_spark.operators import audiocodec, imagecodec, videocodec

        for pdf in batches:
            out = {
                "media_id": [], "kind_detected": [], "n_bytes": [],
                "feature": [],
            }
            for _, row in pdf.iterrows():
                p = bytes(row["payload"] or b"")
                kind, feat = "unknown", None
                try:
                    if p[:8] == b"\x89PNG\r\n\x1a\n" or p[:2] in (b"P5", b"P6"):
                        img = imagecodec.decode(p)
                        kind = "image"
                        feat = [
                            sum(img.data) / len(img.data),
                            float(max(img.data)),
                        ]
                    elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                        clip = audiocodec.decode(p)
                        kind = "audio"
                        feat = [
                            sum(clip.samples) / len(clip.samples),
                            float(max(clip.samples)),
                        ]
                    elif p[:9] == b"YUV4MPEG2":
                        vid = videocodec.decode(p)
                        kind = "video"
                        n_px = sum(len(f.data) for f in vid.frames)
                        total = sum(sum(f.data) for f in vid.frames)
                        diffs = [
                            sum(
                                abs(a - b)
                                for a, b in zip(f0.data, f1.data)
                            ) / len(f0.data)
                            for f0, f1 in zip(vid.frames, vid.frames[1:])
                        ]
                        feat = [
                            total / n_px,
                            sum(diffs) / len(diffs) if diffs else 0.0,
                        ]
                except (ValueError, ZeroDivisionError):
                    kind, feat = "unknown", None
                out["media_id"].append(row["media_id"])
                out["kind_detected"].append(kind)
                out["n_bytes"].append(len(p))
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, REAL_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled
    frame. Real kernel first: a YUV4MPEG2 payload is DECODED
    (operators/videocodec.py) and the sampled frames come out as
    deterministic PGM re-encodings of the actual luma planes, one per
    every_ms of clip time (source frame = t·fps, clamped to the clip).
    Non-y4m payloads (synthetic fixture bytes) keep the deterministic
    byte-slice kernel — the explode/batch shape is identical either
    way, and a compressed-format decoder (PyAV) drops into the same
    slot."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("multimodal_kernel")
        from rc_rag_spark.operators import imagecodec, videocodec

        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for _, row in pdf.iterrows():
                if row["kind"] != "video" or row["payload"] is None:
                    continue
                blob = bytes(row["payload"])
                if blob[:9] == b"YUV4MPEG2":
                    clip = videocodec.decode(blob)
                    num, den = clip.fps
                    dur = clip.duration_ms
                    n_out = max(1, dur // every_ms) if dur else 1
                    for k in range(n_out):
                        src = min(
                            clip.n_frames - 1,
                            k * every_ms * num // (1000 * den),
                        )
                        ids.append(row["media_id"])
                        idxs.append(k)
                        payloads.append(
                            imagecodec.encode_pnm(clip.frames[src])
                        )
                    continue
                dur = row["meta"]["duration_ms"] or 0
                n_frames = max(1, dur // every_ms)
                step = max(1, len(blob) // n_frames)
                for k in range(n_frames):
                    ids.append(row["media_id"])
                    idxs.append(k)
                    payloads.append(blob[k * step : (k + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Image resize over binary payloads (task-list op: decode →
    resize → re-encode). Real kernel first: PNG/PPM/PGM payloads are
    decoded by the stdlib codec (operators/imagecodec.py), resampled
    nearest-neighbor, and re-encoded as deterministic PNG — no
    third-party deps, same bytes in every environment. Other formats
    go through PIL when present. Payloads that aren't decodable images
    (synthetic fixture payloads are raw bytes) degrade per-row to a
    deterministic fake: payload length scaled by the pixel ratio.
    Batching, schema, and the metadata rewrite are the Spark-side
    contract: meta.width/height reflect the target size so downstream
    filters keep pruning before any decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("multimodal_kernel")
        from rc_rag_spark.operators import imagecodec

        try:
            import io

            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "payload": [], "meta": [],
            }
            for _, row in pdf.iterrows():
                if row["kind"] != "image" or row["payload"] is None:
                    continue
                meta = dict(row["meta"])
                payload = None
                try:
                    img = imagecodec.decode(bytes(row["payload"]))
                    payload = imagecodec.encode_png(
                        img.resize((width, height))
                    )
                except ValueError:
                    payload = None  # not PNG/PNM — try PIL, then fake
                if payload is None and have_pil:
                    try:
                        img = Image.open(io.BytesIO(row["payload"]))
                        img = img.resize((width, height))
                        buf = io.BytesIO()
                        img.save(buf, format="PNG")
                        payload = buf.getvalue()
                    except Exception:
                        # not a decodable image (synthetic fixtures are
                        # raw bytes) — fall through to the fake kernel
                        payload = None
                if payload is None:
                    # deterministic fake: payload length scales with the
                    # pixel ratio (floor, min 1 byte)
                    src_px = max(
                        1, (meta["width"] or 1) * (meta["height"] or 1)
                    )
                    blob = bytes(row["payload"]) or b"\x00"
                    n = max(1, len(blob) * width * height // src_px)
                    reps = -(-n // len(blob))
                    payload = (blob * reps)[:n]
                meta["width"], meta["height"] = width, height
                out["media_id"].append(row["media_id"])
                out["kind"].append(row["kind"])
                out["payload"].append(payload)
                out["meta"].append(meta)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, MEDIA_SCHEMA)


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (documents stand-ins) for
    exercising the plumbing."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes((i * 31 + j) % 256 for j in range(128 + i))
        rows.append(
            (
                i,
                kind,
                payload,
                (64 + i % 32, 48 + i % 16, 4000 + 500 * (i % 5), "fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_stats(features: DataFrame) -> DataFrame:
    """Post-extraction relational stage: per-kind payload stats."""
    return features.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.round(F.avg(F.element_at("feature", 1)), 6).alias("avg_f0"),
    )


CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("chunk_payload", BinaryType()),
        StructField("chunk_ms", IntegerType()),
    ]
)


def chunk_audio(media: DataFrame, window_ms: int = 500) -> DataFrame:
    """Fixed-duration chunking for audio rows: one output row per
    window_ms slice. Like sample_frames the decode is stubbed — the
    'chunk' is a deterministic byte slice proportional to the time
    window — but the Spark shape (metadata-driven explode via
    Arrow-batched mapInPandas, memory bounded per batch) is the real
    100 TB path; a real decoder drops into the same slot. The final
    chunk extends to the end of the payload, so it carries BOTH the
    remainder bytes and the remainder milliseconds — chunks always
    reassemble to the whole blob. Rows with a NULL meta struct or a
    non-positive/unknown duration are skipped: they can't be
    time-chunked, and fabricating a window_ms stamp would overstate
    covered time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("multimodal_kernel")
        for pdf in batches:
            ids, idxs, payloads, ms = [], [], [], []
            for _, row in pdf.iterrows():
                if row["kind"] != "audio" or row["payload"] is None:
                    continue
                meta = row["meta"]
                dur = (meta["duration_ms"] if meta is not None else 0) or 0
                if dur <= 0:
                    continue
                n_chunks = max(1, -(-dur // window_ms))  # ceil
                blob = row["payload"]
                step = max(1, len(blob) // n_chunks)
                for k in range(n_chunks):
                    ids.append(row["media_id"])
                    idxs.append(k)
                    end = len(blob) if k == n_chunks - 1 else (k + 1) * step
                    payloads.append(blob[k * step : end])
                    ms.append(min(window_ms, dur - k * window_ms))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "chunk_idx": idxs,
                    "chunk_payload": payloads,
                    "chunk_ms": ms,
                }
            )

    return media.mapInPandas(run, CHUNK_SCHEMA)


def frame_features(frames: DataFrame) -> DataFrame:
    """Per-frame feature extraction (second stage after sample_frames):
    same deterministic fake kernel as extract_features, applied to the
    frame payload — a real video model drops into this slot. Arrow
    mapInPandas, one float per frame here (keyframe scoring)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("multimodal_kernel")
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "f0": [
                        _fake_feature(bytes(p) if p is not None else b"", 1)[0]
                        for p in pdf["frame_payload"]
                    ],
                }
            )

    return frames.mapInPandas(run, "media_id long, frame_idx int, f0 float")
