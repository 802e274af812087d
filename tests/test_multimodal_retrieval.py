"""Multimodal plumbing + MLlib retrieval-model tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rc_rag_spark.operators import multimodal as MM
from rc_rag_spark.operators import retrieval as R


@pytest.fixture(scope="module")
def media(spark):
    return MM.synthesize_media(spark, n=48).cache()


def test_feature_extraction_schema_and_determinism(media):
    f1 = MM.extract_features(media).collect()
    f2 = MM.extract_features(media).collect()
    assert len(f1) == 48
    by_id = {r["media_id"]: r for r in f1}
    by_id2 = {r["media_id"]: r for r in f2}
    for i in by_id:
        assert by_id[i]["feature"] == by_id2[i]["feature"]
        assert len(by_id[i]["feature"]) == 8
        assert by_id[i]["n_bytes"] == 128 + i


def test_frame_sampling_only_video(media):
    frames = MM.sample_frames(media, every_ms=1000).collect()
    kinds = {r["media_id"] % 3 for r in frames}
    assert kinds == {2}  # only kind == 'video' rows (i % 3 == 2)
    per_media = {}
    for r in frames:
        per_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in per_media.items():
        assert sorted(idxs) == list(range(len(idxs)))


def test_metadata_pruning_before_decode(media):
    """Filters on the meta struct must prune before mapInPandas."""
    small = media.where(F.col("meta.width") < 70)
    out = MM.extract_features(small).count()
    assert 0 < out < 48


def test_media_stats(media):
    stats = MM.media_stats(MM.extract_features(media)).collect()
    assert {r["kind"] for r in stats} == {"image", "audio", "video"}


def test_decode_garbage_raises():
    # garbage bytes are not a PNG/PNM/WAV and (without PIL/soundfile)
    # not decodable at all — the real decoders must reject them, not
    # fake through
    with pytest.raises(Exception):
        MM._decode_image(b"x")
    with pytest.raises(Exception):
        MM._decode_audio(b"x")


def test_real_audio_decode_smoke():
    """The real decode path (stdlib codec — no soundfile needed):
    _decode_audio returns exact samples for a real PCM WAV."""
    from rc_rag_spark.operators import audiocodec

    clip = audiocodec.SimpleAudio(8000, 1, 2, [0, 1000, -1000, 32767])
    audio = MM._decode_audio(audiocodec.encode_wav(clip))
    assert audio.sample_rate == 8000
    assert audio.samples == [0, 1000, -1000, 32767]


# minimal valid 1x1 PNG (public-domain byte sequence)
_TINY_PNG = __import__("base64").b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf"
    "DwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def test_real_image_decode_smoke(spark):
    """The real decode path (stdlib codec — no Pillow needed):
    _decode_image returns a 1x1 image for a real PNG, and
    resize_images takes the real-kernel branch (re-encoded PNG
    payload, not the deterministic fake)."""
    img = MM._decode_image(_TINY_PNG)
    assert img.size == (1, 1)
    media = spark.createDataFrame(
        [(0, "image", _TINY_PNG, (1, 1, 0, "png"))], MM.MEDIA_SCHEMA
    )
    rows = MM.resize_images(media, width=4, height=4).collect()
    assert len(rows) == 1
    out = bytes(rows[0]["payload"])
    assert out[:8] == b"\x89PNG\r\n\x1a\n"  # real re-encode, not fake
    assert MM._decode_image(out).size == (4, 4)


def test_chunk_audio_reassembles_whole_blob(media):
    """The final chunk extends to the end of the payload: per-media
    chunk bytes must sum to the full blob length and concatenate back
    to the original payload."""
    blobs = {
        r["media_id"]: bytes(r["payload"])
        for r in media.where(F.col("kind") == "audio").collect()
    }
    chunks = MM.chunk_audio(media, window_ms=500).collect()
    per_media = {}
    for r in chunks:
        per_media.setdefault(r["media_id"], []).append(
            (r["chunk_idx"], bytes(r["chunk_payload"]))
        )
    assert set(per_media) == set(blobs)
    for mid, parts in per_media.items():
        parts.sort()
        assert b"".join(p for _, p in parts) == blobs[mid], mid


def test_chunk_audio_skips_null_meta_and_zero_duration(spark):
    """NULL meta structs must not crash the Arrow batch, and
    zero/unknown-duration rows must not fabricate chunk_ms."""
    rows = [
        (0, "audio", b"0123456789", (1, 1, 1000, "fake")),  # normal
        (1, "audio", b"0123456789", None),                  # NULL meta
        (2, "audio", b"0123456789", (1, 1, 0, "fake")),     # zero dur
        (3, "audio", b"0123456789", (1, 1, None, "fake")),  # NULL dur
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out = MM.chunk_audio(media, window_ms=500).collect()
    assert {r["media_id"] for r in out} == {0}
    assert sum(r["chunk_ms"] for r in out) == 1000


def test_retrieval_model_separates_pos_neg(spark, sf_dir):
    pairs = R.synthesize_training_pairs(spark, sf_dir, limit=200)
    model = R.train_relevance_model(pairs)
    scored = R.score_pairs(model, pairs)
    agg = (
        scored.groupBy("label")
        .agg(F.avg("relevance").alias("avg_rel"))
        .collect()
    )
    by_label = {r["label"]: r["avg_rel"] for r in agg}
    assert by_label[1.0] > by_label[0.0] + 0.2, by_label
    cols = set(scored.columns)
    assert {"pair_id", "question", "passage", "label", "relevance"} <= cols


def test_resize_images_rewrites_meta_and_payload(spark):
    from rc_rag_spark.operators import multimodal as MM
    from pyspark.sql import functions as F

    media = MM.synthesize_media(spark, n=30)
    rows = MM.resize_images(media, width=32, height=32).collect()
    # only image rows survive, every meta rewritten to the target size
    assert rows and all(r["kind"] == "image" for r in rows)
    assert all(
        r["meta"]["width"] == 32 and r["meta"]["height"] == 32 for r in rows
    )
    assert all(len(r["payload"]) >= 1 for r in rows)
    # deterministic across runs
    again = MM.resize_images(media, width=32, height=32).collect()
    assert sorted(len(r["payload"]) for r in rows) == sorted(
        len(r["payload"]) for r in again
    )


def test_q99_image_resize_runs(spark, sf_dir):
    import rc_rag_spark.queries as q

    out = q.REGISTRY["q99_image_resize"].fn(spark, sf_dir).collect()
    assert len(out) == 1 and out[0]["kind"] == "image"
    assert out[0]["min_w"] == 32 and out[0]["max_h"] == 32


def test_extract_features_real_dispatch_and_quarantine(spark):
    """extract_features_real routes by container magic (image/audio/
    video through their real codecs) and QUARANTINES undecodable
    payloads as kind_detected='unknown' with a NULL feature instead
    of failing the batch."""
    import struct

    from rc_rag_spark.operators import audiocodec, videocodec
    from rc_rag_spark.operators.imagecodec import SimpleImage, encode_pnm

    img = encode_pnm(SimpleImage("L", (2, 2), bytes([10, 20, 30, 40])))
    wav = audiocodec.encode_wav(audiocodec.SimpleAudio(8000, 1, 1, [5, 15]))
    y4m = videocodec.encode_y4m(
        videocodec.SimpleVideo(
            (2, 1), (25, 1), "mono",
            [SimpleImage("L", (2, 1), bytes([0, 10])),
             SimpleImage("L", (2, 1), bytes([4, 2]))],
        )
    )
    # RIFF magic but truncated garbage: must quarantine, not raise
    poison = b"RIFF" + struct.pack("<I", 4) + b"WAVEjunk"
    rows = [
        (0, "media", img, (2, 2, 0, "pgm")),
        (1, "media", wav, (0, 0, 0, "wav")),
        (2, "media", y4m, (2, 1, 80, "y4m")),
        (3, "media", poison, (0, 0, 0, "?")),
        (4, "media", b"plain bytes", (0, 0, 0, "?")),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in MM.extract_features_real(media).collect()}
    assert got[0]["kind_detected"] == "image"
    assert got[0]["feature"] == [25.0, 40.0]
    assert got[1]["kind_detected"] == "audio"
    assert got[1]["feature"] == [10.0, 15.0]
    assert got[2]["kind_detected"] == "video"
    assert got[2]["feature"] == [4.0, 6.0]  # mean luma; mean |diff| per px
    for pid in (3, 4):
        assert got[pid]["kind_detected"] == "unknown"
        assert got[pid]["feature"] is None
