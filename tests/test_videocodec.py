"""Stdlib Y4M codec (operators/videocodec.py): golden-byte encode,
exact round-trips (mono + C420), header/robustness rules, and the
real-decode branch of multimodal.sample_frames."""

from __future__ import annotations

import pytest

from rc_rag_spark.operators import videocodec as VC
from rc_rag_spark.operators.imagecodec import SimpleImage, decode_pnm


def _mono_clip(frames_bytes, w=4, h=2, fps=(25, 1)):
    frames = [SimpleImage("L", (w, h), fb) for fb in frames_bytes]
    return VC.SimpleVideo((w, h), fps, "mono", frames)


def test_encode_golden_bytes_mono():
    clip = _mono_clip([bytes(range(8)), bytes(range(8, 16))])
    assert VC.encode_y4m(clip) == (
        b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 Cmono\n"
        b"FRAME\n" + bytes(range(8))
        + b"FRAME\n" + bytes(range(8, 16))
    )


def test_mono_roundtrip_exact():
    clip = _mono_clip([bytes([9] * 8), bytes([200] * 8)], fps=(30, 1))
    out = VC.decode(VC.encode_y4m(clip))
    assert out.size == (4, 2)
    assert out.fps == (30, 1)
    assert out.colorspace == "mono"
    assert [f.data for f in out.frames] == [bytes([9] * 8), bytes([200] * 8)]
    assert out.duration_ms == 2 * 1000 // 30


def test_c420_roundtrip_exact():
    y = bytes(range(16))  # 4x4 luma
    u, v = bytes([1, 2, 3, 4]), bytes([5, 6, 7, 8])  # 2x2 chroma
    clip = VC.SimpleVideo(
        (4, 4), (25, 1), "420",
        [SimpleImage("L", (4, 4), y)], [(u, v)],
    )
    out = VC.decode(VC.encode_y4m(clip))
    assert out.frames[0].data == y
    assert out.chroma == [(u, v)]


def test_header_parsing_skips_unknown_params_and_frame_params():
    raw = (
        b"YUV4MPEG2 W2 H2 F24:1 It A4:3 XYSCSS=MONO Cmono\n"
        b"FRAME Ipresentation\n" + bytes([1, 2, 3, 4])
    )
    out = VC.decode(raw)
    assert out.size == (2, 2) and out.fps == (24, 1)
    assert out.frames[0].data == bytes([1, 2, 3, 4])


def test_default_colorspace_is_420():
    raw = (
        b"YUV4MPEG2 W2 H2 F25:1\n"
        b"FRAME\n" + bytes(4) + bytes(1) + bytes(1)
    )
    out = VC.decode(raw)
    assert out.colorspace == "420"
    assert out.chroma == [(bytes(1), bytes(1))]


def test_reject_garbage_truncation_and_bad_colorspace():
    with pytest.raises(ValueError):
        VC.decode(b"not video")
    with pytest.raises(ValueError, match="truncated"):
        VC.decode(b"YUV4MPEG2 W4 H2 Cmono\nFRAME\n\x00\x00")
    with pytest.raises(ValueError, match="colorspace"):
        VC.decode(b"YUV4MPEG2 W4 H2 C422\nFRAME\n" + bytes(16))
    with pytest.raises(ValueError, match="FRAME"):
        VC.decode(b"YUV4MPEG2 W2 H1 Cmono\nBLOB\n\x00\x00")


def test_frames_are_simpleimages_resizable():
    clip = _mono_clip([bytes(range(8))])
    fr = VC.decode(VC.encode_y4m(clip)).frames[0]
    small = fr.resize((2, 1))
    assert small.size == (2, 1)
    # nearest mapping: x*4//2 -> cols 0, 2 of row 0
    assert small.data == bytes([0, 2])


def test_sample_frames_real_decode_branch(spark):
    """A y4m payload routes through the REAL decoder: sampled frames
    are PGM re-encodings of actual luma planes, chosen at t*fps."""
    from rc_rag_spark.operators import multimodal as MM

    frames = [bytes([10 * i] * 4) for i in range(5)]  # 2x2, 5 frames
    clip = VC.SimpleVideo(
        (2, 2), (2, 1), "mono",
        [SimpleImage("L", (2, 2), fb) for fb in frames],
    )  # 2 fps -> 2500 ms
    payload = VC.encode_y4m(clip)
    media = spark.createDataFrame(
        [(7, "video", payload, (2, 2, 2500, "y4m"))], MM.MEDIA_SCHEMA
    )
    rows = MM.sample_frames(media, every_ms=1000).collect()
    # 2500 ms // 1000 -> 2 sampled frames at t=0 s and t=1 s
    assert [r["frame_idx"] for r in rows] == [0, 1]
    got = [decode_pnm(bytes(r["frame_payload"])) for r in rows]
    # t=0 -> src frame 0; t=1 s * 2 fps -> src frame 2
    assert got[0].data == frames[0]
    assert got[1].data == frames[2]


def test_sample_frames_byte_slice_fallback_unchanged(spark):
    """Non-y4m payloads keep the deterministic byte-slice kernel
    (q74's oracle depends on it)."""
    from rc_rag_spark.operators import multimodal as MM

    blob = bytes(range(100, 160))
    media = spark.createDataFrame(
        [(3, "video", blob, (8, 8, 2000, "fake"))], MM.MEDIA_SCHEMA
    )
    rows = MM.sample_frames(media, every_ms=1000).collect()
    assert len(rows) == 2
    step = len(blob) // 2
    assert bytes(rows[0]["frame_payload"]) == blob[:step]
    assert bytes(rows[1]["frame_payload"]) == blob[step : 2 * step]
