"""Stdlib WAV codec (operators/audiocodec.py): golden-byte encode,
exact round-trips at every supported width, chunk-walk robustness, and
the integer resample/downmix kernels — all pure-Python, no Spark."""

from __future__ import annotations

import struct

import pytest

from rc_rag_spark.operators import audiocodec as AC


def test_encode_golden_bytes_8bit_mono():
    """Byte-exact golden: the minimal RIFF layout is pinned so encode
    stays deterministic across environments."""
    clip = AC.SimpleAudio(8000, 1, 1, [0, 128, 255])
    wav = AC.encode_wav(clip)
    assert wav == (
        b"RIFF" + struct.pack("<I", 39) + b"WAVE"
        b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 3) + bytes([0, 128, 255])
    )


@pytest.mark.parametrize(
    "width,samples",
    [
        (1, [0, 1, 127, 128, 255]),
        (2, [0, -1, 32767, -32768, 12345]),
        (3, [0, -1, 8388607, -8388608, 70000]),
        (4, [0, -1, 2**31 - 1, -(2**31), 7]),
    ],
)
def test_pcm_roundtrip_exact(width, samples):
    clip = AC.SimpleAudio(44100, 1, width, samples)
    out = AC.decode(AC.encode_wav(clip))
    assert out.sample_rate == 44100
    assert out.n_channels == 1
    assert out.sample_width == width
    assert out.samples == samples


def test_float_roundtrip_exact():
    vals = [0.0, -1.0, 0.5, 0.25, -0.125]
    for width in (4, 8):
        clip = AC.SimpleAudio(16000, 1, width, vals, is_float=True)
        out = AC.decode(AC.encode_wav(clip))
        assert out.is_float and out.samples == vals


def test_stereo_interleave_and_downmix():
    # frames: (0,10) (2,20) (4,40) — interleaved storage
    clip = AC.SimpleAudio(8000, 2, 2, [0, 10, 2, 20, 4, 40])
    out = AC.decode(AC.encode_wav(clip))
    assert out.n_frames == 3
    assert out.channel(0) == [0, 2, 4]
    assert out.channel(1) == [10, 20, 40]
    mono = out.to_mono()
    assert mono.n_channels == 1
    assert mono.samples == [5, 11, 22]  # floor mean, exact ints


def test_resample_nearest_mapping():
    """dst frame i reads src frame i*srcN//dstN — downsample 8->2k
    picks every 4th frame; upsample repeats frames, never invents."""
    clip = AC.SimpleAudio(8000, 1, 2, list(range(64)))
    down = clip.resample(2000)
    assert down.sample_rate == 2000
    assert down.samples == [i * 64 // 16 for i in range(16)]
    assert down.samples == list(range(0, 64, 4))
    up = AC.SimpleAudio(1000, 1, 2, [5, 9]).resample(3000)
    assert up.samples == [5, 5, 5, 9, 9, 9]


def test_chunk_walk_skips_unknown_and_pad():
    """LIST chunk before fmt, odd-size junk chunk with pad byte, fact
    chunk after data — all skipped; decode still exact."""
    clip = AC.SimpleAudio(8000, 1, 2, [7, -7])
    base = AC.encode_wav(clip)
    fmt_and_data = base[12:]
    hacked = (
        base[:4] + struct.pack("<I", 0) + b"WAVE"  # size ignored
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"junk" + struct.pack("<I", 3) + b"abc\x00"  # odd size + pad
        + fmt_and_data
        + b"fact" + struct.pack("<I", 4) + struct.pack("<I", 2)
    )
    out = AC.decode(hacked)
    assert out.samples == [7, -7]


def test_extensible_format_tag():
    """WAVE_FORMAT_EXTENSIBLE wrapping PCM: real tag lives in the
    SubFormat GUID's first u16."""
    raw = struct.pack("<2h", 3, -3)
    fmt_body = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        + struct.pack("<HHI", 22, 16, 0)  # cbSize, validbits, mask
        + struct.pack("<H", 1) + b"\x00" * 14  # SubFormat GUID: PCM
    )
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(raw))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    assert AC.decode(wav).samples == [3, -3]


def test_reject_non_wav_and_bad_fmt():
    with pytest.raises(ValueError):
        AC.decode(b"not audio at all")
    with pytest.raises(ValueError):
        AC.decode(b"RIFF\x00\x00\x00\x00AVI ")
    # ADPCM (tag 2) is not supported — must refuse, not mis-decode
    raw = b"\x00\x00"
    fmt_body = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 8)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8 + len(raw)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt_body
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    with pytest.raises(ValueError, match="format tag"):
        AC.decode(wav)


def test_trailing_partial_frame_dropped():
    """A data chunk whose byte count isn't a whole number of frames
    must not mis-align channels."""
    clip = AC.SimpleAudio(8000, 2, 2, [1, 2, 3, 4])
    wav = bytearray(AC.encode_wav(clip))
    # append 2 extra bytes (half a stereo 16-bit frame) to data
    data_size_off = wav.rindex(b"data") + 4
    (old,) = struct.unpack_from("<I", wav, data_size_off)
    wav += b"\x09\x00"
    struct.pack_into("<I", wav, data_size_off, old + 2)
    out = AC.decode(bytes(wav))
    assert out.samples == [1, 2, 3, 4]


def test_duration_ms():
    assert AC.SimpleAudio(8000, 1, 1, [0] * 64).duration_ms == 8
    assert AC.SimpleAudio(1000, 2, 2, [0, 0] * 1500).duration_ms == 1500
