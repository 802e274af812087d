"""Stdlib-only audio codec: RIFF/WAVE PCM decode + encode.

The reference pipeline (/root/reference/code/utils.py) is text-only —
audio columns are this repo's multimodal mandate, and until round 7
the decode slot raised NotImplementedError with a "requires
soundfile/librosa" excuse. That excuse is wrong for PCM WAV: the
container is a flat RIFF chunk list and the samples are fixed-width
little-endian integers, all of which `struct` parses exactly, with no
dependency and no float in the container path. This module closes the
stub the same way operators/imagecodec.py closed the image one.

Supported:
  - WAV decode: PCM (format tag 1, and WAVE_FORMAT_EXTENSIBLE 0xFFFE
    wrapping PCM) at 8-bit unsigned / 16/24/32-bit signed LE, plus
    IEEE float32/float64 (format tag 3), any channel count. Chunk
    walking skips unknown chunks (LIST/fact/cue) and tolerates the
    odd-size pad byte, so real-world files parse, not just our own.
  - WAV encode: deterministic minimal RIFF (fmt + data, no timestamps,
    no extra chunks) for the same sample formats.
  - Nearest-neighbor resample (src frame = dst*srcN // dstN — the same
    integer mapping as imagecodec's resize) and channel-mean downmix,
    both exact integer arithmetic so an external SQL oracle can
    recompute them.

Scale note: this runs inside Arrow-batched mapInPandas workers
(operators/multimodal.py) — per-payload cost is bounded by clip size,
payloads never cross the driver, and a faster kernel (soundfile /
libsndfile) drops into the same slot when present.
"""

from __future__ import annotations

import struct

_PCM = 1
_IEEE_FLOAT = 3
_EXTENSIBLE = 0xFFFE

# struct codes for signed widths; 24-bit is hand-assembled
_INT_FMT = {2: "<h", 4: "<i"}
_FLOAT_FMT = {4: "<f", 8: "<d"}


class SimpleAudio:
    """Minimal in-memory clip: sample_rate (Hz), n_channels, and
    `samples` — a flat list of per-sample values, frame-major with
    interleaved channels (frame i, channel c at samples[i*n_channels
    + c]). Integer formats decode to exact ints (8-bit kept unsigned
    0..255 as stored; 16/24/32-bit signed), float formats to Python
    floats. `sample_width` remembers the source width so encode
    round-trips."""

    __slots__ = ("sample_rate", "n_channels", "sample_width",
                 "is_float", "samples")

    def __init__(self, sample_rate, n_channels, sample_width, samples,
                 is_float=False):
        if sample_rate <= 0 or n_channels <= 0:
            raise ValueError(
                f"bad audio shape: rate={sample_rate} ch={n_channels}"
            )
        if len(samples) % n_channels:
            raise ValueError(
                f"{len(samples)} samples not divisible by "
                f"{n_channels} channels"
            )
        self.sample_rate = int(sample_rate)
        self.n_channels = int(n_channels)
        self.sample_width = int(sample_width)
        self.is_float = bool(is_float)
        self.samples = list(samples)

    @property
    def n_frames(self) -> int:
        return len(self.samples) // self.n_channels

    @property
    def duration_ms(self) -> int:
        return self.n_frames * 1000 // self.sample_rate

    def channel(self, c: int) -> list:
        return self.samples[c :: self.n_channels]

    def to_mono(self) -> "SimpleAudio":
        """Channel-mean downmix. Integer formats use floor division
        (exact, oracle-recomputable); float formats a plain mean."""
        if self.n_channels == 1:
            return self
        n = self.n_channels
        if self.is_float:
            mono = [
                sum(self.samples[i : i + n]) / n
                for i in range(0, len(self.samples), n)
            ]
        else:
            mono = [
                sum(self.samples[i : i + n]) // n
                for i in range(0, len(self.samples), n)
            ]
        return SimpleAudio(
            self.sample_rate, 1, self.sample_width, mono, self.is_float
        )

    def resample(self, target_rate: int) -> "SimpleAudio":
        """Nearest-neighbor resample: output frame i reads source
        frame i*srcN // dstN (the imagecodec resize mapping on the
        time axis). Deterministic, integer-only index math; no
        filtering — this is the decode-side sanity kernel, a real
        DSP resampler drops into the same slot."""
        if target_rate <= 0:
            raise ValueError(f"bad target rate {target_rate}")
        src_n = self.n_frames
        dst_n = src_n * target_rate // self.sample_rate
        ch = self.n_channels
        out = []
        for i in range(dst_n):
            base = (i * src_n // dst_n) * ch
            out.extend(self.samples[base : base + ch])
        return SimpleAudio(
            target_rate, ch, self.sample_width, out, self.is_float
        )


def _decode_samples(raw: bytes, width: int, is_float: bool) -> list:
    if is_float:
        fmt = _FLOAT_FMT.get(width)
        if fmt is None:
            raise ValueError(f"unsupported float sample width {width}")
        n = len(raw) // width
        return list(struct.unpack(f"<{n}{fmt[1]}", raw[: n * width]))
    if width == 1:
        return list(raw)  # 8-bit PCM is unsigned by spec
    if width == 3:
        return [
            int.from_bytes(raw[i : i + 3], "little", signed=True)
            for i in range(0, len(raw) - len(raw) % 3, 3)
        ]
    fmt = _INT_FMT.get(width)
    if fmt is None:
        raise ValueError(f"unsupported PCM sample width {width}")
    n = len(raw) // width
    return list(struct.unpack(f"<{n}{fmt[1]}", raw[: n * width]))


def decode(payload: bytes) -> SimpleAudio:
    """Decode a RIFF/WAVE payload. Walks the chunk list (skipping
    unknown chunks and pad bytes), requires a PCM or IEEE-float fmt,
    and returns exact sample values."""
    b = bytes(payload or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, n_ch, rate, _byte_rate, _block, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag == _EXTENSIBLE:
                # SubFormat GUID's leading u16 is the real format tag
                if size < 40:
                    raise ValueError("extensible fmt chunk too short")
                (tag,) = struct.unpack_from("<H", body, 24)
            fmt = (tag, n_ch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt or data chunk")
    tag, n_ch, rate, bits = fmt
    if tag not in (_PCM, _IEEE_FLOAT):
        raise ValueError(f"unsupported WAVE format tag {tag}")
    if bits % 8 or bits == 0:
        raise ValueError(f"unsupported bit depth {bits}")
    width = bits // 8
    is_float = tag == _IEEE_FLOAT
    samples = _decode_samples(data, width, is_float)
    # drop a trailing partial frame rather than mis-align channels
    samples = samples[: len(samples) - len(samples) % n_ch]
    return SimpleAudio(rate, n_ch, width, samples, is_float)


def encode_wav(audio: SimpleAudio) -> bytes:
    """Deterministic minimal WAV: RIFF header + fmt + data, nothing
    else. Byte-stable for identical inputs in every environment."""
    width = audio.sample_width
    if audio.is_float:
        if width not in _FLOAT_FMT:
            raise ValueError(f"unsupported float sample width {width}")
        tag = _IEEE_FLOAT
        raw = struct.pack(
            f"<{len(audio.samples)}{_FLOAT_FMT[width][1]}", *audio.samples
        )
    elif width == 1:
        tag = _PCM
        raw = bytes(max(0, min(255, int(s))) for s in audio.samples)
    elif width == 3:
        tag = _PCM
        raw = b"".join(
            int(s).to_bytes(3, "little", signed=True)
            for s in audio.samples
        )
    elif width in _INT_FMT:
        tag = _PCM
        raw = struct.pack(
            f"<{len(audio.samples)}{_INT_FMT[width][1]}",
            *[int(s) for s in audio.samples],
        )
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    block = audio.n_channels * width
    fmt_body = struct.pack(
        "<HHIIHH",
        tag,
        audio.n_channels,
        audio.sample_rate,
        audio.sample_rate * block,
        block,
        width * 8,
    )
    data_size = len(raw)
    riff_size = 4 + (8 + len(fmt_body)) + (8 + data_size)
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", riff_size),
            b"WAVE",
            b"fmt ",
            struct.pack("<I", len(fmt_body)),
            fmt_body,
            b"data",
            struct.pack("<I", data_size),
            raw,
        ]
    )
