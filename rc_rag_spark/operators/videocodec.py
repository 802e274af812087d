"""Stdlib-only video codec: YUV4MPEG2 (.y4m) decode + encode.

Closes the last "decode is a byte slice" note in the multimodal
surface the same way imagecodec.py (PNG/PNM) and audiocodec.py
(RIFF/WAVE) did: Y4M is a real, public, uncompressed interchange
format (mjpegtools lineage; what ffmpeg emits with `-f yuv4mpeg`) —
a plain-text stream header, then one "FRAME\\n" marker + raw planar
YUV per frame. No entropy coding, so `bytes` + a header parser decode
it exactly, with no third-party deps.

Supported:
  - Stream header: W/H (required), F fps ratio, I interlace, A aspect,
    C colorspace — Cmono (luma only), C420/C420jpeg/C420mpeg2/C420paldv
    (4:2:0 chroma), C444 (full chroma). Unknown X params skipped.
  - FRAME headers with optional parameters (ignored, per spec).
  - Decode returns frames as imagecodec.SimpleImage rasters: mode 'L'
    (the luma plane — chroma retained separately for C420/C444), so
    every existing image op (resize, PNG re-encode) applies per frame.
  - Encode: deterministic minimal stream (header + FRAME markers),
    byte-stable for identical inputs.

Scale note: like the image/audio codecs this runs inside Arrow-batched
mapInPandas workers (operators/multimodal.py) — per-payload cost is
bounded by clip size, payloads never cross the driver, and a faster
kernel (PyAV/ffmpeg) drops into the same slot when present.
"""

from __future__ import annotations

from rc_rag_spark.operators.imagecodec import SimpleImage

_MAGIC = b"YUV4MPEG2"

# chroma subsampling: plane size divisors (w_div, h_div) per colorspace
_CHROMA = {
    "mono": None,
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "444": (1, 1),
}


class SimpleVideo:
    """Minimal in-memory clip: size (w, h), fps as an exact (num, den)
    ratio, colorspace tag, and `frames` — a list of SimpleImage 'L'
    rasters (luma); `chroma` holds the (u_plane, v_plane) bytes per
    frame for non-mono colorspaces (empty tuple list for mono)."""

    __slots__ = ("size", "fps", "colorspace", "frames", "chroma")

    def __init__(self, size, fps=(25, 1), colorspace="mono",
                 frames=None, chroma=None):
        w, h = size
        if w <= 0 or h <= 0:
            raise ValueError(f"bad frame size {size}")
        if colorspace not in _CHROMA:
            raise ValueError(f"unsupported colorspace C{colorspace}")
        self.size = (int(w), int(h))
        self.fps = (int(fps[0]), int(fps[1]))
        self.colorspace = colorspace
        self.frames = list(frames or [])
        self.chroma = list(chroma or [])

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def duration_ms(self) -> int:
        num, den = self.fps
        return self.n_frames * 1000 * den // num if num else 0


def _parse_header(line: bytes):
    parts = line.split(b" ")
    if parts[0] != _MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    cs = "420"  # the format's default when C is absent
    for p in parts[1:]:
        if not p:
            continue
        tag, val = p[:1], p[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif tag == b"C":
            cs = val.decode("ascii")
            if cs not in _CHROMA:
                raise ValueError(f"unsupported colorspace C{cs}")
        # I (interlace), A (aspect), X (extensions): no effect on
        # plane layout — skipped
    if not w or not h:
        raise ValueError("Y4M header missing W or H")
    return w, h, fps, cs


def decode(payload: bytes) -> SimpleVideo:
    """Decode a YUV4MPEG2 payload: header line, then FRAME records of
    raw planar YUV. Truncated trailing frames are rejected, not
    silently padded."""
    b = bytes(payload or b"")
    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    w, h, fps, cs = _parse_header(b[:nl])
    div = _CHROMA[cs]
    y_size = w * h
    if div is None:
        c_size = 0
    else:
        c_size = (w // div[0]) * (h // div[1])
    frames, chroma = [], []
    pos = nl + 1
    while pos < len(b):
        fnl = b.find(b"\n", pos)
        if fnl < 0 or b[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        # FRAME may carry parameters after a space — ignored per spec
        pos = fnl + 1
        end = pos + y_size + 2 * c_size
        if end > len(b):
            raise ValueError("truncated frame payload")
        frames.append(SimpleImage("L", (w, h), b[pos : pos + y_size]))
        if c_size:
            u = b[pos + y_size : pos + y_size + c_size]
            v = b[pos + y_size + c_size : end]
            chroma.append((u, v))
        pos = end
    return SimpleVideo((w, h), fps, cs, frames, chroma)


def encode_y4m(video: SimpleVideo) -> bytes:
    """Deterministic minimal Y4M: header with W/H/F/Ip/A1:1/C, then
    FRAME + planes. Byte-stable for identical inputs."""
    w, h = video.size
    div = _CHROMA[video.colorspace]
    c_size = 0 if div is None else (w // div[0]) * (h // div[1])
    out = [
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n"
        % (w, h, video.fps[0], video.fps[1],
           video.colorspace.encode("ascii"))
    ]
    for i, fr in enumerate(video.frames):
        if fr.mode != "L" or fr.size != (w, h):
            raise ValueError(
                f"frame {i} is {fr.mode}{fr.size}, stream wants L({w},{h})"
            )
        out.append(b"FRAME\n")
        out.append(fr.data)
        if div is not None:
            if i >= len(video.chroma):
                raise ValueError(f"frame {i} missing chroma planes")
            u, v = video.chroma[i]
            if len(u) != c_size or len(v) != c_size:
                raise ValueError(f"frame {i} chroma plane size mismatch")
            out.append(u)
            out.append(v)
    return b"".join(out)
