"""Minimal pure-stdlib media codecs for the multimodal real-decode tier.

This container ships no image/audio libraries (no PIL/librosa), but PNG
and WAV are simple enough to decode with ``zlib`` + ``struct`` + the
stdlib ``wave`` module — enough to close the loop from opaque binary
payloads to real pixel/sample arrays without external dependencies. The
kernels in ``operators/multimodal.py`` dispatch on the payload magic:
payloads these codecs understand get a REAL decode; everything else
falls back to the deterministic stub so the distributed plumbing always
runs.

Scope (deliberate): PNG bit depth 8, color types 0/2/6 (gray/RGB/RGBA),
no interlace — the subset our own encoder emits and the overwhelmingly
common case; WAV PCM16. Out-of-scope inputs raise ``ValueError`` so the
caller's fallback logic stays explicit. When PIL is installed the
multimodal kernels prefer it; these codecs are the guaranteed floor.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def sniff_media(payload: bytes) -> str | None:
    """Identify a payload by magic bytes: 'png', 'wav', or None."""
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to a (height, width, channels) uint8 array.

    Supports bit depth 8, color types 0 (gray), 2 (RGB), 6 (RGBA), no
    interlace; all five scanline filters. Raises ``ValueError`` on
    anything else (caller falls back to the stub kernel)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, width, height, ctype, idat = 8, None, None, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype not in _CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} ctype={ctype} "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = np.frombuffer(raw, np.uint8, stride, row_off + 1).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub — inherently sequential in x
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            line += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                line[x] = (line[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = line
        prev = out[y]
    return out.reshape(height, width, ch)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a (h, w) or (h, w, {1,3,4}) uint8 array as PNG (filter 0)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(
        b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV (PCM16 via the stdlib wave module)
# ---------------------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM16 WAV to (sample_rate, int16 samples[n, channels])."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"not PCM16 (width={w.getsampwidth()})")
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
        samples = np.frombuffer(frames, dtype="<i2").reshape(
            -1, w.getnchannels()
        )
    return rate, samples


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples (1-D mono or [n, channels]) as PCM16 WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def resize_nearest(arr: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, c) array — index math only,
    deterministic across platforms (no filtering/rounding-mode variance)."""
    h, w = arr.shape[:2]
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    return arr[ys][:, xs]
