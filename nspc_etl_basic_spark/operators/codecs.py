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
    """Identify a payload by magic bytes: 'png', 'jpeg', 'wav', or None."""
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
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
# JPEG (baseline DCT, grayscale) — JPEG is the dominant real-corpus image
# format; this closes the round-3 gap where JPEG payloads fell back to the
# fake kernel. Full baseline pipeline: canonical Huffman (spec Annex K
# default luminance tables), zigzag, dequantization, separable float
# IDCT, level shift — so ANY single-component baseline JFIF decodes, not
# just our own encoder's output. Scope (extended since): 8-bit grayscale
# AND 3-component YCbCr (4:4:4/4:2:2/4:2:0), DRI/RSTn restart intervals;
# still no progressive/arithmetic/CMYK (ValueError routes the caller to
# its fallback tier, same contract as decode_png).
# ---------------------------------------------------------------------------

#: zigzag scan: stream position -> natural (row-major) coefficient index
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: default luminance Huffman tables (JPEG spec Annex K.3.3 — public
#: constants): (bits[1..16], symbol values)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


def _dct_matrix() -> np.ndarray:
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    c = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    c[0] /= np.sqrt(2.0)
    return c  # F = C @ f @ C.T ; f = C.T @ F @ C


_DCT_C = _dct_matrix()


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-pad to byte edge
        return bytes(self.buf)

    def restart(self, m: int) -> None:
        """Byte-align (1-pad) and emit RSTm — markers go in RAW, outside
        the stuffing discipline."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (m & 7)])


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category coding: value -> (size, appended bits)."""
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _check_quant(quant: np.ndarray | None) -> np.ndarray:
    q = np.ones((8, 8), dtype=np.int64) if quant is None else np.asarray(quant, np.int64)
    if q.shape != (8, 8) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant must be 8x8 with entries in 1..255")
    return q


def _encode_block(
    bw: "_BitWriter", block: np.ndarray, zz_q: np.ndarray,
    pred: int, dc_codes: dict, ac_codes: dict,
) -> int:
    """Forward-DCT + quantize + entropy-code one 8x8 spatial block
    (level-shifted float); returns the new DC predictor."""
    coef = _DCT_C @ block @ _DCT_C.T
    zz = np.rint(coef.reshape(64)[_ZIGZAG] / zz_q).astype(np.int64)
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    size, bits = _magnitude(diff)
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0].max() + 1) if (zz[1:] != 0).any() else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return pred


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


_APP0_JFIF = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
_DHT_BODY = (
    b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
    + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS)
)


def encode_jpeg_gray(
    arr: np.ndarray,
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) uint8 array as a baseline grayscale JFIF.

    ``quant`` is the 8x8 quantization table (natural order); default is
    all-ones — with flat 8x8 blocks that makes the round trip EXACT
    (DC-only blocks, integer coefficients), which is what keeps the
    driver query's oracle SQL-expressible. Dimensions not divisible by 8
    are edge-padded for encoding and recorded at true size in SOF0.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (what camera/webtool encoders ship for error
    resilience — and, on a real cluster, the property that lets a
    decoder parallelize within one image)."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_gray expects an (h, w) uint8 array")
    h, w = arr.shape
    q = _check_quant(quant)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(arr, ((0, ph - h), (0, pw - w)), mode="edge")

    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = 0
    zz_q = q.reshape(64)[_ZIGZAG]
    n_mcu = 0
    rst = 0
    total_mcus = (ph // 8) * (pw // 8)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            pred = _encode_block(bw, block, zz_q, pred, dc_codes, ac_codes)
            n_mcu += 1
            if (
                restart_interval
                and n_mcu % restart_interval == 0
                and n_mcu < total_mcus
            ):
                bw.restart(rst)
                rst = (rst + 1) & 7
                pred = 0

    dqt = _seg(0xFFDB, b"\x00" + bytes(int(v) for v in zz_q))
    sof = _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht = _seg(0xFFC4, _DHT_BODY)
    dri = _seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    app0 = _seg(0xFFE0, _APP0_JFIF)
    return (
        b"\xff\xd8" + app0 + dqt + sof + dht + dri + sos
        + bw.flush() + b"\xff\xd9"
    )


def encode_jpeg_color(
    arr: np.ndarray,
    subsampling: str = "420",
    quant_luma: np.ndarray | None = None,
    quant_chroma: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline YCbCr JFIF with
    4:2:0 (default — the dominant real-corpus shape) or 4:4:4 chroma
    subsampling. JFIF color transform; 2x2 box-mean chroma downsampling;
    two quant tables (luma id 0, chroma id 1), one shared Huffman pair —
    everything the decoder handles from arbitrary encoders, exercised
    from our own."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_color expects an (h, w, 3) uint8 array")
    if subsampling not in ("420", "444"):
        raise ValueError("subsampling must be '420' or '444'")
    h, w = arr.shape[:2]
    ql = _check_quant(quant_luma)
    qc = _check_quant(quant_chroma if quant_chroma is not None else quant_luma)
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    if subsampling == "420":
        sampling = [(2, 2), (1, 1), (1, 1)]
        mcu_w, mcu_h = 16, 16
        # pad to MCU grid first so the 2x2 box mean never averages
        # ragged edges
        py, px = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
        y, cb, cr = (
            np.pad(p, ((0, py - h), (0, px - w)), mode="edge")
            for p in (y, cb, cr)
        )
        cb = (cb[0::2, 0::2] + cb[1::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 1::2]) / 4.0
        cr = (cr[0::2, 0::2] + cr[1::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 1::2]) / 4.0
    else:
        sampling = [(1, 1), (1, 1), (1, 1)]
        mcu_w = mcu_h = 8
        py, px = -(-h // 8) * 8, -(-w // 8) * 8
        y, cb, cr = (
            np.pad(p, ((0, py - h), (0, px - w)), mode="edge")
            for p in (y, cb, cr)
        )

    planes = [y, cb, cr]
    zz_ql = ql.reshape(64)[_ZIGZAG]
    zz_qc = qc.reshape(64)[_ZIGZAG]
    zz_qs = [zz_ql, zz_qc, zz_qc]
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    preds = [0, 0, 0]
    mcus_x, mcus_y = px // mcu_w, py // mcu_h
    n_mcu = 0
    rst = 0
    total_mcus = mcus_x * mcus_y
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (hs, vs) in enumerate(sampling):
                for byi in range(vs):
                    for bxi in range(hs):
                        y0 = (my * vs + byi) * 8
                        x0 = (mx * hs + bxi) * 8
                        block = planes[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        preds[ci] = _encode_block(
                            bw, block, zz_qs[ci], preds[ci], dc_codes, ac_codes
                        )
            n_mcu += 1
            if (
                restart_interval
                and n_mcu % restart_interval == 0
                and n_mcu < total_mcus
            ):
                bw.restart(rst)
                rst = (rst + 1) & 7
                preds = [0, 0, 0]

    dqt = _seg(
        0xFFDB,
        b"\x00" + bytes(int(v) for v in zz_ql)
        + b"\x01" + bytes(int(v) for v in zz_qc),
    )
    comp_spec = b"".join(
        bytes([cid, (hs << 4) | vs, tq])
        for cid, (hs, vs), tq in zip([1, 2, 3], sampling, [0, 1, 1])
    )
    sof = _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3) + comp_spec)
    dht = _seg(0xFFC4, _DHT_BODY)
    dri = _seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = _seg(
        0xFFDA, b"\x03" + b"\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00"
    )
    app0 = _seg(0xFFE0, _APP0_JFIF)
    return (
        b"\xff\xd8" + app0 + dqt + sof + dht + dri + sos
        + bw.flush() + b"\xff\xd9"
    )


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; a real marker
    (0xFF followed by non-zero) ends the stream."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise EOFError("marker reached")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn at a restart boundary: drop the pad bits
        (their byte, if any, was already pulled into the accumulator)
        and step over the two marker bytes."""
        self.n = 0
        self.acc = 0
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        if b0 != 0xFF or not (0xD0 <= b1 <= 0xD7):
            raise ValueError(
                f"expected restart marker, found {b0:02x}{b1:02x}"
            )
        self.pos += 2


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for canonical tables."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln <= 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(br: _BitReader, dc_tab, ac_tab, q, pred: int):
    """One entropy-coded 8x8 block -> (spatial float block, new DC pred)."""
    zz = np.zeros(64, dtype=np.int64)
    size = _read_symbol(br, dc_tab)
    diff = _extend(br.bits(size), size) if size else 0
    pred += diff
    zz[0] = pred
    i = 1
    while i < 64:
        sym = _read_symbol(br, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        run, size = sym >> 4, sym & 0xF
        i += run
        if i > 63:
            raise ValueError("AC index overflow")
        zz[i] = _extend(br.bits(size), size)
        i += 1
    nat = np.empty(64, np.int64)
    nat[_ZIGZAG] = zz
    coef = (nat * q).reshape(8, 8).astype(np.float64)
    return _DCT_C.T @ coef @ _DCT_C + 128.0, pred


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF: grayscale -> (h, w) uint8, YCbCr color ->
    (h, w, 3) uint8 RGB.

    Handles any 1- or 3-component baseline stream with per-component
    sampling factors up to 2x2 — which covers the real-corpus shapes:
    grayscale, 4:4:4, 4:2:2 and 4:2:0 chroma subsampling (chroma planes
    upsampled by replication), arbitrary quant/Huffman tables,
    multi-segment DQT/DHT, interleaved MCU scan with per-component DC
    predictors, and DRI/RSTn restart intervals (predictors reset at each
    marker). Raises ``ValueError`` on progressive, arithmetic-coded or
    CMYK inputs so callers fall back to their stub tier; corrupt or
    truncated streams may surface as IndexError/EOFError/struct.error —
    callers treating "undecodable" as a fallback signal should catch
    broadly (see multimodal._decode_image)."""
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[tuple[int, int, int, int]] = []  # (cid, hs, vs, tq)
    scan_tabs: dict[int, tuple[int, int]] = {}
    scan_pos = None
    dri = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker stream")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(body):
                prec, tid = body[o] >> 4, body[o] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body, np.uint8, 64, o + 1).astype(np.int64)
                nat = np.empty(64, np.int64)
                nat[_ZIGZAG] = zz
                quant[tid] = nat
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0xF
                counts = list(body[o + 1 : o + 17])
                nvals = sum(counts)
                vals = list(body[o + 17 : o + 17 + nvals])
                huff[(cls, tid)] = _huff_decoder(counts, vals)
                o += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp not in (1, 3):
                raise ValueError("only 8-bit 1/3-component baseline supported")
            for ci in range(ncomp):
                cid = body[6 + ci * 3]
                hv = body[7 + ci * 3]
                comps.append((cid, hv >> 4, hv & 0xF, body[8 + ci * 3]))
            if any(hs > 2 or vs > 2 or hs < 1 or vs < 1 for _, hs, vs, _ in comps):
                raise ValueError("sampling factors above 2x2 unsupported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != len(comps):
                raise ValueError("partial/multi-scan unsupported")
            for si in range(ns):
                scan_tabs[body[1 + si * 2]] = (
                    body[2 + si * 2] >> 4,
                    body[2 + si * 2] & 0xF,
                )
            scan_pos = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_pos is None or h is None or not comps:
        raise ValueError("truncated JPEG")

    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    preds = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.empty((mcus_y * vs * 8, mcus_x * hs * 8), np.float64)
        preds[cid] = 0

    br = _BitReader(data, scan_pos)
    n_mcu = 0
    total_mcus = mcus_x * mcus_y
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, hs, vs, tq in comps:
                dc_tab = huff[(0, scan_tabs[cid][0])]
                ac_tab = huff[(1, scan_tabs[cid][1])]
                q = quant[tq]
                for byi in range(vs):
                    for bxi in range(hs):
                        block, preds[cid] = _decode_block(
                            br, dc_tab, ac_tab, q, preds[cid]
                        )
                        y0 = (my * vs + byi) * 8
                        x0 = (mx * hs + bxi) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            n_mcu += 1
            if dri and n_mcu % dri == 0 and n_mcu < total_mcus:
                br.restart()
                for cid in preds:
                    preds[cid] = 0

    if len(comps) == 1:
        plane = planes[comps[0][0]]
        return np.clip(np.rint(plane[:h, :w]), 0, 255).astype(np.uint8)

    # upsample chroma to full resolution by replication, then YCbCr->RGB
    full = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        if hs < hmax:
            p = np.repeat(p, hmax // hs, axis=1)
        if vs < vmax:
            p = np.repeat(p, vmax // vs, axis=0)
        full.append(p[:h, :w])
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Back-compat wrapper: decode and refuse non-grayscale streams."""
    out = decode_jpeg(data)
    if out.ndim != 2:
        raise ValueError("not a grayscale JPEG")
    return out


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
