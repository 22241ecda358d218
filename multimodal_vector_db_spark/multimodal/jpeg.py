"""Baseline JPEG (JFIF) codec — pure numpy + stdlib, zero dependencies.

The reference decodes images with PIL (``image_embedder.py:154-157``);
PIL is absent in this container. This module implements the baseline
sequential DCT JPEG process end-to-end — enough to encode and decode
real JFIF files:

- **Encoder**: level shift → 8×8 forward DCT (type-II, orthonormal) →
  quantization (standard Annex-K tables scaled by a quality factor) →
  zig-zag → DC DPCM + AC run-length → canonical Huffman (Annex-K
  tables) → JFIF byte stream with 0xFF stuffing.
- **Decoder**: marker parse (DQT/SOF0/DHT/SOS/DRI) → Huffman decode →
  de-zig-zag → dequantize → inverse DCT → level shift → clip, with
  restart-marker support and 4:4:4 / grayscale subsampling (the
  encoder emits 4:4:4; 4:2:0 files from other encoders are out of
  scope and raise).

Color images use the JFIF YCbCr transform (BT.601 full-range) on both
sides. JPEG is lossy: round-trips are exact only for inputs whose
blocks quantize losslessly (e.g. images uniform within each 8×8 block
— the property the oracle query exploits); general inputs round-trip
within a PSNR bound (property-tested).
"""

from __future__ import annotations

import struct

import numpy as np

# -- zig-zag order -----------------------------------------------------------

_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# -- Annex-K quantization tables (luminance / chrominance) -------------------

_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 → base table, 100 → all ones."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = np.floor((base * s + 50) / 100)
    return np.clip(qt, 1, 255)


# -- Annex-K Huffman tables --------------------------------------------------
# (bits[i] = number of codes of length i+1, then the symbol values)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) → symbol."""
    return {
        (ln, code): sym for sym, (code, ln) in _build_codes(bits, vals).items()
    }


# -- DCT ---------------------------------------------------------------------

def _dct_matrix() -> np.ndarray:
    n = 8
    M = np.zeros((n, n))
    for k in range(n):
        c = np.sqrt(1.0 / n) if k == 0 else np.sqrt(2.0 / n)
        M[k] = c * np.cos((2 * np.arange(n) + 1) * k * np.pi / (2 * n))
    return M


_DCT = _dct_matrix()


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial → DCT coefficients (orthonormal type-II)."""
    return _DCT @ blocks @ _DCT.T


def _idct(blocks: np.ndarray) -> np.ndarray:
    return _DCT.T @ blocks @ _DCT


# -- bit IO ------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG bitstream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                # stuffed zero must follow inside entropy data
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("unexpected marker in entropy data")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """Value → (size category, appended bits) per JPEG F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Appended bits → signed value (JPEG F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# -- encoder -----------------------------------------------------------------

def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def _encode_component(
    plane: np.ndarray,
    qt: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    writer: _BitWriter,
    pred: int,
) -> int:
    h, w = plane.shape
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1:h, :]  # edge replicate
    padded[:, w:] = padded[:, w - 1:w]
    q8 = qt.reshape(8, 8)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by:by + 8, bx:bx + 8] - 128.0
            coef = np.round(_fdct(block[None])[0] / q8).astype(np.int64)
            zz = coef.reshape(64)[_ZZ]
            # DC
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            size, bits = _magnitude(diff)
            code, ln = dc_codes[size]
            writer.write(code, ln)
            if size:
                writer.write(bits, size)
            # AC with run-lengths
            run = 0
            last_nz = 0
            nz = np.nonzero(zz[1:])[0]
            last_nz = (nz[-1] + 1) if len(nz) else 0
            for i in range(1, last_nz + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    writer.write(code, ln)
                    run -= 16
                size, bits = _magnitude(v)
                code, ln = ac_codes[(run << 4) | size]
                writer.write(code, ln)
                writer.write(bits, size)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]  # EOB
                writer.write(code, ln)
    return pred


def _huff_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """(H, W) grayscale or (H, W, 3) RGB uint8 → baseline JFIF bytes
    (4:4:4, Annex-K Huffman tables, IJG quality scaling)."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qt_l = _scaled_qt(_QT_LUMA, quality)
    qt_c = _scaled_qt(_QT_CHROMA, quality)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    # DQT (table 0 = luma; table 1 = chroma when color)
    zz_l = qt_l.reshape(64)[_ZZ].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_l
    if not gray:
        zz_c = qt_c.reshape(64)[_ZZ].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + zz_c
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, 0x11, 0])  # comp 1: 1x1, QT 0
    if not gray:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT
    out += _huff_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _huff_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        out += _huff_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _huff_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    # SOS
    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos = bytes([ncomp, 1, 0x00, 2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    writer = _BitWriter()
    dc_l = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    if gray:
        _encode_component(
            arr.astype(np.float64), qt_l, dc_l, ac_l, writer, 0
        )
    else:
        ycc = _rgb_to_ycbcr(arr)
        dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
        ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
        # 4:4:4, non-interleaved would need separate scans; baseline
        # interleaves MCUs — with 1x1 sampling an MCU is one block of
        # each component, so encode block-by-block interleaved:
        ph = (h + 7) // 8 * 8
        pw = (w + 7) // 8 * 8
        planes = []
        for ci in range(3):
            p = np.empty((ph, pw))
            p[:h, :w] = ycc[:, :, ci]
            p[h:, :w] = ycc[h - 1:h, :, ci]
            p[:, w:] = p[:, w - 1:w]
            planes.append(p)
        qts = [qt_l.reshape(8, 8), qt_c.reshape(8, 8), qt_c.reshape(8, 8)]
        dcs = [dc_l, dc_c, dc_c]
        acs = [ac_l, ac_c, ac_c]
        preds = [0, 0, 0]
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for ci in range(3):
                    block = planes[ci][by:by + 8, bx:bx + 8] - 128.0
                    coef = np.round(
                        _fdct(block[None])[0] / qts[ci]
                    ).astype(np.int64)
                    zz = coef.reshape(64)[_ZZ]
                    diff = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                    size, bits = _magnitude(diff)
                    code, ln = dcs[ci][size]
                    writer.write(code, ln)
                    if size:
                        writer.write(bits, size)
                    run = 0
                    nzi = np.nonzero(zz[1:])[0]
                    last_nz = (nzi[-1] + 1) if len(nzi) else 0
                    for i in range(1, last_nz + 1):
                        v = int(zz[i])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = acs[ci][0xF0]
                            writer.write(code, ln)
                            run -= 16
                        size, bits = _magnitude(v)
                        code, ln = acs[ci][(run << 4) | size]
                        writer.write(code, ln)
                        writer.write(bits, size)
                        run = 0
                    if last_nz < 63:
                        code, ln = acs[ci][0x00]
                        writer.write(code, ln)
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder -----------------------------------------------------------------

def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 array (H, W) or (H, W, 3).

    Supports: baseline sequential DCT (SOF0), 8-bit, 1 or 3
    components with 1×1 sampling (4:4:4 — what :func:`encode_jpeg`
    emits), restart intervals. Progressive (SOF2), arithmetic coding,
    and subsampled chroma raise ValueError — route those to the
    PIL-gated path."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = None
    restart = 0
    scan_comps: list[dict] = []
    entropy = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", content[pos + 2:pos + 4])
        data = content[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64)
                tbl[_ZZ] = np.frombuffer(
                    data[p:p + 64], dtype=np.uint8
                ).astype(np.float64)
                qts[tq] = tbl.reshape(8, 8)
                p += 64
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", data[:6])
            p = 6
            for _ in range(nc):
                cid, samp, tq = data[p], data[p + 1], data[p + 2]
                if samp != 0x11:
                    raise ValueError(
                        "subsampled JPEG unsupported (4:4:4 only)"
                    )
                comps.append({"id": cid, "tq": tq})
                p += 3
        elif marker in (0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 0xF
                bits = list(data[p + 1:p + 17])
                nv = sum(bits)
                vals = list(data[p + 17:p + 17 + nv])
                tab = _build_decode(bits, vals)
                if tc == 0:
                    dc_tabs[th] = tab
                else:
                    ac_tabs[th] = tab
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            ns = data[0]
            p = 1
            for _ in range(ns):
                cid, tabs = data[p], data[p + 1]
                comp = next(c for c in comps if c["id"] == cid)
                scan_comps.append(
                    {**comp, "dc": tabs >> 4, "ac": tabs & 0xF}
                )
                p += 2
            entropy_start = pos + 2 + seglen
            # entropy data runs to the next real marker (skip stuffed
            # FF00 and restart markers)
            q = entropy_start
            while q + 1 < len(content):
                if content[q] == 0xFF and content[q + 1] not in (
                    0x00, *range(0xD0, 0xD8)
                ):
                    break
                q += 1
            entropy = content[entropy_start:q]
            pos = q
            continue
        pos += 2 + seglen
    if h is None or entropy is None:
        raise ValueError("JPEG missing SOF0/SOS")

    nc = len(scan_comps)
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    n_mcu = (ph // 8) * (pw // 8)
    planes = [np.zeros((ph, pw)) for _ in range(nc)]

    def read_symbol(reader: _BitReader, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    segments = [entropy]
    if restart:
        # split on restart markers FFD0..FFD7
        segments = []
        cur = bytearray()
        q = 0
        while q < len(entropy):
            if (
                entropy[q] == 0xFF
                and q + 1 < len(entropy)
                and 0xD0 <= entropy[q + 1] <= 0xD7
            ):
                segments.append(bytes(cur))
                cur = bytearray()
                q += 2
            else:
                cur.append(entropy[q])
                q += 1
        segments.append(bytes(cur))

    mcu = 0
    for seg in segments:
        reader = _BitReader(seg)
        preds = [0] * nc
        limit = mcu + restart if restart else n_mcu
        while mcu < min(limit, n_mcu):
            by = (mcu // (pw // 8)) * 8
            bx = (mcu % (pw // 8)) * 8
            for ci, sc in enumerate(scan_comps):
                zz = np.zeros(64, dtype=np.float64)
                size = read_symbol(reader, dc_tabs[sc["dc"]])
                diff = _extend(reader.read_bits(size), size)
                preds[ci] += diff
                zz[0] = preds[ci]
                i = 1
                while i < 64:
                    rs = read_symbol(reader, ac_tabs[sc["ac"]])
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            i += 16
                            continue
                        break  # EOB
                    i += r
                    if i > 63:
                        raise ValueError("AC run past block end")
                    zz[i] = _extend(reader.read_bits(s), s)
                    i += 1
                coef = np.zeros(64)
                coef[_ZZ] = zz
                block = _idct(
                    (coef.reshape(8, 8) * qts[sc["tq"]])[None]
                )[0] + 128.0
                planes[ci][by:by + 8, bx:bx + 8] = block
            mcu += 1

    if nc == 1:
        return np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(
        planes[0][:h, :w], planes[1][:h, :w], planes[2][:h, :w]
    )
