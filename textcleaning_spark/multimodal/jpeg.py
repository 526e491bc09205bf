"""Baseline JPEG (ITU-T T.81) codec in pure numpy — no PIL/libjpeg.

Round-3 shipped a real PNG codec (stdlib zlib inflate + numpy scanline
unfilter); JPEG is the remaining — and single most common — web image
format, and its baseline mode is likewise a published byte layout plus
published algorithms, all reimplementable with numpy alone:

* Encoder: JFIF APP0, Annex K quantization tables scaled by the
  standard quality formula, Annex K Huffman tables (Tables K.3-K.6),
  2-D DCT-II as one orthonormal 8×8 matrix sandwich, 4:4:4 or 4:2:0
  chroma subsampling, byte-stuffed entropy stream.
* Decoder: baseline/extended sequential DCT (SOF0/SOF1), multiple
  DQT/DHT segments, 8- and 16-bit quant tables, generic sampling
  factors (4:4:4 / 4:2:2 / 4:2:0 MCU interleave + nearest upsample),
  DRI/RSTn restart intervals, canonical Huffman decode per T.81
  F.2.2.3, IDCT, YCbCr→RGB (BT.601 full-range per JFIF).

Progressive (SOF2) and arithmetic-coded JPEGs raise ValueError — that
is a different entropy layout, and the honest boundary of "baseline".

Reference analogue: the reference ingests documents only
(text_process.py:41-47); media decode is part of the engine's
multimodal layer (SURVEY.md LLM-pipeline additions). Scale shape: both
directions run inside Arrow-batched mapInPandas kernels
(multimodal/media.py), so decoded frames never cross the JVM boundary.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# published constant tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (bits per code length 1..16, symbol values) — Tables K.3-K.6
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis M (M @ M.T = I): forward
    F = M f Mᵀ, inverse f = Mᵀ F M — exactly T.81's normalization."""
    u = np.arange(8)[:, None].astype(np.float64)
    x = np.arange(8)[None, :].astype(np.float64)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m


_DCT_M = _dct_matrix()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """Annex K table scaled by the standard quality formula."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# canonical Huffman (T.81 Annex C code assignment, F.2.2.3 decode)
# ---------------------------------------------------------------------------
def _encoder_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        sl = self.bits[self.pos : self.pos + n]
        if len(sl) < n:
            raise ValueError("truncated JPEG entropy stream")
        self.pos += n
        v = 0
        for b in sl:
            v = (v << 1) | int(b)
        return v

    def decode_huff(self, h: _HuffDecoder) -> int:
        code = 0
        for ln in range(1, 17):
            if self.pos >= len(self.bits):
                raise ValueError("truncated JPEG entropy stream")
            code = (code << 1) | int(self.bits[self.pos])
            self.pos += 1
            if h.maxcode[ln] >= 0 and code <= h.maxcode[ln]:
                return h.vals[h.valptr[ln] + code - h.mincode[ln]]
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map a SIZE-bit magnitude to its signed value."""
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


# ---------------------------------------------------------------------------
# color transforms (JFIF / BT.601 full range)
# ---------------------------------------------------------------------------
def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------
def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _encode_plane_block(
    plane: np.ndarray, by: int, bx: int, qt: np.ndarray
) -> np.ndarray:
    f = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
    coef = _DCT_M @ f @ _DCT_M.T
    zz = coef.reshape(-1)[ZIGZAG]
    return np.round(zz / qt[ZIGZAG]).astype(np.int64)


def _write_block(
    zz: np.ndarray, pred: int, dc: dict, ac: dict, bw: _BitWriter
) -> int:
    diff = int(zz[0]) - pred
    size = abs(diff).bit_length()
    code, ln = dc[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zrl, zln = ac[0xF0]
            bw.write(zrl, zln)
            run -= 16
        size = abs(v).bit_length()
        code, ln = ac[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        eob, eln = ac[0x00]
        bw.write(eob, eln)
    return int(zz[0])


def encode_jpeg(rgb: np.ndarray, quality: int = 90, subsample: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes. ``subsample=True``
    emits 4:2:0 (2×2 box-filtered chroma, the dominant web layout);
    default 4:4:4 keeps chroma full-resolution."""
    h, w, _ = rgb.shape
    hs, vs = (2, 2) if subsample else (1, 1)  # Y sampling factors
    mcu_w, mcu_h = 8 * hs, 8 * vs
    pw = -(-w // mcu_w) * mcu_w
    ph = -(-h // mcu_h) * mcu_h
    padded = np.pad(rgb.astype(np.float64), ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded)
    y_plane = ycc[..., 0]
    if subsample:
        cb = ycc[..., 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = ycc[..., 2].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        cb, cr = ycc[..., 1], ycc[..., 2]

    q_lum = _scaled_quant(Q_LUM, quality)
    q_chr = _scaled_quant(Q_CHR, quality)
    dc_l, ac_l = _encoder_codes(*DC_LUM), _encoder_codes(*AC_LUM)
    dc_c, ac_c = _encoder_codes(*DC_CHR), _encoder_codes(*AC_CHR)

    bw = _BitWriter()
    preds = [0, 0, 0]
    mcus_x, mcus_y = pw // mcu_w, ph // mcu_h
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(vs):
                for bx in range(hs):
                    zz = _encode_plane_block(
                        y_plane, my * vs + by, mx * hs + bx, q_lum
                    )
                    preds[0] = _write_block(zz, preds[0], dc_l, ac_l, bw)
            for ci, plane in ((1, cb), (2, cr)):
                zz = _encode_plane_block(plane, my, mx, q_chr)
                preds[ci] = _write_block(zz, preds[ci], dc_c, ac_c, bw)
    bw.flush()

    app0 = b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    dqt = _seg(0xFFDB, bytes([0]) + bytes(q_lum[ZIGZAG].tolist())) + _seg(
        0xFFDB, bytes([1]) + bytes(q_chr[ZIGZAG].tolist())
    )
    sof = _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )

    def dht(tc_th: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, vals = table
        return _seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

    sos = _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + _seg(0xFFE0, app0)
        + dqt
        + sof
        + dht(0x00, DC_LUM)
        + dht(0x10, AC_LUM)
        + dht(0x01, DC_CHR)
        + dht(0x11, AC_CHR)
        + sos
        + bytes(bw.out)
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
def _split_entropy(b: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``pos``: un-stuff 0xFF00, split at RSTn,
    stop at any other marker. Returns (segments, position of marker)."""
    segs: list[bytearray] = [bytearray()]
    i = pos
    n = len(b)
    while i < n:
        c = b[i]
        if c != 0xFF:
            segs[-1].append(c)
            i += 1
            continue
        m = b[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytearray())
            i += 2
        else:
            break
    return [bytes(s) for s in segs], i


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes → (h, w, 3) uint8 RGB."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[dict] = []
    h = w = None
    restart = 0
    pos = 2
    segs: list[bytes] = []
    scan_comps: list[tuple[int, int, int]] = []
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1  # fill bytes permitted between segments
            continue
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", b, pos + 2)[0]
        data = b[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 15
                i += 1
                if pq:
                    vals = np.frombuffer(data[i : i + 128], ">u2").astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(data[i : i + 64], np.uint8).astype(np.int64)
                    i += 64
                tbl = np.zeros(64, np.int64)
                tbl[ZIGZAG] = vals
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: Huffman sequential
            _, h, w, nc = struct.unpack_from(">BHHB", data, 0)
            comps = []
            for c in range(nc):
                cid, hv, tq = data[6 + c * 3 : 9 + c * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline/extended sequential Huffman JPEG supported "
                f"(SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 15
                bits = list(data[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(data[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", data, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = data[0]
            scan_comps = []
            for c in range(ns):
                cid, tabs = data[1 + c * 2], data[2 + c * 2]
                scan_comps.append((cid, tabs >> 4, tabs & 15))
            segs, pos = _split_entropy(b, pos + 2 + ln)
            break
        pos += 2 + ln
    if h is None or not scan_comps:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)
    by_id = {c["id"]: c for c in comps}
    order = []
    for cid, td, ta in scan_comps:
        c = by_id[cid]
        order.append(
            {
                "c": c,
                "dc": huff[(0, td)],
                "ac": huff[(1, ta)],
                "qt": qt[c["tq"]],
                "plane": np.zeros(
                    (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), np.float64
                ),
            }
        )

    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = [0] * len(order)
    for m in range(mcus_x * mcus_y):
        if restart and m and m % restart == 0:
            seg_idx += 1
            reader = _BitReader(segs[seg_idx])
            preds = [0] * len(order)
        my, mx = divmod(m, mcus_x)
        for oi, o in enumerate(order):
            cv, ch = o["c"]["v"], o["c"]["h"]
            for by in range(cv):
                for bx in range(ch):
                    zz = np.zeros(64, np.int64)
                    t = reader.decode_huff(o["dc"])
                    preds[oi] += _extend(reader.receive(t), t)
                    zz[0] = preds[oi]
                    k = 1
                    while k < 64:
                        rs = reader.decode_huff(o["ac"])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                break  # EOB
                            k += 16
                            continue
                        k += r
                        zz[k] = _extend(reader.receive(s), s)
                        k += 1
                    coef = np.zeros(64, np.float64)
                    coef[ZIGZAG] = (zz * o["qt"][ZIGZAG]).astype(np.float64)
                    blk = _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M + 128.0
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    o["plane"][y0 : y0 + 8, x0 : x0 + 8] = blk

    planes = []
    for o in order:
        c = o["c"]
        p = o["plane"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=-1)
    ycc = np.stack(planes[:3], axis=-1)
    rgb = _ycbcr_to_rgb(ycc)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
