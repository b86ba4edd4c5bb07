"""Pure-numpy baseline JPEG codec for the ``_minicodec`` fallback.

JPEG is the majority container of any real multimodal corpus, so the
PIL-less sandbox path needs at least the baseline profile: this module
implements a self-contained BASELINE SEQUENTIAL (SOF0/SOF1, 8-bit,
Huffman) decoder — grayscale and 3-component YCbCr with arbitrary
4:4:4 / 4:2:2 / 4:2:0 style sampling factors and restart markers — and
a baseline 4:4:4 encoder with IJG-quality-scaled Annex K quantization
tables. Everything outside the baseline profile (progressive SOF2,
arithmetic coding, 12-bit precision, hierarchical, CMYK) FAILS LOUD
with a precise message, per the engine's no-silent-degradation rule.

All algorithms are from the public JPEG standard (ITU-T T.81 / ISO
10918-1) and the JFIF spec: canonical Huffman decode (F.16), DC
prediction + EXTEND (F.12), zigzag, 8x8 type-II DCT as an orthonormal
matrix product, byte stuffing (FF 00), RSTn predictor resets. The
Huffman/quant tables the ENCODER uses are written into the stream's
DQT/DHT segments, and the DECODER always reads tables from the stream
— so decode correctness never depends on table choice.

Performance note: entropy decode is a per-symbol Python loop (Huffman
is inherently sequential); everything after the symbol stream —
dequantize, IDCT, upsample, color transform — is vectorized numpy over
all blocks at once. Fine for the actor-pool decode stages' thumbnails
and fixtures; a real deployment vendors PIL/turbojpeg and this module
is only the guaranteed-present floor.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]


# -- shared constants -------------------------------------------------------

def _zigzag() -> np.ndarray:
    """Zigzag scan order: ZIG[k] = row-major index of coefficient k."""
    out = []
    for s in range(16):
        ii = range(s + 1) if s % 2 == 1 else reversed(range(s + 1))
        for i in ii:
            j = s - i
            if i < 8 and j < 8:
                out.append(i * 8 + j)
    return np.array(out, np.int64)


ZIG = _zigzag()
UNZIG = np.argsort(ZIG)

# orthonormal 8-point DCT-II basis: F = M @ f @ M.T, f = M.T @ F @ M
_M = np.array([[np.cos((2 * n + 1) * k * np.pi / 16)
                * (np.sqrt(0.5) if k == 0 else 1.0) * 0.5
                for n in range(8)] for k in range(8)])

# Annex K quantization tables (zigzag-ordered at use time)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int64)

# Annex K typical Huffman tables (bits[1..16], values). Only used by
# the ENCODER; they are emitted into DHT so any valid table would
# interoperate — table choice affects size, never correctness.
_DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_VALS = list(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
_AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_L_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_C_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

assert sum(_AC_L_BITS) == len(_AC_L_VALS) == 162
assert sum(_AC_C_BITS) == len(_AC_C_VALS) == 162


# -- Huffman ----------------------------------------------------------------

def _canonical_codes(bits, vals):
    """(code, length) per value in canonical JPEG order."""
    codes, code, k = [], 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes.append((vals[k], code, length))
            k += 1
            code += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical Huffman decode via the F.16 min/max-code tables."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, bits, vals):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if code <= self.maxcode[length]:
                return self.vals[self.valptr[length]
                                 + code - self.mincode[length]]
        raise ValueError("minijpeg: invalid Huffman code in scan")


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                # past-the-end pad bits read as 1 (T.81 F.2.2.5 allows
                # the final byte's pad; decoding never depends on them)
                return 1
            self.buf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    """EXTEND (T.81 F.12): map the s low-order bits to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# -- decoder ----------------------------------------------------------------

def decode_jpeg(data: bytes):
    """Decode baseline-sequential JPEG bytes -> (uint8 array, mode).

    mode is "L" (1 component) or "RGB" (3-component YCbCr, JFIF color
    transform). Raises ValueError with the offending profile feature
    for anything outside baseline Huffman 8-bit."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("minijpeg: not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise ValueError(f"minijpeg: expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:            # fill byte padding before a marker
            pos -= 1
            continue
        if marker == 0xD9:            # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                  # standalone markers
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:            # DQT (possibly several tables)
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 15
                if pq != 0:
                    raise ValueError(
                        "minijpeg: 16-bit quantization tables "
                        "(Pq=1) are outside the baseline profile")
                qt[tq] = np.frombuffer(seg[sp + 1:sp + 65],
                                       np.uint8).astype(np.int64)
                sp += 65
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (both sequential DCT)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(
                    f"minijpeg: {prec}-bit precision unsupported "
                    f"(baseline is 8-bit)")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            kind = {0xC2: "progressive", 0xC3: "lossless",
                    0xC9: "arithmetic", 0xCA: "progressive arithmetic",
                    0xCB: "lossless arithmetic"}.get(
                        marker, f"SOF{marker - 0xC0}")
            raise ValueError(
                f"minijpeg: {kind} JPEG unsupported — only baseline "
                f"sequential Huffman (SOF0/SOF1); re-encode or install "
                f"pillow")
        elif marker == 0xC4:          # DHT (possibly several tables)
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 15
                bits = list(seg[sp + 1:sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17:sp + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                sp += 17 + nv
        elif marker == 0xDD:          # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:          # SOS -> entropy data follows
            if frame is None:
                raise ValueError("minijpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i:3 + 2 * i]
                scan.append((cid, tt >> 4, tt & 15))
            end = _scan_end(data, pos)
            arr = _decode_scan(data[pos:end], frame, scan, qt, huff,
                               restart_interval)
            return arr
        # all other markers (APPn, COM) are skipped
    raise ValueError("minijpeg: no SOS scan found")


def _scan_end(data: bytes, pos: int) -> int:
    """Index of the first non-RST marker after the entropy data."""
    i = pos
    n = len(data)
    while i < n - 1:
        if data[i] == 0xFF and data[i + 1] != 0x00 \
                and not (0xD0 <= data[i + 1] <= 0xD7):
            return i
        i += 1
    return n


def _destuff_segments(scan: bytes):
    """Split entropy bytes at RSTn markers, removing FF 00 stuffing."""
    segs, cur = [], bytearray()
    i, n = 0, len(scan)
    while i < n:
        b = scan[i]
        if b == 0xFF and i + 1 < n:
            nxt = scan[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs


def _decode_scan(scan: bytes, frame, scan_comps, qt, huff,
                 restart_interval: int) -> tuple[np.ndarray, str]:
    h, w, comps = frame
    if len(comps) not in (1, 3):
        raise ValueError(
            f"minijpeg: {len(comps)}-component JPEG unsupported "
            f"(grayscale or YCbCr only; CMYK needs pillow)")
    if len(scan_comps) != len(comps):
        # legal baseline (separate per-component scans) but outside
        # this decoder's single-interleaved-scan support — fail with
        # the promised precise message, never a KeyError downstream
        raise ValueError(
            f"minijpeg: non-interleaved JPEG unsupported (scan covers "
            f"{len(scan_comps)} of {len(comps)} components; this "
            f"decoder handles one interleaved scan) — install pillow")
    if len(comps) == 1:
        # a single-component scan is non-interleaved by definition
        # (T.81 A.2.2: the data unit is one 8x8 block; declared
        # sampling factors do not tile the MCU)
        cid, _hs, _vs, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    tables = {cid: (dc, ac) for cid, dc, ac in scan_comps}
    if set(tables) != {c[0] for c in comps}:
        raise ValueError(
            "minijpeg: scan component ids do not match the frame's")

    # per-component coefficient storage: (blocks_y, blocks_x, 64)
    planes = {}
    for cid, hs, vs, tq in comps:
        planes[cid] = np.zeros((mcuy * vs, mcux * hs, 64), np.int64)

    segs = _destuff_segments(scan)
    seg_i = 0
    br = _BitReader(segs[0])
    pred = {cid: 0 for cid, _, _, _ in comps}
    since_restart = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and since_restart == restart_interval:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError(
                        "minijpeg: scan ended before all restart "
                        "intervals were decoded")
                br = _BitReader(segs[seg_i])
                pred = {cid: 0 for cid, _, _, _ in comps}
                since_restart = 0
            for cid, hs, vs, tq in comps:
                dct, act = tables[cid]
                dc_dec = huff[(0, dct)]
                ac_dec = huff[(1, act)]
                for by in range(vs):
                    for bx in range(hs):
                        coef = planes[cid][my * vs + by, mx * hs + bx]
                        s = dc_dec.decode(br)
                        pred[cid] += _extend(br.read_bits(s), s)
                        coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = ac_dec.decode(br)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16          # ZRL
                                    continue
                                break                # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "minijpeg: AC run past block end")
                            coef[k] = _extend(br.read_bits(s), s)
                            k += 1
            since_restart += 1

    # dequantize + IDCT, vectorized across every block of a component
    out_planes = {}
    for cid, hs, vs, tq in comps:
        if tq not in qt:
            raise ValueError(f"minijpeg: missing DQT table {tq}")
        coefs = planes[cid] * qt[tq][None, None, :]     # zigzag order
        by, bx = coefs.shape[:2]
        blocks = coefs[:, :, UNZIG].reshape(by, bx, 8, 8)
        # f = M.T @ F @ M over all blocks at once
        pix = np.einsum("ki,yxkl,lj->yxij", _M, blocks, _M) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full MCU grid resolution (nearest)
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                              hmax // hs, axis=1)
        out_planes[cid] = plane[:h, :w]
    arrs = [out_planes[cid] for cid, _, _, _ in comps]
    if len(arrs) == 1:
        return (np.clip(np.rint(arrs[0]), 0, 255).astype(np.uint8), "L")
    y, cb, cr = arrs
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.rint(np.stack([r, g, b], axis=2)), 0,
                  255).astype(np.uint8)
    return rgb, "RGB"


# -- encoder ----------------------------------------------------------------

class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)      # byte stuffing
                self.buf = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.buf = (self.buf << pad) | ((1 << pad) - 1)
            self.out.append(self.buf)
            if self.buf == 0xFF:
                self.out.append(0x00)
            self.buf = 0
            self.nbits = 0
        return bytes(self.out)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _dht_segment(tc: int, th: int, bits, vals) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body


def _size_of(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(arr: np.ndarray, quality: int = 75) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline 4:4:4 JFIF JPEG with Annex K tables at ``quality``."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        raise ValueError(
            f"minijpeg: encode expects (h, w) or (h, w, 3) uint8, got "
            f"shape {arr.shape}")
    h, w = planes[0].shape
    if h == 0 or w == 0:
        raise ValueError("minijpeg: cannot encode an empty image")
    ql = _quality_scale(_QL, quality)[ZIG]     # zigzag-ordered
    qc = _quality_scale(_QC, quality)[ZIG]
    nc = len(planes)

    enc_dc = [_canonical_codes(_DC_L_BITS, _DC_L_VALS),
              _canonical_codes(_DC_C_BITS, _DC_C_VALS)]
    enc_ac = [_canonical_codes(_AC_L_BITS, _AC_L_VALS),
              _canonical_codes(_AC_C_BITS, _AC_C_VALS)]
    dc_lut = [{v: (c, le) for v, c, le in t} for t in enc_dc]
    ac_lut = [{v: (c, le) for v, c, le in t} for t in enc_ac]

    # header segments
    out = bytearray(b"\xFF\xD8")
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" \
        + bytes(ql.tolist())
    if nc == 3:
        out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x01" \
            + bytes(qc.tolist())
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])   # 4:4:4
    out += b"\xFF\xC0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_L_BITS, _DC_L_VALS)
    out += _dht_segment(1, 0, _AC_L_BITS, _AC_L_VALS)
    if nc == 3:
        out += _dht_segment(0, 1, _DC_C_BITS, _DC_C_VALS)
        out += _dht_segment(1, 1, _AC_C_BITS, _AC_C_VALS)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos

    # quantized zigzag coefficients for every block of every plane
    by, bx = -(-h // 8), -(-w // 8)
    qcoefs = []
    for ci, plane in enumerate(planes):
        padded = np.pad(plane, ((0, by * 8 - h), (0, bx * 8 - w)),
                        mode="edge") - 128.0
        blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        F = np.einsum("ik,yxkl,jl->yxij", _M, blocks, _M)
        q = (ql if ci == 0 else qc)[UNZIG].reshape(8, 8)
        qz = np.rint(F / q[None, None]).astype(np.int64) \
            .reshape(by, bx, 64)[:, :, ZIG]
        qcoefs.append(qz)

    bw = _BitWriter()
    pred = [0] * nc
    for yb in range(by):
        for xb in range(bx):
            for ci in range(nc):
                t = 0 if ci == 0 else 1
                coef = qcoefs[ci][yb, xb]
                diff = int(coef[0]) - pred[ci]
                pred[ci] = int(coef[0])
                s = _size_of(diff)
                code, ln = dc_lut[t][s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0
                             else diff + (1 << s) - 1, s)
                run = 0
                last_nz = int(np.max(np.nonzero(coef)[0])) \
                    if np.any(coef[1:]) else 0
                for k in range(1, 64):
                    v = int(coef[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_lut[t][0xF0]     # ZRL
                        bw.write(code, ln)
                        run -= 16
                    s = _size_of(v)
                    code, ln = ac_lut[t][(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                    if k == last_nz:
                        break
                if last_nz < 63:
                    code, ln = ac_lut[t][0x00]         # EOB
                    bw.write(code, ln)
    out += bw.flush()
    out += b"\xFF\xD9"
    return bytes(out)
