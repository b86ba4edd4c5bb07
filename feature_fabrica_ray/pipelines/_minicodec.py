"""Pure-stdlib mini image/audio codec — the real-codec fallback.

PIL / soundfile are the preferred decoders for the multimodal stages
(``multimodal.py``), but neither ships in this container. This module
implements the minimal standards-compliant subset the pipeline and its
tests need, from public format specs only, with zero dependencies
beyond ``zlib`` / ``struct`` / numpy:

- PNG (ISO/IEC 15948): 8-bit gray / gray+alpha / RGB / RGBA,
  non-interlaced; all five scanline filters on decode, filter-0 on
  encode; CRC-checked chunks.
- BMP (BITMAPINFOHEADER): 24-bit uncompressed bottom-up.
- WAV (RIFF): IEEE float32 and PCM16/PCM8, read + write.

``MiniImage`` mirrors the slice of the PIL ``Image`` surface the
stages use (``open`` / ``fromarray`` / ``size`` / ``convert("L")`` /
``resize`` / ``save`` / ``__array__``); ``read``/``write`` mirror
soundfile's. Grayscale conversion uses PIL's exact ITU-R 601-2
integer arithmetic ((R*19595 + G*38470 + B*7471 + 0x8000) >> 16) so
results are bit-identical when PIL is present; resize is exact
area-overlap averaging (PIL ``BOX``-equivalent for downscales).

Reference parity: the reference engine has no media path at all —
this backs the multimodal stages the 100-TB brief adds
(SURVEY.md §8.3)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["MiniImage", "read", "write"]


# ---------------------------------------------------------------------------
# resampling
# ---------------------------------------------------------------------------

def _overlap_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic area-overlap resampling matrix —
    loops are bounded by the (tiny) grid sizes, never pixel counts."""
    M = np.zeros((n_out, n_in))
    scale = n_in / n_out
    for o in range(n_out):
        lo, hi = o * scale, (o + 1) * scale
        for i in range(int(np.floor(lo)), min(int(np.ceil(hi)), n_in)):
            M[o, i] = min(hi, i + 1) - max(lo, i)
    return M / scale


def _area_resize(a: np.ndarray, h: int, w: int) -> np.ndarray:
    a = np.asarray(a, np.float64)
    return _overlap_matrix(a.shape[0], h) @ a \
        @ _overlap_matrix(a.shape[1], w).T


# ---------------------------------------------------------------------------
# images
# ---------------------------------------------------------------------------

class _Gray:
    """Grayscale view with the PIL surface the stages touch."""

    def __init__(self, arr: np.ndarray):
        self.arr = arr

    @property
    def size(self):
        return (self.arr.shape[1], self.arr.shape[0])

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self.arr, dtype=dtype)

    def convert(self, mode: str) -> "_Gray":
        if mode != "L":
            raise ValueError(f"minicodec: unsupported convert({mode!r})")
        return self

    def resize(self, wh) -> "_Gray":
        w, h = wh
        return _Gray(_area_resize(self.arr, h, w))


class MiniImage:
    """(h, w[, c]) uint8 array + the PIL ``Image`` subset used here."""

    def __init__(self, arr: np.ndarray, mode: str):
        self.arr = np.asarray(arr, np.uint8)
        self.mode = mode

    # -- PIL-compatible constructors -----------------------------------
    @classmethod
    def fromarray(cls, arr, mode: str | None = None) -> "MiniImage":
        arr = np.asarray(arr, np.uint8)
        if mode is None:
            mode = {2: "L", 3: {3: "RGB", 4: "RGBA"}[arr.shape[2]]}[arr.ndim]
        return cls(arr, mode)

    @classmethod
    def open(cls, fp) -> "MiniImage":
        data = fp.read() if hasattr(fp, "read") else bytes(fp)
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png(data)
        if data[:2] == b"BM":
            return _decode_bmp(data)
        if data[:2] == b"\xFF\xD8":
            from ._minijpeg import decode_jpeg

            arr, mode = decode_jpeg(data)
            return cls(arr, mode)
        if data[:6] in (b"GIF87a", b"GIF89a"):
            from ._minigif import decode_gif

            arr, mode = decode_gif(data)
            return cls(arr, mode)
        raise ValueError(
            "minicodec: unsupported image format (PNG, 24-bit BMP, "
            "baseline JPEG and GIF decode without PIL) — install "
            "pillow for progressive-JPEG/TIFF/WebP/&c.")

    # -- PIL-compatible surface ----------------------------------------
    @property
    def size(self):
        return (self.arr.shape[1], self.arr.shape[0])

    def convert(self, mode: str):
        if mode != "L":
            raise ValueError(f"minicodec: unsupported convert({mode!r})")
        a = self.arr
        if a.ndim == 2:
            return _Gray(a)
        if a.shape[2] == 2:          # gray + alpha
            return _Gray(a[:, :, 0])
        r = a[:, :, 0].astype(np.uint32)
        g = a[:, :, 1].astype(np.uint32)
        b = a[:, :, 2].astype(np.uint32)
        # PIL's exact L = ITU-R 601-2 integer arithmetic
        L = (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
        return _Gray(L.astype(np.uint8))

    def resize(self, wh):
        w, h = wh
        if self.arr.ndim == 2:
            return MiniImage(np.clip(np.rint(
                _area_resize(self.arr, h, w)), 0, 255), self.mode)
        chans = [np.clip(np.rint(_area_resize(
            self.arr[:, :, c], h, w)), 0, 255)
            for c in range(self.arr.shape[2])]
        return MiniImage(np.stack(chans, axis=2), self.mode)

    def save(self, fp, format: str = "PNG", quality: int = 75) -> None:
        fmt = format.upper()
        if fmt == "PNG":
            fp.write(_encode_png(self.arr))
        elif fmt == "BMP":
            fp.write(_encode_bmp(self.arr))
        elif fmt in ("JPEG", "JPG"):
            from ._minijpeg import encode_jpeg

            fp.write(encode_jpeg(self.arr, quality=quality))
        elif fmt == "GIF":
            from ._minigif import encode_gif

            fp.write(encode_gif(self.arr))
        else:
            raise ValueError(f"minicodec: unsupported save format {format!r}")


# -- PNG --------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(data: bytes) -> MiniImage:
    pos, w = 8, None
    idat = bytearray()
    h = bitdepth = colortype = interlace = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + chunk) & 0xFFFFFFFF != crc:
            raise ValueError("minicodec: PNG chunk CRC mismatch")
        if ctype == b"IHDR":
            w, h, bitdepth, colortype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("minicodec: PNG missing IHDR")
    if bitdepth != 8 or colortype not in _PNG_CHANNELS or interlace:
        raise ValueError(
            f"minicodec: unsupported PNG (bitdepth={bitdepth}, "
            f"colortype={colortype}, interlace={interlace}) — only "
            f"8-bit non-interlaced gray/GA/RGB/RGBA")
    ch = _PNG_CHANNELS[colortype]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    p = 0
    for y in range(h):
        f = raw[p]
        line = np.frombuffer(raw, np.uint8, stride, p + 1).astype(np.int64)
        p += 1 + stride
        if f == 0:
            cur = line
        elif f == 2:                       # Up
            cur = (line + prev) & 0xFF
        elif f == 1:                       # Sub: per-channel prefix sum
            # cur[i] = (line[i] + cur[i-ch]) mod 256 is a cumsum mod 256
            # down the width axis — fully vectorized, no Python loop
            cur = (np.cumsum(line.reshape(-1, ch), axis=0) & 0xFF) \
                .reshape(stride)
        elif f in (3, 4):                  # Average / Paeth
            # sequential in x (floor-div / predictor choice breaks the
            # prefix form) but vectorized ACROSS the ch channel lanes:
            # w iterations per row, not w*ch
            ln = line.reshape(-1, ch)
            pv = prev.reshape(-1, ch)
            cur2 = np.zeros_like(ln)
            zero = np.zeros(ch, np.int64)
            for x in range(ln.shape[0]):
                a = cur2[x - 1] if x else zero
                b = pv[x]
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    c = pv[x - 1] if x else zero
                    pa_ = np.abs(b - c)
                    pb_ = np.abs(a - c)
                    pc_ = np.abs(a + b - 2 * c)
                    pred = np.where((pa_ <= pb_) & (pa_ <= pc_), a,
                                    np.where(pb_ <= pc_, b, c))
                cur2[x] = (ln[x] + pred) & 0xFF
            cur = cur2.reshape(stride)
        else:
            raise ValueError(f"minicodec: unknown PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    arr = out.reshape(h, w, ch) if ch > 1 else out.reshape(h, w)
    mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[ch]
    return MiniImage(arr, mode)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload)) + ctype + payload \
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)


def _encode_png(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr, np.uint8)
    h, w = arr.shape[:2]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = arr.reshape(h, w * ch)
    scan = np.zeros((h, 1 + w * ch), np.uint8)   # filter 0 per row
    scan[:, 1:] = flat
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
            + _chunk(b"IEND", b""))


# -- BMP --------------------------------------------------------------------

def _encode_bmp(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    h, w = arr.shape[:2]
    rgb = arr[:, :, :3]
    row_len = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_len), np.uint8)
    rows[:, :w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return header + info + body


def _decode_bmp(data: bytes) -> MiniImage:
    (_sig, _size, _r1, _r2, off) = struct.unpack("<2sIHHI", data[:14])
    (hsz, w, h, _planes, bpp, comp) = struct.unpack("<IiiHHI", data[14:34])
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"minicodec: unsupported BMP (bpp={bpp}, compression={comp}) "
            f"— only 24-bit uncompressed")
    flip = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, np.uint8, h * row_len, off) \
        .reshape(h, row_len)[:, :w * 3].reshape(h, w, 3)
    rgb = rows[::-1, :, ::-1] if flip else rows[:, :, ::-1]
    return MiniImage(rgb.copy(), "RGB")


# ---------------------------------------------------------------------------
# audio (WAV) — soundfile-compatible read/write subset
# ---------------------------------------------------------------------------

def write(fp, data, samplerate: int, format: str = "WAV",
          subtype: str = "FLOAT") -> None:
    """soundfile.write subset: WAV container, FLOAT (ieee float32) or
    PCM_16 samples; ``data`` is (n,) or (n, channels) float in [-1, 1]."""
    if format.upper() != "WAV":
        raise ValueError(f"minicodec: unsupported audio format {format!r}")
    x = np.asarray(data, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, chn = x.shape
    if subtype.upper() == "FLOAT":
        fmt_tag, bits = 3, 32
        body = x.astype("<f4").tobytes()
    elif subtype.upper() in ("PCM_16", "PCM16"):
        fmt_tag, bits = 1, 16
        body = np.clip(np.rint(x * 32767.0), -32768,
                       32767).astype("<i2").tobytes()
    else:
        raise ValueError(f"minicodec: unsupported subtype {subtype!r}")
    block = chn * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_tag, chn, samplerate,
                      samplerate * block, block, bits)
    riff = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)
    fp.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)


def read(fp, dtype: str = "float64", always_2d: bool = False):
    """soundfile.read subset: WAV with float32/float64 (tag 3) or
    PCM16/PCM8 (tag 1) samples → (data, samplerate)."""
    data = fp.read() if hasattr(fp, "read") else bytes(fp)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("minicodec: not a RIFF/WAVE payload — install "
                         "soundfile for FLAC/Ogg/&c.")
    pos, fmt, body = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        chunk = data[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            body = chunk
        pos += 8 + ln + (ln & 1)
    if fmt is None or body is None:
        raise ValueError("minicodec: WAV missing fmt/data chunk")
    tag, chn, sr, _br, _block, bits = fmt
    if tag == 3 and bits == 32:
        x = np.frombuffer(body, "<f4").astype(np.float64)
    elif tag == 3 and bits == 64:
        x = np.frombuffer(body, "<f8").astype(np.float64)
    elif tag == 1 and bits == 16:
        x = np.frombuffer(body, "<i2").astype(np.float64) / 32768.0
    elif tag == 1 and bits == 8:
        x = (np.frombuffer(body, np.uint8).astype(np.float64) - 128.0) \
            / 128.0
    else:
        raise ValueError(
            f"minicodec: unsupported WAV encoding (tag={tag}, "
            f"bits={bits}) — only float32/64 and PCM8/16")
    x = x.reshape(-1, chn)
    if not always_2d and chn == 1:
        x = x[:, 0]
    if dtype not in ("float64", "float32"):
        raise ValueError(f"minicodec: unsupported dtype {dtype!r}")
    return x.astype(dtype), sr
