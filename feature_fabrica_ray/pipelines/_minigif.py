"""Pure-numpy GIF87a/GIF89a codec for the ``_minicodec`` fallback.

Completes the fallback's coverage of real corpus image containers
(PNG / BMP / baseline JPEG / GIF): a spec-complete FIRST-FRAME decoder
— full variable-width LZW (dictionary growth to 12 bits, KwKwK case,
mid-stream clear codes), global and local color tables, interlaced
row order, frames smaller than the logical screen composited onto the
background color — and a minimal LOSSLESS encoder for fixtures (the
classic clear-code-per-symbol "uncompressed GIF" stream, legal per the
spec, so the encoder needs no dictionary and the round trip is exact
for any <=256-color image).

Animated GIFs decode their FIRST image descriptor only (the corpus
feature-extraction contract: width/height/pixel stats of the poster
frame); transparency indices are ignored (the transparent pixel keeps
its palette color — this decoder produces RGB, not RGBA). Everything
else that is malformed fails loud with a precise message.

All formats/algorithms are from the public GIF89a specification
(CompuServe, 1990) — LSB-first sub-block bit packing, the 8/8/4/2
interlace passes, and the standard LZW variant with per-stream
minimum code size.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif"]


def _lzw_decode(min_code_size: int, data: bytes,
                expected: int) -> np.ndarray:
    """GIF LZW decode (LSB-first variable-width codes) -> index array."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while len(out) < expected:
        if bitpos + width > total_bits:
            break                              # truncated stream: stop
        v = 0
        for i in range(width):
            v |= ((data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1) \
                << i
        bitpos += width
        if v == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if v == end:
            break
        if prev is None:
            if v >= len(table):
                raise ValueError("minigif: first LZW code not a literal")
            entry = table[v]
        elif v < len(table):
            entry = table[v]
            table.append(prev + entry[:1])
        elif v == len(table):                  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"minigif: LZW code {v} out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError(
            f"minigif: LZW stream ended after {len(out)} of "
            f"{expected} pixels")
    return np.frombuffer(bytes(out[:expected]), np.uint8)


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    """Reorder interlaced rows: passes start at 0/4/2/1, step 8/8/4/2."""
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    out = np.empty_like(idx)
    out[order] = idx
    return out


def _read_color_table(data: bytes, pos: int, n: int):
    ct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
    return ct, pos + 3 * n


def decode_gif(data: bytes):
    """Decode GIF bytes -> (uint8 RGB array of the LOGICAL SCREEN with
    the first frame composited onto the background color, "RGB")."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("minigif: not a GIF (missing GIF87a/89a)")
    W, H, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (flags & 7))
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:                          # trailer
            break
        if b == 0x21:                          # extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(
                f"minigif: unexpected block 0x{b:02X} at byte {pos}")
        left, top, fw, fh, iflags = struct.unpack("<HHHHB",
                                                  data[pos + 1:pos + 10])
        pos += 10
        lct = None
        if iflags & 0x80:
            lct, pos = _read_color_table(data, pos, 2 << (iflags & 7))
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(
                f"minigif: invalid LZW minimum code size {min_code}")
        chunks = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            chunks.extend(data[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        pal = lct if lct is not None else gct
        if pal is None:
            raise ValueError("minigif: image has no color table")
        idx = _lzw_decode(min_code, bytes(chunks), fw * fh) \
            .reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx, fh)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("minigif: pixel index outside color table")
        frame = pal[idx]                       # (fh, fw, 3)
        if (left, top, fw, fh) == (0, 0, W, H):
            return frame.astype(np.uint8), "RGB"
        bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
                  else np.zeros(3, np.uint8))
        canvas = np.broadcast_to(bg_rgb, (H, W, 3)).copy()
        canvas[top:top + fh, left:left + fw] = frame
        return canvas.astype(np.uint8), "RGB"
    raise ValueError("minigif: no image descriptor before trailer")


# -- encoder ----------------------------------------------------------------

def encode_gif(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) grayscale uint8 array with at
    most 256 distinct colors as a LOSSLESS single-frame GIF89a (the
    clear-code-per-symbol LZW stream — larger than a real encoder's
    output but spec-legal and exactly invertible)."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(
            f"minigif: encode expects (h, w) or (h, w, 3) uint8, got "
            f"shape {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("minigif: cannot encode an empty image")
    flat = arr.reshape(-1, 3)
    pal, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(
            f"minigif: {len(pal)} distinct colors > 256 — quantize "
            f"first (GIF is palette-indexed)")
    bits = max(int(np.ceil(np.log2(max(len(pal), 2)))), 1)
    tbl_n = 1 << bits
    table = np.zeros((tbl_n, 3), np.uint8)
    table[:len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(bits, 2)
    clear = 1 << min_code
    width = min_code + 1
    out.append(min_code)
    # clear-code-per-symbol stream: CLEAR resets the table before every
    # literal, so codes never grow past width and no dictionary is kept
    bitbuf, nbits, body = 0, 0, bytearray()

    def push(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            body.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    for v in idx.tolist():
        push(clear)
        push(int(v))
    push(clear + 1)                            # END
    if nbits:
        body.append(bitbuf & 0xFF)
    for i in range(0, len(body), 255):
        chunk = body[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)
