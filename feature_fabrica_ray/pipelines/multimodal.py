"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as ACTOR-POOL
``map_batches`` stages.

The Ray-side plumbing is real and tested: schema, actor signature
(state loaded once in ``__init__``, per-batch work in ``__call__``),
byte-budgeted batch sizes, output layout. The decode kernel is gated:
``PIL``/``soundfile`` when importable, else the pure-stdlib
``_minicodec`` (real PNG / 24-bit BMP / baseline JPEG via
``_minijpeg`` / GIF via ``_minigif`` / PCM WAV decode; progressive
JPEG / FLAC fail loud), else — for payloads with no real codec magic — a deterministic
fake decoder (documented below). NOT a silent no-op anywhere.

Fake-decode contract (deterministic, test-asserted): the payload's first
8 bytes are a header ``u32 width, u32 height`` (little-endian); "pixels"
are the remaining bytes. Features: (width, height, n_bytes, mean_byte,
byte_entropy). Real decoders produce the same feature schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "synth_media_table", "DecodeImageFeatures",
           "PHashImage", "phash_pipeline",
           "DecodeAudioFeatures", "FrameSampler", "ResizeImage",
           "decode_pipeline", "audio_pipeline", "frame_pipeline",
           "resize_pipeline"]

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # image | audio | video
    ("payload", pa.binary()),         # opaque encoded bytes
    ("n_bytes", pa.int64()),
])


def _round6(x: np.ndarray) -> np.ndarray:
    """Round half AWAY from zero at 6 decimals (DuckDB ``round()``
    semantics) — np.round is banker's, which diverges on the EXACT
    5e-7 ties a 256-byte resized body produces (mean = k/256 terminates
    within 8 decimals, so k % 4 == 2 is always a tie)."""
    x = np.asarray(x, np.float64)
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def synth_media_table(sf_dir: str, media_type: str = "image"):
    """Deterministic media table derived from documents: payload = 8-byte
    width/height header + utf8 text bytes. Stands in for real encoded
    media so the plumbing is exercised end-to-end."""
    from ..sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        payloads = []
        for d, t in zip(ids, texts):
            body = (t or "").encode()
            w = np.uint32(16 + d % 64)
            h = np.uint32(16 + (d * 7) % 48)
            payloads.append(w.tobytes() + h.tobytes() + body)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array([media_type] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        })

    return ds.map_batches(derive, batch_format="pyarrow", batch_size=None)


def _real_image_rows(buf: np.ndarray, off: np.ndarray,
                     lens: np.ndarray) -> np.ndarray:
    """Per-row bool: payload starts with a real image codec magic (PNG /
    JPEG / GIF / BMP). The synthetic fake-contract header is a LE uint32
    width in [16, 80), whose SECOND byte is always 0 — every real magic
    has a nonzero second byte, so the two contracts never collide."""
    n = len(lens)
    out = np.zeros(n, bool)
    ok = lens >= 4
    if not ok.any():
        return out
    pos = off[:-1][ok][:, None] + np.arange(4)
    b = buf[pos]
    png = (b[:, 0] == 0x89) & (b[:, 1] == 0x50)
    jpg = (b[:, 0] == 0xFF) & (b[:, 1] == 0xD8)
    gif = (b[:, 0] == 0x47) & (b[:, 1] == 0x49) & (b[:, 2] == 0x46)
    bmp = (b[:, 0] == 0x42) & (b[:, 1] == 0x4D)
    out[ok] = png | jpg | gif | bmp
    return out


def _real_audio_rows(buf: np.ndarray, off: np.ndarray,
                     lens: np.ndarray) -> np.ndarray:
    """Per-row bool: payload starts with a real audio container magic
    (RIFF/WAV, FLAC, Ogg). Same non-collision argument as
    ``_real_image_rows``: the fake header's second byte is always 0."""
    n = len(lens)
    out = np.zeros(n, bool)
    ok = lens >= 4
    if not ok.any():
        return out
    pos = off[:-1][ok][:, None] + np.arange(4)
    b = buf[pos]
    riff = (b[:, 0] == 0x52) & (b[:, 1] == 0x49) & (b[:, 2] == 0x46)
    flac = (b[:, 0] == 0x66) & (b[:, 1] == 0x4C) & (b[:, 2] == 0x61)
    ogg = (b[:, 0] == 0x4F) & (b[:, 1] == 0x67) & (b[:, 2] == 0x67)
    out[ok] = riff | flac | ogg
    return out


class DecodeImageFeatures:
    """Actor-pool decode stage: codec state initialised ONCE per actor
    (``__init__``), batches decoded in ``__call__``.

    Use: ``ds.map_batches(DecodeImageFeatures, concurrency=N,
    batch_size=B, num_cpus=1)`` with B sized so B x mean_payload_bytes
    stays well under the worker heap (wide binary rows => small B)."""

    def __init__(self, resize_to: tuple[int, int] = (32, 32)):
        self.resize_to = resize_to
        try:  # preferred real codec
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            # pure-stdlib PNG/BMP fallback — same Image surface;
            # formats past the fallback (progressive JPEG, TIFF,
            # WebP) raise loud inside open()
            from ._minicodec import MiniImage

            self._pil = MiniImage

    def _decode_real(self, payload: bytes):  # pragma: no cover
        """Real-codec decode of ONE image: (width, height, mean, entropy)
        with the same field semantics as the fake contract — mean/entropy
        over the 8-bit GRAYSCALE pixel distribution."""
        import io

        img = self._pil.open(io.BytesIO(payload))
        w, h = img.size
        px = np.asarray(img.convert("L"), dtype=np.int64).ravel()
        mean = float(px.mean()) if px.size else 0.0
        if px.size:
            p = np.bincount(px, minlength=256) / px.size
            ent = float(-np.where(p > 0, p * np.log2(np.maximum(p, 1e-300)),
                                  0.0).sum())
        else:
            ent = 0.0
        return w, h, mean, ent

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        # flat zero-copy view over all payload bytes in the batch
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        buf = np.frombuffer(payloads.buffers()[2] or b"", dtype=np.uint8)
        raw_off = np.frombuffer(payloads.buffers()[1], dtype=np.int32)
        off = raw_off[payloads.offset:payloads.offset + len(payloads) + 1].astype(np.int64)
        n = len(payloads)
        lens = np.diff(off)
        real = _real_image_rows(buf, off, lens)
        if real.any():
            # payloads carrying a real codec magic never fall through
            # to the fake-header parse; formats outside the decoder's
            # reach (progressive JPEG / TIFF / WebP without PIL)
            # raise loud inside open()
            widths = np.zeros(n, np.int64)
            heights = np.zeros(n, np.int64)
            means = np.zeros(n, np.float64)
            ents = np.zeros(n, np.float64)
            for i in np.flatnonzero(real):
                w, h, m, e = self._decode_real(
                    buf[off[i]:off[i + 1]].tobytes())
                widths[i], heights[i], means[i], ents[i] = w, h, m, e
            if not real.all():
                raise NotImplementedError(
                    "mixed real/fake image payloads in one batch are "
                    "not supported — partition by media source upstream")
            out = batch.drop_columns(["payload"])
            out = out.append_column("width", pa.array(widths, pa.int64()))
            out = out.append_column("height", pa.array(heights, pa.int64()))
            out = out.append_column(
                "mean_byte", pa.array(_round6(means), pa.float64()))
            return out.append_column(
                "byte_entropy", pa.array(_round6(ents), pa.float64()))
        has_hdr = lens >= 8

        # header parse, vectorized: gather the 8 header bytes of every
        # headered row and combine little-endian
        widths = np.zeros(n, np.int64)
        heights = np.zeros(n, np.int64)
        if has_hdr.any():
            hpos = off[:-1][has_hdr][:, None] + np.arange(8)     # (m, 8)
            hb = buf[hpos].astype(np.int64)                      # (m, 8)
            sh = np.array([1, 1 << 8, 1 << 16, 1 << 24])
            widths[has_hdr] = (hb[:, :4] * sh).sum(axis=1)
            heights[has_hdr] = (hb[:, 4:] * sh).sum(axis=1)

        # body stats, one pass over the flat buffer: mark header bytes via
        # a delta/cumsum mask, then segmented mean (weighted bincount) and
        # per-row 256-bin histograms (combined-index bincount) for entropy
        delta = np.zeros(buf.size + 1, np.int64)
        hs = off[:-1][has_hdr]
        np.add.at(delta, hs, 1)
        np.add.at(delta, hs + 8, -1)
        is_body = np.cumsum(delta[:-1]) == 0
        row_of = np.repeat(np.arange(n), lens)
        body_row = row_of[is_body]
        body_bytes = buf[is_body].astype(np.int64)
        body_len = lens - 8 * has_hdr

        means = np.zeros(n, np.float64)
        ents = np.zeros(n, np.float64)
        nz = body_len > 0
        if body_bytes.size:
            sums = np.bincount(body_row, weights=body_bytes, minlength=n)
            means[nz] = sums[nz] / body_len[nz]
            counts = np.bincount(body_row * 256 + body_bytes,
                                 minlength=n * 256).reshape(n, 256)
            p = counts / np.maximum(body_len, 1)[:, None]
            plogp = np.where(p > 0, p * np.log2(np.maximum(p, 1e-300)), 0.0)
            ents[nz] = -plogp.sum(axis=1)[nz]
        out = batch.drop_columns(["payload"])
        out = out.append_column("width", pa.array(widths, pa.int64()))
        out = out.append_column("height", pa.array(heights, pa.int64()))
        out = out.append_column("mean_byte", pa.array(_round6(means), pa.float64()))
        out = out.append_column("byte_entropy", pa.array(_round6(ents), pa.float64()))
        return out


class DecodeAudioFeatures:
    """Actor-pool audio feature stage (same contract shape as images):
    codec gated behind ``soundfile``; the deterministic fake treats the
    body as int8 PCM and emits (n_samples, rms, zero_crossings) — the
    canonical cheap audio features."""

    def __init__(self, sample_rate: int = 16_000):
        self.sample_rate = sample_rate
        try:  # preferred real codec
            import soundfile  # noqa: F401

            self._sf = soundfile
        except ImportError:
            # pure-stdlib WAV fallback — same read() surface;
            # FLAC/Ogg payloads raise loud inside read()
            from . import _minicodec

            self._sf = _minicodec

    def _decode_real(self, payload: bytes):  # pragma: no cover
        """Real-codec decode of ONE audio payload: (n_samples, rms,
        zero_crossings) with the fake contract's field semantics — rms
        in int8 full-scale units (float samples x 127), crossings as
        signbit flips over the first channel."""
        import io

        data, _sr = self._sf.read(io.BytesIO(payload), dtype="float64",
                                  always_2d=True)
        x = data[:, 0] * 127.0
        ns = int(x.size)
        rms = float(np.sqrt((x * x).mean())) if ns else 0.0
        zc = int((np.signbit(x[1:]) != np.signbit(x[:-1])).sum()) \
            if ns > 1 else 0
        return ns, rms, zc

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        buf = np.frombuffer(payloads.buffers()[2] or b"", dtype=np.uint8)
        raw_off = np.frombuffer(payloads.buffers()[1], dtype=np.int32)
        off = raw_off[payloads.offset:payloads.offset + len(payloads) + 1].astype(np.int64)
        n = len(payloads)
        lens = np.diff(off)
        real = _real_audio_rows(buf, off, lens)
        if real.any():
            if not real.all():
                raise NotImplementedError(
                    "mixed real/fake audio payloads in one batch are "
                    "not supported — partition by media source upstream")
            ns = np.zeros(n, np.int64)
            rms = np.zeros(n, np.float64)
            zc = np.zeros(n, np.int64)
            for i in range(n):
                ns[i], rms[i], zc[i] = self._decode_real(
                    buf[off[i]:off[i + 1]].tobytes())
            out = batch.drop_columns(["payload"])
            out = out.append_column("n_samples", pa.array(ns, pa.int64()))
            out = out.append_column(
                "rms", pa.array(_round6(rms), pa.float64()))
            return out.append_column("zero_crossings",
                                     pa.array(zc, pa.int64()))
        # fake PCM body = bytes after the 8-byte header, viewed as int8 —
        # one flat segmented pass (weighted bincounts), no per-row loop
        body_start = off[:-1] + np.minimum(lens, 8)
        n_samples = np.maximum(lens - 8, 0)
        row_of = np.repeat(np.arange(n), lens)
        delta = np.zeros(buf.size + 1, np.int64)
        np.add.at(delta, off[:-1], 1)
        np.add.at(delta, body_start, -1)
        is_body = np.cumsum(delta[:-1]) == 0
        pcm = buf[is_body].view(np.int8).astype(np.float64)
        pcm_row = row_of[is_body]
        rms = np.zeros(n, np.float64)
        zc = np.zeros(n, np.int64)
        if pcm.size:
            nz = n_samples > 0
            sq = np.bincount(pcm_row, weights=pcm * pcm, minlength=n)
            rms[nz] = np.sqrt(sq[nz] / n_samples[nz])
            if pcm.size > 1:
                flips = (np.signbit(pcm[1:]) != np.signbit(pcm[:-1])) \
                    & (pcm_row[1:] == pcm_row[:-1])
                zc = np.bincount(pcm_row[1:][flips], minlength=n).astype(np.int64)
        out = batch.drop_columns(["payload"])
        out = out.append_column("n_samples", pa.array(n_samples, pa.int64()))
        out = out.append_column("rms", pa.array(_round6(rms), pa.float64()))
        return out.append_column("zero_crossings", pa.array(zc, pa.int64()))


class FrameSampler:
    """Actor-pool frame-sampling stage for video payloads: emits one row
    per sampled frame (every ``stride``-th 256-byte pseudo-frame of the
    body). Real codecs would seek keyframes; the output layout
    (media_id, frame_idx, frame_bytes) is the contract."""

    def __init__(self, stride: int = 4, frame_bytes: int = 256):
        self.stride = stride
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        out_id, out_idx, out_frame = [], [], []
        for mid, p in zip(ids, payloads):
            body = p[8:]
            nframes = max(len(body) // self.frame_bytes, 0)
            for f in range(0, nframes, self.stride):
                out_id.append(int(mid))
                out_idx.append(f)
                out_frame.append(body[f * self.frame_bytes:(f + 1) * self.frame_bytes])
        return pa.table({"media_id": pa.array(out_id, pa.int64()),
                         "frame_idx": pa.array(out_idx, pa.int64()),
                         "frame": pa.array(out_frame, pa.binary())})


def decode_pipeline(sf_dir: str, concurrency: int = 4, batch_size: int = 256):
    """media table -> actor-pool decode -> feature table. batch_size is
    byte-budgeted: payloads are wide, so batches are small."""
    ds = synth_media_table(sf_dir)
    return ds.map_batches(DecodeImageFeatures, concurrency=concurrency,
                          batch_size=batch_size, num_cpus=1,
                          batch_format="pyarrow")


def audio_pipeline(sf_dir: str, concurrency: int = 4, batch_size: int = 256):
    """media table (audio) -> actor-pool PCM feature extraction."""
    ds = synth_media_table(sf_dir, media_type="audio")
    return ds.map_batches(DecodeAudioFeatures, concurrency=concurrency,
                          batch_size=batch_size, num_cpus=1,
                          batch_format="pyarrow")


def frame_pipeline(sf_dir: str, stride: int = 4, frame_bytes: int = 256,
                   concurrency: int = 4, batch_size: int = 256):
    """media table (video) -> actor-pool frame sampling: one row per
    sampled pseudo-frame."""
    ds = synth_media_table(sf_dir, media_type="video")
    return ds.map_batches(FrameSampler,
                          fn_constructor_kwargs={"stride": stride,
                                                 "frame_bytes": frame_bytes},
                          concurrency=concurrency, batch_size=batch_size,
                          num_cpus=1, batch_format="pyarrow")


class ResizeImage:
    """Actor-pool resize stage: nearest-neighbor downsample of the fake
    pixel grid to ``(out_w, out_h)``, emitting a NEW payload (header +
    resized body). Contract: the body is a row-major ``width x height``
    grid, truncated/zero-padded to ``width*height`` bytes. Real codecs
    would decode-resize-encode; the Ray plumbing (actor state, batch
    layout, output schema) is the tested contract.

    Vectorized: per batch, one (n, out_w*out_h) gather-index matrix
    built from the width/height columns — no per-row Python loop."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        buf = np.frombuffer(payloads.buffers()[2] or b"", dtype=np.uint8)
        raw_off = np.frombuffer(payloads.buffers()[1], dtype=np.int32)
        off = raw_off[payloads.offset:payloads.offset + len(payloads) + 1] \
            .astype(np.int64)
        n = len(payloads)
        lens = np.diff(off)
        ow, oh = self.out_w, self.out_h

        # source geometry from the 8-byte header (0 when headerless)
        widths = np.zeros(n, np.int64)
        heights = np.zeros(n, np.int64)
        has_hdr = lens >= 8
        if has_hdr.any():
            hpos = off[:-1][has_hdr][:, None] + np.arange(8)
            hb = buf[hpos].astype(np.int64)
            sh = np.array([1, 1 << 8, 1 << 16, 1 << 24])
            widths[has_hdr] = (hb[:, :4] * sh).sum(axis=1)
            heights[has_hdr] = (hb[:, 4:] * sh).sum(axis=1)
        widths = np.maximum(widths, 1)
        heights = np.maximum(heights, 1)

        # nearest-neighbor source coordinates per output pixel, for every
        # row at once: (n, oh*ow) index matrix into each row's pixel grid
        oy = np.arange(oh)
        ox = np.arange(ow)
        sy = (oy[None, :] * heights[:, None]) // oh          # (n, oh)
        sx = (ox[None, :] * widths[:, None]) // ow           # (n, ow)
        flat_idx = (sy[:, :, None] * widths[:, None, None]
                    + sx[:, None, :]).reshape(n, oh * ow)     # (n, oh*ow)
        body_start = off[:-1] + 8 * has_hdr
        body_len = np.maximum(lens - 8 * has_hdr, 0)
        # clamp reads past the body to a zero byte (zero-pad contract)
        valid = flat_idx < body_len[:, None]
        gidx = np.where(valid, body_start[:, None] + flat_idx, 0)
        pixels = np.where(valid, buf[gidx] if buf.size else 0, 0) \
            .astype(np.uint8)

        header = np.empty((n, 8), np.uint8)
        header[:, 0:4] = np.frombuffer(
            np.uint32(ow).tobytes(), np.uint8)[None, :]
        header[:, 4:8] = np.frombuffer(
            np.uint32(oh).tobytes(), np.uint8)[None, :]
        out_rows = np.concatenate([header, pixels], axis=1)
        out_payload = pa.array([r.tobytes() for r in out_rows], pa.binary())
        t = pa.table({
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "payload": out_payload,
            "n_bytes": pa.array(np.full(n, 8 + oh * ow, np.int64)),
            "width": pa.array(np.full(n, ow, np.int64)),
            "height": pa.array(np.full(n, oh, np.int64)),
        })
        return t


def resize_pipeline(sf_dir: str, out_w: int = 16, out_h: int = 16,
                    concurrency: int = 4, batch_size: int = 256):
    """media table -> actor-pool nearest-neighbor resize."""
    ds = synth_media_table(sf_dir)
    return ds.map_batches(ResizeImage,
                          fn_constructor_kwargs={"out_w": out_w,
                                                 "out_h": out_h},
                          concurrency=concurrency, batch_size=batch_size,
                          num_cpus=1, batch_format="pyarrow")

class PHashImage:
    """Actor-pool perceptual-hash stage: 64-bit dHash per image.

    dHash recipe (Krawetz): resample to a GRID_H x (GRID_W+1) grayscale
    grid, then bit (r, c) = grid[r, c+1] > grid[r, c] — robust to
    re-encoding/scaling, so near-identical images land within a small
    hamming distance; feed the output through
    ``dedup.signature_hamming_pairs`` for banded near-dup blocking.

    Decode is gated like ``DecodeImageFeatures`` (real codec when PIL
    is importable, else the documented fake-decode contract: 8-byte
    header + body bytes). The fake "grayscale resample" splits the
    body into 72 contiguous chunks whose byte-means form the 8x9 grid
    — one flat segmented-bincount pass per batch, no per-row loop.
    Empty bodies hash to 0 regardless of batch layout. Output: input
    columns minus payload, plus ``phash`` (int64 bit pattern)."""

    GRID_H, GRID_W = 8, 8            # 8 rows x 9 cols sampled -> 64 bits

    def __init__(self):
        try:  # preferred real codec
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            from ._minicodec import MiniImage

            self._pil = MiniImage

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        buf = np.frombuffer(payloads.buffers()[2] or b"", dtype=np.uint8)
        raw_off = np.frombuffer(payloads.buffers()[1], dtype=np.int32)
        off = raw_off[payloads.offset:
                      payloads.offset + len(payloads) + 1].astype(np.int64)
        n = len(payloads)
        lens = np.diff(off)
        real = _real_image_rows(buf, off, lens)
        if real.any():
            if not real.all():
                raise NotImplementedError(
                    "mixed real/fake image payloads in one batch are "
                    "not supported — partition by media source upstream")
            import io

            # real dHash: PIL grayscale resample to the (W+1) x H grid,
            # then the same horizontal-gradient bit recipe as the fake
            grids = np.empty((n, self.GRID_H, self.GRID_W + 1), np.float64)
            for i in range(n):
                img = self._pil.open(
                    io.BytesIO(buf[off[i]:off[i + 1]].tobytes()))
                g = img.convert("L").resize(
                    (self.GRID_W + 1, self.GRID_H))
                grids[i] = np.asarray(g, dtype=np.float64)
            bits = (grids[:, :, 1:] > grids[:, :, :-1]).astype(np.uint8) \
                .reshape(n, self.GRID_H * self.GRID_W)
            ph = np.packbits(bits, axis=1, bitorder="little") \
                .view(np.uint64).ravel()
            return batch.drop_columns(["payload"]).append_column(
                "phash", pa.array(ph.view(np.int64), pa.int64()))
        has_hdr = lens >= 8
        ncell = self.GRID_H * (self.GRID_W + 1)

        # body view: mask off the 8 header bytes (delta/cumsum trick)
        delta = np.zeros(buf.size + 1, np.int64)
        hs = off[:-1][has_hdr]
        np.add.at(delta, hs, 1)
        np.add.at(delta, hs + 8, -1)
        is_body = np.cumsum(delta[:-1]) == 0
        row_of = np.repeat(np.arange(n), lens)
        body_row = row_of[is_body]
        body_bytes = buf[is_body].astype(np.float64)
        body_len = (lens - 8 * has_hdr).astype(np.int64)

        grid = np.zeros((n, ncell), np.float64)
        if body_bytes.size:
            # position within the row's body -> fixed grid cell
            starts = np.zeros(n, np.int64)
            starts[1:] = np.cumsum(body_len)[:-1]
            pos = np.arange(body_bytes.size) - starts[body_row]
            cell = (pos * ncell) // np.maximum(body_len[body_row], 1)
            idx = body_row * ncell + cell
            sums = np.bincount(idx, weights=body_bytes, minlength=n * ncell)
            cnts = np.bincount(idx, minlength=n * ncell)
            grid = (sums / np.maximum(cnts, 1)).reshape(n, ncell)
        g = grid.reshape(n, self.GRID_H, self.GRID_W + 1)
        bits = (g[:, :, 1:] > g[:, :, :-1]).astype(np.uint8) \
            .reshape(n, self.GRID_H * self.GRID_W)
        phash = np.packbits(bits, axis=1, bitorder="little") \
            .view(np.uint64).ravel()
        out = batch.drop_columns(["payload"])
        return out.append_column("phash",
                                 pa.array(phash.view(np.int64), pa.int64()))


def phash_pipeline(sf_dir: str, max_hamming: int = 3,
                   concurrency: int = 4, batch_size: int = 256):
    """synth media -> PHashImage actor pool -> banded hamming pair
    blocking: the image near-dup detector (payloads hash once, only
    24 B/row/band signatures enter the exchange)."""
    from .dedup import signature_hamming_pairs

    ds = synth_media_table(sf_dir).map_batches(
        PHashImage, concurrency=concurrency, batch_size=batch_size,
        num_cpus=1, batch_format="pyarrow")
    return signature_hamming_pairs(ds, "phash", "media_id",
                                   max_hamming=max_hamming)
