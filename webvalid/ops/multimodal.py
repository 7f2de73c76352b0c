"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with metadata
(mime, width/height, duration). Image decode is REAL for the main web
formats — PNG and baseline JPEG via the pure-NumPy codecs in
ops/imagecodec.py, plus PNM and BMP here, and RIFF/PCM WAV for audio;
resize (nearest + bilinear) is real too. Only genuinely-unavailable
codecs (video, exotic formats) fall back to a deterministic fake keyed
by payload bytes (or PIL when importable). The Ray-side plumbing is
uniform throughout: actor-pool `map_batches` stages, byte-aware batch
sizing, Arrow-native binary handling, fixed-dim feature schema.

`WEBVALID_FORCE_STUB=1` forces the fake for hermetic stub runs.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FEATURE_DIM = 32


def _try_pil():
    if os.environ.get("WEBVALID_FORCE_STUB"):
        return None
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_pnm(payload: bytes) -> tuple[int, int, float] | None:
    """REAL decoder for binary PNM images (PGM 'P5' grayscale / PPM
    'P6' RGB) — pure numpy, no codec library needed. Returns
    (width, height, mean_intensity in [0,1]) or None if the payload is
    not a well-formed 8-bit binary PNM.

    The one genuinely-decodable format in this container; PIL formats
    go through `_try_pil`, everything else hits the documented stub.
    """
    if len(payload) < 10 or payload[:1] != b"P" or payload[1:2] not in b"56":
        return None
    channels = 1 if payload[1:2] == b"5" else 3
    # header: magic, width, height, maxval as whitespace-separated
    # tokens; '#' comments run to end-of-line. Every scan is bounded by
    # `end` — slicing past the buffer returns b'' (never IndexError),
    # so an unbounded loop would SPIN forever on a truncated header.
    pos = 2
    end = len(payload)
    fields: list[int] = []
    try:
        while len(fields) < 3:
            while pos < end and payload[pos:pos + 1].isspace():
                pos += 1
            if pos >= end:
                return None
            if payload[pos:pos + 1] == b"#":
                pos = payload.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < end and not payload[pos:pos + 1].isspace():
                pos += 1
            if pos >= end:
                return None
            fields.append(int(payload[start:pos]))
        # single whitespace after maxval, then the raster; tolerate the
        # common out-of-spec CRLF separator (else the raster would be
        # read one byte off, silently)
        sep = payload[pos:pos + 1]
        pos += 1
        if sep == b"\r" and payload[pos:pos + 1] == b"\n":
            pos += 1
    except (ValueError, IndexError):
        return None
    width, height, maxval = fields
    if not (0 < width and 0 < height and 0 < maxval < 256):
        return None
    need = width * height * channels
    if len(payload) - pos < need:
        return None
    pix = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return width, height, float(pix.mean() / maxval)


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake decode: (width, height, mean_intensity)."""
    h = hashlib.blake2b(payload, digest_size=8).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    mean = h[2] / 255.0
    return width, height, mean


class DecodeImageStub:
    """Actor-pool stage: binary payload → (width, height, mean, feature vec).

    The main web formats decode for REAL: PNG and baseline JPEG via the
    pure-NumPy codecs in ops/imagecodec.py, plus PNM and BMP; PIL is
    used when importable for anything else; only unknown formats fall
    back to the deterministic fake (the name is kept for history —
    the stub is now the exception, not the rule).
    """

    def __init__(self, payload_col: str = "html", id_col: str = "url"):
        self.payload_col = payload_col
        self.id_col = id_col
        self.pil = _try_pil()
        # honor the documented contract: FORCE_STUB bypasses ALL real
        # decoders (PNM included), keeping stub runs hermetic
        self.force_stub = bool(os.environ.get("WEBVALID_FORCE_STUB"))

    def _decode_impl(self, payload: bytes) -> tuple[int, int, float]:
        from webvalid.ops.imagecodec import decode_jpeg, decode_png, luma_mean

        if self.force_stub:
            return _fake_decode(payload)
        pnm = decode_pnm(payload)
        if pnm is not None:
            return pnm
        bmp = decode_bmp(payload)
        if bmp is not None:
            return bmp
        from webvalid.ops.gifcodec import decode_gif

        try:
            gif = decode_gif(payload)
        except ValueError:
            gif = None  # GIF magic but corrupt body: fall through
        if gif is not None:
            return gif.shape[1], gif.shape[0], luma_mean(gif)
        img = decode_png(payload)
        if img is None:
            img = decode_jpeg(payload)
        if img is not None:
            return img.shape[1], img.shape[0], luma_mean(img)
        if self.pil is not None:
            import io

            try:
                img = self.pil.open(io.BytesIO(payload))
                arr = np.asarray(img.convert("L"), dtype=np.float64)
                return img.width, img.height, float(arr.mean() / 255.0)
            except Exception:
                return _fake_decode(payload)
        return _fake_decode(payload)

    def _features(self, payload: bytes) -> np.ndarray:
        """Deterministic fixed-dim feature vector from payload bytes."""
        digest = hashlib.blake2b(payload, digest_size=FEATURE_DIM).digest()
        return np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        widths = np.zeros(n, dtype=np.int32)
        heights = np.zeros(n, dtype=np.int32)
        means = np.full(n, np.nan)
        # fixed-dim features for every row (zeros for null payloads:
        # width == 0 marks "not decoded") — uniform shape keeps the
        # column tensor-friendly downstream
        feats: list = [[0.0] * FEATURE_DIM] * n
        for i, p in enumerate(payloads):
            if p is None:
                continue
            w, h, m = self._decode_impl(p)
            widths[i], heights[i], means[i] = w, h, m
            feats[i] = self._features(p).tolist()
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "mean_intensity": pa.array(means, pa.float64()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class FrameSampleStub:
    """Video-shaped stage: payload → every-k-th 'frame' slice summary.

    Frames are stubbed as fixed-size byte windows of the payload; the
    output layout (one row per sampled frame, frame_idx + payload
    summary) is the real contract a frame sampler would produce."""

    def __init__(self, payload_col: str = "html", id_col: str = "url",
                 frame_bytes: int = 4096, every: int = 4, max_frames: int = 8):
        self.payload_col = payload_col
        self.id_col = id_col
        self.frame_bytes = frame_bytes
        self.every = every
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, frame_idx, frame_hash = [], [], []
        ids = batch[self.id_col].to_pylist()
        for i, p in enumerate(batch[self.payload_col].to_pylist()):
            if p is None:
                continue
            n_frames = max(1, len(p) // self.frame_bytes)
            taken = 0
            for fi in range(0, n_frames, self.every):
                if taken >= self.max_frames:
                    break
                chunk = p[fi * self.frame_bytes: (fi + 1) * self.frame_bytes]
                ids_out.append(ids[i])
                frame_idx.append(fi)
                frame_hash.append(
                    int.from_bytes(hashlib.blake2b(chunk, digest_size=8).digest(), "little")
                )
                taken += 1
        return pa.table(
            {
                self.id_col: pa.array(ids_out),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "frame_hash": pa.array(frame_hash, pa.uint64()),
            }
        )


class VideoFrameSampler:
    """REAL video frame sampling for MJPEG-in-AVI payloads
    (ops/videocodec RIFF parser + the pure-NumPy JPEG decoder): every
    `every`-th frame is container-extracted and decoded to (frame_idx,
    width, height, mean_luma). Non-AVI payloads fall back to the
    FrameSampleStub byte-window contract with width/height/luma null —
    honest: the row says whether a real decode happened (`decoded`).

    Actor-pool stage: nothing heavy in __init__ today, but the shape
    (state once per actor, small batches for giant binary rows) is the
    contract every real codec stage here follows."""

    def __init__(self, payload_col: str = "video", id_col: str = "doc_id",
                 every: int = 2, max_frames: int = 4,
                 frame_bytes: int = 4096):
        self.payload_col = payload_col
        self.id_col = id_col
        self.every = every
        self.max_frames = max_frames
        self.frame_bytes = frame_bytes
        # same hermetic-stub contract as DecodeImageStub: FORCE_STUB
        # bypasses every real codec path
        self.force_stub = bool(os.environ.get("WEBVALID_FORCE_STUB"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from webvalid.ops.gifcodec import decode_gif_frames
        from webvalid.ops.imagecodec import luma_mean
        from webvalid.ops.videocodec import decode_avi_frames

        ids = batch[self.id_col].to_pylist()
        ids_out, fidx, w, h, luma, dec = [], [], [], [], [], []
        for i, p in enumerate(batch[self.payload_col].to_pylist()):
            if p is None:
                continue
            frames = None
            if not self.force_stub:
                try:
                    if p[:4] == b"GIF8":
                        # animated GIF (full-redraw frames); partial-
                        # region animations raise -> fallback below
                        frames = decode_gif_frames(
                            p, every=self.every, max_frames=self.max_frames)
                    else:
                        frames = decode_avi_frames(
                            p, every=self.every, max_frames=self.max_frames)
                except ValueError:
                    frames = None
            # a container that parses but holds ZERO frames must still
            # surface the payload (every non-null payload emits >= 1
            # row) — route it through the fallback like a non-container
            if not frames:
                frames = None
            if frames is not None:
                for fi, img in frames:
                    ids_out.append(ids[i])
                    fidx.append(fi)
                    h.append(img.shape[0])
                    w.append(img.shape[1])
                    # proper Rec.601 luma (x255), matching the image
                    # stage — a flat RGB mean misreports color frames
                    luma.append(luma_mean(img) * 255.0)
                    dec.append(True)
            else:
                n_frames = max(1, len(p) // self.frame_bytes)
                taken = 0
                for fi in range(0, n_frames, self.every):
                    if taken >= self.max_frames:
                        break
                    ids_out.append(ids[i])
                    fidx.append(fi)
                    w.append(None)
                    h.append(None)
                    luma.append(None)
                    dec.append(False)
                    taken += 1
        return pa.table({
            # explicit type: an all-skipped batch would otherwise infer
            # Arrow null for the id column and clash with other blocks
            self.id_col: pa.array(ids_out,
                                  type=batch.schema.field(self.id_col).type),
            "frame_idx": pa.array(fidx, pa.int32()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "mean_luma": pa.array(luma, pa.float64()),
            "decoded": pa.array(dec, pa.bool_()),
        })


def sample_video(ds, payload_col: str = "video", id_col: str = "doc_id",
                 concurrency=(1, 8), batch_size: int = 64, **kw):
    """Real frame-sampling wiring: actor pool, small batches (video
    payloads are the largest binary rows in the schema)."""
    return ds.select_columns([id_col, payload_col]).map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"payload_col": payload_col,
                               "id_col": id_col, **kw},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_images(ds, payload_col: str = "html", id_col: str = "url",
                  concurrency=(1, 8), batch_size: int = 256):
    """Decode stage wiring: small batches (payloads are large), actor pool.

    batch_size is deliberately small: batch_bytes ≈ batch_size × mean
    payload size must fit the worker heap (SURVEY.md §4.2 giant-rows
    row)."""
    return ds.select_columns([id_col, payload_col]).map_batches(
        DecodeImageStub,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, payload_col: str = "html", id_col: str = "url",
                  concurrency=(1, 8), batch_size: int = 128, **kw):
    return ds.select_columns([id_col, payload_col]).map_batches(
        FrameSampleStub,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col, **kw},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# REAL decoders #2/#3: uncompressed BMP (image) and RIFF/PCM WAV (audio)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> tuple[int, int, float] | None:
    """REAL decoder for uncompressed 24-bit BI_RGB Windows BMP — pure
    struct + numpy. Returns (width, height, mean_intensity in [0,1])
    or None if the payload is not a well-formed one.

    Bottom-up rows and 4-byte row padding are handled; mean intensity
    is over all channel bytes (padding excluded)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    try:
        data_off, = struct.unpack_from("<I", payload, 10)
        hdr_size, = struct.unpack_from("<I", payload, 14)
        if hdr_size < 40:
            return None
        width, height = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression, = struct.unpack_from("<I", payload, 30)
    except struct.error:
        return None
    height = abs(height)
    if (planes != 1 or bpp != 24 or compression != 0
            or width <= 0 or height <= 0):
        return None
    row_bytes = (width * 3 + 3) & ~3
    need = row_bytes * height
    if data_off + need > len(payload):
        return None
    rows = np.frombuffer(payload, np.uint8, count=need,
                         offset=data_off).reshape(height, row_bytes)
    pix = rows[:, : width * 3]
    return width, height, float(pix.mean() / 255.0)


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL decoder for RIFF/WAVE PCM (8- or 16-bit, any channel
    count) — pure struct + numpy. Returns (sample_rate, n_channels,
    float64 mono samples in [-1, 1]) or None.

    Walks the RIFF chunk list properly (fmt may be followed by LIST /
    fact chunks before data; chunks are word-aligned)."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        try:
            size, = struct.unpack_from("<I", payload, pos + 4)
        except struct.error:
            return None
        body = payload[pos + 8: pos + 8 + size]
        if len(body) < size:
            return None
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
        if fmt is not None and data is not None:
            break
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits, = struct.unpack_from("<H", fmt, 14)
    if audio_fmt != 1 or n_ch == 0 or rate == 0 or bits not in (8, 16):
        return None
    if bits == 16:
        n = len(data) // 2
        x = np.frombuffer(data, np.int16, count=n).astype(np.float64) / 32768.0
    else:
        x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    frames = len(x) // n_ch
    if frames == 0:
        return None
    mono = x[: frames * n_ch].reshape(frames, n_ch).mean(axis=1)
    return int(rate), int(n_ch), mono


class AudioFeatures:
    """Actor-pool stage: WAV payload → (duration_sec, sample_rate,
    n_channels, rms, peak, zero-crossing rate). Pure-numpy REAL
    decode via `decode_wav`; non-WAV / malformed payloads yield a row
    with sample_rate == 0 (the 'not decoded' marker, mirroring
    DecodeImageStub's width == 0)."""

    def __init__(self, payload_col: str = "audio", id_col: str = "url"):
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        rate = np.zeros(n, np.int32)
        chans = np.zeros(n, np.int32)
        dur = np.full(n, np.nan)
        rms = np.full(n, np.nan)
        peak = np.full(n, np.nan)
        zcr = np.full(n, np.nan)
        for i, p in enumerate(payloads):
            if p is None:
                continue
            dec = decode_wav(p)
            if dec is None:
                continue
            r, c, mono = dec
            rate[i], chans[i] = r, c
            dur[i] = len(mono) / r
            rms[i] = float(np.sqrt(np.mean(mono * mono)))
            peak[i] = float(np.abs(mono).max())
            sgn = np.signbit(mono)
            zcr[i] = float((sgn[1:] != sgn[:-1]).mean()) if len(mono) > 1 else 0.0
        return pa.table({
            self.id_col: batch[self.id_col],
            "sample_rate": pa.array(rate, pa.int32()),
            "n_channels": pa.array(chans, pa.int32()),
            "duration_sec": pa.array(dur, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
            "peak": pa.array(peak, pa.float64()),
            "zcr": pa.array(zcr, pa.float64()),
        })


def audio_features(ds, payload_col: str = "audio", id_col: str = "url",
                   concurrency=(1, 8), batch_size: int = 64):
    """Audio feature stage wiring: actor pool, byte-aware small
    batches (same giant-row contract as decode_images)."""
    return ds.select_columns([id_col, payload_col]).map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_nearest(img, out_h: int, out_w: int):
    """Nearest-neighbor resize of (H, W, C) via pixel-center index
    mapping: src = floor((dst + 0.5) * in/out) — the OpenCV/PIL-nearest
    convention, exact integer selection (no resampling arithmetic)."""
    import numpy as np

    h, w = img.shape[:2]
    yy = np.minimum((np.arange(out_h) + 0.5) * h / out_h, h - 1).astype(np.int64)
    xx = np.minimum((np.arange(out_w) + 0.5) * w / out_w, w - 1).astype(np.int64)
    return img[yy[:, None], xx[None, :]]


def resize_bilinear(img, out_h: int, out_w: int):
    """Bilinear resize of (H, W, C) float64 with half-pixel centers
    (align_corners=False convention), fully vectorized."""
    import numpy as np

    h, w = img.shape[:2]
    a = img.astype(np.float64)
    fy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    fx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


class ResizeImage:
    """Actor-pool stage: binary payload → decode → resize → (id, out
    dims, resized mean). `method` = "nearest" (exact integer pixel
    selection — SQL-recomputable on synthetic payloads) or "bilinear".
    Rows whose payload fails to decode emit width 0 (same null
    contract as DecodeImageStub)."""

    def __init__(self, out_h: int, out_w: int, method: str = "nearest",
                 payload_col: str = "html", id_col: str = "url"):
        self.out_h, self.out_w = out_h, out_w
        self.method = method
        self.payload_col = payload_col
        self.id_col = id_col

    def _resize(self, img):
        if self.method == "nearest":
            return resize_nearest(img, self.out_h, self.out_w)
        return resize_bilinear(img, self.out_h, self.out_w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from webvalid.ops.imagecodec import decode_jpeg, decode_png

        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        widths = np.zeros(n, dtype=np.int32)
        heights = np.zeros(n, dtype=np.int32)
        means = np.full(n, np.nan)
        for i, p in enumerate(payloads):
            if p is None:
                continue
            img = decode_png(p)
            if img is None:
                img = decode_jpeg(p)
            if img is None:
                continue
            out = self._resize(img)
            widths[i], heights[i] = self.out_w, self.out_h
            means[i] = float(np.asarray(out, dtype=np.float64).mean() / 255.0)
        return pa.table({
            self.id_col: batch[self.id_col],
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "mean_intensity": pa.array(means, pa.float64()),
        })


def resize_images(ds, out_h: int, out_w: int, method: str = "nearest",
                  payload_col: str = "html", id_col: str = "url",
                  concurrency=(1, 8), batch_size: int = 256):
    """Resize stage wiring: same actor-pool shape as decode_images."""
    return ds.select_columns([id_col, payload_col]).map_batches(
        ResizeImage,
        fn_constructor_kwargs={"out_h": out_h, "out_w": out_w,
                               "method": method,
                               "payload_col": payload_col,
                               "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
