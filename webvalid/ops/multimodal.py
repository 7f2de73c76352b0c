"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with metadata
(mime, width/height, duration). The decode/feature kernels are STUBBED
— the real codec libraries (PIL, ffmpeg, torchaudio) are not in this
container — behind a deterministic fake keyed by payload bytes, with
the Ray-side plumbing real and tested: actor-pool `map_batches`
stages, byte-aware batch sizing, Arrow-native binary handling (never
pandas object round-trips), fixed-dim feature output schema.

To swap in a real decoder, override `_decode_impl` (an import-try for
PIL is attempted first; `WEBVALID_FORCE_STUB=1` forces the fake).
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

    Real decode would go in `__init__` (model / codec load, once per
    actor) + `_decode_impl`; everything else — batch handling, schema,
    null propagation — is production-shaped.
    """

    def __init__(self, payload_col: str = "html", id_col: str = "url"):
        self.payload_col = payload_col
        self.id_col = id_col
        self.pil = _try_pil()
        # honor the documented contract: FORCE_STUB bypasses ALL real
        # decoders (PNM included), keeping stub runs hermetic
        self.force_stub = bool(os.environ.get("WEBVALID_FORCE_STUB"))

    def _decode_impl(self, payload: bytes) -> tuple[int, int, float]:
        if self.force_stub:
            return _fake_decode(payload)
        pnm = decode_pnm(payload)
        if pnm is not None:
            return pnm
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
