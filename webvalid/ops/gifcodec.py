"""Pure-Python/NumPy GIF codec (decode + test encoder).

Extends the engine's real-format coverage (PNG, baseline JPEG, BMP,
PNM, WAV, MJPEG/AVI) with GIF87a/89a — the remaining common web image
format. Public knowledge only: the GIF89a specification (logical
screen descriptor, color tables, image descriptor, interlacing) and
standard LZW with variable code width (max 12 bits), clear/EOI codes.

Decode returns the FIRST image frame as (h, w, 3) uint8 RGB (animated
GIFs: frame 1 — the stage contract is thumbnail-style inspection, not
animation). The encoder exists so tests and gates can synthesize
deterministic fixtures; it uses the classic 'uncompressed GIF'
technique (literal codes with periodic clear codes so the code width
never grows), which every conforming decoder accepts.

Scale shape: per-payload work inside the actor-pool decode stage; the
LZW inner loop is per-code Python (bounded by pixel count) — fine for
web-thumbnail payloads; giant images should ride the PNG/JPEG paths.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    acc = bits = pos = 0
    out = bytearray()
    prev: bytes | None = None
    n = len(data)
    while True:
        while bits < width:
            if pos >= n:
                return out  # truncated stream: surface what decoded
            acc |= data[pos] << bits
            pos += 1
            bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table) and (code < clear or code > eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_pixels:
            return out


def _valueerror_on_truncation(fn):
    """Truncated payloads hit struct.unpack_from / payload[pos] /
    np.frombuffer mid-parse — normalize struct.error and IndexError to
    ValueError so the codec-dispatch fallback handlers (which catch
    ValueError) actually take corrupt web payloads."""
    import functools

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        try:
            return fn(*a, **kw)
        except (struct.error, IndexError) as e:
            raise ValueError(f"truncated GIF payload: {e}") from e
    return wrapper


@_valueerror_on_truncation
def decode_gif(payload: bytes):
    """First frame of a GIF87a/89a as (h, w, 3) uint8 RGB, or None if
    the payload is not a GIF. Raises ValueError on a corrupt GIF."""
    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (
            b"7a", b"9a"):
        return None
    pos = 6
    _, _, packed, _, _ = struct.unpack_from("<HHBBB", payload, pos)
    pos += 7
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, size * 3,
                            pos).reshape(size, 3)
        pos += size * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + len-prefixed sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += payload[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _, _, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        pal = gct
        if ipacked & 0x80:
            size = 2 << (ipacked & 0x07)
            pal = np.frombuffer(payload, np.uint8, size * 3,
                                pos).reshape(size, 3)
            pos += size * 3
        if pal is None:
            raise ValueError("GIF image without a color table")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while pos < len(payload) and payload[pos]:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += ln + 1
        pos += 1
        idx = np.frombuffer(
            bytes(_lzw_decode(b"".join(chunks), min_code, w * h)), np.uint8)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data truncated")
        idx = idx[:w * h].reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            rows = np.concatenate([np.arange(start, h, step)
                                   for start, step in _INTERLACE_PASSES])
            de = np.empty_like(idx)
            de[rows] = idx
            idx = de
        return pal[np.minimum(idx, len(pal) - 1)]
    raise ValueError("GIF contains no image block")


def encode_gif(img: np.ndarray, interlaced: bool = False) -> bytes:
    """Grayscale (h, w) uint8 → GIF89a with a 256-entry gray palette,
    written as 'uncompressed' LZW (literal codes + periodic clears so
    the code width stays at 9 bits)."""
    img = np.asarray(img, np.uint8)
    if img.ndim != 2:
        raise ValueError("test encoder takes a grayscale (h, w) image")
    h, w = img.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlaced else 0)
    rows = img
    if interlaced:
        order = np.concatenate([np.arange(start, h, step)
                                for start, step in _INTERLACE_PASSES])
        rows = img[order]
    pixels = rows.reshape(-1)
    clear, eoi = 256, 257
    codes = [clear]
    run = 0
    for p in pixels.tolist():
        codes.append(p)
        run += 1
        if run == 250:  # keep the decoder's table under 2^9 entries
            codes.append(clear)
            run = 0
    codes.append(eoi)
    acc = bits = 0
    stream = bytearray()
    for c in codes:
        acc |= c << bits
        bits += 9
        while bits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        stream.append(acc & 0xFF)
    out.append(8)  # LZW min code size
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)


@_valueerror_on_truncation
def decode_gif_frames(payload: bytes, every: int = 1,
                      max_frames: int | None = None) -> list[tuple]:
    """(frame_idx, (h, w, 3) RGB) for every `every`-th frame of an
    animated GIF whose frames each cover the FULL logical screen (the
    common full-redraw case). Partial-region frames would need disposal
    compositing — out of scope, raised loudly so the caller's fallback
    path takes the payload. Returns None for non-GIF payloads."""
    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (
            b"7a", b"9a"):
        return None
    sw, sh, packed = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, size * 3,
                            pos).reshape(size, 3)
        pos += size * 3
    frames: list[tuple] = []
    fi = -1
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += payload[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB",
                                                      payload, pos + 1)
        pos += 10
        pal = gct
        if ipacked & 0x80:
            size = 2 << (ipacked & 0x07)
            pal = np.frombuffer(payload, np.uint8, size * 3,
                                pos).reshape(size, 3)
            pos += size * 3
        if (left, top, w, h) != (0, 0, sw, sh):
            raise ValueError("partial-region GIF frame: disposal "
                             "compositing not implemented")
        if pal is None:
            raise ValueError("GIF frame without a color table")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while pos < len(payload) and payload[pos]:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += ln + 1
        pos += 1
        fi += 1
        if fi % every:
            continue
        if max_frames is not None and len(frames) >= max_frames:
            continue
        idx = np.frombuffer(
            bytes(_lzw_decode(b"".join(chunks), min_code, w * h)), np.uint8)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data truncated")
        idx = idx[:w * h].reshape(h, w)
        if ipacked & 0x40:
            rows = np.concatenate([np.arange(start, step_h, step)
                                   for (start, step), step_h in
                                   zip(_INTERLACE_PASSES, [h] * 4)])
            de = np.empty_like(idx)
            de[rows] = idx
            idx = de
        frames.append((fi, pal[np.minimum(idx, len(pal) - 1)]))
    return frames


def encode_gif_animation(imgs: list[np.ndarray]) -> bytes:
    """Grayscale frames (all full logical-screen size) → animated
    GIF89a, one image block per frame (test encoder)."""
    if not imgs:
        raise ValueError("need at least one frame")
    h, w = np.asarray(imgs[0]).shape
    single = [encode_gif(np.asarray(im, np.uint8)) for im in imgs]
    # splice: header+LSD+GCT from the first, image blocks from each
    head_len = 13 + 256 * 3
    out = bytearray(single[0][:head_len])
    for s in single:
        out += s[head_len:-1]  # strip the trailer byte
    out += b"\x3B"
    return bytes(out)
