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
LZW decode is batch-vectorized (NumPy bit-gather code extraction,
pointer-doubled table metadata, backward chain fill) — the Python loop
count is O(#clear-codes + #width-bumps + max-chain-length), not
O(#codes), so a megapixel frame costs tens of vector ops instead of a
million dict steps. `_lzw_decode_scalar` keeps the per-code reference
semantics for the fuzz parity test.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode_scalar(data: bytes, min_code_size: int,
                       n_pixels: int) -> bytearray:
    """Per-code reference decoder (GIF89a appendix F semantics).

    Kept as the behavioral spec for the vectorized `_lzw_decode`: the
    parity test fuzzes both against real LZW streams, truncations and
    corruptions and requires byte-identical output / errors.
    """
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


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """Vectorized LZW decode, byte-identical to `_lzw_decode_scalar`.

    Three vectorized phases per clear-delimited segment:
    1. code extraction — variable-width codes are pulled in one NumPy
       bit-gather per (width, gulp): each code spans ≤3 bytes, so
       b[i] | b[i+1]<<8 | b[i+2]<<16 >> (bit&7) & mask decodes a whole
       width-run at once. Width-bump positions are deterministic given
       the table size (bump exactly when base+i == 1<<width, mirroring
       the scalar equality check), so the only scan needed inside a
       gulp is for clear/EOI codes.
    2. table metadata — entry i has prefix c_{i-1}; string lengths and
       first-bytes (needed for the KwKwK case and the backward fill)
       come from pointer-doubling over the prefix array: O(log chain)
       passes of R = R[R].
    3. output fill — every emitted code writes its string backward
       (last byte at its cumsum end), walking prefix chains for all
       codes simultaneously; total writes equal total output bytes.

    Truncated streams return what decoded; corrupt codes raise the
    scalar's exact ValueError; output may overshoot n_pixels by the
    tail of the final entry, exactly like the scalar (callers slice).
    """
    if n_pixels <= 0:
        # the scalar emits its FIRST entry before the >= n_pixels stop
        # check, so n_pixels=0 yields one entry, not b"" — delegate the
        # degenerate case (it decodes at most one code) to keep the
        # byte-identical contract exact
        return _lzw_decode_scalar(data, min_code_size, n_pixels)
    clear = 1 << min_code_size
    eoi = clear + 1
    base = clear + 2
    raw = np.frombuffer(data, np.uint8)
    # one int64 copy of the payload up front: per-gulp gathers then run
    # conversion-free (a 12-bit code spans <=3 bytes at any bit offset)
    pad64 = np.empty(len(raw) + 2, np.int64)
    pad64[:len(raw)] = raw
    pad64[len(raw):] = 0
    total_bits = len(raw) * 8
    bitpos = 0
    out_parts: list[np.ndarray] = []
    out_len = 0

    def gulp(width: int, count: int) -> np.ndarray:
        nonlocal bitpos
        avail = (total_bits - bitpos) // width
        k = min(count, avail)
        if k <= 0:
            return np.empty(0, np.int64)
        starts = bitpos + width * np.arange(k, dtype=np.int64)
        b0 = starts >> 3
        v = pad64[b0] | (pad64[b0 + 1] << 8) | (pad64[b0 + 2] << 16)
        codes = (v >> (starts & 7)) & ((1 << width) - 1)
        bitpos += k * width
        return codes

    while True:
        # ---- collect one clear-delimited segment's codes -------------
        width = min_code_size + 1
        seg: list[np.ndarray] = []
        seg_len = 0
        ended_by = "trunc"  # trunc | eoi | clear | cap
        while True:
            # codes readable at this width before the bump: the bump
            # fires after reading code index i_b = (1<<width) - base
            # (scalar's len(table) == 1<<width equality — if i_b < 1 or
            # width is 12 the width never changes again this segment)
            i_b = (1 << width) - base
            if width >= 12 or i_b < max(seg_len, 1):
                run = np.iinfo(np.int64).max
            else:
                run = i_b - seg_len + 1
            # every non-clear code emits >=1 byte, so needed+2 codes
            # always reach the fill point; a clear inside the gulp
            # truncates it anyway
            cap = n_pixels - out_len - seg_len + 2
            if cap <= 0:
                ended_by = "cap"
                break
            codes = gulp(width, min(run, cap))
            if codes.size == 0:
                ended_by = "trunc"
                break
            stop = np.flatnonzero((codes == clear) | (codes == eoi))
            if stop.size:
                s = int(stop[0])
                ended_by = "clear" if codes[s] == clear else "eoi"
                # un-read the codes past the control code
                bitpos -= (codes.size - s - 1) * width
                codes = codes[:s]
                seg.append(codes)
                seg_len += codes.size
                break
            seg.append(codes)
            seg_len += codes.size
            if run <= cap and run < np.iinfo(np.int64).max:
                width += 1  # the bump the scalar takes on equality
        # ---- process the segment vectorized --------------------------
        m = seg_len
        if m:
            c = np.concatenate(seg) if len(seg) > 1 else seg[0]
            # fast path — every code a root (uncompressed-style GIFs
            # emit clears so often the table is never referenced):
            # output IS the code array, one byte per code
            if int(c.max()) < clear:
                need = n_pixels - out_len
                m_eff = m if m <= need else need
                out_parts.append(c[:m_eff].astype(np.uint8))
                out_len += m_eff
                if out_len >= n_pixels:
                    break
                if ended_by in ("trunc", "eoi"):
                    break
                continue
            # validity: c_0 must be a root; c_i may reference at most
            # the entry being created at step i (E_i = base+i-1, KwKwK)
            emax = base - 1 + np.arange(m, dtype=np.int64)
            emax[0] = clear - 1
            bad = np.flatnonzero(c > emax)
            iv = int(bad[0]) if bad.size else m
            # prefix array over roots + this segment's entries; values
            # clipped into range so pointer-doubling never indexes OOB
            # (only chains at/after the first invalid code are affected,
            # and those raise before use)
            size = base + max(m - 1, 0)
            P = np.arange(size, dtype=np.int64)
            if m > 1:
                # clip each entry's prefix BELOW its own index (valid
                # prefixes already are: c_j <= E_j = base+j-1): keeps
                # chains strictly decreasing so the doubling loop
                # terminates even on garbage prefixes past iv
                P[base:] = np.minimum(c[:-1],
                                      np.arange(base - 1, size - 1))
            # roots (first bytes) and string lengths by pointer doubling
            R = P.copy()
            D = (P != np.arange(size)).astype(np.int64)
            D[base:] = 1
            while True:
                deep = R >= base
                if not deep.any():
                    break
                D = D + D[R]
                R = R[R]
            cc = np.minimum(c, size - 1)
            lens = D[cc] + 1
            ends = np.cumsum(lens)
            fill = np.flatnonzero(ends >= n_pixels - out_len)
            ifill = int(fill[0]) if fill.size else m
            if iv <= ifill and iv < m:
                raise ValueError(f"corrupt LZW stream (code {int(c[iv])})")
            m_eff = min(ifill + 1, m)
            # last byte of each table entry = first byte (root) of the
            # string emitted when it was created
            LB = np.arange(size, dtype=np.int64)
            if m > 1:
                LB[base:] = R[cc[1:]]
            total = int(ends[m_eff - 1])
            seg_out = np.empty(total, np.uint8)
            cur = cc[:m_eff].copy()
            end = ends[:m_eff].copy()
            while cur.size:
                end -= 1
                seg_out[end] = LB[cur]
                alive = cur >= base
                cur = P[cur[alive]]
                end = end[alive]
            out_parts.append(seg_out)
            out_len += total
            if out_len >= n_pixels:
                break
        if ended_by in ("trunc", "eoi"):
            break
        if ended_by == "cap":  # unreachable guard: cap implies filled
            break
    return bytearray(
        np.concatenate(out_parts).tobytes() if out_parts else b"")


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
