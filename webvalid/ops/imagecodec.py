"""Pure-NumPy image codecs: PNG (full lossless) and baseline JPEG.

The container ships no image libraries, but `decode_images` shouldn't
fake-decode the two formats that dominate web corpora. Both decoders
are real implementations of the public specs (PNG RFC 2083 / ISO
15948; JPEG ITU-T T.81 baseline sequential):

- PNG: chunk walk → zlib inflate → per-row unfilter (None/Up fully
  vectorized; Sub via per-channel cumsum mod 256; Average/Paeth scalar
  along the row) for gray / RGB / RGBA, 8-bit, non-interlaced.
- JPEG: marker parse (DQT/SOF0/DHT/SOS/DRI), byte-unstuffed bitstream,
  Huffman-decoded MCUs, dequantize + dezigzag, exact float IDCT via
  the 8×8 DCT-III matrix, 4:4:4 / 4:2:0 / grayscale, restart markers.

Matching ENCODERS (PNG filter-0; JPEG grayscale 4:4:4 with the Annex K
tables) exist so tests and gates can synthesize real payloads
deterministically — PNG round-trips bit-exact; JPEG round-trips within
quantization error (flat blocks within ±2).

Everything here is derived from the public format specifications.
No reference analogue (the reference is a CSV drift engine);
multimodal decode is a north-rule training-data addition.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes):
    """payload → (height, width, channels) uint8 array, or None if not
    a decodable PNG (8-bit gray/RGB/RGBA, non-interlaced)."""
    if not payload.startswith(_PNG_SIG):
        return None
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    try:
        while pos + 8 <= len(payload):
            length, ctype = struct.unpack(">I4s", payload[pos:pos + 8])
            pos += 8
            data = payload[pos:pos + length]
            pos += length + 4  # skip CRC
            if ctype == b"IHDR":
                (width, height, bit_depth, color_type, _comp, _filt,
                 interlace) = struct.unpack(">IIBBBBB", data)
            elif ctype == b"IDAT":
                idat.extend(data)
            elif ctype == b"IEND":
                break
        if width is None or bit_depth != 8 or interlace != 0:
            return None
        channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
        if channels is None:
            return None
        stride = width * channels
        expected = height * (stride + 1)
        # bounded inflate: the exact output size is known from IHDR, so
        # never inflate more than that (an unbounded zlib.decompress on
        # attacker bytes is a decompression-bomb memory DoS)
        raw = zlib.decompressobj().decompress(bytes(idat), expected)
    except Exception:
        return None
    if len(raw) < height * (stride + 1):
        return None
    rows = np.frombuffer(raw, dtype=np.uint8,
                         count=height * (stride + 1)).reshape(height,
                                                              stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int64)
    out = np.zeros((height, stride), dtype=np.int64)
    bpp = channels
    for y in range(height):
        f = filters[y]
        row = data[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub: per-channel cumsum mod 256
            r = row.reshape(width, bpp)
            out[y] = (np.cumsum(r, axis=0) % 256).reshape(stride)
        elif f == 2:  # Up
            out[y] = (row + prev) % 256
        elif f == 3:  # Average
            cur = out[y]
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (row[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth
            cur = out[y]
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                cur[x] = (row[x] + pred) % 256
        else:
            return None
    return out.astype(np.uint8).reshape(height, width, channels)


def encode_png(img: np.ndarray) -> bytes:
    """(H, W[, C]) uint8 → PNG bytes (filter 0, one IDAT)."""
    assert img.dtype == np.uint8
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    assert c in (1, 2, 3, 4)
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# JPEG (baseline sequential, ITU-T T.81)
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8x8 DCT-II basis matrix: C[k, n] = a_k * cos((2n+1) k pi / 16)
_DCT = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else 0.5
    _DCT[_k] = _a * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16)

# Annex K luminance quantization table (quality 50 base)
_QY_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

# Annex K typical Huffman tables (bits counts + symbol values)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
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


def _build_decode_table(bits, vals):
    """{(length, code): symbol} per T.81 C.2 canonical code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals):
    """{symbol: (length, code)}."""
    return {sym: (ln, code)
            for (ln, code), sym in _build_decode_table(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over byte-unstuffed entropy data."""

    __slots__ = ("data", "pos", "bitbuf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise EOFError
            self.bitbuf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _unstuff(scan: bytes) -> tuple[bytes, list[int]]:
    """Remove 0xFF00 stuffing; record restart-marker split points."""
    out = bytearray()
    marks = []
    i = 0
    n = len(scan)
    while i < n:
        b = scan[i]
        if b == 0xFF:
            nxt = scan[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                out.append(0xFF)
                i += 2
                continue
            if nxt == 0xFF:            # fill byte before a marker
                i += 1
                continue
            if 0xD0 <= nxt <= 0xD7:   # RSTn
                marks.append(len(out))
                i += 2
                continue
            break                      # EOI / next marker
        out.append(b)
        i += 1
    return bytes(out), marks


def decode_jpeg(payload: bytes):
    """payload → (height, width, channels) uint8, or None if not a
    decodable baseline JPEG (gray, 4:4:4, or 4:2:0 YCbCr)."""
    if not payload.startswith(b"\xFF\xD8"):
        return None
    try:
        return _decode_jpeg_inner(payload)
    except Exception:
        return None


def _decode_jpeg_inner(payload: bytes):
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None
    width = height = None
    restart_interval = 0
    scan_comps = None
    scan_data = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1
        if pos >= len(payload):
            return None
        marker = payload[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq != 0:
                    return None  # 16-bit tables: not baseline-common
                qt[tq] = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                i += 64
        elif marker == 0xC0:  # SOF0 baseline
            _prec, height, width, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3):  # non-baseline SOF
            return None
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                tbl = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cs, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan_comps.append({"id": cs, "td": tt >> 4, "ta": tt & 0xF})
            scan_data = payload[pos + seglen:]
            break
        pos += seglen
    if comps is None or scan_data is None:
        return None

    if len(comps) not in (1, 3):
        return None  # CMYK/NChannel: out of contract — None, not garbage
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-width // mcu_w)
    mcus_y = -(-height // mcu_h)
    data, _marks = _unstuff(scan_data)
    br = _BitReader(data)
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] | {"td": s["td"], "ta": s["ta"]}
             for s in scan_comps]
    planes = [np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]),
                       dtype=np.float64) for c in order]
    pred = [0] * len(order)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.nbits = 0                  # byte-align at restart
                pred = [0] * len(order)
            n_mcu += 1
            for ci, c in enumerate(order):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        t = br.decode_huff(huff_dc[c["td"]])
                        diff = _extend(br.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.decode_huff(huff_ac[c["ta"]])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break     # EOB
                            k += r
                            coef[k] = _extend(br.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coef * qt[c["tq"]]
                        b8 = block.reshape(8, 8)
                        pix = _DCT.T @ b8 @ _DCT + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
    out_planes = []
    for c, p in zip(order, planes):
        if c["h"] != hmax or c["v"] != vmax:   # upsample (nearest)
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out_planes.append(p[:height, :width])
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return g[:, :, None]
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def encode_jpeg_gray(img: np.ndarray, quality: int = 85) -> bytes:
    """(H, W) uint8 grayscale → baseline JPEG bytes (Annex K tables)."""
    assert img.ndim == 2 and img.dtype == np.uint8
    assert 1 <= quality <= 100
    h, w = img.shape
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((_QY_BASE * scale + 50) // 100, 1, 255)
    dc_tab = _build_encode_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_tab = _build_encode_table(_AC_LUM_BITS, _AC_LUM_VALS)

    bits = bytearray()
    bitbuf = 0
    nbits = 0

    def put(code: int, length: int):
        nonlocal bitbuf, nbits
        for i in range(length - 1, -1, -1):
            bitbuf = (bitbuf << 1) | ((code >> i) & 1)
            nbits += 1
            if nbits == 8:
                bits.append(bitbuf)
                if bitbuf == 0xFF:
                    bits.append(0x00)
                bitbuf = 0
                nbits = 0

    def magnitude(v: int) -> tuple[int, int]:
        t = int(abs(v)).bit_length()
        return (t, v if v >= 0 else v + (1 << t) - 1)

    hp = -(-h // 8) * 8
    wp = -(-w // 8) * 8
    padded = np.empty((hp, wp), dtype=np.float64)
    padded[:h, :w] = img
    padded[h:, :w] = img[-1:, :]        # edge-replicate padding
    padded[:, w:] = padded[:, w - 1:w]
    pred = 0
    q_zz = q[_ZIGZAG]  # DQT payload and quantization run in zigzag order
    for by in range(0, hp, 8):
        for bx in range(0, wp, 8):
            blk = padded[by:by + 8, bx:bx + 8] - 128.0
            coef = _DCT @ blk @ _DCT.T
            zz = coef.reshape(64)[_ZIGZAG]
            qz = np.round(zz / q_zz).astype(np.int64)
            diff = int(qz[0]) - pred
            pred = int(qz[0])
            t, mag = magnitude(diff)
            ln, code = dc_tab[t]
            put(code, ln)
            if t:
                put(mag, t)
            run = 0
            last_nz = np.flatnonzero(qz[1:])
            last = int(last_nz[-1]) + 1 if len(last_nz) else 0
            for k in range(1, last + 1):
                v = int(qz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_tab[0xF0]
                    put(code, ln)
                    run -= 16
                t, mag = magnitude(v)
                ln, code = ac_tab[(run << 4) | t]
                put(code, ln)
                put(mag, t)
                run = 0
            if last < 63:
                ln, code = ac_tab[0x00]
                put(code, ln)
    if nbits:
        pad = 8 - nbits
        put((1 << pad) - 1, pad)  # pad with 1-bits to the byte edge
    scan = bytes(bits)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes(int(x) for x in q_zz))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht_dc = seg(0xC4, b"\x00" + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
    dht_ac = seg(0xC4, b"\x10" + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS))
    sos = seg(0xDA, b"\x01" + bytes([1, 0x00]) + b"\x00\x3F\x00")
    return (b"\xFF\xD8" + dqt + sof + dht_dc + dht_ac + sos
            + scan + b"\xFF\xD9")


def encode_jpeg_color(img: np.ndarray, quality: int = 85,
                      subsample: str = "444") -> bytes:
    """(H, W, 3) uint8 RGB → baseline JPEG (YCbCr, 4:4:4 or 4:2:0).

    Test-support encoder exercising the decoder's color + chroma
    upsampling paths; all components share the Annex K luminance
    tables (legal, simpler)."""
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    assert 1 <= quality <= 100
    h, w = img.shape[:2]
    a = img.astype(np.float64)
    y = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    cb = -0.168736 * a[:, :, 0] - 0.331264 * a[:, :, 1] + 0.5 * a[:, :, 2] + 128
    cr = 0.5 * a[:, :, 0] - 0.418688 * a[:, :, 1] - 0.081312 * a[:, :, 2] + 128
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((_QY_BASE * scale + 50) // 100, 1, 255)
    q_zz = q[_ZIGZAG]
    dc_tab = _build_encode_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_tab = _build_encode_table(_AC_LUM_BITS, _AC_LUM_VALS)

    if subsample == "420":
        hy, vy = 2, 2
    else:
        hy, vy = 1, 1
    mcu_w, mcu_h = 8 * hy, 8 * vy
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)

    def pad_to(p, H, W):
        out = np.empty((H, W), dtype=np.float64)
        ph, pw = p.shape
        out[:ph, :pw] = p
        out[ph:, :pw] = p[-1:, :]
        out[:, pw:] = out[:, pw - 1:pw]
        return out

    yp = pad_to(y, mcus_y * mcu_h, mcus_x * mcu_w)
    if subsample == "420":
        cbp = pad_to(cb, mcus_y * mcu_h, mcus_x * mcu_w)
        crp = pad_to(cr, mcus_y * mcu_h, mcus_x * mcu_w)
        # 2x2 box downsample
        cbp = cbp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
        crp = crp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
    else:
        cbp = pad_to(cb, mcus_y * 8, mcus_x * 8)
        crp = pad_to(cr, mcus_y * 8, mcus_x * 8)

    bits = bytearray()
    state = {"buf": 0, "n": 0}

    def put(code: int, length: int):
        for i in range(length - 1, -1, -1):
            state["buf"] = (state["buf"] << 1) | ((code >> i) & 1)
            state["n"] += 1
            if state["n"] == 8:
                bits.append(state["buf"])
                if state["buf"] == 0xFF:
                    bits.append(0x00)
                state["buf"] = 0
                state["n"] = 0

    def magnitude(v: int):
        t = int(abs(v)).bit_length()
        return t, (v if v >= 0 else v + (1 << t) - 1)

    def encode_block(blk, pred):
        coef = _DCT @ (blk - 128.0) @ _DCT.T
        zz = coef.reshape(64)[_ZIGZAG]
        qz = np.round(zz / q_zz).astype(np.int64)
        diff = int(qz[0]) - pred
        t, mag = magnitude(diff)
        ln, code = dc_tab[t]
        put(code, ln)
        if t:
            put(mag, t)
        run = 0
        nz = np.flatnonzero(qz[1:])
        last = int(nz[-1]) + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(qz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_tab[0xF0]
                put(code, ln)
                run -= 16
            t, mag = magnitude(v)
            ln, code = ac_tab[(run << 4) | t]
            put(code, ln)
            put(mag, t)
            run = 0
        if last < 63:
            ln, code = ac_tab[0x00]
            put(code, ln)
        return int(qz[0])

    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(vy):
                for bx in range(hy):
                    y0, x0 = (my * vy + by) * 8, (mx * hy + bx) * 8
                    preds[0] = encode_block(yp[y0:y0 + 8, x0:x0 + 8], preds[0])
            for ci, p in ((1, cbp), (2, crp)):
                y0, x0 = my * 8, mx * 8
                preds[ci] = encode_block(p[y0:y0 + 8, x0:x0 + 8], preds[ci])
    if state["n"]:
        pad = 8 - state["n"]
        put((1 << pad) - 1, pad)
    scan = bytes(bits)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    samp = (hy << 4) | vy
    sof_body = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, samp, 0, 2, 0x11, 0, 3, 0x11, 0])
    dqt = seg(0xDB, b"\x00" + bytes(int(x) for x in q_zz))
    sof = seg(0xC0, sof_body)
    dht_dc = seg(0xC4, b"\x00" + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
    dht_ac = seg(0xC4, b"\x10" + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS))
    sos = seg(0xDA, b"\x03" + bytes([1, 0x00, 2, 0x00, 3, 0x00])
              + b"\x00\x3F\x00")
    return (b"\xFF\xD8" + dqt + sof + dht_dc + dht_ac + sos
            + scan + b"\xFF\xD9")


# luma used for mean_intensity (ITU-R 601-2, PIL convert("L") weights)
def luma_mean(img: np.ndarray) -> float:
    """Mean luminance in [0, 1] of an (H, W, C) uint8 array
    (C = 1 gray, 2 gray+alpha, 3 RGB, 4 RGBA; alpha ignored)."""
    a = img.astype(np.float64)
    if a.shape[2] < 3:
        g = a[:, :, 0]          # gray / gray+alpha
    else:
        g = (a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114) / 1000
    return float(g.mean() / 255.0)
