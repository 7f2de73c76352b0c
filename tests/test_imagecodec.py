"""Pure-NumPy PNG / baseline-JPEG codec tests (ops/imagecodec.py)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

from webvalid.ops.imagecodec import (decode_jpeg, decode_png,
                                     encode_jpeg_color, encode_jpeg_gray,
                                     encode_png, luma_mean)


def test_png_roundtrip_exact_all_channel_counts():
    rng = np.random.default_rng(0)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, (37, 53, c), dtype=np.uint8)
        dec = decode_png(encode_png(img))
        assert dec is not None and dec.shape == img.shape
        assert (dec == img).all()


def test_png_decoder_handles_all_filter_types():
    """Hand-build a PNG whose rows use filters 0-4; decode must
    recover the original exactly (filters per RFC 2083 §6)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 11, 3), dtype=np.uint8)
    h, w, bpp = img.shape
    rows = []
    prev = np.zeros(w * bpp, dtype=np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = img[y].reshape(-1).astype(np.int64)
        if f == 0:
            raw = cur
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            raw = (cur - left) % 256
        elif f == 2:
            raw = (cur - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            raw = (cur - (left + prev) // 2) % 256
        else:  # paeth
            raw = np.zeros_like(cur)
            for x in range(len(cur)):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else cc)
                raw[x] = (cur[x] - pred) % 256
        rows.append(bytes([f]) + raw.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"".join(rows)))
               + chunk(b"IEND", b""))
    dec = decode_png(payload)
    assert dec is not None and (dec == img).all()


def test_jpeg_gray_roundtrip_within_quant_error():
    x, y = np.meshgrid(np.arange(64), np.arange(48))
    grad = ((x * 2 + y * 3) % 256).astype(np.uint8)
    d = decode_jpeg(encode_jpeg_gray(grad, quality=90))
    assert d.shape == (48, 64, 1)
    err = np.abs(d[:, :, 0].astype(int) - grad.astype(int))
    assert err.max() <= 12 and err.mean() < 1.0
    flat = np.full((40, 56), 137, dtype=np.uint8)
    df_ = decode_jpeg(encode_jpeg_gray(flat))
    assert np.abs(df_[:, :, 0].astype(int) - 137).max() <= 2


def test_jpeg_color_444_and_420_roundtrip():
    x, y = np.meshgrid(np.arange(40), np.arange(32))
    img = np.stack([(x * 3) % 256, (y * 5) % 256, (x + y) % 256],
                   axis=2).astype(np.uint8)
    for ss, tol in (("444", 4), ("420", 12)):
        d = decode_jpeg(encode_jpeg_color(img, quality=90, subsample=ss))
        assert d.shape == img.shape, ss
        assert np.abs(d.astype(int) - img.astype(int)).max() <= tol, ss


def test_jpeg_odd_dimensions_pad_and_crop():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (33, 41), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg_gray(img, quality=75))
    assert d.shape == (33, 41, 1)


def test_decode_images_actor_pool_decodes_real_png_jpeg(ray_session):
    import ray.data

    from webvalid.ops.multimodal import decode_images

    rng = np.random.default_rng(9)
    rows = []
    truth = {}
    for i in range(24):
        w, h = 16 + i % 7, 16 + i % 5
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        payload = encode_png(img[:, :, None]) if i % 2 == 0 \
            else encode_jpeg_gray(img, quality=90)
        rows.append({"url": f"u{i}", "img": payload})
        truth[f"u{i}"] = (w, h, float(img.astype(np.float64).mean() / 255.0))
    ds = ray.data.from_items(rows).repartition(3)
    out = decode_images(ds, payload_col="img", id_col="url").to_pandas()
    assert len(out) == 24
    for _, r in out.iterrows():
        w, h, m = truth[r["url"]]
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["mean_intensity"] - m) <= 0.02


def test_luma_mean_rgb_weights():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[:, :, 0] = 255  # pure red
    assert abs(luma_mean(img) - 299 / 1000) < 1e-12


def test_resize_nearest_exact_selection():
    from webvalid.ops.multimodal import resize_nearest

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (17, 29, 3), dtype=np.uint8)
    out = resize_nearest(img, 8, 8)
    assert out.shape == (8, 8, 3)
    for dy in range(8):
        for dx in range(8):
            sy = min(int((dy + 0.5) * 17 / 8), 16)
            sx = min(int((dx + 0.5) * 29 / 8), 28)
            assert (out[dy, dx] == img[sy, sx]).all()


def test_resize_bilinear_interpolates():
    from webvalid.ops.multimodal import resize_bilinear

    # constant image stays constant under any resize
    flat = np.full((10, 14, 1), 77, dtype=np.uint8)
    out = resize_bilinear(flat, 5, 9)
    assert np.allclose(out, 77.0)
    # a horizontal ramp keeps monotone rows
    ramp = np.tile(np.arange(32, dtype=np.uint8), (8, 1))[:, :, None]
    out = resize_bilinear(ramp, 4, 16)
    assert (np.diff(out[0, :, 0]) >= 0).all()
    # upscaling a 2x2 checker yields intermediate values
    chk = np.array([[0, 255], [255, 0]], dtype=np.uint8)[:, :, None]
    out = resize_bilinear(chk, 4, 4)
    assert 0 < out[1, 1, 0] < 255


def test_resize_images_actor_pool(ray_session):
    import ray.data

    from webvalid.ops.multimodal import resize_images, resize_nearest

    rng = np.random.default_rng(15)
    rows, truth = [], {}
    for i in range(12):
        img = rng.integers(0, 256, (11 + i, 13 + i), dtype=np.uint8)
        rows.append({"url": f"u{i}", "img": encode_png(img[:, :, None])})
        truth[f"u{i}"] = resize_nearest(img[:, :, None], 6, 6).mean() / 255.0
    ds = ray.data.from_items(rows).repartition(2)
    out = resize_images(ds, 6, 6, payload_col="img", id_col="url").to_pandas()
    for _, r in out.iterrows():
        assert (r["width"], r["height"]) == (6, 6)
        assert abs(r["mean_intensity"] - truth[r["url"]]) < 1e-12


def test_png_gray_alpha_roundtrip_and_luma():
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (9, 7, 2), dtype=np.uint8)  # gray+alpha
    d = decode_png(encode_png(img))
    assert d is not None and (d == img).all()
    # luma ignores alpha: channel 0 mean
    assert abs(luma_mean(d) - img[:, :, 0].mean() / 255.0) < 1e-12


def test_png_decompression_bomb_bounded():
    """IDAT inflating far past the IHDR-implied size must not allocate
    unbounded memory — decode inflates at most the expected bytes."""
    bomb = zlib.compress(b"\x00" * (64 * 1024 * 1024), 9)

    def chunk(ct, data):
        return (struct.pack(">I", len(data)) + ct + data
                + struct.pack(">I", zlib.crc32(ct + data) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
    d = decode_png(payload)  # prefix decodes to the declared 4x4 image
    assert d is None or d.shape == (4, 4, 1)


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: 0xFF fill bytes may precede any marker."""
    good = encode_jpeg_gray(np.full((16, 16), 99, np.uint8))
    i = good.index(b"\xFF\xC0")
    filled = good[:i] + b"\xFF\xFF" + good[i:]
    d = decode_jpeg(filled)
    assert d is not None and d.shape == (16, 16, 1)
    assert abs(int(d[0, 0, 0]) - 99) <= 2


def test_avi_mjpeg_roundtrip_exact():
    """Mux deterministic constant-gray JPEG frames into an AVI, parse
    the container back, decode sampled frames: dims exact, luma within
    JPEG quantization of the source level."""
    import numpy as np

    from webvalid.ops.imagecodec import encode_jpeg_gray
    from webvalid.ops.videocodec import (decode_avi_frames,
                                         encode_avi_mjpeg,
                                         parse_avi_mjpeg)

    levels = [40, 90, 140, 190, 65, 115]
    jpegs = [encode_jpeg_gray(np.full((24, 40), L, np.uint8), quality=90)
             for L in levels]
    avi = encode_avi_mjpeg(jpegs, 40, 24, fps=5)
    meta = parse_avi_mjpeg(avi)
    assert (meta["width"], meta["height"]) == (40, 24)
    assert meta["n_frames"] == 6 and len(meta["frames"]) == 6
    assert meta["usec_per_frame"] == 200_000
    dec = decode_avi_frames(avi, every=2, max_frames=3)
    assert [fi for fi, _ in dec] == [0, 2, 4]
    for fi, img in dec:
        assert img.shape[:2] == (24, 40)
        assert abs(float(img.mean()) - levels[fi]) <= 1.0


def test_avi_parser_rejects_non_mjpeg():
    import struct

    import pytest

    from webvalid.ops.videocodec import parse_avi_mjpeg

    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        parse_avi_mjpeg(b"GIF89a whatever")
    # valid RIFF but a non-MJPEG stream handler must be refused loudly
    import numpy as np

    from webvalid.ops.imagecodec import encode_jpeg_gray
    from webvalid.ops.videocodec import encode_avi_mjpeg

    avi = bytearray(encode_avi_mjpeg(
        [encode_jpeg_gray(np.full((8, 8), 50, np.uint8))], 8, 8))
    pos = avi.find(b"vids") + 4
    avi[pos:pos + 4] = b"H264"
    with pytest.raises(ValueError, match="unsupported video handler"):
        parse_avi_mjpeg(bytes(avi))


def test_video_sampler_stage_real_and_fallback(ray_session):
    """The actor-pool stage decodes AVI payloads for real (dims + luma)
    and falls back to the byte-window contract (decoded=False, null
    dims) for non-AVI payloads — honest per-row provenance."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webvalid.ops.imagecodec import encode_jpeg_gray
    from webvalid.ops.multimodal import sample_video
    from webvalid.ops.videocodec import encode_avi_mjpeg

    jpegs = [encode_jpeg_gray(np.full((16, 16), L, np.uint8), quality=90)
             for L in (30, 60, 90, 120)]
    avi = encode_avi_mjpeg(jpegs, 16, 16)
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "video": pa.array([avi, b"\x00" * 9000, None],
                                    pa.binary())})
    out = sample_video(ray.data.from_arrow(t), every=2, max_frames=2,
                       concurrency=1).to_pandas()
    real = out[out.doc_id == 1].sort_values("frame_idx")
    assert real["frame_idx"].tolist() == [0, 2]
    assert real["decoded"].all() and (real["width"] == 16).all()
    assert np.allclose(real["mean_luma"], [30, 90], atol=1.0)
    fb = out[out.doc_id == 2]
    assert (~fb["decoded"]).all() and fb["width"].isna().all()
    assert (out.doc_id != 3).all()  # null payload -> no rows


def test_gif_roundtrip_pixel_exact():
    """GIF is lossless: decode(encode(img)) reproduces every pixel,
    interlaced or not, across shapes including 1x1."""
    import numpy as np

    from webvalid.ops.gifcodec import decode_gif, encode_gif

    rng = np.random.default_rng(7)
    for h, w in [(16, 16), (23, 41), (64, 64), (1, 1), (3, 260)]:
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        for inter in (False, True):
            dec = decode_gif(encode_gif(img, interlaced=inter))
            assert dec.shape == (h, w, 3)
            assert (dec[:, :, 0] == img).all(), (h, w, inter)
            assert (dec[:, :, 2] == img).all()


def test_gif_decoder_guards():
    import pytest

    from webvalid.ops.gifcodec import decode_gif, encode_gif

    assert decode_gif(b"not a gif at all") is None
    assert decode_gif(b"GIF8") is None  # too short
    import numpy as np

    gif = bytearray(encode_gif(np.zeros((4, 4), np.uint8)))
    gif = gif[: len(gif) // 2]  # truncate mid image data
    with pytest.raises(ValueError):
        decode_gif(bytes(gif) + b"\x00\x3B")


def test_decode_stage_handles_gif(ray_session):
    """The actor-pool decode stage recognizes GIF payloads and decodes
    them for real (exact dims + exact mean)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webvalid.ops.gifcodec import encode_gif
    from webvalid.ops.multimodal import decode_images

    img = (np.arange(15 * 9, dtype=np.uint8).reshape(9, 15) * 3) % 256
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "img": pa.array([encode_gif(img)], pa.binary())})
    out = decode_images(ray.data.from_arrow(t), payload_col="img",
                        id_col="doc_id", concurrency=1).to_pandas()
    assert out["width"].iloc[0] == 15 and out["height"].iloc[0] == 9
    assert abs(out["mean_intensity"].iloc[0] - img.mean() / 255.0) < 1e-9


def test_corrupt_payloads_fall_back_not_crash(ray_session):
    """A GIF with valid magic but corrupt body must fall through to the
    deterministic fake in the decode stage (never crash the batch), and
    an AVI whose 00dc chunks are not JPEG must take the sampler's
    byte-window fallback."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webvalid.ops.multimodal import decode_images, sample_video
    from webvalid.ops.videocodec import encode_avi_mjpeg

    bad_gif = b"GIF89a" + b"\x10\x00\x10\x00\x87\x00\x00" + b"\xff" * 20
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "img": pa.array([bad_gif], pa.binary())})
    out = decode_images(ray.data.from_arrow(t), payload_col="img",
                        id_col="doc_id", concurrency=1).to_pandas()
    assert len(out) == 1 and out["width"].iloc[0] > 0  # fake, not crash

    bad_avi = encode_avi_mjpeg([b"not a jpeg frame"], 8, 8)
    t2 = pa.table({"doc_id": pa.array([1], pa.int64()),
                   "video": pa.array([bad_avi], pa.binary())})
    out2 = sample_video(ray.data.from_arrow(t2), every=1, max_frames=2,
                        concurrency=1).to_pandas()
    assert (~out2["decoded"]).all() and len(out2) >= 1


def test_video_sampler_handles_animated_gif(ray_session):
    """Full-redraw animated GIFs sample through the same stage as
    MJPEG/AVI — pixel-exact luma (GIF is lossless)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webvalid.ops.gifcodec import encode_gif_animation
    from webvalid.ops.multimodal import sample_video

    frames = [np.full((10, 14), L, np.uint8) for L in (20, 70, 120, 170)]
    gif = encode_gif_animation(frames)
    t = pa.table({"doc_id": pa.array([5], pa.int64()),
                  "video": pa.array([gif], pa.binary())})
    out = sample_video(ray.data.from_arrow(t), every=2, max_frames=2,
                       concurrency=1).to_pandas().sort_values("frame_idx")
    assert out["frame_idx"].tolist() == [0, 2]
    assert out["decoded"].all()
    assert (out["width"] == 14).all() and (out["height"] == 10).all()
    assert np.allclose(out["mean_luma"], [20, 120])


def test_video_sampler_empty_container_and_truncated_gif(ray_session):
    """A container that parses but holds zero frames must surface via
    the fallback (no payload silently disappears), and a truncated GIF
    (struct-level corruption) must also take the fallback instead of
    killing the task (r4 review #1/#3)."""
    import struct

    import numpy as np
    import pyarrow as pa
    import ray.data

    from webvalid.ops.gifcodec import encode_gif
    from webvalid.ops.multimodal import sample_video

    # GIF with a trailer right after the header: parses, zero frames
    empty_gif = (b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0) + b"\x3B")
    # truncated mid image-descriptor: struct.error inside the codec
    trunc_gif = (b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0)
                 + b"\x2c\x00\x00")
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "video": pa.array([empty_gif, trunc_gif], pa.binary())})
    out = sample_video(ray.data.from_arrow(t), every=1, max_frames=2,
                       concurrency=1).to_pandas()
    assert set(out["doc_id"]) == {1, 2}  # neither payload disappears
    assert (~out["decoded"]).all()


def test_video_sampler_rec601_luma_for_color_frames(ray_session):
    """mean_luma must be Rec.601 luma, not a flat RGB mean: a pure-blue
    frame reads ~29, not 85."""
    import numpy as np

    from webvalid.ops.multimodal import VideoFrameSampler
    import pyarrow as pa

    # build a tiny color GIF: palette index 1 -> pure blue
    import struct as st

    w = h = 4
    gif = bytearray(b"GIF89a")
    gif += st.pack("<HHBBB", w, h, 0x80 | 0x00, 0, 0)  # GCT size 2
    gif += bytes([0, 0, 0, 0, 0, 255])  # palette: black, blue
    gif += st.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    # LZW min code 2: clear=4, eoi=5, codes are 3-bit; a clear every
    # 2 literals keeps the decoder's table under 2^3 so the width
    # never grows past 3 bits
    codes = [4]
    for j in range(w * h):
        codes.append(1)
        if j % 2 == 1:
            codes.append(4)
    codes.append(5)
    acc = bits = 0
    stream = bytearray()
    for c in codes:
        acc |= c << bits
        bits += 3
        while bits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        stream.append(acc & 0xFF)
    gif += bytes([2, len(stream)]) + bytes(stream) + b"\x00\x3B"
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "video": pa.array([bytes(gif)], pa.binary())})
    out = VideoFrameSampler(every=1, max_frames=1)(t).to_pandas()
    assert out["decoded"].all()
    assert abs(out["mean_luma"].iloc[0] - 255 * 0.114) < 0.5


def _lzw_compress(pixels: np.ndarray, min_code_size: int,
                  clear_every: int | None = None) -> bytes:
    """Real GIF LZW compressor (dictionary growth, variable width,
    clear at table-full or every `clear_every` codes) — test-side spec
    generator for the vectorized-decoder parity fuzz."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out_codes: list[tuple[int, int]] = []  # (code, width at emit time)

    def fresh():
        return ({bytes([i]): i for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, next_code, width = fresh()
    out_codes.append((clear, width))
    emitted = 0
    cur = b""
    for p in pixels.tolist():
        nxt = cur + bytes([p])
        if nxt in table:
            cur = nxt
            continue
        out_codes.append((table[cur], width))
        emitted += 1
        table[nxt] = next_code
        next_code += 1
        # decoder bump: after its append, len(table)==1<<width
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096 or (clear_every and emitted % clear_every == 0):
            out_codes.append((clear, width))
            table, next_code, width = fresh()
        cur = bytes([p])
    if cur:
        out_codes.append((table[cur], width))
    out_codes.append((eoi, width))
    acc = bits = 0
    stream = bytearray()
    for code, w in out_codes:
        acc |= code << bits
        bits += w
        while bits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        stream.append(acc & 0xFF)
    return bytes(stream)


def test_lzw_vectorized_matches_scalar_fuzz():
    """The batch LZW decoder must be byte-identical to the per-code
    reference on real compressed streams: dictionary growth across
    width bumps, KwKwK codes (runs), periodic clears, truncations at
    every byte length, and corrupt codes (same ValueError)."""
    import pytest

    from webvalid.ops.gifcodec import _lzw_decode, _lzw_decode_scalar

    rng = np.random.default_rng(11)
    cases = []
    # runs-heavy (KwKwK + deep chains), random, tiny, solid, few-symbol
    cases.append((np.repeat(rng.integers(0, 4, 200), rng.integers(1, 30, 200))
                  .astype(np.uint8), 2))
    cases.append((rng.integers(0, 256, 5000).astype(np.uint8), 8))
    cases.append((rng.integers(0, 16, 20000).astype(np.uint8), 4))
    cases.append((np.zeros(9000, np.uint8), 2))
    cases.append((np.array([3], np.uint8), 2))
    cases.append((np.arange(256, dtype=np.uint8).repeat(40), 8))
    for i, (pix, mcs) in enumerate(cases):
        for clear_every in (None, 37):
            data = _lzw_compress(pix, mcs, clear_every)
            n = len(pix)
            exp = _lzw_decode_scalar(data, mcs, n)
            got = _lzw_decode(data, mcs, n)
            assert bytes(got) == bytes(exp), (i, clear_every)
            assert bytes(got[:n]) == pix.tobytes(), (i, clear_every)
            # truncations: both must agree byte-for-byte at every cut
            for cut in range(0, len(data), max(1, len(data) // 23)):
                exp_t = _lzw_decode_scalar(data[:cut], mcs, n)
                got_t = _lzw_decode(data[:cut], mcs, n)
                assert bytes(got_t) == bytes(exp_t), (i, clear_every, cut)
    # n_pixels=0 (zero-area frame): the scalar emits its first entry
    # before the stop check — the fast path must match byte-for-byte
    for pix0, mcs0 in ((np.array([3, 1, 3], np.uint8), 2),
                       (np.zeros(5, np.uint8), 2)):
        d0 = _lzw_compress(pix0, mcs0, None)
        assert bytes(_lzw_decode(d0, mcs0, 0)) == \
            bytes(_lzw_decode_scalar(d0, mcs0, 0))
    # corrupt: an out-of-range code raises identically in both
    pix = rng.integers(0, 4, 50).astype(np.uint8)
    data = bytearray(_lzw_compress(pix, 2, None))
    data[3] ^= 0xFF
    results = []
    for fn in (_lzw_decode_scalar, _lzw_decode):
        try:
            results.append(bytes(fn(bytes(data), 2, 50)))
        except ValueError as e:
            results.append(str(e))
    assert results[0] == results[1]
    # corrupt code must actually raise when planted early
    bad = bytes([0xFF] * 30)
    with pytest.raises(ValueError, match="corrupt LZW stream"):
        _lzw_decode(bad, 2, 1000)
    with pytest.raises(ValueError, match="corrupt LZW stream"):
        _lzw_decode_scalar(bad, 2, 1000)
