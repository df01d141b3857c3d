"""VP8L (WebP lossless) decode vs an independent forward encoder.

The encoder below is written from the spec's forward description
(canonical prefix codes, transforms as residual producers, LZ77 with
the length/distance extra-bit scheme) — not by inverting the decoder —
so the decoder's bit-level reading, code building, and inverse
transforms are checked against a second implementation of the format.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import pytest

from gfftoneo4j_ray.stages import multimodal, webp


class _BitW:
    """LSB-first bit writer (prefix-code bits written MSB-first,
    matching the DEFLATE-style packing the spec prescribes)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v: int, nbits: int):
        assert 0 <= v < (1 << nbits) or nbits == 0
        self.acc |= v << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def code(self, c: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.w((c >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.buf)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


def _huff_lengths(freq: dict[int, int], alphabet: int) -> list[int]:
    """Plain Huffman code lengths (test inputs are benign: depth ≤ 15)."""
    live = sorted(freq.items())
    if not live:
        raise ValueError("empty histogram")
    if len(live) == 1:
        out = [0] * alphabet
        out[live[0][0]] = 1
        return out
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(live)]
    heapq.heapify(heap)
    nxt = len(heap)
    depth = {s: 0 for s, _ in live}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, nxt, g1 + g2))
        nxt += 1
    out = [0] * alphabet
    for s, d in depth.items():
        assert d <= 15
        out[s] = d
    return out


def _canon_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical (code, nbits) per symbol — DEFLATE assignment."""
    live = [(ln, s) for s, ln in enumerate(lengths) if ln]
    max_len = max(ln for ln, _ in live)
    bl = [0] * (max_len + 1)
    for ln, _ in live:
        bl[ln] += 1
    nxt = [0] * (max_len + 1)
    c = 0
    for b in range(1, max_len + 1):
        c = (c + bl[b - 1]) << 1
        nxt[b] = c
    out = {}
    for ln, s in sorted(live, key=lambda t: (t[0], t[1])):
        out[s] = (nxt[ln], ln)
        nxt[ln] += 1
    return out


class _Code:
    """A writable prefix code: emits its own definition, then symbols."""

    def __init__(self, freq: dict[int, int], alphabet: int):
        self.single = len(freq) == 1
        self.lengths = _huff_lengths(freq, alphabet)
        self.codes = _canon_codes(self.lengths) if not self.single else {}
        self.only = next(iter(freq)) if self.single else None

    def define(self, bw: _BitW):
        if self.single:
            bw.w(1, 1)          # simple
            bw.w(0, 1)          # one symbol
            if self.only > 1:
                bw.w(1, 1)      # 8-bit symbol
                bw.w(self.only, 8)
            else:
                bw.w(0, 1)
                bw.w(self.only, 1)
            return
        bw.w(0, 1)              # normal (code-length-coded)
        clc_freq: dict[int, int] = {}
        for ln in self.lengths:
            clc_freq[ln] = clc_freq.get(ln, 0) + 1
        clc_lengths = _huff_lengths(clc_freq, 19)
        bw.w(19 - 4, 4)
        for s in webp._CLC_ORDER:
            bw.w(clc_lengths[s], 3)
        bw.w(0, 1)              # no max_symbol shortcut
        if len(clc_freq) == 1:
            return              # 0-bit code-length symbols
        clc_codes = _canon_codes(clc_lengths)
        for ln in self.lengths:
            bw.code(*clc_codes[ln])

    def emit(self, bw: _BitW, sym: int):
        if self.single:
            assert sym == self.only
            return
        bw.code(*self.codes[sym])


def _lz77_code(value: int) -> tuple[int, int, int]:
    """(prefix code, extra value, extra bits) for a length/distance."""
    if value <= 4:
        return value - 1, 0, 0
    bits = (value - 1).bit_length() - 2
    rem = value - 1 - (1 << (bits + 1))
    code = 2 + 2 * bits + (rem >> bits)
    return code, rem & ((1 << bits) - 1), bits


def _emit_pixels(bw: _BitW, tokens, cache_bits=0, toplevel=True):
    """tokens: ('px', argb) | ('copy', length, dval) | ('cache', idx).
    Defines the 5 prefix codes from the token stream, then emits it.
    ``toplevel=False`` for transform/meta sub-images, which carry no
    meta-prefix bit."""
    galpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    hist = [dict() for _ in range(5)]  # g r b a d

    def bump(h, s):
        h[s] = h.get(s, 0) + 1

    for t in tokens:
        if t[0] == "px":
            px = t[1]
            bump(hist[0], (px >> 8) & 0xFF)
            bump(hist[1], (px >> 16) & 0xFF)
            bump(hist[2], px & 0xFF)
            bump(hist[3], (px >> 24) & 0xFF)
        elif t[0] == "copy":
            bump(hist[0], 256 + _lz77_code(t[1])[0])
            bump(hist[4], _lz77_code(t[2])[0])
        else:
            bump(hist[0], 280 + t[1])
    if not hist[1]:  # no literals at all — dummy channel codes
        for h in hist[1:4]:
            h[0] = 1
    if not hist[4]:
        hist[4][0] = 1
    bw.w(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.w(cache_bits, 4)
    if toplevel:
        bw.w(0, 1)  # no meta prefix codes
    codes = [_Code(hist[0], galpha), _Code(hist[1], 256),
             _Code(hist[2], 256), _Code(hist[3], 256),
             _Code(hist[4], 40)]
    for c in codes:
        c.define(bw)
    for t in tokens:
        if t[0] == "px":
            px = t[1]
            codes[0].emit(bw, (px >> 8) & 0xFF)
            codes[1].emit(bw, (px >> 16) & 0xFF)
            codes[2].emit(bw, px & 0xFF)
            codes[3].emit(bw, (px >> 24) & 0xFF)
        elif t[0] == "copy":
            for val, code in ((t[1], codes[0]), (t[2], codes[4])):
                c, extra, ebits = _lz77_code(val)
                code.emit(bw, 256 + c if code is codes[0] else c)
                bw.w(extra, ebits)
        else:
            codes[0].emit(bw, 280 + t[1])


def _container(vp8l: bytes, *, vp8x: bool = False) -> bytes:
    chunk = b"VP8L" + len(vp8l).to_bytes(4, "little") + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    if vp8x:
        x = b"VP8X" + (10).to_bytes(4, "little") + bytes(10)
        chunk = x + chunk
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" \
        + chunk


def _vp8l_header(bw: _BitW, w: int, h: int):
    bw.w(0x2F, 8)
    bw.w(w - 1, 14)
    bw.w(h - 1, 14)
    bw.w(0, 1)
    bw.w(0, 3)


def _literal_tokens(argb: np.ndarray):
    return [("px", int(p)) for p in argb.reshape(-1)]


def _rgb_to_argb(img: np.ndarray, alpha: int = 0xFF) -> np.ndarray:
    r = img[..., 0].astype(np.uint32)
    g = img[..., 1].astype(np.uint32)
    b = img[..., 2].astype(np.uint32)
    return (np.uint32(alpha) << 24) | (r << 16) | (g << 8) | b


@pytest.fixture()
def rgb16():
    rng = np.random.default_rng(13)
    return rng.integers(0, 256, size=(11, 16, 3), dtype=np.uint8)


def test_vp8l_literal_roundtrip(rgb16):
    h, w, _ = rgb16.shape
    bw = _BitW()
    _vp8l_header(bw, w, h)
    bw.w(0, 1)  # no transforms
    _emit_pixels(bw, _literal_tokens(_rgb_to_argb(rgb16)))
    out = multimodal.decode_image(_container(bw.bytes()))
    np.testing.assert_array_equal(out, rgb16)
    # VP8X extended container wraps the same chunk
    out = multimodal.decode_image(_container(bw.bytes(), vp8x=True))
    np.testing.assert_array_equal(out, rgb16)


def test_vp8l_lz77_and_color_cache(rgb16):
    # duplicate the first row 4x: a vertical copy via the (0, 1)
    # plane code, a horizontal run via dist+120, and cache hits
    h, w = 6, 16
    row = rgb16[0]
    img = np.tile(row, (h, 1)).reshape(h, w, 3)
    argb = _rgb_to_argb(img)
    cache_bits = 6
    cache = [0] * (1 << cache_bits)
    tokens = []
    for px in argb[0]:
        px = int(px)
        slot = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
        if cache[slot] == px:
            tokens.append(("cache", slot))
        else:
            tokens.append(("px", px))
            cache[slot] = px
    tokens.append(("copy", w, webp._DIST_MAP.index((0, 1)) + 1))  # row 2
    tokens.append(("copy", w * (h - 2), w + 120))  # rest, literal dist
    bw = _BitW()
    _vp8l_header(bw, w, h)
    bw.w(0, 1)
    _emit_pixels(bw, tokens, cache_bits=cache_bits)
    out = multimodal.decode_image(_container(bw.bytes()))
    np.testing.assert_array_equal(out, img)


def test_vp8l_subtract_green_and_predictor(rgb16):
    h, w, _ = rgb16.shape
    argb = _rgb_to_argb(rgb16)
    bw = _BitW()
    _vp8l_header(bw, w, h)
    # subtract-green transform: residual r-g, b-g
    bw.w(1, 1)
    bw.w(2, 2)
    # predictor transform, one 512x512 block, mode 1 (left)
    bw.w(1, 1)
    bw.w(0, 2)
    bw.w(7, 3)  # size_bits = 9
    _emit_pixels(bw, [("px", 0xFF000000 | (1 << 8))],
                 toplevel=False)  # mode sub-image
    bw.w(0, 1)  # end of transforms
    sg = argb.copy().reshape(-1)
    g = (sg >> 8) & 0xFF
    r = (((sg >> 16) & 0xFF) - g) & 0xFF
    b = ((sg & 0xFF) - g) & 0xFF
    sg = (sg & 0xFF00FF00) | (r << 16) | b
    sg = sg.reshape(h, w)
    # predictor residuals (applied AFTER subtract-green on encode
    # side, since the decoder inverts predictor first)
    res = np.zeros_like(sg)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(sg[y, x - 1])
            elif x == 0:
                pred = int(sg[y - 1, x])
            else:
                pred = int(sg[y, x - 1])  # mode 1
            cur = int(sg[y, x])
            px = 0
            for sh in (0, 8, 16, 24):
                px |= ((((cur >> sh) & 0xFF) - ((pred >> sh) & 0xFF))
                       & 0xFF) << sh
            res[y, x] = px
    _emit_pixels(bw, _literal_tokens(res))
    out = multimodal.decode_image(_container(bw.bytes()))
    np.testing.assert_array_equal(out, rgb16)


@pytest.mark.parametrize("ncolors", [2, 4, 13])
def test_vp8l_palette_bundling(ncolors):
    rng = np.random.default_rng(ncolors)
    palette = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, size=(9, 21), dtype=np.uint8)
    h, w = idx.shape
    pal_argb = _rgb_to_argb(palette.reshape(1, -1, 3)).reshape(-1)
    bw = _BitW()
    _vp8l_header(bw, w, h)
    bw.w(1, 1)
    bw.w(3, 2)              # color-indexing transform
    bw.w(ncolors - 1, 8)
    deltas = []
    prev = 0
    for p in pal_argb:      # palette is stored delta-coded
        p = int(p)
        d = 0
        for sh in (0, 8, 16, 24):
            d |= ((((p >> sh) & 0xFF) - ((prev >> sh) & 0xFF)) & 0xFF) \
                << sh
        deltas.append(("px", d))
        prev = p
    _emit_pixels(bw, deltas, toplevel=False)
    bw.w(0, 1)              # end of transforms
    bpp = {2: 1, 4: 2, 13: 4}[ncolors]
    per = 8 // bpp
    packed_w = (w + per - 1) // per
    packed = np.zeros((h, packed_w), np.uint32)
    for y in range(h):
        for x in range(w):
            packed[y, x // per] |= int(idx[y, x]) << ((x % per) * bpp)
    tokens = [("px", 0xFF000000 | (int(v) << 8))
              for v in packed.reshape(-1)]
    _emit_pixels(bw, tokens)
    out = multimodal.decode_image(_container(bw.bytes()))
    np.testing.assert_array_equal(out, palette[idx])


def test_webp_gates_and_totality(rgb16):
    with pytest.raises(NotImplementedError):  # lossy gate
        multimodal.decode_image(
            b"RIFF" + (12).to_bytes(4, "little") + b"WEBP"
            + b"VP8 " + (4).to_bytes(4, "little") + b"\x00" * 4)
    with pytest.raises(ValueError):  # truncated chunk
        multimodal.decode_image(
            b"RIFF" + (100).to_bytes(4, "little") + b"WEBPVP8L"
            + (90).to_bytes(4, "little") + b"\x2f")
    # totality through the actor stage: malformed webp → fake path
    h, w, _ = rgb16.shape
    bw = _BitW()
    _vp8l_header(bw, w, h)
    bw.w(0, 1)
    _emit_pixels(bw, _literal_tokens(_rgb_to_argb(rgb16)))
    ok = _container(bw.bytes())
    t = pa.table({"url": pa.array(["bad", "good"]),
                  "html": pa.array([ok[:30], ok], pa.binary())})
    out = multimodal.ImageResizer(out_hw=(3, 3))(t)
    assert out.num_rows == 2
    want = multimodal.resize_nn(multimodal.to_gray(rgb16), 3, 3)
    assert out["pixels"].to_pylist()[1] == want.reshape(-1).tolist()


def _anim_container(frames_vp8l, w, h, *, offsets=None) -> bytes:
    """Animated-WebP writer: VP8X (animation flag) + ANIM + one ANMF
    per VP8L frame payload."""
    def chunk(tag, body):
        out = tag + len(body).to_bytes(4, "little") + body
        return out + (b"\x00" if len(body) & 1 else b"")

    body = chunk(b"VP8X", bytes([0x02]) + bytes(3)
                 + (w - 1).to_bytes(3, "little")
                 + (h - 1).to_bytes(3, "little"))
    body += chunk(b"ANIM", bytes(6))
    offsets = offsets or [(0, 0)] * len(frames_vp8l)
    for (fx, fy), fr in zip(offsets, frames_vp8l):
        hdr = (fx // 2).to_bytes(3, "little") \
            + (fy // 2).to_bytes(3, "little") \
            + (w - 1).to_bytes(3, "little") \
            + (h - 1).to_bytes(3, "little") \
            + (40).to_bytes(3, "little") + bytes([0])
        body += chunk(b"ANMF", hdr + chunk(b"VP8L", fr))
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" \
        + body


def _vp8l_payload(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    bw = _BitW()
    _vp8l_header(bw, w, h)
    bw.w(0, 1)
    _emit_pixels(bw, _literal_tokens(_rgb_to_argb(img)))
    return bw.bytes()


def test_webp_animation_frames_and_sampler(rgb16):
    rng = np.random.default_rng(31)
    frames = [rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
              for _ in range(7)]
    anim = _anim_container([_vp8l_payload(f) for f in frames], 8, 6)
    got = webp.decode_webp_frames(anim)
    assert len(got) == 7
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)
    # decode_image = first frame, the GIF contract
    np.testing.assert_array_equal(multimodal.decode_image(anim),
                                  frames[0])
    # partial-canvas frames stay honestly gated
    with pytest.raises(NotImplementedError):
        webp.decode_webp_frames(_anim_container(
            [_vp8l_payload(frames[0])], 8, 6, offsets=[(2, 0)]))
    # FrameSampler: real evenly-spaced frames (0, 2, 4, 6 of 7)
    import hashlib as _h
    t = pa.table({"url": pa.array(["a"]),
                  "html": pa.array([anim], pa.binary())})
    out = multimodal.FrameSampler(max_frames=4)(t)
    assert out["frame_idx"].to_pylist() == [0, 2, 4, 6]
    want = [_h.sha1(multimodal.to_gray(frames[i]).tobytes()).hexdigest()
            for i in (0, 2, 4, 6)]
    assert out["frame_sha1"].to_pylist() == want
