"""WebP lossless (VP8L) decode — pure stdlib + numpy, no codec library.

Implements the public "WebP Lossless Bitstream Specification"
(Google; the format behind ``VP8L`` chunks): LSB-first bit reading,
canonical prefix codes (simple two-symbol and code-length-coded forms,
incl. the max_symbol early-out), meta-prefix code groups, the color
cache, LZ77 backward references with the 24 length/distance prefix
codes and the 2D close-neighbor distance mapping, and all four
inverse transforms — predictor (14 modes), cross-color, subtract
green, and color indexing with sub-byte pixel bundling. Lossy VP8
(``VP8 `` chunks) and animations stay honestly codec-gated.

Like :func:`..multimodal._png_unfilter`'s Paeth lane and the GIF LZW
loop, the inherently sequential parts (prefix-code walk, predictor
scan) run as Python loops — the sandbox-native exact path; at
production scale the decode stage swaps in a codec library behind the
same actor-pool plumbing.

Reference parity anchor: SURVEY.md §2.6 (opaque-payload decode
stages); no corresponding reference code exists — this is engine
capability beyond corwur/gfftoneo4j.
"""

from __future__ import annotations

import numpy as np

# order in which code-length-code lengths are stored (spec §6.2.2.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
              14, 15, 16)

# 2D distance mapping for dist_code 1..120 (spec §6.2.2.3): (xoff,
# yoff) pairs, transcribed from the specification's table.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (6, 5), (-6, 5), (5, 6), (-5, 6),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (0, 8), (1, 8), (-1, 8), (8, 4), (3, 8), (-3, 8), (6, 7), (-6, 7),
    (8, 5), (7, 6), (-7, 6), (8, 6), (4, 8), (-4, 8), (8, 7),
)

_GREEN_BASE = 256          # literal green symbols
_N_LENGTH_CODES = 24       # LZ77 length prefix codes after the greens
_N_DIST_CODES = 40


class _Bits:
    """LSB-first bit reader over bytes (spec §4)."""

    __slots__ = ("d", "pos")

    def __init__(self, d: bytes, start_byte: int = 0):
        self.d = d
        self.pos = start_byte * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        end = p + n
        byte, bit = p >> 3, p & 7
        nbytes = (bit + n + 7) >> 3
        chunk = self.d[byte:byte + nbytes]
        if len(chunk) < nbytes:
            raise ValueError("truncated VP8L bitstream")
        self.pos = end
        return (int.from_bytes(chunk, "little") >> bit) & ((1 << n) - 1)

    def bit(self) -> int:
        return self.read(1)


def _canonical(lengths: list[int]):
    """Build a decode structure from canonical code lengths: either
    ("const", sym) for single-symbol codes (0 bits read), or
    ("table", {(nbits, code): sym}, max_len) walked MSB-first —
    the DEFLATE-style canonical assignment the spec prescribes."""
    live = [(s, ln) for s, ln in enumerate(lengths) if ln]
    if not live:
        raise ValueError("empty prefix code")
    if len(live) == 1:
        return ("const", live[0][0])
    max_len = max(ln for _, ln in live)
    bl_count = [0] * (max_len + 1)
    for _, ln in live:
        bl_count[ln] += 1
    next_code = [0] * (max_len + 1)
    code = 0
    for b in range(1, max_len + 1):
        code = (code + bl_count[b - 1]) << 1
        next_code[b] = code
    if next_code[max_len] + bl_count[max_len] > (1 << max_len):
        raise ValueError("over-subscribed prefix code")
    table: dict[tuple[int, int], int] = {}
    for sym, ln in live:  # live is in symbol order = canonical order
        table[(ln, next_code[ln])] = sym
        next_code[ln] += 1
    return ("table", table, max_len)


def _readsym(br: _Bits, code) -> int:
    if code[0] == "const":
        return code[1]
    _, table, max_len = code
    v = 0
    for n in range(1, max_len + 1):
        v = (v << 1) | br.bit()
        s = table.get((n, v))
        if s is not None:
            return s
    raise ValueError("invalid prefix-code bit sequence")


def _read_prefix_code(br: _Bits, alphabet_size: int):
    """One prefix code: simple (1-2 symbols) or code-length-coded
    (spec §6.2.2.1/6.2.2.2)."""
    if br.bit():  # simple
        nsym = br.bit() + 1
        s0 = br.read(8) if br.bit() else br.bit()
        lengths = [0] * alphabet_size
        if nsym == 1:
            if s0 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[s0] = 1
            return _canonical(lengths)
        s1 = br.read(8)
        if s0 >= alphabet_size or s1 >= alphabet_size or s0 == s1:
            raise ValueError("bad simple-code symbols")
        lengths[s0] = lengths[s1] = 1
        return _canonical(lengths)
    ncodes = 4 + br.read(4)
    cl = [0] * 19
    for i in range(ncodes):
        cl[_CLC_ORDER[i]] = br.read(3)
    clc = _canonical(cl)
    if br.bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = _readsym(br, clc)
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev = s
        else:
            if s == 16:
                rep, fill = 3 + br.read(2), prev
            elif s == 17:
                rep, fill = 3 + br.read(3), 0
            else:
                rep, fill = 11 + br.read(7), 0
            if sym + rep > alphabet_size:
                raise ValueError("prefix-code repeat overflow")
            for _ in range(rep):
                lengths[sym] = fill
                sym += 1
    return _canonical(lengths)


def _lz77_value(code: int, br: _Bits) -> int:
    """Length/distance prefix-code value with extra bits (spec §5.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_pixels(br: _Bits, w: int, h: int, *,
                   allow_meta: bool) -> np.ndarray:
    """Spatially-coded image (spec §6.2.3) → flat uint32 ARGB array."""
    cache_bits = 0
    if br.bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color-cache size {cache_bits}")
    meta_idx = None
    hb = 0
    ngroups = 1
    if allow_meta and br.bit():
        hb = 2 + br.read(3)
        mw, mh = _subsample(w, hb), _subsample(h, hb)
        meta = _decode_pixels(br, mw, mh, allow_meta=False)
        meta_idx = ((meta >> 8) & 0xFFFF).astype(np.int64).reshape(mh, mw)
        ngroups = int(meta_idx.max()) + 1
    green_alpha = _GREEN_BASE + _N_LENGTH_CODES + \
        ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(ngroups):
        groups.append((
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),    # red
            _read_prefix_code(br, 256),    # blue
            _read_prefix_code(br, 256),    # alpha
            _read_prefix_code(br, _N_DIST_CODES)))
    n = w * h
    out = np.zeros(n, np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    gidx = 0
    while pos < n:
        if meta_idx is not None:
            y, x = divmod(pos, w)
            gidx = int(meta_idx[y >> hb, x >> hb])
        gc, rc, bc, ac, dc = groups[gidx]
        s = _readsym(br, gc)
        if s < _GREEN_BASE:
            r = _readsym(br, rc)
            b = _readsym(br, bc)
            a = _readsym(br, ac)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
            pos += 1
        elif s < _GREEN_BASE + _N_LENGTH_CODES:
            length = _lz77_value(s - _GREEN_BASE, br)
            dval = _lz77_value(_readsym(br, dc), br)
            if dval <= 120:
                xoff, yoff = _DIST_MAP[dval - 1]
                dist = max(1, yoff * w + xoff)
            else:
                dist = dval - 120
            if dist > pos or pos + length > n:
                raise ValueError("LZ77 reference out of bounds")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("cache symbol without a color cache")
            out[pos] = cache[s - _GREEN_BASE - _N_LENGTH_CODES]
            pos += 1
    return out


def _avg2(a: int, b: int) -> int:
    # per-channel (a + b) / 2 without unpacking: mask out the low
    # carry bits, then add back the shared carries
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    px = 0
    for sh in (0, 8, 16, 24):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        px |= max(0, min(255, v)) << sh
    return px


def _clamp_add_sub_half(avg: int, tl: int) -> int:
    px = 0
    for sh in (0, 8, 16, 24):
        a = (avg >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
        px |= max(0, min(255, a + half)) << sh
    return px


def _select(l: int, t: int, tl: int) -> int:
    pl = pt = 0
    for sh in (0, 8, 16, 24):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        p = lc + tc - tlc
        pl += abs(p - lc)
        pt += abs(p - tc)
    return l if pl < pt else t


def _add_px(a: int, b: int) -> int:
    # per-channel modulo-256 add
    s = 0
    for sh in (0, 8, 16, 24):
        s |= ((((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) & 0xFF) << sh
    return s


def _inv_predictor(img: np.ndarray, w: int, h: int,
                   modes: np.ndarray, bits: int) -> None:
    """In-place inverse predictor transform (spec §5.1) over flat
    ARGB. Sequential by construction — the residual at (x, y) needs
    the reconstructed neighbors."""
    flat = img
    for pos in range(w * h):
        y, x = divmod(pos, w)
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(flat[pos - 1])                      # L
        elif x == 0:
            pred = int(flat[pos - w])                      # T
        else:
            mode = int(modes[y >> bits, x >> bits])
            left = int(flat[pos - 1])
            top = int(flat[pos - w])
            tl = int(flat[pos - w - 1])
            tr = int(flat[pos - w + 1])  # x==w-1 wraps to row start
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = top
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _avg2(_avg2(left, tr), top)
            elif mode == 6:
                pred = _avg2(left, tl)
            elif mode == 7:
                pred = _avg2(left, top)
            elif mode == 8:
                pred = _avg2(tl, top)
            elif mode == 9:
                pred = _avg2(top, tr)
            elif mode == 10:
                pred = _avg2(_avg2(left, tl), _avg2(top, tr))
            elif mode == 11:
                pred = _select(left, top, tl)
            elif mode == 12:
                pred = _clamp_add_sub_full(left, top, tl)
            elif mode == 13:
                pred = _clamp_add_sub_half(_avg2(left, top), tl)
            else:
                raise ValueError(f"bad predictor mode {mode}")
        flat[pos] = _add_px(int(flat[pos]), pred)


def _ctd(t: int, c: int) -> int:
    """ColorTransformDelta: (int8)t * (int8)c >> 5 (spec §5.2)."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(img: np.ndarray, w: int, h: int,
                         elems: np.ndarray, bits: int) -> None:
    """In-place inverse cross-color transform. The per-block transform
    element packs green_to_red in the blue byte, green_to_blue in
    green, red_to_blue in red (spec §5.2)."""
    for pos in range(w * h):
        y, x = divmod(pos, w)
        e = int(elems[y >> bits, x >> bits])
        g2r = e & 0xFF
        g2b = (e >> 8) & 0xFF
        r2b = (e >> 16) & 0xFF
        px = int(img[pos])
        g = (px >> 8) & 0xFF
        r = ((px >> 16) & 0xFF) + _ctd(g2r, g) & 0xFF
        b = ((px & 0xFF) + _ctd(g2b, g) + _ctd(r2b, r)) & 0xFF
        img[pos] = (px & 0xFF000000) | (r << 16) | (g << 8) | b


def _inv_subtract_green(img: np.ndarray) -> None:
    g = (img >> 8) & 0xFF
    r = ((img >> 16) & 0xFF) + g & 0xFF
    b = (img & 0xFF) + g & 0xFF
    img[:] = (img & 0xFF00FF00) | (r << 16) | b


def _read_image_stream(br: _Bits, w: int, h: int) -> np.ndarray:
    """Top-level image stream: transforms + spatially-coded data,
    inverse transforms applied in reverse read order (spec §4/§5)."""
    transforms = []  # (type, data...) in read order
    seen = set()
    cur_w = w
    while br.bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError(f"duplicate transform {ttype}")
        seen.add(ttype)
        if ttype == 0 or ttype == 1:  # predictor / cross-color
            bits = 2 + br.read(3)
            sw, sh = _subsample(cur_w, bits), _subsample(h, bits)
            sub = _decode_pixels(br, sw, sh, allow_meta=False)
            if ttype == 0:
                modes = ((sub >> 8) & 0xFF).reshape(sh, sw)
                transforms.append(("pred", modes, bits))
            else:
                elems = (sub & 0x00FFFFFF).reshape(sh, sw)
                transforms.append(("color", elems, bits))
        elif ttype == 2:  # subtract green
            transforms.append(("subg",))
        else:  # color indexing
            psize = 1 + br.read(8)
            pal = _decode_pixels(br, psize, 1, allow_meta=False)
            # palette entries are component-wise deltas off the
            # previous entry
            acc = np.zeros(psize, np.uint32)
            prev = 0
            for i in range(psize):
                prev = _add_px(prev, int(pal[i]))
                acc[i] = prev
            if psize <= 2:
                wbits = 3
            elif psize <= 4:
                wbits = 2
            elif psize <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append(("palette", acc, wbits, cur_w))
            cur_w = _subsample(cur_w, wbits)
    img = _decode_pixels(br, cur_w, h, allow_meta=True)
    for t in reversed(transforms):
        if t[0] == "palette":
            _, pal, wbits, orig_w = t
            idx = ((img >> 8) & 0xFF).astype(np.int64)
            if wbits:
                bpp = 8 >> wbits
                mask = (1 << bpp) - 1
                packed = idx.reshape(h, cur_w)
                subs = np.stack([(packed >> (i * bpp)) & mask
                                 for i in range(1 << wbits)], axis=2)
                idx = subs.reshape(h, -1)[:, :orig_w].reshape(-1)
            if int(idx.max()) >= len(pal):
                raise ValueError("palette index out of range")
            img = pal[idx]
            cur_w = orig_w
        elif t[0] == "subg":
            _inv_subtract_green(img)
        elif t[0] == "pred":
            _inv_predictor(img, cur_w, h, t[1], t[2])
        else:
            _inv_color_transform(img, cur_w, h, t[1], t[2])
    if cur_w != w:
        raise ValueError("color-indexing width never restored")
    return img


def decode_vp8l(data: bytes) -> np.ndarray:
    """Decode a VP8L chunk payload → (h, w, 3) uint8 RGB (alpha
    dropped, the same contract as the PNG path)."""
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _Bits(data, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.bit()  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    if w * h > (64 << 20):
        raise ValueError(f"bad VP8L dimensions {w}x{h}")
    img = _read_image_stream(br, w, h)
    rgb = np.empty((h * w, 3), np.uint8)
    rgb[:, 0] = (img >> 16) & 0xFF
    rgb[:, 1] = (img >> 8) & 0xFF
    rgb[:, 2] = img & 0xFF
    return rgb.reshape(h, w, 3)


def _chunks(p: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        tag = p[i:i + 4]
        size = int.from_bytes(p[i + 4:i + 8], "little")
        body = p[i + 8:i + 8 + size]
        if len(body) < size or i + 8 + size > end:
            raise ValueError("truncated WebP chunk")
        yield tag, body
        i += 8 + size + (size & 1)


def _u24(b: bytes, off: int) -> int:
    return int.from_bytes(b[off:off + 3], "little")


def decode_webp_frames(payload: bytes) -> list[np.ndarray]:
    """RIFF/WEBP container → decoded lossless frame list. A still
    ``VP8L`` (plain or ``VP8X``-extended) yields one frame; an
    animated container yields every full-canvas lossless ``ANMF``
    frame in order. Lossy ``VP8 `` payloads and partial-canvas
    animation frames (which need dispose/blend compositing over an
    alpha channel this decoder drops) raise ``NotImplementedError`` —
    the honest codec gate."""
    p = payload or b""
    if p[:4] != b"RIFF" or p[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    frames: list[np.ndarray] = []
    saw_gate = None
    for tag, body in _chunks(p, 12, len(p)):
        if tag == b"VP8L":
            return [decode_vp8l(body)]
        if tag == b"VP8 ":
            saw_gate = "lossy WebP (VP8) needs a codec library " \
                "(absent here)"
        elif tag == b"ANMF":
            if len(body) < 16:
                raise ValueError("truncated ANMF header")
            fx, fy = 2 * _u24(body, 0), 2 * _u24(body, 3)
            fw, fh = _u24(body, 6) + 1, _u24(body, 9) + 1
            if fx or fy:
                raise NotImplementedError(
                    "partial-canvas WebP animation frames need "
                    "alpha compositing (codec-gated here)")
            got = None
            for t2, b2 in _chunks(body, 16, len(body)):
                if t2 == b"VP8L":
                    got = decode_vp8l(b2)
                elif t2 == b"VP8 ":
                    saw_gate = "lossy WebP (VP8) needs a codec " \
                        "library (absent here)"
            if got is not None:
                if got.shape[:2] != (fh, fw):
                    raise ValueError("ANMF frame size mismatch")
                frames.append(got)
    if frames:
        return frames
    if saw_gate:
        raise NotImplementedError(saw_gate)
    raise ValueError("WebP container with no image chunk")


def decode_webp(payload: bytes) -> np.ndarray:
    """First decoded frame of a WebP payload (the same first-frame
    contract as the GIF path) — see :func:`decode_webp_frames`."""
    return decode_webp_frames(payload)[0]
