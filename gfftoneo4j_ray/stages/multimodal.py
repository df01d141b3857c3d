"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. Decode is REAL — no codec library needed —
for PPM/PGM (netpbm P6/P5), 24-bit uncompressed BMP, 8-bit PNG
(sequential or Adam7; stdlib zlib inflate + numpy unfilter), and
baseline + progressive JPEG (:mod:`.jpeg`), GIF87a/89a first
frames (stdlib-loop LZW), and lossless WebP (VP8L, :mod:`.webp`) —
see :func:`decode_image` — plus RIFF/WAVE audio (integer/float
PCM, G.711 A-law/μ-law, EXTENSIBLE)
(:func:`decode_wav`), YUV4MPEG2 video frames (:func:`decode_y4m`)
and MP3 frame-header metadata (:func:`mp3_metadata`); the remaining
formats (lossy-VP8 WebP, MP3 PCM decode, …) stay gated behind an
import-try with an honest ``NotImplementedError`` or fake-feature
fallback.
:class:`PayloadFeaturizer` uses a
deterministic content-hash fake feature in place of a model forward
pass so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested either way.

Scale notes: binary payloads dominate block size — use small
``batch_size`` (payload-count, not bytes) and let the pool autoscale;
drop the payload column as soon as features are extracted (the same
rule as dropping ``html`` after text extraction, SURVEY.md §4.2).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

FEATURE_DIM = 8

# every error a malformed-but-sniffable payload can raise out of the
# native decoders: struct.error covers truncated fixed headers (a
# payload starting 'BM' or 'RIFF..WAVE' shorter than the header);
# IndexError/KeyError cover truncated JPEG table segments and scans
# referencing undeclared table ids; the others cover bad field
# values. The decode stages catch exactly this tuple so they stay
# TOTAL over arbitrary web payloads — one malformed payload must
# never kill a map task.
_DECODE_ERRORS = (ValueError, NotImplementedError, struct.error,
                  IndexError, KeyError)


def _try_import_decoder():
    try:  # pragma: no cover - decoder libs absent in this container
        import PIL.Image  # noqa: F401
        return PIL.Image
    except ImportError:
        return None


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_format(payload: bytes) -> str | None:
    """Magic-byte sniff for the natively-decodable formats."""
    p = payload or b""
    if p[:2] == b"P6":
        return "ppm"
    if p[:2] == b"P5":
        return "pgm"
    if p[:2] == b"BM":
        return "bmp"
    if p[:8] == _PNG_MAGIC:
        return "png"
    if p[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        return "webp"
    if p[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    return None


def _pnm_tokens(p: bytes, need: int) -> tuple[list[int], int]:
    """Read `need` whitespace-separated integer header tokens after the
    magic, skipping '#' comments; returns (tokens, pixel_data_offset).
    Per the netpbm spec exactly ONE whitespace byte follows the last
    header token before the raster."""
    toks: list[int] = []
    i = 2  # past magic
    while len(toks) < need:
        while i < len(p) and p[i:i + 1].isspace():
            i += 1
        if i < len(p) and p[i:i + 1] == b"#":
            while i < len(p) and p[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(p) and not p[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        toks.append(int(p[i:j]))
        i = j
    return toks, i + 1  # one whitespace byte after the last token


# PNG color type → channels per pixel (8-bit depth; PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 interlace passes: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_chunks(p: bytes):
    """Yield (type, data) for each PNG chunk, CRC-verified; raises
    ValueError on truncation, CRC mismatch, or a missing IEND."""
    import zlib

    i = 8  # past the signature
    while i + 8 <= len(p):
        ln = struct.unpack_from(">I", p, i)[0]
        typ = p[i + 4:i + 8]
        data = p[i + 8:i + 8 + ln]
        if len(data) < ln or i + 12 + ln > len(p):
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", p, i + 8 + ln)[0]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        yield typ, data
        if typ == b"IEND":
            return
        i += 12 + ln
    raise ValueError("PNG missing IEND")


def _png_unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §9): (h, w*bpp) uint8.

    Filters None/Up are whole-row vectorized; Sub is a per-channel-lane
    cumsum (addition mod 256 commutes with the prefix sum); Average and
    Paeth carry a true per-pixel data dependency and fall back to an
    in-row loop — the sandbox-native path. A production cluster swaps
    the whole decode for a codec library; this decoder's job is exact
    small-scale correctness with zero dependencies."""
    stride = w * bpp
    arr = np.frombuffer(raw, np.uint8)
    if len(arr) < h * (stride + 1):
        raise ValueError("truncated PNG raster")
    arr = arr[:h * (stride + 1)].reshape(h, stride + 1)
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ftype = int(arr[y, 0])
        line = arr[y, 1:].astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x - bpp]
            rec = (np.cumsum(line.reshape(w, bpp), axis=0,
                             dtype=np.int64) & 0xFF).astype(np.int32)
            rec = rec.reshape(stride)
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype in (3, 4):  # Average / Paeth: sequential in x
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    pt = a + b - c
                    da, db, dc = abs(pt - a), abs(pt - b), abs(pt - c)
                    pred = a if (da <= db and da <= dc) else \
                        (b if db <= dc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def _decode_png(p: bytes) -> np.ndarray:
    """REAL pure-numpy+zlib PNG decode (zlib is stdlib — no codec
    library needed): 8-bit depth, color types gray/RGB/palette/
    gray+alpha/RGBA, sequential or Adam7-interlaced, CRC-verified.
    Alpha is dropped (feature extraction reads color planes); palette
    maps through PLTE. 16-bit depth raises ValueError (→ the callers'
    fake-decode fallback)."""
    import zlib

    ihdr, plte, idat = None, None, []
    for typ, data in _png_chunks(p):
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            if len(data) % 3:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (depth {depth})")
    if comp or filt:
        raise ValueError("bad PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {ctype}")
    if not w or not h or w * h > (64 << 20):
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT: {e}") from None
    ch = _PNG_CHANNELS[ctype]
    if interlace:  # Adam7: 7 independently-filtered sub-images
        full = np.zeros((h, w, ch), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(w - x0) // dx)
            ph = -(-(h - y0) // dy)
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes no bytes
            need = ph * (pw * ch + 1)
            sub = _png_unfilter(raw[off:off + need], ph, pw, ch)
            off += need
            full[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
        img = full
    else:
        img = _png_unfilter(raw, h, w, ch).reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[..., 0]
        if int(idx.max()) >= len(plte):
            raise ValueError("palette index out of range")
        return np.ascontiguousarray(plte[idx])
    if ctype == 0:
        return img[..., 0]
    if ctype == 4:  # gray+alpha → luma plane
        return np.ascontiguousarray(img[..., 0])
    return np.ascontiguousarray(img[..., :3])  # RGB / RGBA → RGB


# GIF interlace passes: (row0, step) per pass (GIF89a spec appendix E)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw(data: bytes, min_code: int, npix: int) -> bytes:
    """GIF-variant LZW decode → exactly ``npix`` index bytes.

    Variable-width codes (LSB-first bit packing), table reset on the
    clear code, deferred-clear tolerated (table pegged at 4096 entries,
    width at 12 bits). Inherently sequential — a per-code Python loop,
    like the Paeth fallback in :func:`_png_unfilter`: the sandbox-native
    exact path; a production cluster swaps the decode stage for a codec
    library with the same actor-pool plumbing."""
    clear = 1 << min_code
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    out: list[bytes] = []
    n_out = 0
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    pos = 0
    while n_out < npix:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first GIF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        # the encoder widens after assigning code (1<<width); its table
        # runs one entry ahead of ours, so we widen when ours fills
        if len(table) == (1 << width) and width < 12:
            width += 1
        out.append(entry)
        n_out += len(entry)
        prev = entry
    if n_out < npix:
        raise ValueError("GIF pixel data underrun")
    return b"".join(out)[:npix]


def _decode_gif(p: bytes) -> np.ndarray:
    """REAL pure-numpy+stdlib GIF decode (GIF87a/89a): first frame,
    LZW-decompressed (:func:`_gif_lzw`), de-interlaced when flagged,
    mapped through the local-or-global color table and composited onto
    a logical-screen canvas filled with the background color (GCE
    transparent pixels show that background). Later frames of an
    animation are ignored — feature extraction reads one frame, the
    same contract as :class:`FrameSampler`'s fake path."""
    if len(p) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, bg = struct.unpack_from("<HHBB", p, 6)
    if not w or not h or w * h > (64 << 20):
        raise ValueError(f"bad GIF dimensions {w}x{h}")
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(p, np.uint8, count=n * 3,
                            offset=i).reshape(n, 3)
        i += n * 3
    transparent = -1
    while i < len(p):
        block = p[i]
        i += 1
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label, then sub-blocks
            if i >= len(p):
                raise ValueError("truncated GIF extension")
            label = p[i]
            i += 1
            while i < len(p) and p[i]:
                if label == 0xF9 and p[i] >= 4 and p[i + 1] & 0x01:
                    transparent = p[i + 4]  # GCE transparency index
                i += 1 + p[i]
            i += 1  # block terminator
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")
        # image descriptor
        if i + 9 > len(p):
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", p, i)
        i += 9
        if not fw or not fh or left + fw > w or top + fh > h:
            raise ValueError("GIF frame outside logical screen")
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            ct = np.frombuffer(p, np.uint8, count=n * 3,
                               offset=i).reshape(n, 3)
            i += n * 3
        if ct is None:
            raise ValueError("GIF image with no color table")
        if i >= len(p):
            raise ValueError("truncated GIF image data")
        min_code = p[i]
        i += 1
        if not 2 <= min_code <= 8:
            raise ValueError(f"bad GIF LZW min code size {min_code}")
        subs = []
        while i < len(p) and p[i]:
            ln = p[i]
            subs.append(p[i + 1:i + 1 + ln])
            if len(subs[-1]) < ln:
                raise ValueError("truncated GIF data sub-block")
            i += 1 + ln
        idx = np.frombuffer(_gif_lzw(b"".join(subs), min_code, fw * fh),
                            np.uint8)
        if int(idx.max()) >= len(ct):
            raise ValueError("GIF color index out of range")
        frame = idx.reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: rows stored in 4 passes
            deint = np.empty_like(frame)
            r = 0
            for row0, step in _GIF_INTERLACE:
                n = len(range(row0, fh, step))
                deint[row0::step] = frame[r:r + n]
                r += n
            frame = deint
        # the background index refers to the GLOBAL color table even
        # when the frame maps through a local one
        bg_rgb = gct[bg] if (gct is not None and bg < len(gct)) else \
            np.zeros(3, np.uint8)
        canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
        rgb = ct[frame]
        if transparent >= 0:
            mask = frame == transparent
            rgb = np.where(mask[..., None], canvas[top:top + fh,
                                                   left:left + fw], rgb)
        canvas[top:top + fh, left:left + fw] = rgb
        return canvas
    raise ValueError("GIF contains no image")


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to a numpy array — (h, w, 3) uint8 for
    color, (h, w) uint8 for grayscale.

    REAL (pure numpy + stdlib zlib, no codec libraries) for: netpbm
    P6 (PPM color) / P5 (PGM grayscale) with maxval ≤ 255, 24-bit
    uncompressed bottom-up/top-down BMP, 8-bit sequential or
    Adam7-interlaced PNG (gray/RGB/palette/gray+alpha/RGBA — see
    :func:`_decode_png`), baseline (SOF0) or progressive (SOF2)
    JPEG (:mod:`stages.jpeg`; arithmetic-coded JPEG falls back),
    GIF87a/89a first frame (:func:`_decode_gif`), lossless WebP
    (VP8L incl. all four transforms, :mod:`stages.webp`), and
    baseline TIFF (none/LZW/PackBits strips, predictor 2,
    gray/RGB/palette, both byte orders — :mod:`stages.tiff`).
    Formats needing an external codec (lossy-VP8 WebP, animations,
    …, absent in this container) raise ``NotImplementedError``
    unless one is importable."""
    p = payload or b""
    fmt = sniff_format(p)
    if fmt == "png":
        return _decode_png(p)
    if fmt == "gif":
        return _decode_gif(p)
    if fmt == "webp":
        from .webp import decode_webp

        return decode_webp(p)
    if fmt == "jpeg":
        from .jpeg import decode_jpeg

        return decode_jpeg(p)
    if fmt == "tiff":
        from .tiff import decode_tiff

        return decode_tiff(p)
    if fmt in ("ppm", "pgm"):
        (w, h, maxval), off = _pnm_tokens(p, 3)
        if maxval > 255:
            raise ValueError("16-bit netpbm not supported")
        ch = 3 if fmt == "ppm" else 1
        need = h * w * ch
        raster = np.frombuffer(p, np.uint8, count=need, offset=off)
        return raster.reshape(h, w, 3) if ch == 3 else raster.reshape(h, w)
    if fmt == "bmp":
        data_off = struct.unpack_from("<I", p, 10)[0]
        w, h_raw = struct.unpack_from("<ii", p, 18)
        bpp = struct.unpack_from("<H", p, 28)[0]
        comp = struct.unpack_from("<I", p, 30)[0]
        if bpp != 24 or comp != 0:
            raise ValueError(f"only 24-bit uncompressed BMP (got bpp={bpp},"
                             f" compression={comp})")
        h = abs(h_raw)
        stride = ((w * 3 + 3) // 4) * 4
        rows = np.frombuffer(p, np.uint8, count=h * stride,
                             offset=data_off).reshape(h, stride)
        img = rows[:, :w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
        if h_raw > 0:  # bottom-up storage
            img = img[::-1]
        return np.ascontiguousarray(img)
    dec = _try_import_decoder()
    if dec is None:
        raise NotImplementedError(
            "compressed-image decode requires PIL/opencv (not in this "
            "container); PPM/PGM/24-bit-BMP/8-bit-PNG/JPEG/GIF decode "
            "natively, "
            "and "
            "PayloadFeaturizer's deterministic fake features cover the "
            "rest of the plumbing")
    import io
    return np.asarray(dec.open(io.BytesIO(p)))  # pragma: no cover


def to_gray(img: np.ndarray) -> np.ndarray:
    """(h, w[, 3]) uint8 → (h, w) uint8 luma — integer ITU-R 601
    arithmetic so the result is bit-stable across platforms."""
    if img.ndim == 2:
        return img
    r = img[..., 0].astype(np.int64)
    g = img[..., 1].astype(np.int64)
    b = img[..., 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature vector: blake2b bytes → floats in
    [-1, 1). Stable across runs/platforms; replaces the model forward
    pass while keeping the data layout identical."""
    h = hashlib.blake2b(payload or b"", digest_size=dim).digest()
    return (np.frombuffer(h, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0


# Y4M colorspace tag (exact) → chroma plane size as (h, w) divisors;
# None = no chroma planes (mjpegtools yuv4mpeg(5)). Exact match only:
# bit-depth extensions (C420p10/p12/…) and C444alpha pack differently
# and must be rejected, not prefix-matched into a misread.
_Y4M_CHROMA = {"420": (2, 2), "420jpeg": (2, 2), "420paldv": (2, 2),
               "420mpeg2": (2, 2), "422": (1, 2), "444": (1, 1),
               "mono": None}


def decode_y4m(payload: bytes) -> tuple[list[np.ndarray], float]:
    """REAL stdlib+numpy YUV4MPEG2 (.y4m) decode → (luma planes, fps).

    Parses the stream header (W/H/F tags; C420* variants, C422, C444,
    Cmono) and every FRAME's raw planes; returns each frame's (h, w)
    uint8 luma (chroma is skipped over, not read — feature extraction
    is luma-based, the same contract as :func:`to_gray`). Y4M is the
    uncompressed interchange format every codec toolchain emits, so
    the frame-sample stage is format-real without a codec library."""
    p = payload or b""
    nl = p.find(b"\n")
    if not p.startswith(b"YUV4MPEG2") or nl < 0:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    fps = 0.0
    cdiv = _Y4M_CHROMA["420"]  # spec default when no C tag
    for tag in p[9:nl].split():
        t, v = chr(tag[0]), tag[1:].decode("ascii", "replace")
        if t == "W":
            w = int(v)
        elif t == "H":
            h = int(v)
        elif t == "F":
            num, den = v.split(":")
            fps = int(num) / max(1, int(den))
        elif t == "C":
            if v not in _Y4M_CHROMA:
                raise ValueError(f"unsupported Y4M colorspace C{v}")
            cdiv = _Y4M_CHROMA[v]
    if not w or not h or w * h > (64 << 20):
        raise ValueError(f"bad Y4M dimensions {w}x{h}")
    ysize = w * h
    csize = 0 if cdiv is None else \
        2 * ((h // cdiv[0]) * (w // cdiv[1]))
    frames: list[np.ndarray] = []
    i = nl + 1
    while i < len(p):
        fnl = p.find(b"\n", i)
        if fnl < 0 or p[i:i + 5] != b"FRAME":
            raise ValueError("bad Y4M FRAME marker")
        i = fnl + 1
        if i + ysize + csize > len(p):
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(p, np.uint8, count=ysize,
                                    offset=i).reshape(h, w))
        i += ysize + csize
    if not frames:
        raise ValueError("Y4M stream with no frames")
    return frames, fps


def frame_features(luma: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """REAL per-frame features over a (h, w) uint8 luma plane: mean,
    std, min, max, quartiles, mean |horizontal gradient| — all in
    [0, 1], deterministic, fully vectorized. Same length/layout as
    :func:`fake_features` so real and fake frames share a schema."""
    y = luma.astype(np.float64) / 255.0
    q25, q50, q75 = np.quantile(y, (0.25, 0.5, 0.75))
    grad = float(np.abs(np.diff(y, axis=1)).mean()) if y.shape[1] > 1 \
        else 0.0
    f = np.array([y.mean(), y.std(), y.min(), y.max(),
                  q25, q50, q75, grad])
    if dim <= len(f):
        return f[:dim]
    return np.pad(f, (0, dim - len(f)))


class PayloadFeaturizer:
    """Actor-pool worker: (key_col, payload_col) → metadata + features.

    The actor shape mirrors a GPU featurizer (weights loaded once in
    __init__, batched forward in __call__); here the "model" is the
    deterministic fake above."""

    def __init__(self, payload_col: str = "html", key_col: str = "url",
                 dim: int = FEATURE_DIM):
        self.payload_col = payload_col
        self.key_col = key_col
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        n_bytes = [len(p or b"") for p in payloads]
        sha = [hashlib.sha1(p or b"").hexdigest() for p in payloads]
        feats = [fake_features(p, self.dim).tolist() for p in payloads]
        return pa.table({
            self.key_col: t[self.key_col],
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "payload_sha1": pa.array(sha, pa.string()),
            "features": pa.array(feats, pa.list_(pa.float64())),
        })


def apply(ds, payload_col: str = "html", key_col: str = "url",
          batch_size: int = 256, concurrency=(1, 4)):
    """binary-payload Dataset → feature Dataset (payload dropped)."""
    return ds.map_batches(
        PayloadFeaturizer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"payload_col": payload_col, "key_col": key_col})


# ---------------------------------------------------------------------------
# decode → resize and video frame-sampling plumbing
# ---------------------------------------------------------------------------

def fake_decode(payload: bytes, h: int = 16, w: int = 16) -> np.ndarray:
    """Deterministic pseudo-decode: payload bytes → (h, w) uint8
    "pixels" via a counter-mode blake2b stream. Stands in for the
    codec (absent in this container) with a numerically real array so
    resize/tensor plumbing is fully testable; swap for the real
    decoder (decode_image) when the library is present."""
    need = h * w
    out = bytearray()
    ctr = 0
    seed = payload or b""
    while len(out) < need:
        out += hashlib.blake2b(seed, digest_size=32,
                               salt=ctr.to_bytes(8, "little")).digest()
        ctr += 1
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(h, w)


def resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (pure numpy index take)."""
    in_h, in_w = img.shape
    rows = (np.arange(out_h) * in_h) // out_h
    cols = (np.arange(out_w) * in_w) // out_w
    return img[rows[:, None], cols[None, :]]


class ImageResizer:
    """Actor-pool worker: (key, payload) → fixed-shape resized pixel
    tensors as ``list<uint8>`` of length out_h×out_w (the flat layout
    every Arrow consumer — and Ray's tensor extension — can read
    zero-copy). Payloads that sniff as a natively-decodable format
    (PPM/PGM/24-bit BMP/8-bit PNG) go through the REAL
    ``decode_image`` → luma →
    resize path; anything else (html, compressed formats) falls back
    to the deterministic ``fake_decode`` so the plumbing stays total."""

    def __init__(self, payload_col: str = "html", key_col: str = "url",
                 src_hw: tuple = (16, 16), out_hw: tuple = (4, 4)):
        self.payload_col = payload_col
        self.key_col = key_col
        self.src_hw = src_hw
        self.out_hw = out_hw

    def _gray(self, p: bytes) -> np.ndarray:
        if sniff_format(p):
            try:
                return to_gray(decode_image(p))
            except _DECODE_ERRORS:
                pass  # malformed/truncated/unsupported variant → fake path
        return fake_decode(p, *self.src_hw)

    def __call__(self, t: pa.Table) -> pa.Table:
        oh, ow = self.out_hw
        pix = [resize_nn(self._gray(p), oh, ow).reshape(-1)
               for p in t[self.payload_col].to_pylist()]
        return pa.table({
            self.key_col: t[self.key_col],
            "height": pa.array([oh] * len(pix), pa.int32()),
            "width": pa.array([ow] * len(pix), pa.int32()),
            "pixels": pa.array([p.tolist() for p in pix],
                               pa.list_(pa.uint8())),
        })


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """256-entry μ-law / A-law → int16 decode LUTs (ITU-T G.711),
    built vectorized over all byte values at first use."""
    b = np.arange(256, dtype=np.int32)
    # μ-law: complement, then exponent/mantissa expansion around the
    # +33 (0x84 = 33<<2) bias folded into the segment offset
    u = ~b & 0xFF
    mag_u = (((u & 0x0F) << 3 | 0x84) << ((u >> 4) & 7)) - 0x84
    ulaw = np.where(u & 0x80, -mag_u, mag_u).astype(np.int16)
    # A-law: XOR 0x55, exponent 0 is linear, others shift a 0x108-based
    # chord; sign bit SET means positive
    a = b ^ 0x55
    e, m = (a >> 4) & 7, a & 0x0F
    mag_a = np.where(e == 0, (m << 4) | 8, ((m << 4) | 0x108) << (e - 1))
    alaw = np.where(a & 0x80, mag_a, -mag_a).astype(np.int16)
    return ulaw, alaw


_G711_LUT: tuple[np.ndarray, np.ndarray] | None = None

# IMA/DVI ADPCM step + index-adjust tables (IMA ADPCM spec / RFC 3551
# §4.5.1 lineage; identical core to stdlib audioop's DVI variant)
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)


def _ima_decode(nibbles: np.ndarray, pred: int, idx: int) -> np.ndarray:
    """Decode a nibble stream with IMA ADPCM from (pred, idx) state.
    Sequential per-sample loop — each step depends on the previous
    predictor/index, the same honest sandbox trade-off as the PNG
    Paeth filter loop."""
    out = np.empty(len(nibbles), np.int16)
    for i, d in enumerate(nibbles):
        step = _IMA_STEPS[idx]
        diff = step >> 3
        if d & 4:
            diff += step
        if d & 2:
            diff += step >> 1
        if d & 1:
            diff += step >> 2
        pred = pred - diff if d & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        out[i] = pred
        idx = max(0, min(88, idx + _IMA_INDEX[d]))
    return out


def _decode_ima_wav(data: bytes, n_ch: int, block_align: int) -> np.ndarray:
    """IMA ADPCM WAV (format tag 0x11): per-block, per-channel 4-byte
    headers (int16 initial sample, uint8 step index, pad) followed by
    low-nibble-first data, stereo interleaved in 4-byte channel
    chunks. Returns int16 (n,) mono or (n, n_ch)."""
    if block_align < 4 * n_ch:
        raise ValueError("IMA ADPCM block smaller than its headers")
    chans: list[list[np.ndarray]] = [[] for _ in range(n_ch)]
    for off in range(0, len(data) - 4 * n_ch + 1, block_align):
        block = data[off:off + block_align]
        states = []
        for c in range(n_ch):
            pred, idx = struct.unpack_from("<hB", block, 4 * c)[:2]
            if idx > 88:
                raise ValueError(f"bad IMA step index {idx}")
            states.append((pred, idx))
            chans[c].append(np.array([pred], np.int16))
        body = np.frombuffer(block, np.uint8, offset=4 * n_ch)
        nib = np.empty(2 * len(body), np.uint8)
        nib[0::2] = body & 0x0F  # low nibble first (WAV layout)
        nib[1::2] = body >> 4
        if n_ch == 1:
            chans[0].append(_ima_decode(nib, *states[0]))
        else:
            # stereo: alternating 4-byte (8-nibble) chunks per channel
            grp = nib[:(len(nib) // (8 * n_ch)) * 8 * n_ch]
            grp = grp.reshape(-1, n_ch, 8)
            for c in range(n_ch):
                chans[c].append(
                    _ima_decode(grp[:, c, :].reshape(-1), *states[c]))
    cols = [np.concatenate(ch) for ch in chans]
    return cols[0] if n_ch == 1 else np.stack(cols, axis=1)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL pure-numpy decode of RIFF/WAVE payloads → (samples,
    sample_rate). Supports the real-web WAV matrix: 8-bit unsigned /
    16/24/32-bit signed little-endian PCM (format tag 1), IEEE float32/
    float64 (tag 3), G.711 A-law / μ-law (tags 6/7, LUT-decoded to
    int16), IMA ADPCM (tag 0x11, per-block headers + nibble stream),
    and WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE — the actual tag is
    lifted from the SubFormat GUID), any channel count (returned as
    (n, channels) for multi-channel, (n,) for mono). Compressed codecs
    (mp3/aac/…) need a library absent here and raise
    ``NotImplementedError``."""
    p = payload or b""
    if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed-audio decode requires a codec library (not in "
            "this container); RIFF/WAVE PCM decodes natively")
    # walk chunks: fmt then data (spec order not guaranteed)
    i, fmt, ext_tag, data = 12, None, None, None
    while i + 8 <= len(p):
        cid, sz = p[i:i + 4], struct.unpack_from("<I", p, i + 4)[0]
        body = p[i + 8:i + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if fmt[0] == 0xFFFE and sz >= 40:
                # EXTENSIBLE: cbSize(2) valid-bits(2) mask(4) then the
                # SubFormat GUID, whose first two LE bytes are the tag
                ext_tag = struct.unpack_from("<H", body, 24)[0]
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    tag, n_ch, rate, _, block_align, bits = fmt
    if tag == 0xFFFE:
        if ext_tag is None:
            raise ValueError("EXTENSIBLE WAV with truncated fmt chunk")
        tag = ext_tag
    if tag == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(data, np.uint8).astype(np.int16) - 128
        elif bits == 16:
            x = np.frombuffer(data, np.dtype("<i2"))
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8)
            raw = raw[:(len(raw) // 3) * 3].reshape(-1, 3).astype(np.int32)
            x = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            x -= (x & 0x800000) << 1  # sign-extend bit 23
        elif bits == 32:
            x = np.frombuffer(data, np.dtype("<i4"))
        else:
            raise ValueError(f"unsupported PCM width {bits}")
    elif tag == 3:  # IEEE float PCM
        if bits == 32:
            x = np.frombuffer(data, np.dtype("<f4"))
        elif bits == 64:
            x = np.frombuffer(data, np.dtype("<f8"))
        else:
            raise ValueError(f"unsupported float width {bits}")
    elif tag in (6, 7):  # G.711 A-law / μ-law, always 8-bit bytes
        global _G711_LUT
        if _G711_LUT is None:
            _G711_LUT = _g711_tables()
        lut = _G711_LUT[0] if tag == 7 else _G711_LUT[1]
        x = lut[np.frombuffer(data, np.uint8)]
    elif tag == 0x11:  # IMA ADPCM (blocks carry their own headers)
        return _decode_ima_wav(data, n_ch, block_align), rate
    else:
        raise ValueError(f"unsupported WAV format tag {tag}")
    if n_ch > 1:
        x = x[:(len(x) // n_ch) * n_ch].reshape(-1, n_ch)
    return x, rate


# MPEG audio (Layer III) header tables, ISO/IEC 11172-3 / 13818-3:
# bitrate kbps by [version-group][bitrate index]; sample rate by
# [version][samplerate index]. Version bits: 0=MPEG2.5, 2=MPEG2,
# 3=MPEG1 (1 is reserved).
_MP3_BITRATE = {
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
        320),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATE = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
             0: (11025, 12000, 8000)}


def mp3_metadata(payload: bytes) -> tuple[int, int, int] | None:
    """REAL MP3 (MPEG Layer III) frame-header walk → (sample_rate,
    n_mpeg_frames, n_samples), or None when the payload isn't MP3.

    Skips a leading ID3v2 tag (syncsafe size), then walks frame
    headers — version/layer/bitrate/samplerate/padding → exact frame
    byte length — summing 1152 (MPEG1) / 576 (MPEG2/2.5) samples per
    frame; stops cleanly at an ID3v1 trailer or <1 header of slack.
    Needs ≥2 consecutive valid frames so random bytes can't false-sync.
    Full PCM decode (Huffman + hybrid filterbank) stays honestly
    gated — this gives the stage real metadata (rate, duration) with
    no codec library."""
    p = payload or b""
    i = 0
    if p[:3] == b"ID3" and len(p) >= 10:
        sz = ((p[6] & 0x7F) << 21) | ((p[7] & 0x7F) << 14) | \
            ((p[8] & 0x7F) << 7) | (p[9] & 0x7F)
        i = 10 + sz
    rate0 = None
    n_frames = 0
    n_samples = 0
    while i + 4 <= len(p):
        if p[i:i + 3] == b"TAG":  # ID3v1 trailer
            break
        b0, b1, b2 = p[i], p[i + 1], p[i + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break
        version = (b1 >> 3) & 0x03
        layer = (b1 >> 1) & 0x03
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        padding = (b2 >> 1) & 0x01
        if version == 1 or layer != 1 or br_idx in (0, 15) or \
                sr_idx == 3:  # reserved / free-format / bad rate
            break
        kbps = _MP3_BITRATE[3 if version == 3 else 2][br_idx]
        rate = _MP3_RATE[version][sr_idx]
        if rate0 is None:
            rate0 = rate
        elif rate != rate0:
            break  # rate change mid-stream: not a clean MP3
        spf = 1152 if version == 3 else 576
        flen = (spf // 8) * kbps * 1000 // rate + padding
        if flen < 4 or i + flen > len(p):
            break
        n_frames += 1
        n_samples += spf
        i += flen
    if n_frames < 2 or rate0 is None:
        return None
    return rate0, n_frames, n_samples


def audio_frame_features(x: np.ndarray, rate: int,
                         frame_ms: int = 25) -> np.ndarray:
    """Per-frame (RMS, zero-crossing-rate) features, fully vectorized:
    reshape into fixed frames, one mean/diff pass — the batched
    feature-extract kernel a real audio featurizer would run."""
    if x.ndim > 1:
        x = x.mean(axis=1)
    x = x.astype(np.float64)
    flen = max(1, (rate * frame_ms) // 1000)
    n = (len(x) // flen) * flen
    if n == 0:
        return np.empty((0, 2), np.float64)
    fr = x[:n].reshape(-1, flen)
    rms = np.sqrt((fr * fr).mean(axis=1))
    zc = (np.signbit(fr[:, 1:]) != np.signbit(fr[:, :-1])).mean(axis=1)
    return np.stack([rms, zc], axis=1)


class AudioFeaturizer:
    """Actor-pool worker: (key, payload) → per-payload audio features.
    WAV-PCM payloads decode natively (decode_wav); MP3 payloads get
    REAL metadata (sample_rate + exact sample count from the frame-
    header walk, :func:`mp3_metadata`) with fake features (PCM decode
    stays codec-gated); anything else falls back entirely to the
    deterministic fake features so the stage is total.
    Emits (key, sample_rate, n_samples, n_frames, features) with
    features = the flattened per-frame (rms, zcr) matrix."""

    def __init__(self, payload_col: str = "html", key_col: str = "url",
                 frame_ms: int = 25):
        self.payload_col = payload_col
        self.key_col = key_col
        self.frame_ms = frame_ms

    def __call__(self, t: pa.Table) -> pa.Table:
        rates, n_samp, n_fr, feats = [], [], [], []
        for p in t[self.payload_col].to_pylist():
            try:
                x, rate = decode_wav(p)
                f = audio_frame_features(x, rate, self.frame_ms)
                rates.append(rate)
                n_samp.append(int(np.prod(x.shape[:1])))
                n_fr.append(f.shape[0])
                feats.append(f.reshape(-1).tolist())
            except _DECODE_ERRORS:
                meta = mp3_metadata(p)
                rates.append(meta[0] if meta else 0)
                n_samp.append(meta[2] if meta else len(p or b""))
                n_fr.append(0)
                feats.append(fake_features(p).tolist())
        return pa.table({
            self.key_col: t[self.key_col],
            "sample_rate": pa.array(rates, pa.int32()),
            "n_samples": pa.array(n_samp, pa.int64()),
            "n_frames": pa.array(n_fr, pa.int64()),
            "features": pa.array(feats, pa.list_(pa.float64())),
        })


class FrameSampler:
    """Actor-pool worker for video payloads: one input row →
    ``n_frames`` output rows (key, frame_idx, frame_sha1, features) —
    the flat_map explode layout a real frame sampler produces.

    YUV4MPEG2 and animated-lossless-WebP payloads are REAL: up to
    ``max_frames`` evenly-spaced frames are decoded
    (:func:`decode_y4m` / :func:`.webp.decode_webp_frames`),
    ``frame_idx`` is the source frame number, ``frame_sha1`` hashes
    the decoded luma plane and ``features`` are
    :func:`frame_features` over it. Any other payload falls back to
    the deterministic fake explode (frame count = 1 + sha1 %
    max_frames over byte-windows), so the stage is total and row
    counts stay stable for tests/goldens. Payloads are dropped at
    emit (the §4.2 payload-hygiene rule)."""

    def __init__(self, payload_col: str = "html", key_col: str = "url",
                 max_frames: int = 4, dim: int = FEATURE_DIM):
        self.payload_col = payload_col
        self.key_col = key_col
        self.max_frames = max_frames
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        keys_in = t[self.key_col].to_pylist()
        o_key, o_idx, o_sha, o_feat = [], [], [], []
        for key, p in zip(keys_in, t[self.payload_col].to_pylist()):
            p = p or b""
            frames = None
            try:
                if p.startswith(b"YUV4MPEG2"):
                    frames, _fps = decode_y4m(p)
                elif sniff_format(p) == "webp":
                    from .webp import decode_webp_frames

                    frames = [to_gray(f) for f in decode_webp_frames(p)]
            except _DECODE_ERRORS:
                frames = None  # malformed/gated → the fake path below
            if frames:
                picks = np.unique(np.linspace(
                    0, len(frames) - 1,
                    min(self.max_frames, len(frames)))
                    .round().astype(np.int64))
                for i in picks:
                    luma = frames[int(i)]
                    o_key.append(key)
                    o_idx.append(int(i))
                    o_sha.append(hashlib.sha1(
                        luma.tobytes()).hexdigest())
                    o_feat.append(frame_features(
                        luma, self.dim).tolist())
                continue
            n = 1 + int.from_bytes(hashlib.sha1(p).digest()[:4],
                                   "little") % self.max_frames
            span = max(1, len(p) // n)
            for i in range(n):
                frame = p[i * span:(i + 1) * span]
                o_key.append(key)
                o_idx.append(i)
                o_sha.append(hashlib.sha1(frame).hexdigest())
                o_feat.append(fake_features(frame, self.dim).tolist())
        return pa.table({
            self.key_col: pa.array(o_key, pa.string()),
            "frame_idx": pa.array(o_idx, pa.int32()),
            "frame_sha1": pa.array(o_sha, pa.string()),
            "features": pa.array(o_feat, pa.list_(pa.float64())),
        })


def sample_frames(ds, payload_col: str = "html", key_col: str = "url",
                  max_frames: int = 4, batch_size: int = 128,
                  concurrency=(1, 4)):
    """binary-payload Dataset → exploded per-frame feature rows."""
    return ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"payload_col": payload_col,
                               "key_col": key_col,
                               "max_frames": max_frames})
