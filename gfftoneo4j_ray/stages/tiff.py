"""Baseline TIFF decode — REAL, pure numpy + stdlib (no codec libs).

TIFF 6.0 (public Adobe spec, 1992): both byte orders (``II``/``MM``),
first-IFD strip-organized images, 8-bit samples, Compression 1 (none),
5 (LZW with the spec's early-change code widths and the optional
horizontal-differencing Predictor 2) and 32773 (PackBits),
Photometric 0/1 (grayscale, WhiteIsZero inverted), 2 (RGB) and
3 (palette via ColorMap, 16-bit entries scaled to 8). Tiled images,
16-bit samples, planar configuration 2 and the JPEG/deflate
compressions raise ``ValueError`` — :func:`.multimodal.decode_image`
surfaces those as quarantine reasons, same contract as the other
decoders.

The archival-web slice of the format matrix: TIFF is rare in live
crawls but common in document/scan corpora (the reference pipeline's
GFF world has no images at all — this whole module family extends the
engine for multimodal training-data work). LZW and PackBits are
per-strip sequential Python loops by nature (like the GIF LZW kernel);
strip payloads are bytes-sliced, never iterated per pixel, and all
raster assembly/predictor work is vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids (TIFF 6.0 §8)
_W, _H = 256, 257
_BITS, _COMP, _PHOTO = 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PLANAR, _PREDICTOR, _COLORMAP = 284, 317, 320

# field type → byte size (types we read; RATIONAL et al. are skipped)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 7: "B"}


def _read_ifd(p: bytes, bo: str) -> dict[int, tuple[int, ...]]:
    """First IFD → {tag: values tuple}; inline-or-offset per §2."""
    (ifd_off,) = struct.unpack_from(bo + "I", p, 4)
    if ifd_off + 2 > len(p):
        raise ValueError("truncated TIFF IFD offset")
    (n_entries,) = struct.unpack_from(bo + "H", p, ifd_off)
    tags: dict[int, tuple[int, ...]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(p):
            raise ValueError("truncated TIFF IFD entry")
        tag, ftype, count = struct.unpack_from(bo + "HHI", p, off)
        if ftype not in _TYPE_FMT:
            # ASCII/RATIONAL/DOUBLE/... — nothing the raster path
            # needs (gating on _TYPE_SIZE alone let ASCII tags — type
            # 2, present in most real TIFFs as Software/DateTime —
            # fall through to a KeyError below, killing the decode)
            continue
        size = _TYPE_SIZE[ftype] * count
        voff = off + 8 if size <= 4 else \
            struct.unpack_from(bo + "I", p, off + 8)[0]
        if voff + size > len(p):
            raise ValueError(f"TIFF tag {tag} value out of bounds")
        fmt = _TYPE_FMT[ftype]
        tags[tag] = struct.unpack_from(bo + str(count) + fmt, p, voff)
    return tags


def _packbits(data: bytes, expect: int) -> bytes:
    """PackBits (§9): n in [0,127] → copy n+1 literals; n in [-127,-1]
    → repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expect:
        c = data[i]
        i += 1
        if c < 128:
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:
            if i >= n:
                raise ValueError("truncated PackBits run")
            out += data[i:i + 1] * (257 - c)
            i += 1
    if len(out) < expect:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expect])


def _lzw(data: bytes, expect: int) -> bytes:
    """TIFF-variant LZW (§13): MSB-first bit packing, Clear=256,
    EOI=257, 9→12-bit codes with the EARLY width change (the table's
    one-code-sooner switch that distinguishes TIFF from GIF LZW).
    Sequential by nature — one Python iteration per code, each
    appending a whole table string."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, acc, nbits, pos = 9, 0, 0, 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < expect:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated LZW strip")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:  # Clear
            table = table[:258]
            width, prev = 9, None
            continue
        if code == 257:  # EOI
            break
        if prev is None:
            if code > 255:
                raise ValueError("bad LZW first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        # early change: width grows when the NEXT code would not fit
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError("truncated LZW strip")
    return bytes(out[:expect])


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF bytes → (h, w) uint8 grayscale or (h, w, 3) uint8 RGB."""
    p = payload or b""
    if p[:4] == b"II*\x00":
        bo = "<"
    elif p[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    t = _read_ifd(p, bo)
    try:
        w, h = t[_W][0], t[_H][0]
        offs, cnts = t[_STRIP_OFF], t[_STRIP_CNT]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from None
    spp = t.get(_SPP, (1,))[0]
    bits = t.get(_BITS, (8,) * spp)
    comp = t.get(_COMP, (1,))[0]
    photo = t.get(_PHOTO, (1,))[0]
    rps = t.get(_ROWS_PER_STRIP, (h,))[0] or h
    planar = t.get(_PLANAR, (1,))[0]
    pred = t.get(_PREDICTOR, (1,))[0]
    if any(b != 8 for b in bits):
        raise ValueError(f"only 8-bit TIFF samples (got {bits})")
    if planar != 1:
        raise ValueError("planar TIFF (PlanarConfiguration=2) unsupported")
    if comp not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if pred not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {pred}")
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    if w <= 0 or h <= 0 or spp not in (1, 3):
        raise ValueError(f"bad TIFF geometry {w}x{h}x{spp}")
    if len(offs) != len(cnts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")

    row_bytes = w * spp
    rows = []
    for s, (off, cnt) in enumerate(zip(offs, cnts)):
        n_rows = min(rps, h - s * rps)
        if n_rows <= 0:
            raise ValueError("more strips than image rows")
        raw = p[off:off + cnt]
        if len(raw) < cnt:
            raise ValueError("truncated TIFF strip")
        expect = n_rows * row_bytes
        if comp == 1:
            if len(raw) < expect:
                raise ValueError("short uncompressed strip")
            strip = raw[:expect]
        elif comp == 5:
            strip = _lzw(raw, expect)
        else:
            strip = _packbits(raw, expect)
        rows.append(np.frombuffer(strip, np.uint8).reshape(n_rows,
                                                           row_bytes))
    img = np.concatenate(rows, axis=0)
    if pred == 2:  # horizontal differencing: per-sample row cumsum
        img = np.cumsum(img.reshape(h, w, spp), axis=1,
                        dtype=np.uint8).reshape(h, row_bytes)
    if spp == 3:
        return np.ascontiguousarray(img.reshape(h, w, 3))
    gray = img.reshape(h, w)
    if photo == 0:  # WhiteIsZero
        return (255 - gray).astype(np.uint8)
    if photo == 3:
        cm = t.get(_COLORMAP)
        if cm is None or len(cm) != 3 * 256:
            raise ValueError("palette TIFF missing/short ColorMap")
        # ColorMap entries are 16-bit; scale to 8 (spec: 0..65535)
        lut = (np.array(cm, np.uint32).reshape(3, 256).T >> 8) \
            .astype(np.uint8)
        return np.ascontiguousarray(lut[gray])
    return np.ascontiguousarray(gray)
