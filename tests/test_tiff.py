"""Baseline TIFF decode vs an independent forward encoder.

The encoder below is written from the TIFF 6.0 spec's forward
description (IFD layout, PackBits runs, LZW with the early-change
code widths) — not by inverting the decoder — so the decoder's IFD
walk, strip assembly, compression kernels and predictor are checked
against a second implementation of the format.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gfftoneo4j_ray.stages import multimodal
from gfftoneo4j_ray.stages.tiff import decode_tiff


def _packbits_encode(row: bytes) -> bytes:
    """Spec §9 forward coder: maximal literal/repeat runs."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length of identical bytes
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 2:
            out += bytes([257 - (j - i), row[i]])
            i = j
        else:
            # literal run up to the next 2-byte repeat
            j = i + 1
            while j < n and j - i < 128:
                if j + 1 < n and row[j] == row[j + 1]:
                    break
                j += 1
            out += bytes([j - i - 1]) + row[i:j]
            i = j
    return bytes(out)


class _LzwW:
    """MSB-first bit writer whose code width tracks the DECODER's
    table state (TIFF early change: width w reads while the decoder's
    next free entry < 2^w - 1)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0
        self.width = 9
        self.emitted = 0  # data codes since the last Clear

    def put(self, code: int):
        self.acc = (self.acc << self.width) | code
        self.nbits += self.width
        while self.nbits >= 8:
            self.buf.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        if code == 256:       # Clear resets the decoder table
            self.width, self.emitted = 9, 0
        elif code != 257:
            # decoder table length after it processes this code:
            # no append on the first post-clear code, one per code after
            self.emitted += 1
            dec_len = 258 + self.emitted - 1
            if dec_len == (1 << self.width) - 1 and self.width < 12:
                self.width += 1

    def bytes(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(self.buf)


def _lzw_encode(data: bytes) -> bytes:
    wtr = _LzwW()
    wtr.put(256)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    w = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        if w + c in table:
            w += c
            continue
        wtr.put(table[w])
        table[w + c] = nxt
        nxt += 1
        w = c
        if nxt >= 4093:  # table nearly full — restart
            wtr.put(table[w])
            wtr.put(256)
            table = {bytes([j]): j for j in range(256)}
            nxt, w = 258, b""
    if w:
        wtr.put(table[w])
    wtr.put(257)
    return wtr.bytes()


def _entry(bo, tag, ftype, values):
    sizes = {1: 1, 3: 2, 4: 4}
    fmts = {1: "B", 3: "H", 4: "I"}
    size = sizes[ftype] * len(values)
    packed = struct.pack(bo + str(len(values)) + fmts[ftype], *values)
    return tag, ftype, len(values), packed, size


def write_tiff(img: np.ndarray, *, bo: str = "<", compression: int = 1,
               photometric: int | None = None, rows_per_strip: int = 4,
               predictor: int = 1, colormap: np.ndarray | None = None
               ) -> bytes:
    """Forward TIFF writer: strip-organized 8-bit baseline file."""
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    if photometric is None:
        photometric = 2 if spp == 3 else 1
    flat = img.reshape(h, w * spp).copy()
    if predictor == 2:
        d = flat.reshape(h, w, spp).astype(np.int16)
        d[:, 1:] -= d[:, :-1].copy()
        flat = (d % 256).astype(np.uint8).reshape(h, w * spp)

    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = flat[y0:y0 + rows_per_strip].tobytes()
        if compression == 5:
            strips.append(_lzw_encode(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)

    tags = [
        _entry(bo, 256, 4, [w]), _entry(bo, 257, 4, [h]),
        _entry(bo, 258, 3, [8] * spp),
        _entry(bo, 259, 3, [compression]),
        _entry(bo, 262, 3, [photometric]),
        _entry(bo, 277, 3, [spp]),
        _entry(bo, 278, 4, [rows_per_strip]),
    ]
    if predictor != 1:
        tags.append(_entry(bo, 317, 3, [predictor]))
    if colormap is not None:
        cm = [int(v) * 257 for v in colormap.T.ravel()]  # 3×256, 16-bit
        tags.append(_entry(bo, 320, 3, cm))

    # layout: header(8) | IFD | out-of-line values | strips
    n_dir = len(tags) + 2  # + StripOffsets, StripByteCounts
    ifd_off = 8
    val_off = ifd_off + 2 + 12 * n_dir + 4
    oversize = []
    for tag, ftype, count, packed, size in tags:
        if size > 4:
            oversize.append(packed)
    n_strips = len(strips)
    arrays_bytes = 0 if n_strips == 1 else 8 * n_strips
    strip_cnt_off = val_off + sum(len(p) for p in oversize)
    strip_off_off = strip_cnt_off + (0 if n_strips == 1 else 4 * n_strips)
    data_off = strip_cnt_off + arrays_bytes
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)

    dir_entries = []
    voff = val_off
    for tag, ftype, count, packed, size in tags:
        if size <= 4:
            dir_entries.append((tag, ftype, count,
                                packed + b"\x00" * (4 - size)))
        else:
            dir_entries.append((tag, ftype, count,
                                struct.pack(bo + "I", voff)))
            voff += size
    if n_strips == 1:  # 4-byte values are INLINE per spec §2
        dir_entries.append((279, 4, 1, struct.pack(bo + "I",
                                                   len(strips[0]))))
        dir_entries.append((273, 4, 1, struct.pack(bo + "I", offs[0])))
    else:
        dir_entries.append((279, 4, n_strips,
                            struct.pack(bo + "I", strip_cnt_off)))
        dir_entries.append((273, 4, n_strips,
                            struct.pack(bo + "I", strip_off_off)))
    dir_entries.sort()  # spec: entries in ascending tag order

    out = bytearray()
    out += (b"II*\x00" if bo == "<" else b"MM\x00*")
    out += struct.pack(bo + "I", ifd_off)
    out += struct.pack(bo + "H", n_dir)
    for tag, ftype, count, val4 in dir_entries:
        out += struct.pack(bo + "HHI", tag, ftype, count) + val4
    out += struct.pack(bo + "I", 0)  # next-IFD = none
    for p in oversize:
        out += p
    if n_strips > 1:
        out += struct.pack(bo + f"{n_strips}I",
                           *[len(s) for s in strips])
        out += struct.pack(bo + f"{n_strips}I", *offs)
    for s in strips:
        out += s
    return bytes(out)


def _img_rgb(h=13, w=9, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    base[3:6, 2:7] = 200  # flat region → PackBits/LZW runs
    return base


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("comp", [1, 5, 32773])
def test_tiff_rgb_roundtrip(bo, comp):
    img = _img_rgb()
    data = write_tiff(img, bo=bo, compression=comp, rows_per_strip=4)
    assert multimodal.sniff_format(data) == "tiff"
    out = multimodal.decode_image(data)
    assert out.shape == img.shape and np.array_equal(out, img)


def test_tiff_gray_whitezero_and_predictor():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (7, 11), dtype=np.uint8)
    # BlackIsZero plain
    assert np.array_equal(decode_tiff(write_tiff(g)), g)
    # WhiteIsZero inverts
    inv = decode_tiff(write_tiff(g, photometric=0))
    assert np.array_equal(inv, 255 - g)
    # horizontal-differencing predictor with LZW, both byte orders
    for bo in ("<", ">"):
        data = write_tiff(g, bo=bo, compression=5, predictor=2,
                          rows_per_strip=3)
        assert np.array_equal(decode_tiff(data), g)
    rgb = _img_rgb(6, 5, seed=11)
    data = write_tiff(rgb, compression=5, predictor=2)
    assert np.array_equal(decode_tiff(data), rgb)


def test_tiff_palette():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 16, (5, 8), dtype=np.uint8)
    cmap = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    data = write_tiff(idx, photometric=3, colormap=cmap)
    out = decode_tiff(data)
    assert out.shape == (5, 8, 3)
    assert np.array_equal(out, cmap[idx])


def test_tiff_lzw_long_input_width_changes():
    """Enough distinct symbols to push the code width past 9 and 10
    bits — exercises the early-change boundary in both directions."""
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (40, 64), dtype=np.uint8)
    data = write_tiff(g, compression=5, rows_per_strip=40)
    assert np.array_equal(decode_tiff(data), g)


def test_tiff_rejects_unsupported():
    img = _img_rgb(4, 4)
    good = bytearray(write_tiff(img))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"ZZZZ" + bytes(good[4:]))
    # unsupported compression: rewrite the Compression entry in place
    comp_entry = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 1, 0)
    assert comp_entry in good
    jpeg_comp = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 7, 0)
    with pytest.raises(ValueError, match="unsupported TIFF compression"):
        decode_tiff(bytes(good).replace(comp_entry, jpeg_comp, 1))
    # truncated strip payload
    with pytest.raises(ValueError):
        decode_tiff(bytes(good[:-10]))


def test_tiff_ascii_and_rational_tags_are_skipped():
    """Regression: real-world TIFFs carry ASCII (type 2) Software /
    DateTime and RATIONAL (type 5) resolution tags. The IFD reader
    must skip every field type outside its raster set — gating on
    _TYPE_SIZE alone let type 2 (size-mapped but format-unmapped)
    reach _TYPE_FMT and KeyError, killing the whole decode."""
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    sw = b"pytest\x00"
    xres = struct.pack("<II", 72, 1)
    # hand-built single-strip grayscale file:
    # header(8) | IFD(2 + 12*n + 4) | software | xres | pixels
    tags = [
        (256, 4, 1, struct.pack("<I", 4)),          # width
        (257, 4, 1, struct.pack("<I", 3)),          # height
        (258, 3, 1, struct.pack("<HH", 8, 0)),      # bits/sample
        (259, 3, 1, struct.pack("<HH", 1, 0)),      # no compression
        (262, 3, 1, struct.pack("<HH", 1, 0)),      # BlackIsZero
        (277, 3, 1, struct.pack("<HH", 1, 0)),      # samples/pixel
        (278, 4, 1, struct.pack("<I", 3)),          # rows/strip
        (279, 4, 1, struct.pack("<I", g.size)),     # strip byte count
    ]
    n_dir = len(tags) + 3  # + Software, XResolution, StripOffsets
    ifd_off = 8
    sw_off = ifd_off + 2 + 12 * n_dir + 4
    xres_off = sw_off + len(sw)
    data_off = xres_off + len(xres)
    tags.append((273, 4, 1, struct.pack("<I", data_off)))   # StripOffsets
    tags.append((305, 2, len(sw), struct.pack("<I", sw_off)))   # Software
    tags.append((282, 5, 1, struct.pack("<I", xres_off)))   # XResolution
    tags.sort()
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n_dir)
    for tag, ftype, count, val4 in tags:
        out += struct.pack("<HHI", tag, ftype, count) + val4
    out += struct.pack("<I", 0)
    out += sw + xres + g.tobytes()
    assert np.array_equal(decode_tiff(bytes(out)), g)
