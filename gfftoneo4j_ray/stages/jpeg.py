"""Baseline JPEG (ITU-T T.81, SOF0 sequential DCT) decode — pure
numpy + stdlib, no codec library.

Completes the native-decode matrix for the dominant web image format:
marker parse → Huffman entropy decode → dequantize → dezigzag →
vectorized 8×8 IDCT over all blocks at once (one einsum) → chroma
upsample → YCbCr→RGB. The entropy decode is inherently bit-serial
(each Huffman code's length depends on the previous symbol), so that
single loop is Python — the sandbox-native correctness path, sized
for test payloads; a production cluster swaps :func:`decode_jpeg`
for a codec library behind the same ``decode_image`` dispatch.

Supported: 8-bit baseline (SOF0), 1 or 3 components, any sampling
factors (4:4:4 / 4:2:2 / 4:2:0 / …), restart intervals (DRI/RSTn),
multi-DHT/DQT segments. Progressive (SOF2) and arithmetic coding
raise ValueError → the callers' deterministic fallback path.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: position k in the entropy stream → raster index
_ZZ = []
for _d in range(15):
    _rows = range(max(0, _d - 7), min(7, _d) + 1)
    for _r in (_rows if _d % 2 == 1 else reversed(_rows)):
        _ZZ.append(_r * 8 + (_d - _r))
_ZZ = np.array(_ZZ, np.int64)

# orthonormal 8-point DCT-II basis: F = C f C^T, f = C^T F C
_C = np.array([[(np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
                * np.cos((2 * n + 1) * k * np.pi / 16)
                for n in range(8)] for k in range(8)])


def build_huffman(bits, vals) -> dict:
    """Canonical Huffman table (T.81 Annex C): BITS[1..16] code
    counts + HUFFVAL symbols → {(length, code): symbol}."""
    lut: dict = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


class _BitReader:
    """MSB-first bit reader over one unstuffed entropy segment."""

    def __init__(self, data: bytes):
        self._bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self._pos = 0

    def read(self, n: int) -> int:
        p = self._pos
        if n == 0:
            return 0
        if p + n > len(self._bits):
            raise ValueError("JPEG bitstream exhausted")
        self._pos = p + n
        out = 0
        for b in self._bits[p:p + n]:
            out = (out << 1) | int(b)
        return out

    def huff(self, lut: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read(1)
            ln += 1
            sym = lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, n: int) -> int:
    """T.81 EXTEND: an n-bit magnitude → signed coefficient."""
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


def _split_scan(scan: bytes):
    """Unstuff 0xFF00 and split the entropy stream at RST markers;
    returns (segments, bytes_consumed_including_terminator)."""
    segs, cur, i, n = [], bytearray(), 0, len(scan)
    while i < n:
        b = scan[i]
        if b == 0xFF:
            m = scan[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # restart marker
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker ends the scan
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(p: bytes) -> np.ndarray:
    """JPEG bytes → (h, w, 3) uint8 RGB, or (h, w) for grayscale."""
    if p[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    dri = 0
    i = 2
    n = len(p)
    while i + 4 <= n:
        if p[i] != 0xFF:
            raise ValueError(f"expected JPEG marker at offset {i}")
        marker = p[i + 1]
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        ln = struct.unpack_from(">H", p, i + 2)[0]
        seg = p[i + 4:i + 2 + ln]
        i += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables)
            j = 0
            while j < len(seg):
                pq_, tq = seg[j] >> 4, seg[j] & 15
                if pq_ != 0:
                    raise ValueError("16-bit quant tables not supported")
                qt[tq] = np.frombuffer(seg, np.uint8, 64, j + 1) \
                    .astype(np.int32)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = seg[j + 1:j + 17]
                cnt = sum(bits)
                vals = seg[j + 17:j + 17 + cnt]
                if len(bits) < 16 or len(vals) < cnt:
                    raise ValueError("truncated JPEG DHT segment")
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    build_huffman(bits, vals)
                j += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline (SOF0) JPEG supported (SOF{marker & 15})")
        elif marker == 0xDD:  # DRI
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tdta = struct.unpack_from(">BB", seg, 1 + 2 * c)
                sel[cs] = (tdta >> 4, tdta & 15)
            return _decode_scan(p[i:], frame, sel, qt,
                                huff_dc, huff_ac, dri)
        # APPn / COM / others: skipped
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(scan, frame, sel, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks per row incl. MCU padding
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
        c["dc"], c["ac"] = sel[c["id"]]
    segs, _ = _split_scan(scan)
    n_mcu = mcux * mcuy
    per_seg = dri if dri else n_mcu
    mcu = 0
    for seg in segs:
        if mcu >= n_mcu:
            break
        r = _BitReader(seg)
        pred = {c["id"]: 0 for c in comps}
        for _ in range(min(per_seg, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for c in comps:
                dlut, alut = huff_dc[c["dc"]], huff_ac[c["ac"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, np.int32)
                        t = r.huff(dlut)
                        pred[c["id"]] += _extend(r.read(t), t)
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = r.huff(alut)
                            rr, s = rs >> 4, rs & 15
                            if s == 0:
                                if rr == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[k] = _extend(r.read(s), s)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = blk * q
            mcu += 1
    if mcu != n_mcu:
        raise ValueError("JPEG scan ended early")

    planes = []
    for c in comps:
        dez = np.zeros_like(c["coef"])
        dez[:, _ZZ] = c["coef"]  # dezigzag
        blocks = dez.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ij,bjk,kl->bil", _C.T, blocks, _C) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        # blocks → plane
        plane = pix.reshape(c["bh"], c["bw"], 8, 8) \
            .transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        # upsample to full MCU-padded resolution, then crop
        plane = plane.repeat(vmax // c["v"], 0).repeat(hmax // c["h"], 1)
        planes.append(plane[:h, :w].astype(np.float64))
    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
