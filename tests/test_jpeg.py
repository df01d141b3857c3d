"""Native baseline-JPEG decode (stages/jpeg.py) against an
independent minimal encoder written here: separate forward
implementations of zigzag, canonical Huffman, FDCT and color
conversion, so a shared-bug round-trip cannot pass by accident."""

from __future__ import annotations

import struct
import zlib  # noqa: F401  (parity with other codec tests)

import numpy as np
import pyarrow as pa
import pytest

from gfftoneo4j_ray.stages import multimodal
from gfftoneo4j_ray.stages.jpeg import decode_jpeg

# --- independent forward pieces (NOT imported from the decoder) ---

_ZIGZAG_FWD = [  # raster index for each zigzag position, spelled out
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def _dct_mat():
    m = np.zeros((8, 8))
    for k in range(8):
        s = np.sqrt((1 if k == 0 else 2) / 8)
        for n in range(8):
            m[k, n] = s * np.cos((2 * n + 1) * k * np.pi / 16)
    return m


def _enc_table(bits, vals):
    """symbol → (code, length), the canonical assignment (T.81 C.2)."""
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return codes


class _Enc:
    """Canonical-Huffman bit writer over fixed simple tables: DC
    symbols 0..11 at 4 bits; AC symbols 0..255 split 128@8 + 128@9
    bits (DHT counts are single bytes, so one length can't hold all
    256)."""

    DC_BITS = [0, 0, 0, 12] + [0] * 12
    DC_VALS = list(range(12))
    AC_BITS = [0] * 7 + [128, 128] + [0] * 7
    AC_VALS = list(range(256))
    DC_CODE = None  # filled below
    AC_CODE = None

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, ln: int):
        self.acc = (self.acc << ln) | code
        self.nacc += ln
        while self.nacc >= 8:
            b = (self.acc >> (self.nacc - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nacc -= 8

    def flush(self):
        if self.nacc:
            self.put((1 << (8 - self.nacc)) - 1, 8 - self.nacc)  # pad 1s

    def put_dc(self, sym: int):
        self.put(*_Enc.DC_CODE[sym])

    def put_ac(self, sym: int):
        self.put(*_Enc.AC_CODE[sym])

    @staticmethod
    def cat(v: int):
        """magnitude category + the category's offset bits"""
        n = int(v).bit_length() if v > 0 else int(-v).bit_length()
        bits = v if v >= 0 else v + (1 << n) - 1
        return n, bits


def _encode_blocks(enc, blocks, qtab, dc_pred):
    """quantized zigzag coefficients for each 8×8 block → bitstream;
    returns the dequantized coefficient blocks (the decoder's ground
    truth)."""
    C = _dct_mat()
    deq = []
    for blk in blocks:
        F = C @ (blk.astype(np.float64) - 128.0) @ C.T
        q = np.round(F / qtab.reshape(8, 8)).astype(np.int32)
        deq.append(q * qtab.reshape(8, 8))
        zz = q.reshape(-1)[_ZIGZAG_FWD]
        dv = int(zz[0]) - dc_pred[0]
        dc_pred[0] = int(zz[0])
        n, bits = _Enc.cat(dv)
        enc.put_dc(n)
        if n:
            enc.put(bits, n)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                enc.put_ac(0xF0)  # ZRL
                run -= 16
            n, bits = _Enc.cat(v)
            enc.put_ac((run << 4) | n)
            enc.put(bits, n)
            run = 0
        if run:
            enc.put_ac(0x00)  # EOB
    return deq


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
        + payload


def _dht(tc, th, bits, vals):
    return _seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))


def encode_jpeg(img: np.ndarray, *, qluma=8, qchroma=12, subsample=1,
                dri=0) -> bytes:
    """Minimal baseline encoder: 4:4:4 (subsample=1) or 4:2:0
    (subsample=2) color, or grayscale for 2-D input."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        factors = [(1, 1)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        factors = [(subsample, subsample), (1, 1), (1, 1)]
    qt = [np.full(64, qluma, np.int32), np.full(64, qchroma, np.int32)]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    comp_blocks = []
    for ci, (plane, (fh, fv)) in enumerate(zip(planes, factors)):
        if (fh, fv) != (hmax, vmax):  # downsample chroma by mean
            sh, sv = hmax // fh, vmax // fv
            ph = -(-plane.shape[0] // sv) * sv
            pw = -(-plane.shape[1] // sh) * sh
            pad = np.pad(plane, ((0, ph - plane.shape[0]),
                                 (0, pw - plane.shape[1])), mode="edge")
            plane = pad.reshape(ph // sv, sv, pw // sh, sh).mean((1, 3))
        bh, bw = mcuy * fv * 8, mcux * fh * 8
        plane = np.pad(plane, ((0, bh - plane.shape[0]),
                               (0, bw - plane.shape[1])), mode="edge")
        comp_blocks.append(np.clip(np.round(plane), 0, 255))

    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0]) + bytes(qt[0].tolist()))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qt[1].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, fh << 4 | fv, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _dht(0, 0, _Enc.DC_BITS, _Enc.DC_VALS)
    out += _dht(1, 0, _Enc.AC_BITS, _Enc.AC_VALS)
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])  # all components use tables 0/0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    enc = _Enc()
    preds = [[0] for _ in planes]
    scan_parts = []
    mcu_in_seg = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (plane, (fh, fv)) in enumerate(
                    zip(comp_blocks, factors)):
                blocks = []
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        blocks.append(plane[y0:y0 + 8, x0:x0 + 8])
                qtab = qt[0] if ci == 0 else qt[1]
                _encode_blocks(enc, blocks, qtab, preds[ci])
            mcu_in_seg += 1
            if dri and mcu_in_seg == dri and (my, mx) != (mcuy - 1,
                                                          mcux - 1):
                enc.flush()
                scan_parts.append(bytes(enc.out))
                scan_parts.append(bytes([0xFF, 0xD0 + (rst & 7)]))
                rst += 1
                enc = _Enc()
                preds = [[0] for _ in planes]
                mcu_in_seg = 0
    enc.flush()
    scan_parts.append(bytes(enc.out))
    return out + b"".join(scan_parts) + b"\xff\xd9"


_Enc.DC_CODE = _enc_table(_Enc.DC_BITS, _Enc.DC_VALS)
_Enc.AC_CODE = _enc_table(_Enc.AC_BITS, _Enc.AC_VALS)


# --- independent PROGRESSIVE encoder (T.81 Annex G forward path) ---

class _ProgEnc(_Enc):
    """Adds EOB-run accumulation and correction-bit buffering (the
    BE buffer) to the plain bit writer."""

    def __init__(self):
        super().__init__()
        self.eobrun = 0
        self.be_bits: list[int] = []

    def flush_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.put_ac(nbits << 4)
            if nbits:
                self.put(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.be_bits:
            self.put(b, 1)
        self.be_bits = []


def _quantize_all(img, qluma, qchroma, subsample):
    """Pixel planes → per-component MCU-padded grids of quantized
    ZIGZAG coefficient vectors (the scans' shared input)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        factors = [(1, 1)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        factors = [(subsample, subsample), (1, 1), (1, 1)]
    qt = [np.full(64, qluma, np.int32), np.full(64, qchroma, np.int32)]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    C = _dct_mat()
    comps = []
    for ci, (plane, (fh, fv)) in enumerate(zip(planes, factors)):
        if (fh, fv) != (hmax, vmax):
            sh, sv = hmax // fh, vmax // fv
            ph = -(-plane.shape[0] // sv) * sv
            pw = -(-plane.shape[1] // sh) * sh
            pad = np.pad(plane, ((0, ph - plane.shape[0]),
                                 (0, pw - plane.shape[1])), mode="edge")
            plane = pad.reshape(ph // sv, sv, pw // sh, sh).mean((1, 3))
        bh, bw = mcuy * fv, mcux * fh
        plane = np.pad(plane, ((0, bh * 8 - plane.shape[0]),
                               (0, bw * 8 - plane.shape[1])),
                       mode="edge")
        plane = np.clip(np.round(plane), 0, 255)
        blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8)
        F = np.einsum("ij,bjk,kl->bil", C, blocks - 128.0, C.T)
        qtab = qt[0 if ci == 0 else 1].reshape(8, 8)
        q = np.round(F / qtab).astype(np.int32)
        zz = q.reshape(-1, 64)[:, _ZIGZAG_FWD]
        # true (non-MCU-padded) block grid for non-interleaved scans
        comp_w = -(-w * fh // hmax)
        comp_h = -(-h * fv // vmax)
        comps.append({"fh": fh, "fv": fv, "bw": bw, "bh": bh,
                      "nbx": -(-comp_w // 8), "nby": -(-comp_h // 8),
                      "tq": 0 if ci == 0 else 1, "zz": zz})
    return h, w, gray, qt, comps, mcux, mcuy


def _emit_ac_first(enc, zz, ss, se, al):
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al  # AC point transform shifts the MAGNITUDE
        if t == 0:
            r += 1
            continue
        if v < 0:
            t = -t
        enc.flush_eobrun()
        while r > 15:
            enc.put_ac(0xF0)
            r -= 16
        n, bits = _Enc.cat(t)
        enc.put_ac((r << 4) | n)
        enc.put(bits, n)
        r = 0
    if r > 0:
        enc.eobrun += 1
        if enc.eobrun == 0x7FFF:
            enc.flush_eobrun()


def _emit_ac_refine(enc, zz, ss, se, al):
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob_k = ss - 1  # position of the last NEWLY-significant coef
    for idx, k in enumerate(range(ss, se + 1)):
        if absv[idx] == 1:
            eob_k = k
    r, br = 0, []
    for idx, k in enumerate(range(ss, se + 1)):
        temp = absv[idx]
        if temp == 0:
            r += 1
            continue
        while r > 15 and k <= eob_k:  # ZRLs not foldable into EOB
            enc.flush_eobrun()
            enc.put_ac(0xF0)
            r -= 16
            for b in br:
                enc.put(b, 1)
            br = []
        if temp > 1:  # history-nonzero: correction bit only
            br.append(temp & 1)
            continue
        enc.flush_eobrun()
        enc.put_ac((r << 4) | 1)
        enc.put(1 if int(zz[k]) >= 0 else 0, 1)
        for b in br:
            enc.put(b, 1)
        br, r = [], 0
    if r > 0 or br:
        enc.eobrun += 1
        enc.be_bits.extend(br)
        if enc.eobrun == 0x7FFF:
            enc.flush_eobrun()


_SCRIPT_COLOR = [  # the libjpeg-style default scan script
    ("dc", None, 0, 0, 0, 1),
    ("ac", 0, 1, 5, 0, 2),
    ("ac", 2, 1, 63, 0, 1),
    ("ac", 1, 1, 63, 0, 1),
    ("ac", 0, 6, 63, 0, 2),
    ("ac", 0, 1, 63, 2, 1),
    ("dc", None, 0, 0, 1, 0),
    ("ac", 2, 1, 63, 1, 0),
    ("ac", 1, 1, 63, 1, 0),
    ("ac", 0, 1, 63, 1, 0),
]
_SCRIPT_GRAY = [
    ("dc", None, 0, 0, 0, 1),
    ("ac", 0, 1, 63, 0, 1),
    ("dc", None, 0, 0, 1, 0),
    ("ac", 0, 1, 63, 1, 0),
]


def _encode_baseline_from(h, w, gray, qt, comps, mcux, mcuy) -> bytes:
    """Baseline (SOF0) stream from ALREADY-quantized zigzag blocks —
    the same coefficients a progressive stream carries, so decoded
    pixels can be compared bit-exactly (independent FDCTs round
    differently at .5 ties, so re-encoding from pixels cannot)."""
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0]) + bytes(qt[0].tolist()))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qt[1].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for ci, c in enumerate(comps):
        sof += bytes([ci + 1, c["fh"] << 4 | c["fv"], c["tq"]])
    out += _seg(0xC0, sof)
    out += _dht(0, 0, _Enc.DC_BITS, _Enc.DC_VALS)
    out += _dht(1, 0, _Enc.AC_BITS, _Enc.AC_VALS)
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    enc = _Enc()
    preds = [0] * len(comps)
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            for by in range(c["fv"]):
                for bx in range(c["fh"]):
                    row, col = my * c["fv"] + by, mx * c["fh"] + bx
                    zz = c["zz"][row * c["bw"] + col]
                    d = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                    n, bits = _Enc.cat(d)
                    enc.put_dc(n)
                    if n:
                        enc.put(bits, n)
                    run = 0
                    for k in range(1, 64):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            enc.put_ac(0xF0)
                            run -= 16
                        n, bits = _Enc.cat(v)
                        enc.put_ac((run << 4) | n)
                        enc.put(bits, n)
                        run = 0
                    if run:
                        enc.put_ac(0x00)  # EOB
    enc.flush()
    return out + bytes(enc.out) + b"\xff\xd9"


def encode_jpeg_progressive(img: np.ndarray, *, qluma=8, qchroma=12,
                            subsample=1, scans=None) -> bytes:
    """Minimal progressive (SOF2) encoder: spectral selection +
    successive approximation per the given scan script (kind, comp,
    Ss, Se, Ah, Al). Independent forward implementation — shares no
    code with the decoder."""
    h, w, gray, qt, comps, mcux, mcuy = _quantize_all(
        img, qluma, qchroma, subsample)
    if scans is None:
        scans = _SCRIPT_GRAY if gray else _SCRIPT_COLOR

    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0]) + bytes(qt[0].tolist()))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qt[1].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for ci, c in enumerate(comps):
        sof += bytes([ci + 1, c["fh"] << 4 | c["fv"], c["tq"]])
    out += _seg(0xC2, sof)
    out += _dht(0, 0, _Enc.DC_BITS, _Enc.DC_VALS)
    out += _dht(1, 0, _Enc.AC_BITS, _Enc.AC_VALS)

    dc_shifted_pos = 0  # Al of the completed DC first scan (sanity)
    for kind, ci, ss, se, ah, al in scans:
        scan_ids = (list(range(len(comps))) if kind == "dc" and not gray
                    else [ci if ci is not None else 0])
        sos = bytes([len(scan_ids)])
        for c in scan_ids:
            sos += bytes([c + 1, 0x00])
        sos += bytes([ss, se, ah << 4 | al])
        out += _seg(0xDA, sos)
        enc = _ProgEnc()
        if kind == "dc" and ah == 0:
            preds = [0] * len(comps)
            for mcu in range(mcux * mcuy):
                my, mx = divmod(mcu, mcux)
                for c_i in scan_ids:
                    c = comps[c_i]
                    for by in range(c["fv"]):
                        for bx in range(c["fh"]):
                            row = my * c["fv"] + by
                            col = mx * c["fh"] + bx
                            v = int(c["zz"][row * c["bw"] + col][0]) >> al
                            d = v - preds[c_i]
                            preds[c_i] = v
                            n, bits = _Enc.cat(d)
                            enc.put_dc(n)
                            if n:
                                enc.put(bits, n)
            dc_shifted_pos = al
        elif kind == "dc":  # refinement: one raw bit per block
            assert al == dc_shifted_pos - 1
            for mcu in range(mcux * mcuy):
                my, mx = divmod(mcu, mcux)
                for c_i in scan_ids:
                    c = comps[c_i]
                    for by in range(c["fv"]):
                        for bx in range(c["fh"]):
                            row = my * c["fv"] + by
                            col = mx * c["fh"] + bx
                            v = int(c["zz"][row * c["bw"] + col][0])
                            enc.put((v >> al) & 1, 1)
        else:  # AC scan: single component, true block grid
            c = comps[ci]
            emit = _emit_ac_first if ah == 0 else _emit_ac_refine
            for row in range(c["nby"]):
                for col in range(c["nbx"]):
                    emit(enc, c["zz"][row * c["bw"] + col], ss, se, al)
            enc.flush_eobrun()
        enc.flush()
        out += bytes(enc.out)
    return out + b"\xff\xd9"


@pytest.fixture()
def photo():
    """Smooth gradient + structured detail — representative content
    where mild quantization stays visually near-lossless."""
    yy, xx = np.mgrid[0:24, 0:21]
    r = (xx * 10) % 256
    g = (yy * 9 + xx * 3) % 256
    b = ((xx + yy) * 6) % 256
    return np.stack([r, g, b], -1).astype(np.uint8)


def test_jpeg_roundtrip_444_near_lossless(photo):
    out = decode_jpeg(encode_jpeg(photo, qluma=1, qchroma=1))
    assert out.shape == photo.shape and out.dtype == np.uint8
    # q=1: only FDCT/IDCT float rounding + color-space rounding remain
    err = np.abs(out.astype(int) - photo.astype(int))
    assert err.max() <= 3, err.max()


def test_jpeg_roundtrip_gray_exact_coefficients():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, qluma=1))
    assert out.shape == img.shape
    # grayscale skips color conversion: error is IDCT rounding only
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_quantized_and_odd_size(photo):
    img = photo[:19, :13]  # forces MCU edge padding + crop
    out = decode_jpeg(encode_jpeg(img, qluma=8, qchroma=12))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < 6.0, err


def test_jpeg_restart_intervals(photo):
    a = decode_jpeg(encode_jpeg(photo, qluma=4, qchroma=4))
    b = decode_jpeg(encode_jpeg(photo, qluma=4, qchroma=4, dri=2))
    np.testing.assert_array_equal(a, b)  # DRI must not change pixels


def test_jpeg_420_subsampling(photo):
    out = decode_jpeg(encode_jpeg(photo, qluma=2, qchroma=2, subsample=2))
    assert out.shape == photo.shape
    # luma survives subsampling; chroma is block-averaged
    lum = lambda im: multimodal.to_gray(im).astype(int)  # noqa: E731
    assert np.abs(lum(out) - lum(photo)).mean() < 4.0


def test_jpeg_rejects_arithmetic_and_truncated(photo):
    ok = encode_jpeg(photo)
    arith = bytearray(ok)
    sof = arith.find(b"\xff\xc0")
    arith[sof + 1] = 0xC9  # relabel as arithmetic-coded (SOF9)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(arith))
    with pytest.raises(ValueError):
        decode_jpeg(ok[: len(ok) // 2])  # truncated entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # no scan
    # a baseline stream relabeled SOF2 is a one-full-band progressive
    # stream — the unified scan machinery decodes it identically
    prog = bytearray(ok)
    prog[sof + 1] = 0xC2
    np.testing.assert_array_equal(decode_jpeg(bytes(prog)),
                                  decode_jpeg(ok))


# --- progressive (SOF2) ---------------------------------------------

def _same_coef_pair(img, qluma, qchroma, subsample=1, scans=None):
    """(baseline bytes, progressive bytes) carrying IDENTICAL
    quantized coefficients."""
    geo = _quantize_all(img, qluma, qchroma, subsample)
    base = _encode_baseline_from(*geo)
    prog = encode_jpeg_progressive(img, qluma=qluma, qchroma=qchroma,
                                   subsample=subsample, scans=scans)
    return base, prog


def test_progressive_equals_baseline_exactly(photo):
    """Same quantized coefficients → decoded pixels must be
    bit-identical across the two codings."""
    for q in ((1, 1), (8, 12)):
        base, prog = _same_coef_pair(photo, *q)
        np.testing.assert_array_equal(decode_jpeg(prog),
                                      decode_jpeg(base))


def test_progressive_near_lossless(photo):
    out = decode_jpeg(encode_jpeg_progressive(photo, qluma=1, qchroma=1))
    assert out.shape == photo.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - photo.astype(int))
    assert err.max() <= 3, err.max()


def test_progressive_gray_and_odd_size(photo):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(19, 13), dtype=np.uint8)
    base, prog = _same_coef_pair(img, 1, 1)
    out = decode_jpeg(prog)
    np.testing.assert_array_equal(out, decode_jpeg(base))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_progressive_420_subsampling(photo):
    base, prog = _same_coef_pair(photo, 2, 2, subsample=2)
    np.testing.assert_array_equal(decode_jpeg(prog), decode_jpeg(base))


def test_progressive_spectral_only_script(photo):
    """Spectral selection without successive approximation (all
    Ah=Al=0) — a distinct EOB-run-heavy coding path."""
    scans = [("dc", None, 0, 0, 0, 0),
             ("ac", 0, 1, 5, 0, 0), ("ac", 0, 6, 63, 0, 0),
             ("ac", 1, 1, 63, 0, 0), ("ac", 2, 1, 63, 0, 0)]
    base, prog = _same_coef_pair(photo, 4, 4, scans=scans)
    np.testing.assert_array_equal(decode_jpeg(prog), decode_jpeg(base))


def test_progressive_dense_and_sparse_content():
    """Noise maximizes coefficient density (ZRL + correction-bit
    paths); near-flat content maximizes cross-block EOB runs."""
    rng = np.random.default_rng(3)
    noisy = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    flat = np.full((40, 56, 3), 128, np.uint8)
    flat[5, 7] = 255
    for img, q in ((noisy, 2), (flat, 8)):
        base, prog = _same_coef_pair(img, q, q, subsample=2)
        np.testing.assert_array_equal(decode_jpeg(prog),
                                      decode_jpeg(base))


def test_progressive_via_decode_image(photo):
    payload = encode_jpeg_progressive(photo, qluma=1, qchroma=1)
    assert multimodal.sniff_format(payload) == "jpeg"
    out = multimodal.decode_image(payload)
    assert out.shape == photo.shape
    err = np.abs(out.astype(int) - photo.astype(int))
    assert err.max() <= 3


def test_jpeg_via_decode_image_and_resizer(photo):
    payload = encode_jpeg(photo, qluma=1, qchroma=1)
    assert multimodal.sniff_format(payload) == "jpeg"
    out = multimodal.decode_image(payload)
    assert out.shape == photo.shape
    # the stage path: real decode for JPEG, fake fallback for garbage
    t = pa.table({"url": ["a", "b"],
                  "html": pa.array([payload, b"\xff\xd8\xffnope"],
                                   pa.binary())})
    res = multimodal.ImageResizer(out_hw=(4, 4))(t)
    want = multimodal.resize_nn(multimodal.to_gray(out), 4, 4)
    assert list(res["pixels"].to_pylist()[0]) == want.reshape(-1).tolist()


def test_malformed_jpegs_fall_back_in_stage(photo):
    """Sniffable-but-broken JPEGs (truncated tables, missing table
    ids) must land on the fake path, never kill the map task."""
    ok = encode_jpeg(photo)
    # scan references quant table 1 for luma but only table 0 exists
    noq = bytearray(encode_jpeg(photo[..., 0]))
    sof = noq.find(b"\xff\xc0")
    noq[sof + 2 + 2 + 6 + 2] = 1  # component 1's Tq → undeclared id
    bad = [ok[:30],                       # cut inside DQT
           bytes(noq),
           b"\xff\xd8\xff\xc4\x00\x05\x00\x01\x02",  # short DHT
           b"\xff\xd8\xff\xdb\x00\x04\x00\x01"]      # short DQT
    t = pa.table({"url": [f"u{i}" for i in range(len(bad))],
                  "html": pa.array(bad, pa.binary())})
    out = multimodal.ImageResizer(out_hw=(2, 2))(t)
    assert out.num_rows == len(bad)
    assert all(len(px) == 4 for px in out["pixels"].to_pylist())
