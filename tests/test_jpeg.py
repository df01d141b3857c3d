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


def test_jpeg_rejects_progressive_and_truncated(photo):
    ok = encode_jpeg(photo)
    prog = bytearray(ok)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2  # relabel as progressive
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))
    with pytest.raises(ValueError):
        decode_jpeg(ok[: len(ok) // 2])  # truncated entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # no scan


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
