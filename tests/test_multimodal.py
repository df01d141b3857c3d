"""Multimodal payload plumbing: schema, actor signature, stubbed decode."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest

from gfftoneo4j_ray.stages import multimodal


def test_featurizer_deterministic_and_schema():
    f = multimodal.PayloadFeaturizer()
    t = pa.table({"url": ["a", "b", "c"],
                  "html": pa.array([b"\x00\x01", b"", None], pa.binary())})
    out1, out2 = f(t), f(t)
    assert out1.equals(out2)
    assert out1.column_names == ["url", "n_bytes", "payload_sha1", "features"]
    assert out1["n_bytes"].to_pylist() == [2, 0, 0]
    feats = out1["features"].to_pylist()
    assert all(len(v) == multimodal.FEATURE_DIM for v in feats)
    assert all(-1.0 <= x < 1.0 for v in feats for x in v)
    # empty and null payloads share the empty-content feature
    assert feats[1] == feats[2]


def test_decode_stub_raises_without_decoder():
    if multimodal._try_import_decoder() is None:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89PNG")


def test_distributed_featurize(ray_session, tiny_corpus):
    import ray

    pages = ray.data.read_parquet(f"{tiny_corpus}/pages",
                                  columns=["url", "html"])
    out = multimodal.apply(pages, batch_size=32, concurrency=(1, 2)).to_pandas()
    assert len(out) == 240
    assert out["payload_sha1"].str.len().eq(40).all()
    # payload column dropped from the output
    assert "html" not in out.columns


def test_fake_decode_resize_shapes_and_determinism():
    img = multimodal.fake_decode(b"payload", 16, 16)
    assert img.shape == (16, 16) and img.dtype.name == "uint8"
    assert (img == multimodal.fake_decode(b"payload", 16, 16)).all()
    small = multimodal.resize_nn(img, 4, 4)
    assert small.shape == (4, 4)
    # nearest-neighbor: every output pixel is an input pixel
    assert np.isin(small, img).all()
    # upsample round-trips the corner pixel
    big = multimodal.resize_nn(small, 8, 8)
    assert big[0, 0] == small[0, 0]


def test_image_resizer_batch_layout():
    r = multimodal.ImageResizer(out_hw=(4, 4))
    t = pa.table({"url": ["a", "b"],
                  "html": pa.array([b"x", b"y"], pa.binary())})
    out = r(t)
    assert out.column_names == ["url", "height", "width", "pixels"]
    pix = out["pixels"].to_pylist()
    assert all(len(p) == 16 for p in pix)
    assert pix[0] != pix[1]          # content-dependent
    assert r(t).equals(out)          # deterministic


def test_frame_sampler_explode_and_determinism(ray_session, tiny_corpus):
    import ray

    s = multimodal.FrameSampler(max_frames=4)
    t = pa.table({"url": ["a", "b"],
                  "html": pa.array([b"0123456789abcdef", b""], pa.binary())})
    out = s(t)
    assert out.column_names == ["url", "frame_idx", "frame_sha1", "features"]
    # per-key frame counts: 1..max_frames, frame_idx dense from 0
    import collections
    per = collections.Counter(out["url"].to_pylist())
    for k, n in per.items():
        assert 1 <= n <= 4
    assert s(t).equals(out)

    pages = ray.data.read_parquet(f"{tiny_corpus}/pages",
                                  columns=["url", "html"])
    frames = multimodal.sample_frames(pages, batch_size=64,
                                      concurrency=(1, 2)).to_pandas()
    assert frames["url"].nunique() == 240
    assert (frames.groupby("url")["frame_idx"].min() == 0).all()


def _ppm_bytes(img):
    h, w, _ = img.shape
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + img.tobytes()


def _pgm_bytes(img):
    h, w = img.shape
    return b"P5 %d %d 255 " % (w, h) + img.tobytes()


def _bmp_bytes(img, top_down=False):
    """Minimal 24-bit uncompressed BMP from an (h, w, 3) RGB array."""
    import struct

    h, w, _ = img.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for r in order:
        bgr = img[r][:, ::-1].tobytes()
        rows.append(bgr + b"\x00" * (stride - len(bgr)))
    pixels = b"".join(rows)
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                      1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0,
                                 14 + 40)
    return header + dib + pixels


@pytest.fixture()
def rgb_img():
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)


def test_decode_ppm_real(rgb_img):
    out = multimodal.decode_image(_ppm_bytes(rgb_img))
    assert out.dtype == np.uint8 and out.shape == rgb_img.shape
    np.testing.assert_array_equal(out, rgb_img)


def test_decode_pgm_real(rgb_img):
    gray = rgb_img[..., 0]
    out = multimodal.decode_image(_pgm_bytes(gray))
    np.testing.assert_array_equal(out, gray)


@pytest.mark.parametrize("top_down", [False, True])
def test_decode_bmp_real(rgb_img, top_down):
    out = multimodal.decode_image(_bmp_bytes(rgb_img, top_down=top_down))
    np.testing.assert_array_equal(out, rgb_img)


def test_decode_rejects_unsupported_variants(rgb_img):
    with pytest.raises(ValueError):
        multimodal.decode_image(b"P6 2 2 65535 " + b"\x00" * 24)  # 16-bit
    bad = bytearray(_bmp_bytes(rgb_img))
    bad[28] = 8  # 8-bit palette BMP
    with pytest.raises(ValueError):
        multimodal.decode_image(bytes(bad))


def test_image_resizer_native_decode_path(ray_session, rgb_img):
    """Payloads that sniff as PPM/BMP go through the REAL decode →
    luma → nearest-neighbor resize; html payloads keep the fake path."""
    import ray

    want = multimodal.resize_nn(multimodal.to_gray(rgb_img), 4, 4) \
        .reshape(-1)
    t = pa.table({
        "url": ["ppm", "bmp", "html"],
        "html": pa.array([_ppm_bytes(rgb_img), _bmp_bytes(rgb_img),
                          b"<html><body>x</body></html>"], pa.binary()),
    })
    out = ray.data.from_arrow(t).map_batches(
        multimodal.ImageResizer, batch_format="pyarrow",
        concurrency=1,
        fn_constructor_kwargs={"out_hw": (4, 4)}).to_pandas() \
        .set_index("url")
    np.testing.assert_array_equal(np.array(out.loc["ppm", "pixels"]), want)
    np.testing.assert_array_equal(np.array(out.loc["bmp", "pixels"]), want)
    fake = multimodal.resize_nn(
        multimodal.fake_decode(b"<html><body>x</body></html>", 16, 16),
        4, 4).reshape(-1)
    np.testing.assert_array_equal(np.array(out.loc["html", "pixels"]), fake)


def _wav_bytes(samples, rate=8000, bits=16, n_ch=1, tag=1, raw=None):
    import struct

    if raw is not None:
        data = raw
    elif bits == 8:
        data = (np.asarray(samples) + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        data = np.asarray(samples, dtype="<i2").tobytes()
    else:
        data = np.asarray(samples, dtype="<i4").tobytes()
    fmt = struct.pack("<HHIIHH", tag, n_ch, rate,
                      rate * n_ch * bits // 8, n_ch * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_wav_real_roundtrip():
    x = (np.sin(np.linspace(0, 20, 800)) * 20000).astype(np.int16)
    got, rate = multimodal.decode_wav(_wav_bytes(x, rate=16000))
    assert rate == 16000
    np.testing.assert_array_equal(got, x)
    # stereo reshapes to (n, 2)
    st = np.stack([x, -x], axis=1).reshape(-1)
    got2, _ = multimodal.decode_wav(_wav_bytes(st, n_ch=2))
    assert got2.shape == (800, 2)
    np.testing.assert_array_equal(got2[:, 0], x)
    # 8-bit path
    b8 = multimodal.decode_wav(_wav_bytes(np.array([0, 127, -128]), bits=8))
    np.testing.assert_array_equal(b8[0], [0, 127, -128])


@pytest.mark.filterwarnings("ignore::DeprecationWarning")
def test_decode_wav_g711_matches_audioop():
    # every possible companded byte, decoded against the independent
    # stdlib G.711 implementation
    import audioop  # deprecated but present on 3.11 — oracle only

    allb = bytes(range(256))
    for tag, ref_fn in ((7, audioop.ulaw2lin), (6, audioop.alaw2lin)):
        got, rate = multimodal.decode_wav(
            _wav_bytes(None, bits=8, tag=tag, raw=allb))
        ref = np.frombuffer(ref_fn(allb, 2), "<i2")
        np.testing.assert_array_equal(got, ref)
        assert rate == 8000
    # stereo μ-law reshapes like PCM does
    st, _ = multimodal.decode_wav(
        _wav_bytes(None, bits=8, tag=7, n_ch=2, raw=allb))
    assert st.shape == (128, 2)


@pytest.mark.filterwarnings("ignore::DeprecationWarning")
def test_decode_wav_ima_adpcm_matches_audioop():
    # mono IMA ADPCM: one WAV block (header pred/index + low-nibble-
    # first data) must equal stdlib audioop's DVI decode of the same
    # nibble stream (audioop reads high nibble first → swap) seeded
    # with the header state
    import audioop
    import struct

    rng = np.random.default_rng(7)
    body = rng.integers(0, 256, 64, dtype=np.uint8)
    pred0, idx0 = -1234, 17
    block = struct.pack("<hBB", pred0, idx0, 0) + body.tobytes()
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 4055, len(block), 4) \
        + struct.pack("<HH", 2, 1 + len(body) * 2)
    wav_body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(block)) + block
    got, rate = multimodal.decode_wav(
        b"RIFF" + struct.pack("<I", len(wav_body)) + wav_body)
    assert rate == 8000 and got[0] == pred0
    swapped = ((body << 4) | (body >> 4)).astype(np.uint8).tobytes()
    ref, _ = audioop.adpcm2lin(swapped, 2, (pred0, idx0))
    np.testing.assert_array_equal(got[1:], np.frombuffer(ref, "<i2"))
    # stereo: per-channel headers + alternating 4-byte chunks; each
    # channel must match an independent mono decode of its own lane
    b2 = rng.integers(0, 256, 64, dtype=np.uint8)
    blk2 = struct.pack("<hBB", 500, 3, 0) + struct.pack(
        "<hBB", -500, 30, 0) + np.stack(
        [body[:32], b2[:32]], 1).reshape(-1, 4, 2).transpose(
        0, 2, 1).reshape(-1).tobytes()
    fmt2 = struct.pack("<HHIIHH", 0x11, 2, 8000, 8110, len(blk2), 4) \
        + struct.pack("<HH", 2, 1 + 32 * 2)
    body2 = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt2)) + fmt2 \
        + b"data" + struct.pack("<I", len(blk2)) + blk2
    st, _ = multimodal.decode_wav(
        b"RIFF" + struct.pack("<I", len(body2)) + body2)
    assert st.shape == (65, 2)
    nib0 = np.empty(64, np.uint8)
    nib0[0::2], nib0[1::2] = body[:32] & 0xF, body[:32] >> 4
    np.testing.assert_array_equal(
        st[1:, 0], multimodal._ima_decode(nib0, 500, 3))
    nib1 = np.empty(64, np.uint8)
    nib1[0::2], nib1[1::2] = b2[:32] & 0xF, b2[:32] >> 4
    np.testing.assert_array_equal(
        st[1:, 1], multimodal._ima_decode(nib1, -500, 30))


def test_decode_wav_24bit_float_and_extensible():
    import struct

    # 24-bit PCM: sign extension across the full range
    vals = np.array([0, 1, -1, 8388607, -8388608, 70000, -70000],
                    np.int32)
    raw = b"".join(struct.pack("<i", v)[:3] for v in vals)
    got, _ = multimodal.decode_wav(_wav_bytes(None, bits=24, raw=raw))
    np.testing.assert_array_equal(got, vals)
    # IEEE float32 (tag 3) keeps float values exactly
    f = np.array([0.0, 0.5, -1.0, 0.25], "<f4")
    gf, _ = multimodal.decode_wav(
        _wav_bytes(None, bits=32, tag=3, raw=f.tobytes()))
    np.testing.assert_array_equal(gf, f)
    # EXTENSIBLE wrapper around 16-bit PCM: tag 0xFFFE + SubFormat GUID
    x = np.array([3, -7, 12000, -32768], "<i2")
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16) \
        + struct.pack("<HHI", 22, 16, 0x3) \
        + struct.pack("<H", 1) + b"\x00\x00" \
        + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    data = x.tobytes()
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    ge, _ = multimodal.decode_wav(
        b"RIFF" + struct.pack("<I", len(body)) + body)
    np.testing.assert_array_equal(ge, x)


def test_decode_wav_rejects_non_pcm():
    bad = bytearray(_wav_bytes(np.zeros(4, np.int16)))
    bad[20] = 85  # format tag 0x55 (mp3)
    with pytest.raises(ValueError):
        multimodal.decode_wav(bytes(bad))
    with pytest.raises(NotImplementedError):
        multimodal.decode_wav(b"\xff\xfbmp3frame")


def test_audio_featurizer_native_and_fallback(ray_session):
    import ray

    x = (np.sin(np.linspace(0, 50, 4000)) * 10000).astype(np.int16)
    wav = _wav_bytes(x, rate=8000)
    t = pa.table({"url": ["wav", "html"],
                  "html": pa.array([wav, b"<html>x</html>"], pa.binary())})
    out = ray.data.from_arrow(t).map_batches(
        multimodal.AudioFeaturizer, batch_format="pyarrow",
        concurrency=1).to_pandas().set_index("url")
    # native path: 25ms @ 8kHz = 200-sample frames → 20 frames
    assert out.loc["wav", "sample_rate"] == 8000
    assert out.loc["wav", "n_frames"] == 20
    want = multimodal.audio_frame_features(x, 8000).reshape(-1)
    np.testing.assert_allclose(np.array(out.loc["wav", "features"]), want)
    # fallback path: fake features, n_frames 0
    assert out.loc["html", "n_frames"] == 0
    assert len(out.loc["html", "features"]) == multimodal.FEATURE_DIM

def test_truncated_sniffable_payloads_fall_back():
    """A payload that sniffs as BMP/WAV but is shorter than the fixed
    header raises struct.error out of the native decoders — the stages
    must catch it and fall back to the fake path (total over arbitrary
    web payloads), not kill the map task (r3 advice, medium)."""
    import struct

    bad = [b"BM", b"BM" + b"\x00" * 12,            # truncated BMP header
           b"RIFF\x10\x00\x00\x00WAVE",            # WAVE with no chunks
           b"RIFFxxxxWAVEfmt ",                    # truncated chunk header
           # declared 16-byte fmt chunk with a 4-byte body → struct.error
           b"RIFFxxxxWAVEfmt " + struct.pack("<I", 16) + b"\x00" * 4,
           b"P6", b"P6 2",                         # truncated netpbm
           b"", b"plain html"]
    t = pa.table({"url": pa.array([f"u{i}" for i in range(len(bad))]),
                  "html": pa.array(bad, pa.binary())})

    out = multimodal.ImageResizer(out_hw=(2, 2))(t)
    assert out.num_rows == len(bad)
    assert all(len(p) == 4 for p in out["pixels"].to_pylist())

    out = multimodal.AudioFeaturizer()(t)
    assert out.num_rows == len(bad)
    # every malformed payload landed on the fake-feature path
    assert out["sample_rate"].to_pylist() == [0] * len(bad)


# ---------------------------------------------------------------------------
# native PNG decode (pure numpy + stdlib zlib)
# ---------------------------------------------------------------------------

def _png_bytes(img, *, color_type=None, filters=0, palette=None,
               interlace=0, depth=8):
    """Minimal reference PNG encoder for the decode tests: applies the
    requested filter type(s) per scanline exactly per the spec, so the
    decoder's unfilter math is checked against an independent forward
    implementation (not round-tripped through itself)."""
    import struct
    import zlib

    if img.ndim == 2:
        img = img[..., None]
    h, w, ch = img.shape
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    def _filter_rows(sub, filters_):
        sh = sub.shape[0]
        fl = [filters_] * sh if isinstance(filters_, int) else \
            list(filters_)[:sh]
        out = bytearray()
        prev = np.zeros(sub.shape[1:], np.int32)
        for y, f in zip(range(sh), fl):
            line = sub[y].astype(np.int32)
            if f == 0:
                enc = line
            elif f == 1:
                left = np.vstack([np.zeros((1, sub.shape[2]), np.int32),
                                  line[:-1]])
                enc = (line - left) & 0xFF
            elif f == 2:
                enc = (line - prev) & 0xFF
            elif f == 3:
                left = np.vstack([np.zeros((1, sub.shape[2]), np.int32),
                                  line[:-1]])
                enc = (line - ((left + prev) >> 1)) & 0xFF
            elif f == 4:
                enc = np.empty_like(line)
                for x in range(sub.shape[1]):
                    for c in range(sub.shape[2]):
                        a = int(line[x - 1, c]) if x else 0
                        b = int(prev[x, c])
                        cc = int(prev[x - 1, c]) if x else 0
                        pt = a + b - cc
                        da, db, dc = abs(pt - a), abs(pt - b), abs(pt - cc)
                        pred = a if (da <= db and da <= dc) else \
                            (b if db <= dc else cc)
                        enc[x, c] = (int(line[x, c]) - pred) & 0xFF
            out += bytes([f]) + enc.astype(np.uint8).tobytes()
            prev = line
        return out

    raw = bytearray()
    if interlace:
        # real Adam7 layout: 7 independently-filtered sub-images
        for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                               (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                               (0, 1, 1, 2)):
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += _filter_rows(sub, filters)
    else:
        raw += _filter_rows(img, [filters] * h
                            if isinstance(filters, int) else filters)

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + \
            struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth,
                                      color_type, 0, 0, interlace))
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_decode_png_rgb_every_filter(rgb_img, filt):
    out = multimodal.decode_image(_png_bytes(rgb_img, filters=filt))
    np.testing.assert_array_equal(out, rgb_img)


def test_decode_png_mixed_filters_and_gray(rgb_img):
    # per-row mixed filters exercise the prev-row carry across types
    out = multimodal.decode_image(_png_bytes(rgb_img,
                                             filters=[0, 4, 1, 3, 2, 4]))
    np.testing.assert_array_equal(out, rgb_img)
    gray = rgb_img[..., 1]
    np.testing.assert_array_equal(
        multimodal.decode_image(_png_bytes(gray, filters=2)), gray)


def test_decode_png_palette_and_alpha(rgb_img):
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(5, 4), dtype=np.uint8)
    got = multimodal.decode_image(
        _png_bytes(idx, color_type=3, filters=1, palette=pal))
    np.testing.assert_array_equal(got, pal[idx])
    # RGBA → RGB (alpha dropped), gray+alpha → luma plane
    rgba = np.dstack([rgb_img, rgb_img[..., 0]])
    np.testing.assert_array_equal(
        multimodal.decode_image(_png_bytes(rgba, filters=4)), rgb_img)
    ga = np.dstack([rgb_img[..., 0], rgb_img[..., 1]])
    np.testing.assert_array_equal(
        multimodal.decode_image(_png_bytes(ga, color_type=4, filters=3)),
        rgb_img[..., 0])


def test_decode_png_adam7_interlaced(rgb_img):
    """Real Adam7 layout (7 independently-filtered sub-images, written
    by the test encoder from the spec) decodes to the exact pixels,
    for every filter type and for sub-images smaller than a pass."""
    for filt in (0, 1, 2, 3, 4):
        out = multimodal.decode_image(
            _png_bytes(rgb_img, filters=filt, interlace=1))
        np.testing.assert_array_equal(out, rgb_img)
    rng = np.random.default_rng(11)
    big = rng.integers(0, 256, size=(19, 23, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        multimodal.decode_image(_png_bytes(big, filters=4, interlace=1)),
        big)
    tiny = rng.integers(0, 256, size=(3, 2), dtype=np.uint8)  # gray,
    # several passes empty
    np.testing.assert_array_equal(
        multimodal.decode_image(_png_bytes(tiny, filters=2, interlace=1)),
        tiny)


def test_decode_png_rejects_and_falls_back(rgb_img):
    ok = _png_bytes(rgb_img)
    with pytest.raises(ValueError):  # CRC corruption must not decode
        bad = bytearray(ok)
        bad[-20] ^= 0xFF  # inside IDAT payload
        multimodal.decode_image(bytes(bad))
    with pytest.raises(ValueError):  # truncated mid-chunk
        multimodal.decode_image(ok[:40])
    with pytest.raises(ValueError):  # unknown interlace method
        multimodal.decode_image(_png_bytes(rgb_img, interlace=2))
    with pytest.raises(ValueError):  # 16-bit depth
        multimodal.decode_image(_png_bytes(rgb_img, depth=16))
    # the total-stage contract: all of the above land on the fake path
    payloads = [ok[:40], _png_bytes(rgb_img, depth=16), ok]
    t = pa.table({"url": pa.array(["a", "b", "c"]),
                  "html": pa.array(payloads, pa.binary())})
    out = multimodal.ImageResizer(out_hw=(2, 2))(t)
    assert out.num_rows == 3
    want = multimodal.resize_nn(multimodal.to_gray(rgb_img), 2, 2)
    assert out["pixels"].to_pylist()[2] == want.reshape(-1).tolist()


# ---------------------------------------------------------------------------
# native GIF decode (stdlib LZW + numpy)
# ---------------------------------------------------------------------------

def _gif_lzw_encode(indices, min_code):
    """Independent forward GIF-LZW compressor for the decode tests:
    emits variable-width LSB-first codes with the spec's width-growth
    rule (widen after assigning code 1<<width), so the decoder's
    sync logic is checked against a from-the-spec encoder, not
    round-tripped through itself."""
    clear = 1 << min_code
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    width = min_code + 1
    bits = []  # (code, width) pairs

    def emit(code):
        bits.append((code, width))

    emit(clear)
    w = b""
    for k in bytes(indices):
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        w = bytes([k])
    if w:
        emit(table[w])
    emit(end)
    out = bytearray()
    buf = nbits = 0
    for code, cw in bits:
        buf |= code << nbits
        nbits += cw
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def _gif_bytes(img, palette, *, interlace=False, left=0, top=0,
               screen=None, bg=0, transparent=None, local_ct=False,
               animated_junk=False):
    """Minimal reference GIF89a encoder: `img` is an (h, w) index
    array into `palette` ((n, 3) uint8, n a power of two ≥ 4)."""
    fh, fw = img.shape
    sw, sh = screen or (left + fw, top + fh)
    n = len(palette)
    ctbits = max(2, n.bit_length() - 1)
    assert n == 1 << ctbits
    out = bytearray(b"GIF89a")
    packed = (0x80 | (ctbits - 1)) if not local_ct else 0
    out += struct.pack("<HHBB", sw, sh, packed, bg) + b"\x00"
    if not local_ct:
        out += palette.astype(np.uint8).tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    if animated_junk:  # a comment extension the decoder must skip
        out += bytes([0x21, 0xFE, 5]) + b"hello" + b"\x00"
    fpacked = (0x80 | (ctbits - 1)) if local_ct else 0
    if interlace:
        fpacked |= 0x40
        rows = np.concatenate([np.arange(r0, fh, st)
                               for r0, st in ((0, 8), (4, 8),
                                              (2, 4), (1, 2))])
        img = img[rows]
    out += bytes([0x2C]) + struct.pack("<HHHHB", left, top, fw, fh,
                                       fpacked)
    if local_ct:
        out += palette.astype(np.uint8).tobytes()
    min_code = max(2, ctbits)
    out += bytes([min_code])
    data = _gif_lzw_encode(img.reshape(-1), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


@pytest.fixture()
def gif_case():
    rng = np.random.default_rng(7)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(13, 9), dtype=np.uint8)
    return idx, palette


def test_decode_gif_plain_and_interlaced(gif_case):
    idx, palette = gif_case
    want = palette[idx]
    out = multimodal.decode_image(_gif_bytes(idx, palette))
    np.testing.assert_array_equal(out, want)
    out = multimodal.decode_image(_gif_bytes(idx, palette,
                                             interlace=True))
    np.testing.assert_array_equal(out, want)
    # a small palette forces width growth through 3→4→… bit codes
    small = palette[:4]
    idx4 = (idx % 4).astype(np.uint8)
    out = multimodal.decode_image(_gif_bytes(idx4, small))
    np.testing.assert_array_equal(out, small[idx4])


def test_decode_gif_local_table_offset_transparency(gif_case):
    idx, palette = gif_case
    # frame offset into a larger logical screen, local color table,
    # comment extension to skip, transparency punching to background
    p = _gif_bytes(idx, palette, left=3, top=2, screen=(16, 18), bg=5,
                   transparent=int(idx[0, 0]), local_ct=True,
                   animated_junk=True)
    out = multimodal.decode_image(p)
    assert out.shape == (18, 16, 3)
    # local-ct frames have no GCT, so the background is black
    np.testing.assert_array_equal(out[0, 0], [0, 0, 0])
    mask = idx == idx[0, 0]
    frame = out[2:2 + 13, 3:3 + 9]
    np.testing.assert_array_equal(frame[~mask], palette[idx[~mask]])
    np.testing.assert_array_equal(frame[mask],
                                  np.zeros((mask.sum(), 3), np.uint8))


def test_decode_gif_lzw_full_table():
    # >4096 dictionary entries: noise at max palette width exercises
    # the table-full (deferred clear) path and 12-bit code plateau
    rng = np.random.default_rng(3)
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(90, 80), dtype=np.uint8)
    out = multimodal.decode_image(_gif_bytes(idx, palette))
    np.testing.assert_array_equal(out, palette[idx])


def test_decode_gif_rejects_and_falls_back(gif_case):
    idx, palette = gif_case
    ok = _gif_bytes(idx, palette)
    with pytest.raises(ValueError):  # truncated mid-stream
        multimodal.decode_image(ok[:20])
    with pytest.raises(ValueError):  # no image descriptor
        multimodal.decode_image(ok[:13 + 48] + b"\x3B")
    bad = bytearray(ok)
    bad[6:8] = struct.pack("<H", 0)  # zero-width logical screen
    with pytest.raises(ValueError):
        multimodal.decode_image(bytes(bad))
    # total-stage contract: malformed GIFs land on the fake path
    t = pa.table({"url": pa.array(["a", "b"]),
                  "html": pa.array([ok[:20], ok], pa.binary())})
    out = multimodal.ImageResizer(out_hw=(2, 2))(t)
    assert out.num_rows == 2
    want = multimodal.resize_nn(multimodal.to_gray(palette[idx]), 2, 2)
    assert out["pixels"].to_pylist()[1] == want.reshape(-1).tolist()


# ---------------------------------------------------------------------------
# native Y4M video frame decode + MP3 frame-header metadata
# ---------------------------------------------------------------------------

def _y4m_bytes(frames_luma, *, cspace="420", fps=(25, 1),
               frame_param=b""):
    """Minimal reference YUV4MPEG2 writer: luma from the given planes,
    chroma planes filled with 0x80 per the colorspace geometry."""
    h, w = frames_luma[0].shape
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1".encode())
    if cspace:
        out += b" C" + cspace.encode()
    out += b"\n"
    div = {"420": (2, 2), "420jpeg": (2, 2), "422": (1, 2),
           "444": (1, 1), "mono": None}.get(cspace or "420", (2, 2))
    for y in frames_luma:
        out += b"FRAME" + frame_param + b"\n" + y.tobytes()
        if div:
            out += b"\x80" * (2 * ((h // div[0]) * (w // div[1])))
    return bytes(out)


def test_decode_y4m_colorspaces_and_fps():
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, size=(8, 6), dtype=np.uint8)
              for _ in range(5)]
    for cs in ("420", "420jpeg", "422", "444", "mono"):
        got, fps = multimodal.decode_y4m(_y4m_bytes(frames, cspace=cs))
        assert fps == 25.0 and len(got) == 5
        for a, b in zip(got, frames):
            np.testing.assert_array_equal(a, b)
    # no C tag → 420 default; per-FRAME params are skipped
    got, fps = multimodal.decode_y4m(
        _y4m_bytes(frames, cspace="", fps=(30000, 1001),
                   frame_param=b" Xweird"))
    assert len(got) == 5 and abs(fps - 29.97) < 0.01
    with pytest.raises(ValueError):  # truncated last frame
        multimodal.decode_y4m(_y4m_bytes(frames)[:-10])
    with pytest.raises(ValueError):  # 10-bit colorspace unsupported
        multimodal.decode_y4m(_y4m_bytes(frames, cspace="420p10"))


def test_frame_sampler_real_y4m_path(ray_session):
    import ray

    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, size=(10, 8), dtype=np.uint8)
              for _ in range(9)]
    good = _y4m_bytes(frames)
    junk = b"not a video at all"
    ds = ray.data.from_items([{"url": "v1", "html": good},
                              {"url": "j1", "html": junk}])
    out = multimodal.sample_frames(ds, max_frames=4).to_pandas()
    v = out[out.url == "v1"].sort_values("frame_idx")
    # 4 evenly-spaced REAL source frames: 0, 3, 5, 8 of 9
    assert v.frame_idx.tolist() == [0, 3, 5, 8]
    import hashlib as _h
    assert v.frame_sha1.tolist() == [
        _h.sha1(frames[i].tobytes()).hexdigest() for i in (0, 3, 5, 8)]
    feats = np.array(v.features.tolist())
    # real luma stats land in [0, 1]; fake features land in [-1, 1)
    assert (feats >= 0).all() and (feats <= 1).all()
    want = multimodal.frame_features(frames[3])
    np.testing.assert_allclose(feats[1], want)
    # the junk row still explodes on the deterministic fake path
    assert len(out[out.url == "j1"]) >= 1


def _mp3_bytes(n_frames, *, version=3, br_idx=9, sr_idx=0, pad=0,
               id3=False):
    """Minimal reference MP3 writer: valid Layer-III headers with
    zeroed payloads, sized exactly per the spec tables."""
    rate = multimodal._MP3_RATE[version][sr_idx]
    kbps = multimodal._MP3_BITRATE[3 if version == 3 else 2][br_idx]
    spf = 1152 if version == 3 else 576
    flen = (spf // 8) * kbps * 1000 // rate + pad
    hdr = bytes([0xFF, 0xE0 | (version << 3) | (1 << 1) | 1,
                 (br_idx << 4) | (sr_idx << 2) | (pad << 1), 0])
    out = b""
    if id3:
        tag = b"junkdata12"  # 10 bytes, syncsafe size
        out += b"ID3\x04\x00\x00" + bytes([0, 0, 0, len(tag)]) + tag
    return out + (hdr + b"\x00" * (flen - 4)) * n_frames


def test_mp3_metadata_walk():
    meta = multimodal.mp3_metadata(_mp3_bytes(7))
    assert meta == (44100, 7, 7 * 1152)
    # MPEG2 @ 16 kHz, padded frames, leading ID3v2 tag
    meta = multimodal.mp3_metadata(
        _mp3_bytes(5, version=2, sr_idx=2, pad=1, id3=True))
    assert meta == (16000, 5, 5 * 576)
    # trailing ID3v1 tag stops the walk cleanly
    meta = multimodal.mp3_metadata(_mp3_bytes(3) + b"TAG" + b"\x00" * 125)
    assert meta == (44100, 3, 3 * 1152)
    # a single frame, random bytes, or WAV must NOT sync
    assert multimodal.mp3_metadata(_mp3_bytes(1)) is None
    assert multimodal.mp3_metadata(b"\xff\xfbjunk" * 40) is None
    assert multimodal.mp3_metadata(b"RIFFxxxxWAVE") is None


def test_audio_featurizer_mp3_metadata_path():
    p = _mp3_bytes(6)
    t = pa.table({"url": pa.array(["m", "x"]),
                  "html": pa.array([p, b"noise"], pa.binary())})
    out = multimodal.AudioFeaturizer()(t)
    assert out["sample_rate"].to_pylist() == [44100, 0]
    assert out["n_samples"].to_pylist()[0] == 6 * 1152
    assert out["n_frames"].to_pylist() == [0, 0]  # PCM decode stays gated


def test_decode_gif_background_uses_global_table(gif_case):
    idx, palette = gif_case
    # global AND local tables: the bg index (5) resolves in the GLOBAL
    # one even though the frame's pixels map through the local table
    lct = palette[::-1].copy()
    p = bytearray(_gif_bytes(idx, lct, left=2, top=1, screen=(14, 16),
                             bg=5, local_ct=True))
    # splice a global color table into the header by setting the GCT
    # flag and inserting palette bytes after the logical screen desc
    p[10] |= 0x80 | 0x03  # GCT present, 16 entries
    p[13:13] = palette.astype(np.uint8).tobytes()
    out = multimodal.decode_image(bytes(p))
    np.testing.assert_array_equal(out[0, 0], palette[5])
    np.testing.assert_array_equal(out[1:1 + 13, 2:2 + 9], lct[idx])
