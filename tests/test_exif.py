"""EXIF metadata extraction (stages/exif.py) — fixtures are built by an
independent forward writer in this file (struct-packed IFDs), the same
independence standard as the TIFF/WebP decoder tests."""

from __future__ import annotations

import struct

import pyarrow as pa
import pytest

from gfftoneo4j_ray.stages.exif import apply, exif_batch, parse_exif


# --------------------------------------------------------------------------
# forward writer: build TIFF/EXIF bytes independently of the parser
# --------------------------------------------------------------------------

class IfdWriter:
    def __init__(self, bo="<"):
        self.bo = bo
        self.entries: list[tuple] = []
        self.heap = b""

    def _heap_add(self, data: bytes) -> int:
        off = len(self.heap)
        self.heap += data
        return off

    def add(self, tag, ftype, count, payload: bytes):
        self.entries.append((tag, ftype, count, payload))

    def ascii(self, tag, s: str):
        b = s.encode() + b"\x00"
        self.add(tag, 2, len(b), b)

    def short(self, tag, *vals):
        self.add(tag, 3, len(vals),
                 struct.pack(self.bo + "H" * len(vals), *vals))

    def long(self, tag, *vals):
        self.add(tag, 4, len(vals),
                 struct.pack(self.bo + "I" * len(vals), *vals))

    def rational(self, tag, pairs):
        flat = [x for p in pairs for x in p]
        self.add(tag, 5, len(pairs),
                 struct.pack(self.bo + "II" * len(pairs), *flat))

    def render(self, at: int) -> tuple[bytes, bytes]:
        """(ifd bytes placed at `at`, heap bytes placed right after)."""
        n = len(self.entries)
        ifd_size = 2 + 12 * n + 4
        heap_base = at + ifd_size
        body = struct.pack(self.bo + "H", n)
        heap = b""
        for tag, ftype, count, payload in sorted(self.entries):
            if len(payload) <= 4:
                v = payload.ljust(4, b"\x00")
            else:
                v = struct.pack(self.bo + "I", heap_base + len(heap))
                heap += payload
            body += struct.pack(self.bo + "HHI", tag, ftype, count) + v
        body += struct.pack(self.bo + "I", 0)
        return body, heap


def build_tiff_exif(bo="<", gps=True) -> bytes:
    # layout: header(8) | IFD0 | heap0 | EXIF IFD | heap1 | GPS | heap2
    def sized(w: IfdWriter, at: int) -> bytes:
        b, h = w.render(at)
        return b + h

    # sizes depend on pointers — fix offsets by two-pass sizing
    ifd0 = IfdWriter(bo)
    ifd0.ascii(0x010F, "CamCo")
    ifd0.ascii(0x0110, "ModelX 9")
    ifd0.short(0x0112, 6)
    ifd0.ascii(0x0132, "2024:06:01 12:00:00")

    exif = IfdWriter(bo)
    exif.rational(0x829A, [(1, 250)])          # 1/250 s → 4000 µs
    exif.rational(0x829D, [(28, 10)])          # f/2.8 → 280
    exif.short(0x8827, 320)
    exif.ascii(0x9003, "2024:06:01 11:59:58")
    exif.rational(0x920A, [(35, 1)])           # 35 mm → 3500
    exif.long(0xA002, 4032)
    exif.long(0xA003, 3024)

    gpsw = IfdWriter(bo)
    if gps:
        gpsw.ascii(1, "S")
        gpsw.rational(2, [(37, 1), (48, 1), (3000, 100)])  # 37°48'30"
        gpsw.ascii(3, "E")
        gpsw.rational(4, [(144, 1), (57, 1), (0, 1)])

    # two-pass: first render with dummy pointers to learn sizes
    probe = IfdWriter(bo)
    probe.entries = list(ifd0.entries)
    probe.long(0x8769, 0)
    if gps:
        probe.long(0x8825, 0)
    b0, h0 = probe.render(8)
    exif_off = 8 + len(b0) + len(h0)
    be, he = exif.render(exif_off)
    gps_off = exif_off + len(be) + len(he)

    final0 = IfdWriter(bo)
    final0.entries = list(ifd0.entries)
    final0.long(0x8769, exif_off)
    if gps:
        final0.long(0x8825, gps_off)
    b0, h0 = final0.render(8)
    assert 8 + len(b0) + len(h0) == exif_off
    out = (b"II*\x00" if bo == "<" else b"MM\x00*")
    out += struct.pack(bo + "I", 8) + b0 + h0 + be + he
    if gps:
        bg, hg = gpsw.render(gps_off)
        out += bg + hg
    return out


def wrap_jpeg_app1(tiff: bytes) -> bytes:
    seg = b"Exif\x00\x00" + tiff
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"   # some APP0
            + b"\xff\xe1" + struct.pack(">H", 2 + len(seg)) + seg
            + b"\xff\xda" + struct.pack(">H", 2))


EXPECT = {
    "make": "CamCo", "model": "ModelX 9", "orientation": 6,
    "datetime": "2024:06:01 12:00:00",
    "datetime_original": "2024:06:01 11:59:58",
    "exposure_us": 4000, "f_number_c": 280, "iso": 320,
    "focal_mm_c": 3500, "pixel_w": 4032, "pixel_h": 3024,
    # 37 + 48/60 + 30/3600 = 37.808333... → south-negative ×1e7
    "gps_lat_c": -378083333, "gps_lon_c": 1449500000,
}


@pytest.mark.parametrize("bo", ["<", ">"])
def test_parse_tiff_both_byte_orders(bo):
    got = parse_exif(build_tiff_exif(bo))
    for k, v in EXPECT.items():
        assert got[k] == v, (bo, k, got[k])
    assert got["software"] is None


def test_parse_from_jpeg_app1():
    got = parse_exif(wrap_jpeg_app1(build_tiff_exif()))
    assert got["model"] == "ModelX 9" and got["gps_lat_c"] < 0


def test_no_gps_and_no_exif_block():
    got = parse_exif(build_tiff_exif(gps=False))
    assert got["gps_lat_c"] is None and got["iso"] == 320
    with pytest.raises(ValueError, match="no EXIF APP1"):
        parse_exif(b"\xff\xd8\xff\xda\x00\x02")
    with pytest.raises(ValueError):
        parse_exif(b"garbage")


def test_bounds_checked_on_corrupt_offsets():
    t = bytearray(build_tiff_exif())
    struct.pack_into("<I", t, 4, 10 ** 6)       # IFD0 offset → far OOB
    with pytest.raises(ValueError, match="out of bounds"):
        parse_exif(bytes(t))
    trunc = build_tiff_exif()[:40]
    with pytest.raises((ValueError, struct.error)):
        parse_exif(trunc)


def test_batch_kernel_quarantines(ray_session):
    import ray

    t = pa.table({
        "url": pa.array(["a", "b", "c"]),
        "payload": pa.array([wrap_jpeg_app1(build_tiff_exif()),
                             b"not an image", None], pa.binary()),
    })
    out = exif_batch(t)
    assert out.num_rows == 3
    rows = out.to_pylist()
    assert rows[0]["exif_error"] is None and rows[0]["iso"] == 320
    assert rows[1]["exif_error"] is not None and rows[1]["make"] is None
    assert rows[2]["exif_error"] is not None
    # distributed apply matches the local kernel
    got = apply(ray.data.from_arrow(t), concurrency=1).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert got["iso"].tolist()[:1] == [320]
    assert list(got.columns)[0] == "url"
