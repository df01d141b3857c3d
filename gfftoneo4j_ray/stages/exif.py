"""EXIF metadata extraction — typed metadata for multimodal columns.

The "opaque binary + typed metadata" multimodal contract needs a
metadata EXTRACTOR, not just raster decoders: camera make/model,
capture time, orientation and GPS position are the join keys a
training-data pipeline filters and groups images by. EXIF (CIPA
DC-008, public) is a TIFF byte structure embedded either in a JPEG
APP1 segment (``Exif\\0\\0`` prefix) or at the head of a TIFF file;
this module walks IFD0 → Exif IFD → GPS IFD with a bounds-checked,
stdlib-only reader (the same no-codec-library stance as
stages/tiff.py, whose raster path reads only the subset of field
types it needs).

Numeric convention: every fractional value lands as a scaled int64
(the repo-wide exact convention) — ``exposure_us`` (µs),
``f_number_c`` / ``focal_mm_c`` (×100), ``gps_lat_c`` / ``gps_lon_c``
(degrees ×10⁷, signed by hemisphere ref). Strings are NUL-stripped.

Scale shape: :func:`exif_batch` is a per-payload map_batches kernel
(actor-pool compatible) over the binary column; output rows are slim
typed columns, the payload itself never re-ships.
"""

from __future__ import annotations

import struct

import pyarrow as pa

# field type → (struct fmt, byte size); 2=ASCII and 7=UNDEFINED read
# as raw bytes; 5/10 are (num, den) rational pairs
_FMT = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 9: ("i", 4)}
_RATIONAL = {5: ("II", 8), 10: ("ii", 8)}
_MAX_VALUES = 4096
_MAX_IFD_ENTRIES = 512

# IFD0
_MAKE, _MODEL, _ORIENT, _SOFTWARE, _DATETIME = (
    0x010F, 0x0110, 0x0112, 0x0131, 0x0132)
_EXIF_PTR, _GPS_PTR = 0x8769, 0x8825
# Exif IFD
_EXPOSURE, _FNUMBER, _ISO, _DT_ORIG, _FOCAL = (
    0x829A, 0x829D, 0x8827, 0x9003, 0x920A)
_PIX_X, _PIX_Y = 0xA002, 0xA003
# GPS IFD
_GPS_LAT_REF, _GPS_LAT, _GPS_LON_REF, _GPS_LON = 1, 2, 3, 4


def _read_ifd_rich(p: bytes, bo: str, ifd_off: int) -> dict:
    """One IFD → {tag: str | bytes | tuple[int,...] | tuple[(n,d),...]}
    with hard bounds on entry and value counts."""
    if ifd_off < 0 or ifd_off + 2 > len(p):
        raise ValueError("EXIF IFD offset out of bounds")
    (n_entries,) = struct.unpack_from(bo + "H", p, ifd_off)
    if n_entries > _MAX_IFD_ENTRIES:
        raise ValueError("EXIF IFD entry count implausible")
    tags: dict = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(p):
            raise ValueError("truncated EXIF IFD entry")
        tag, ftype, count = struct.unpack_from(bo + "HHI", p, off)
        if count > _MAX_VALUES:
            continue
        if ftype in (2, 7):
            size = count
        elif ftype in _FMT:
            size = _FMT[ftype][1] * count
        elif ftype in _RATIONAL:
            size = _RATIONAL[ftype][1] * count
        else:
            continue
        voff = off + 8 if size <= 4 else \
            struct.unpack_from(bo + "I", p, off + 8)[0]
        if voff + size > len(p):
            raise ValueError(f"EXIF tag {tag:#06x} value out of bounds")
        if ftype == 2:
            tags[tag] = p[voff:voff + count].split(b"\x00", 1)[0] \
                .decode("ascii", "replace")
        elif ftype == 7:
            tags[tag] = p[voff:voff + count]
        elif ftype in _FMT:
            fmt = _FMT[ftype][0]
            tags[tag] = struct.unpack_from(bo + str(count) + fmt, p, voff)
        else:
            fmt = _RATIONAL[ftype][0]
            flat = struct.unpack_from(bo + fmt * count, p, voff)
            tags[tag] = tuple(zip(flat[::2], flat[1::2]))
    return tags


def _exif_tiff_block(payload: bytes) -> bytes:
    """JPEG → its APP1 Exif TIFF block; bare TIFF → itself."""
    p = payload or b""
    if p[:4] in (b"II*\x00", b"MM\x00*"):
        return p
    if p[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG or TIFF payload")
    i = 2
    while i + 4 <= len(p):
        if p[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = p[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA:      # start of scan — no APP1 seen
            break
        (seg_len,) = struct.unpack_from(">H", p, i + 2)
        if seg_len < 2 or i + 2 + seg_len > len(p):
            raise ValueError("truncated JPEG segment")
        if marker == 0xE1 and p[i + 4:i + 10] == b"Exif\x00\x00":
            return p[i + 10:i + 2 + seg_len]
        i += 2 + seg_len
    raise ValueError("no EXIF APP1 segment")


def _ratio_scaled(pairs, scale: int):
    """first (num, den) rational → half-up scaled int, None on 0-den."""
    if not pairs:
        return None
    n, d = pairs[0]
    if d == 0:
        return None
    return (n * scale + d // 2) // d


def _gps_degrees_c(triple, ref: str, neg_ref: str):
    """((d),(m),(s)) rationals + hemisphere ref → degrees ×10⁷."""
    if not triple or len(triple) < 3:
        return None
    parts = []
    for n, d in triple[:3]:
        if d == 0:
            return None
        parts.append((n, d))
    scale = 10_000_000
    (dn, dd), (mn, md), (sn, sd) = parts
    # exact integer arithmetic over the common denominator
    num = dn * md * sd * 3600 + mn * dd * sd * 60 + sn * dd * md
    den = dd * md * sd * 3600
    val = (num * scale + den // 2) // den
    return -val if ref.upper().startswith(neg_ref) else val


EXIF_FIELDS = [
    ("make", pa.string()), ("model", pa.string()),
    ("software", pa.string()), ("orientation", pa.int32()),
    ("datetime", pa.string()), ("datetime_original", pa.string()),
    ("exposure_us", pa.int64()), ("f_number_c", pa.int64()),
    ("iso", pa.int64()), ("focal_mm_c", pa.int64()),
    ("pixel_w", pa.int64()), ("pixel_h", pa.int64()),
    ("gps_lat_c", pa.int64()), ("gps_lon_c", pa.int64()),
]
EXIF_SCHEMA = pa.schema(EXIF_FIELDS + [("exif_error", pa.string())])


def parse_exif(payload: bytes) -> dict:
    """JPEG/TIFF bytes → typed EXIF field dict (missing fields None).
    Raises ValueError on payloads without a readable EXIF block."""
    t = _exif_tiff_block(payload)
    if t[:2] == b"II":
        bo = "<"
    elif t[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("bad EXIF TIFF byte-order mark")
    (ifd0_off,) = struct.unpack_from(bo + "I", t, 4)
    ifd0 = _read_ifd_rich(t, bo, ifd0_off)
    out = dict.fromkeys([n for n, _ in EXIF_FIELDS])
    out["make"] = ifd0.get(_MAKE)
    out["model"] = ifd0.get(_MODEL)
    out["software"] = ifd0.get(_SOFTWARE)
    out["datetime"] = ifd0.get(_DATETIME)
    if _ORIENT in ifd0 and ifd0[_ORIENT]:
        out["orientation"] = int(ifd0[_ORIENT][0])
    if _EXIF_PTR in ifd0 and ifd0[_EXIF_PTR]:
        ex = _read_ifd_rich(t, bo, int(ifd0[_EXIF_PTR][0]))
        out["datetime_original"] = ex.get(_DT_ORIG)
        out["exposure_us"] = _ratio_scaled(ex.get(_EXPOSURE), 1_000_000)
        out["f_number_c"] = _ratio_scaled(ex.get(_FNUMBER), 100)
        out["focal_mm_c"] = _ratio_scaled(ex.get(_FOCAL), 100)
        if _ISO in ex and ex[_ISO]:
            out["iso"] = int(ex[_ISO][0])
        if _PIX_X in ex and ex[_PIX_X]:
            out["pixel_w"] = int(ex[_PIX_X][0])
        if _PIX_Y in ex and ex[_PIX_Y]:
            out["pixel_h"] = int(ex[_PIX_Y][0])
    if _GPS_PTR in ifd0 and ifd0[_GPS_PTR]:
        gps = _read_ifd_rich(t, bo, int(ifd0[_GPS_PTR][0]))
        out["gps_lat_c"] = _gps_degrees_c(
            gps.get(_GPS_LAT), gps.get(_GPS_LAT_REF, "N") or "N", "S")
        out["gps_lon_c"] = _gps_degrees_c(
            gps.get(_GPS_LON), gps.get(_GPS_LON_REF, "E") or "E", "W")
    return out


def exif_batch(t: pa.Table, bin_col: str = "payload",
               keep_cols: tuple = ("url",)) -> pa.Table:
    """Binary column → EXIF_SCHEMA typed metadata columns (plus the
    carried key columns). Unreadable payloads quarantine into
    ``exif_error`` with every field null — the module-wide decode
    contract (stages/multimodal.py)."""
    rows: dict[str, list] = {n: [] for n, _ in EXIF_FIELDS}
    errs: list = []
    for payload in t[bin_col].to_pylist():
        try:
            got = parse_exif(payload)
            err = None
        except (ValueError, struct.error, IndexError) as e:
            got = dict.fromkeys([n for n, _ in EXIF_FIELDS])
            err = f"{type(e).__name__}: {e}"
        for n, _ in EXIF_FIELDS:
            rows[n].append(got[n])
        errs.append(err)
    cols = {c: t[c] for c in keep_cols if c in t.column_names}
    for n, typ in EXIF_FIELDS:
        cols[n] = pa.array(rows[n], typ)
    cols["exif_error"] = pa.array(errs, pa.string())
    return pa.table(cols)


class ExifExtractor:
    """Actor-pool callable: binary column → EXIF_SCHEMA columns."""

    def __init__(self, bin_col: str = "payload",
                 keep_cols: tuple = ("url",)):
        self.bin_col = bin_col
        self.keep_cols = keep_cols

    def __call__(self, t: pa.Table) -> pa.Table:
        return exif_batch(t, bin_col=self.bin_col,
                          keep_cols=self.keep_cols)


def apply(ds, bin_col: str = "payload", keep_cols: tuple = ("url",),
          concurrency=(1, 4), batch_size: int = 256):
    """Actor-pool EXIF extraction stage over a binary column."""
    return ds.map_batches(
        ExifExtractor, fn_constructor_kwargs=dict(
            bin_col=bin_col, keep_cols=keep_cols),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
