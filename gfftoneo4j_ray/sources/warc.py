"""WARC pages source: Common-Crawl-style WARC files → the input_hint
pages schema ``(url, warc_ts, html, lang)``.

The web-archive analogue of the reference's file-reader head (S1:
one file → many records, corwur Application.scala:42-50): WARC/1.0-1.1
(ISO 28500) container files, plain or gzip — Common Crawl gzips each
record as its own gzip member precisely so that readers can split and
stream them record-by-record.

Ray Data layout: one WARC file = one read task
(``read_binary_files`` over the shard listing — WARC offsets are not
seekable without an index, so the file is the natural unit of
parallelism; Common Crawl ships ~1 GB files, which is also the right
block granularity at cluster scale). Record parsing, HTTP-payload
splitting, and header extraction all run inside ``map_batches`` — no
driver loop, no Python-per-byte work beyond the per-record header
scan (headers are ~300 bytes; payload bytes are sliced, never
iterated).

Malformed records follow the jsonl source's contract: quarantined
with a reason into ``_malformed`` by default, or fail-fast with
``on_error="raise"`` (the reference's behavior).
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

import pyarrow as pa

WARC_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("lang", pa.string()),             # 'und' — language-ID is a stage
    ("_malformed", pa.string()),       # null = clean; else the reason
])

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> tuple[bytes, str | None]:
    """Decompress ALL members of a (possibly multi-member) gzip stream
    — CC writes one member per record; ``zlib`` stops at each member
    boundary, so loop until the tail is consumed. Returns
    ``(decoded, err)``: corrupt bytes (``zlib.error``) keep every
    record that decoded before the bad member and report the error
    instead of killing the read task (the quarantine contract covers
    corruption as well as truncation)."""
    out = []
    err = None
    while data:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error as e:
            err = f"corrupt gzip member: {e}"
            break
        data = d.unused_data
        if not d.eof:  # truncated member — keep what decoded
            break
    return b"".join(out), err


def _parse_warc_headers(block: bytes) -> dict:
    """WARC named fields (ISO 28500 §4): 'Name: value' lines after the
    version line; names are case-insensitive."""
    headers: dict = {}
    for line in block.split(b"\r\n")[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().lower()] = v.strip()
    return headers


def _dechunk(body: bytes) -> bytes | None:
    """Decode a Transfer-Encoding: chunked HTTP body (RFC 9112 §7.1):
    ``<size-hex>[;ext]\\r\\n<data>\\r\\n`` repeated, terminated by a
    0-size chunk (trailers ignored). Returns ``None`` on malformed or
    truncated framing — the caller quarantines."""
    out = []
    i, n = 0, len(body)
    while True:
        j = body.find(b"\r\n", i)
        if j < 0:
            return None
        size_tok = body[i:j].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return None
        if size < 0:
            return None
        if size == 0:
            return b"".join(out)
        start = j + 2
        if start + size + 2 > n or body[start + size:start + size + 2] \
                != b"\r\n":
            return None
        out.append(body[start:start + size])
        i = start + size + 2


def _http_body(payload: bytes) -> tuple[bytes, str | None]:
    """Split an HTTP response message into its body (after the first
    CRLFCRLF), de-chunking ``Transfer-Encoding: chunked`` payloads —
    Common-Crawl response records frequently carry chunked bodies,
    whose chunk-size framing lines would otherwise pollute the html
    column. A payload without an HTTP status line is returned whole
    (resource records carry the raw document). Returns
    ``(body, err)``; malformed chunk framing reports an error."""
    if not payload.startswith(b"HTTP/"):
        return payload, None
    i = payload.find(_CRLF2)
    if i < 0:
        return b"", None
    body = payload[i + 4:]
    # header field names are case-insensitive (RFC 9110 §5.1); the
    # header block is ~hundreds of bytes, so one lower() is cheap
    for line in payload[:i].lower().split(b"\r\n")[1:]:
        k, sep, v = line.partition(b":")
        if sep and k.strip() == b"transfer-encoding" \
                and b"chunked" in v:
            decoded = _dechunk(body)
            if decoded is None:
                return b"", "malformed chunked transfer-encoding"
            return decoded, None
    return body, None


def _parse_ts(v: bytes):
    """WARC-Date (ISO 8601, UTC) → µs since epoch, None if absent."""
    try:
        s = v.decode("ascii").replace("Z", "+00:00")
        dt = datetime.fromisoformat(s)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)
    except ValueError:
        return None


def parse_warc_bytes(data: bytes, *, on_error: str = "quarantine",
                     types: tuple = (b"response", b"resource")):
    """One WARC file's bytes → list of (url, ts_us, html, err) tuples
    for its response/resource records (warcinfo/request/metadata are
    skipped — they describe the crawl, not the documents)."""
    gz_err = None
    if data[:2] == b"\x1f\x8b":
        data, gz_err = _gunzip_members(data)
        if gz_err and on_error == "raise":
            raise ValueError(gz_err)
    rows = []
    i = 0
    n = len(data)
    while i < n:
        # skip inter-record blank lines
        while i < n and data[i:i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        if not data.startswith(b"WARC/", i):
            msg = f"expected WARC version at offset {i}"
            if on_error == "raise":
                raise ValueError(msg)
            rows.append((None, None, None, msg))
            break  # cannot resync without a record length
        hdr_end = data.find(_CRLF2, i)
        if hdr_end < 0:
            msg = "truncated WARC header block"
            if on_error == "raise":
                raise ValueError(msg)
            rows.append((None, None, None, msg))
            break
        headers = _parse_warc_headers(data[i:hdr_end])
        try:
            length = int(headers[b"content-length"])
            if length < 0:  # a negative length would move the record
                raise ValueError(length)  # offset BACKWARDS — refuse
        except (KeyError, ValueError):
            msg = "missing/bad Content-Length"
            if on_error == "raise":
                raise ValueError(msg) from None
            rows.append((None, None, None, msg))
            break  # record boundary unknown — stop, don't misparse
        body_start = hdr_end + 4
        payload = data[body_start:body_start + length]
        i = body_start + length
        if len(payload) < length:
            msg = "truncated WARC payload"
            if on_error == "raise":
                raise ValueError(msg)
            rows.append((None, None, None, msg))
            break
        if headers.get(b"warc-type") not in types:
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = _parse_ts(headers.get(b"warc-date", b""))
        if not url:
            msg = "record missing WARC-Target-URI"
            if on_error == "raise":
                raise ValueError(msg)
            rows.append((None, None, None, msg))
            continue
        body, body_err = _http_body(payload)
        if body_err:
            msg = f"{body_err} ({url})"
            if on_error == "raise":
                raise ValueError(msg)
            rows.append((None, None, None, msg))
            continue
        rows.append((url, ts, body, None))
    if gz_err:  # records before the corrupt member were kept above
        rows.append((None, None, None, gz_err))
    return rows


def read_warc(paths, *, on_error: str = "quarantine"):
    """WARC file paths (plain or .gz) → pages Dataset in the
    input_hint shape; compose with ``extract_text.apply`` /
    ``split_quarantine`` exactly like the parquet source."""
    import ray

    def parse_files(t: pa.Table) -> pa.Table:
        urls, tss, htmls, langs, errs = [], [], [], [], []
        for data in t["bytes"].to_pylist():
            for url, ts, html, err in parse_warc_bytes(
                    data, on_error=on_error):
                urls.append(url)
                tss.append(ts)
                htmls.append(html)
                langs.append(None if err else "und")
                errs.append(err)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "lang": pa.array(langs, pa.string()),
            "_malformed": pa.array(errs, pa.string()),
        }).cast(WARC_SCHEMA)

    # one file per block: parse_fn concurrency follows the file count
    return ray.data.read_binary_files(paths).map_batches(
        parse_files, batch_format="pyarrow", batch_size=1)


def write_warc(pages_table: pa.Table, path: str, *,
               gzip_members: bool = False) -> str:
    """Inverse writer (test fixture helper): pages rows → a WARC file
    of response records, optionally with one gzip member per record
    (the Common-Crawl on-disk layout)."""
    import gzip

    def record(url: str, ts_us: int, html: bytes) -> bytes:
        ts = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + html)
        hdr = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               + f"WARC-Target-URI: {url}\r\n".encode()
               + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
               .encode()
               + f"Content-Length: {len(http)}\r\n".encode())
        return hdr + b"\r\n" + http + _CRLF2

    with open(path, "wb") as f:
        for row in pages_table.to_pylist():
            ts = row["warc_ts"]
            if not isinstance(ts, int):
                ts = int(ts.replace(tzinfo=timezone.utc)
                         .timestamp() * 1_000_000)
            rec = record(row["url"], ts, row["html"])
            f.write(gzip.compress(rec, mtime=0) if gzip_members else rec)
    return path


WET_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("_malformed", pa.string()),
])


def read_wet(paths, *, on_error: str = "quarantine"):
    """WET files (Common Crawl's extracted-text sidecar: a WARC
    container whose ``conversion`` records carry the already-extracted
    UTF-8 plain text) → documents-shaped Dataset
    ``(url, warc_ts, text, lang, _malformed)``.

    The WET path bypasses the HTML extraction stage entirely — its
    output plugs straight into the triple/dedup/analytics stages. Same
    unit of parallelism as ``read_warc`` (one ~1 GB file per read
    task), same quarantine contract: invalid UTF-8 payloads and
    malformed records land in ``_malformed`` instead of killing the
    task (or raise under ``on_error='raise'``)."""
    import ray

    def parse_files(t: pa.Table) -> pa.Table:
        urls, tss, texts, langs, errs = [], [], [], [], []
        for data in t["bytes"].to_pylist():
            for url, ts, body, err in parse_warc_bytes(
                    data, on_error=on_error,
                    types=(b"conversion",)):
                text = None
                if err is None:
                    try:
                        text = body.decode("utf-8")
                    except UnicodeDecodeError:
                        err = f"invalid UTF-8 in WET payload ({url})"
                        if on_error == "raise":
                            raise ValueError(err) from None
                        url = None
                urls.append(url)
                tss.append(ts)
                texts.append(text)
                langs.append(None if err else "und")
                errs.append(err)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "_malformed": pa.array(errs, pa.string()),
        }).cast(WET_SCHEMA)

    return ray.data.read_binary_files(paths).map_batches(
        parse_files, batch_format="pyarrow", batch_size=1)


def write_wet(doc_rows, path: str, *, gzip_members: bool = False,
              stray_response: bool = False) -> str:
    """Inverse writer (test fixture helper): (url, ts_us, text-bytes)
    rows → a WET file of conversion records. ``stray_response``
    appends a response record, which a WET reader must skip."""
    import gzip

    def record(wtype: bytes, url: str, ts_us: int, body: bytes) -> bytes:
        ts = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
        hdr = (b"WARC/1.0\r\n"
               b"WARC-Type: " + wtype + b"\r\n"
               + f"WARC-Target-URI: {url}\r\n".encode()
               + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
               .encode()
               + b"Content-Type: text/plain\r\n"
               + f"Content-Length: {len(body)}\r\n".encode())
        return hdr + b"\r\n" + body + _CRLF2

    with open(path, "wb") as f:
        for url, ts_us, body in doc_rows:
            rec = record(b"conversion", url, ts_us, body)
            f.write(gzip.compress(rec, mtime=0) if gzip_members else rec)
        if stray_response:
            rec = record(b"response", "https://skip.example/", 0,
                         b"HTTP/1.1 200 OK\r\n\r\n<html></html>")
            f.write(gzip.compress(rec, mtime=0) if gzip_members else rec)
    return path


def split_quarantine(ds):
    """(clean pages without _malformed, quarantined rows) — same
    contract as the extract stage's views: two lazy vectorized filters
    over the same upstream."""
    import pyarrow.compute as pc

    clean = ds.map_batches(
        lambda t: t.filter(pc.is_null(t["_malformed"]))
        .drop_columns(["_malformed"]), batch_format="pyarrow")
    quar = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["_malformed"]))
        .select(["url", "_malformed"]), batch_format="pyarrow")
    return clean, quar
