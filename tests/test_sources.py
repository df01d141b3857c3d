"""Line-oriented JSONL source (S1/P1-P3 analogues) + derived pages +
text-verification lineage."""

from __future__ import annotations

import json
import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from gfftoneo4j_ray.sources.jsonl import read_pages_jsonl, write_pages_jsonl


@pytest.fixture()
def jsonl_file(tmp_path, tiny_corpus):
    pages = pq.read_table(f"{tiny_corpus}/pages").slice(0, 50)
    p = tmp_path / "pages.jsonl"
    write_pages_jsonl(pages, str(p))
    # append a malformed line and a comment
    with open(p, "a") as f:
        f.write("# trailing comment\n")
        f.write('{"url": "https://bad.example", "warc_ts": "not-an-int", "html": "eA=="}\n')
        f.write("this is not json at all\n")
    return str(p), pages


def test_jsonl_roundtrip_and_quarantine(ray_session, jsonl_file):
    path, pages = jsonl_file
    ds = read_pages_jsonl(path)
    df = ds.to_pandas()
    clean = df[df["_malformed"].isnull()]
    bad = df[df["_malformed"].notnull()]
    assert len(clean) == 50
    assert len(bad) == 2  # comment dropped silently, 2 malformed kept
    src = pages.to_pandas()
    merged = clean.merge(src[["url", "text"]], on="url",
                         suffixes=("_got", "_want"))
    assert len(merged) == 50
    assert (merged["text_got"] == merged["text_want"]).all()
    # html bytes survive the base64 roundtrip (align by url)
    got_html = dict(zip(clean["url"], clean["html"]))
    want_html = dict(zip(src["url"], src["html"]))
    assert all(got_html[u] == want_html[u] for u in got_html)


def test_jsonl_fail_fast_mode(ray_session, jsonl_file):
    import ray

    path, _ = jsonl_file
    with pytest.raises(ray.exceptions.RayTaskError):
        read_pages_jsonl(path, on_error="raise").materialize()


def test_pipeline_from_jsonl(ray_session, jsonl_file, tiny_corpus, tmp_path):
    """The JSONL source feeds the same pipeline: parse → drop malformed →
    write parquet → kg.run consumes it."""
    from gfftoneo4j_ray.pipelines import kg

    path, _ = jsonl_file
    ds = read_pages_jsonl(path)
    clean = ds.map_batches(
        lambda t: t.filter(pc.is_null(t["_malformed"])).drop_columns(["_malformed"]),
        batch_format="pyarrow")
    pages_dir = str(tmp_path / "pages_pq")
    clean.write_parquet(pages_dir)
    res = kg.run(pages_dir, f"{tiny_corpus}/dictionary.parquet",
                 str(tmp_path / "out"), checkpointed=False)
    assert pq.read_table(res["nodes_dir"]).num_rows > 0


def test_text_verify_lineage(ray_session, tiny_corpus, tmp_path):
    """cfg.verify_text records the byte-identity invariant per row:
    zero mismatches on a well-formed corpus; a corrupted html row is
    quarantined (not a mismatch); a wrong `text` column IS one."""
    import pyarrow as pa

    from gfftoneo4j_ray.pipelines import kg

    # corrupt one page's reference text
    t = pq.read_table(f"{tiny_corpus}/pages")
    texts = t.column("text").to_pylist()
    texts[3] = texts[3] + " TAMPERED"
    t2 = t.set_column(t.schema.get_field_index("text"), "text",
                      pa.array(texts, pa.string()))
    d = tmp_path / "pages"
    os.makedirs(d)
    pq.write_table(t2, str(d / "part-0.parquet"))

    cfg = kg.KgConfig(verify_text=True)
    out = str(tmp_path / "out")
    kg.run(str(d), f"{tiny_corpus}/dictionary.parquet", out, cfg=cfg,
           checkpointed=True, resume=False)
    mism = json.load(open(os.path.join(out, "_lineage", "text_mismatch.json")))
    assert len(mism) == 1
    assert mism[0]["url"] == t.column("url")[3].as_py()


# ---------------------------------------------------------------------------
# WARC source (Common-Crawl-style container files)
# ---------------------------------------------------------------------------

@pytest.fixture()
def warc_files(tmp_path, tiny_corpus):
    """Two WARC shards from the corpus — one plain, one with the
    Common-Crawl one-gzip-member-per-record layout."""
    from gfftoneo4j_ray.sources.warc import write_warc

    pages = pq.read_table(f"{tiny_corpus}/pages")
    a = write_warc(pages.slice(0, 30), str(tmp_path / "a.warc"))
    b = write_warc(pages.slice(30, 30), str(tmp_path / "b.warc.gz"),
                   gzip_members=True)
    return [a, b], pages.slice(0, 60)


def test_warc_roundtrip_plain_and_gzip(ray_session, warc_files):
    from gfftoneo4j_ray.sources.warc import read_warc, split_quarantine

    paths, pages = warc_files
    clean, quar = split_quarantine(read_warc(paths))
    df = clean.to_pandas()
    assert quar.count() == 0
    assert len(df) == 60
    src = pages.to_pandas()
    got = dict(zip(df["url"], df["html"]))
    assert all(got[u] == h for u, h in zip(src["url"], src["html"]))
    # WARC-Date survives at second precision
    ts = df.merge(src[["url", "warc_ts"]], on="url",
                  suffixes=("_got", "_want"))
    assert (ts["warc_ts_got"].dt.floor("s")
            == ts["warc_ts_want"].dt.floor("s")).all()


def test_warc_skips_non_document_records_and_quarantines(ray_session,
                                                         tmp_path):
    from gfftoneo4j_ray.sources.warc import parse_warc_bytes, read_warc

    # a crawl-metadata record, a clean response, then a truncated one
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
            b"\r\nmeta\r\n\r\n")
    http = b"HTTP/1.1 200 OK\r\n\r\n<html><p>hi</p></html>"
    resp = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://x.example/\r\n"
            b"WARC-Date: 2024-01-02T03:04:05Z\r\n"
            + b"Content-Length: %d\r\n\r\n" % len(http)
            + http + b"\r\n\r\n")
    trunc = (b"WARC/1.0\r\nWARC-Type: response\r\n"
             b"WARC-Target-URI: http://y.example/\r\n"
             b"Content-Length: 9999\r\n\r\nshort")
    rows = parse_warc_bytes(info + resp + trunc)
    assert [r[3] for r in rows] == [None, "truncated WARC payload"]
    assert rows[0][0] == "http://x.example/"
    assert rows[0][2] == b"<html><p>hi</p></html>"

    p = tmp_path / "mixed.warc"
    p.write_bytes(info + resp)
    df = read_warc([str(p)]).to_pandas()
    assert len(df) == 1 and df["_malformed"].isnull().all()
    assert df["warc_ts"].iloc[0].isoformat().startswith("2024-01-02T03:04:05")

    with pytest.raises(ValueError):
        parse_warc_bytes(trunc, on_error="raise")

    # a negative Content-Length must quarantine, not loop forever
    neg = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://z.example/\r\n"
           b"Content-Length: -7\r\n\r\nxxxx")
    rows = parse_warc_bytes(neg)
    assert rows == [(None, None, None, "missing/bad Content-Length")]


def test_warc_corrupt_gzip_quarantines_keeps_prior_records():
    """Corrupt (non-truncated) gzip bytes must follow the quarantine
    contract — records that decoded before the bad member are kept,
    one quarantine row reports the corruption, and on_error='raise'
    raises — not an uncaught zlib.error killing the read task."""
    import gzip

    import pytest

    from gfftoneo4j_ray.sources.warc import parse_warc_bytes

    http = b"HTTP/1.1 200 OK\r\n\r\n<html><p>ok</p></html>"
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://a.example/\r\n"
           b"WARC-Date: 2024-01-02T03:04:05Z\r\n"
           + b"Content-Length: %d\r\n\r\n" % len(http) + http + b"\r\n\r\n")
    good = gzip.compress(rec, mtime=0)
    bad = good[:3] + b"\xff" + good[4:]  # corrupt the gzip header flags
    rows = parse_warc_bytes(good + bad)
    assert rows[0][0] == "http://a.example/" and rows[0][3] is None
    assert rows[-1][3].startswith("corrupt gzip member")
    with pytest.raises(ValueError, match="corrupt gzip"):
        parse_warc_bytes(good + bad, on_error="raise")


def test_warc_chunked_transfer_encoding_dechunked():
    """Transfer-Encoding: chunked bodies are de-chunked (the framing
    lines must not pollute the html column); malformed chunk framing
    quarantines the record."""
    import pytest

    from gfftoneo4j_ray.sources.warc import parse_warc_bytes

    body = b"7\r\n<html><\r\n11\r\np>chunked</p></ht\r\n3;ext=1\r\nml>\r\n" \
           b"0\r\nX-Trailer: t\r\n\r\n"
    http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: Chunked\r\n\r\n" + body)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://c.example/\r\n"
           b"WARC-Date: 2024-01-02T03:04:05Z\r\n"
           + b"Content-Length: %d\r\n\r\n" % len(http) + http + b"\r\n\r\n")
    rows = parse_warc_bytes(rec)
    assert rows == [("http://c.example/", rows[0][1],
                     b"<html><p>chunked</p></html>", None)]

    bad_http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
                b"ZZ\r\nnot-hex\r\n0\r\n\r\n")
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://d.example/\r\n"
           + b"Content-Length: %d\r\n\r\n" % len(bad_http)
           + bad_http + b"\r\n\r\n")
    rows = parse_warc_bytes(bad)
    assert rows[0][0] is None
    assert rows[0][3].startswith("malformed chunked")
    with pytest.raises(ValueError, match="malformed chunked"):
        parse_warc_bytes(bad, on_error="raise")


def test_wet_roundtrip_skip_and_quarantine(ray_session, tmp_path):
    """WET (conversion-record) ingest: plain + per-record-gzip files
    round-trip the text, a stray response record is skipped, and an
    invalid-UTF-8 payload is quarantined with a reason."""
    from gfftoneo4j_ray.sources.warc import (read_wet, split_quarantine,
                                             write_wet)

    rows = [(f"https://ex.org/{i}", 1_700_000_000_000_000 + i * 1_000_000,
             f"doc {i} text\nwith lines".encode()) for i in range(20)]
    a = write_wet(rows[:10], str(tmp_path / "a.warc.wet"),
                  stray_response=True)
    bad = rows[10:] + [("https://ex.org/bad", 1_700_000_000_000_000,
                        b"\xff\xfe broken")]
    b = write_wet(bad, str(tmp_path / "b.warc.wet.gz"), gzip_members=True)

    clean, quar = split_quarantine(read_wet([a, b]))
    df = clean.to_pandas()
    assert len(df) == 20  # stray response skipped, bad row quarantined
    got = dict(zip(df["url"], df["text"]))
    for url, _, body in rows:
        assert got[url] == body.decode()
    q = quar.to_pandas()
    assert len(q) == 1 and "invalid UTF-8" in q["_malformed"].iloc[0]

    # Ray wraps the task's ValueError in UserCodeException; the
    # original message survives in the chained str
    with pytest.raises(Exception, match="invalid UTF-8"):
        read_wet([b], on_error="raise").materialize()


def test_pipeline_from_warc(ray_session, warc_files, tiny_corpus, tmp_path):
    """The WARC source feeds the same KG pipeline as parquet/jsonl,
    with language predicted at ingest (WARC has no lang field)."""
    from gfftoneo4j_ray.pipelines import kg
    from gfftoneo4j_ray.sources.warc import read_warc, split_quarantine

    def _annotate_lang(t):
        # ingest-time language ID: WARC carries no language — predict
        # from the extracted text, overwriting the 'und' placeholder
        from gfftoneo4j_ray.functions.textstats import lang_id_batch
        from gfftoneo4j_ray.stages.extract_text import extract_text_batch

        pred = lang_id_batch(extract_text_batch(t), text_col="text",
                             id_col="url")
        return t.set_column(t.schema.get_field_index("lang"), "lang",
                            pred["lang_pred"])

    paths, _ = warc_files
    clean, _ = split_quarantine(read_warc(paths))
    pages_dir = str(tmp_path / "pages_pq")
    clean.map_batches(_annotate_lang, batch_format="pyarrow") \
        .write_parquet(pages_dir)
    res = kg.run(pages_dir, f"{tiny_corpus}/dictionary.parquet",
                 str(tmp_path / "out"), checkpointed=False)
    assert pq.read_table(res["nodes_dir"]).num_rows > 0


def test_streaming_kg_run_all_pages_filtered(ray_session, warc_files,
                                             tiny_corpus, tmp_path):
    """An all-filtered stream (every page 'und' → dropped by the lang
    gate) must produce EMPTY node/edge tables, not crash the streaming
    sink on Ray's zero-column empty blocks."""
    from gfftoneo4j_ray.pipelines import kg
    from gfftoneo4j_ray.sources.warc import read_warc, split_quarantine

    paths, _ = warc_files
    clean, _ = split_quarantine(read_warc(paths))  # lang stays 'und'
    pages_dir = str(tmp_path / "pages_und")
    clean.write_parquet(pages_dir)
    res = kg.run(pages_dir, f"{tiny_corpus}/dictionary.parquet",
                 str(tmp_path / "out"), checkpointed=False)
    nodes = pq.read_table(res["nodes_dir"])
    edges = pq.read_table(res["edges_dir"])
    # page nodes / order edges need no lang; entity rows must be absent
    assert nodes.num_rows == 60  # one page node per clean WARC record
    assert set(edges.column("type").to_pylist()) <= {"order"}
