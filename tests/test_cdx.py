"""CDX(J) index source + fetch planning (sources/cdx.py)."""

from __future__ import annotations

import os

import pyarrow as pa
import ray

from gfftoneo4j_ray.sources.cdx import parse_cdx_batch, plan_fetch, read_cdx


def _line(urlkey, ts, **kw):
    import json

    return f"{urlkey} {ts} {json.dumps(kw)}"


LINES = [
    "# comment header",
    _line("com,example)/a", "20240101000000", url="http://example.com/a",
          mime="text/html", status="200", digest="AAA1",
          filename="w1.warc.gz", offset="0", length="100"),
    _line("com,example)/b", "20240101000500", url="http://example.com/b",
          mime="text/html", status="200", digest="BBB2",
          filename="w2.warc.gz", offset="50", length="80"),
    # same digest, later ts — loses keep-one
    _line("com,example)/a2", "20240102000000", url="http://example.com/a2",
          mime="text/html", status="200", digest="AAA1",
          filename="w1.warc.gz", offset="500", length="100"),
    # non-html mime and redirect — both filtered by the plan
    _line("com,example)/img", "20240101000001", url="http://example.com/i",
          mime="image/png", status="200", digest="IMG1",
          filename="w1.warc.gz", offset="200", length="10"),
    _line("com,example)/r", "20240101000002", url="http://example.com/r",
          mime="text/html", status="301", digest="RDR1",
          filename="w1.warc.gz", offset="300", length="10"),
    # revisit record without status — filtered (null status)
    'com,example)/rev 20240103000000 {"url": "http://example.com/rev",'
    ' "mime": "warc/revisit", "digest": "AAA1", "filename": "w3.warc.gz",'
    ' "offset": "7", "length": "9"}',
    # same digest as BBB2 but earlier ts in a later file — WINS keep-one
    _line("com,example)/b0", "20240101000400", url="http://example.com/b0",
          mime="text/html", status="200", digest="BBB2",
          filename="w3.warc.gz", offset="10", length="80"),
    "totally not a cdx line",
    _line("com,example)/dup", "20240101000500", url="http://example.com/dup",
          mime="text/html", status="200", digest="BBB2",
          filename="w2.warc.gz", offset="999", length="80"),  # ts tie: urlkey b < dup
]


def test_parse_batch_fields_and_quarantine():
    t = parse_cdx_batch(pa.table({"text": pa.array(LINES)}))
    # comment dropped; 9 data lines parsed
    assert t.num_rows == 9
    bad = t.filter(pa.compute.is_valid(t["_malformed"]))
    assert bad.num_rows == 1
    good = t.filter(pa.compute.is_null(t["_malformed"]))
    r0 = good.slice(0, 1).to_pylist()[0]
    assert r0["urlkey"] == "com,example)/a"
    assert r0["status"] == 200 and r0["offset"] == 0 and r0["length"] == 100
    assert r0["ts"].year == 2024 and r0["ts"].month == 1
    # the revisit record parses with null status
    rev = good.filter(
        pa.compute.equal(good["urlkey"], "com,example)/rev")).to_pylist()[0]
    assert rev["status"] is None and rev["digest"] == "AAA1"


def test_parse_raise_mode():
    import pytest

    with pytest.raises(ValueError, match="malformed CDX line"):
        parse_cdx_batch(pa.table({"text": pa.array(["nope"])}),
                        on_error="raise")


def test_read_and_plan(ray_session, tmp_path):
    p = os.path.join(tmp_path, "cdx-00000")
    with open(p, "w") as f:
        f.write("\n".join(LINES) + "\n")
    ds = read_cdx(p)
    plan = plan_fetch(ds, num_buckets=4).to_pandas()
    # kept: digest AAA1 (earliest capture = /a), BBB2 (earliest = /b0
    # at 00:04); img/redirect/revisit/malformed all dropped
    assert set(plan["digest"]) == {"AAA1", "BBB2"}
    assert set(plan["urlkey"]) == {"com,example)/a", "com,example)/b0"}
    # ordered per warc file then offset (sequential-read locality)
    assert list(plan[["warc_filename", "offset"]].itertuples(
        index=False, name=None)) == sorted(
        plan[["warc_filename", "offset"]].itertuples(index=False,
                                                     name=None))


def test_plan_against_known_digests(ray_session, tmp_path):
    p = os.path.join(tmp_path, "cdx-00001")
    with open(p, "w") as f:
        f.write("\n".join(LINES) + "\n")
    known = ray.data.from_arrow(pa.table({"digest": pa.array(["AAA1"])}))
    plan = plan_fetch(read_cdx(p), known_digests=known,
                      num_buckets=4).to_pandas()
    assert set(plan["digest"]) == {"BBB2"}      # AAA1 already held
    assert list(plan["urlkey"]) == ["com,example)/b0"]


def test_plan_ts_tie_breaks_on_urlkey(ray_session, tmp_path):
    # /b and /dup share digest BBB2 at the same ts once /b0 is excluded
    lines = [ln for ln in LINES if "b0" not in ln]
    p = os.path.join(tmp_path, "cdx-00002")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    plan = plan_fetch(read_cdx(p), num_buckets=4).to_pandas()
    got = plan[plan["digest"] == "BBB2"]
    assert list(got["urlkey"]) == ["com,example)/b"]  # lowest urlkey wins
