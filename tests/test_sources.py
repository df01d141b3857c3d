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
