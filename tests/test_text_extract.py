"""Byte-identical text extraction + quarantine path.

Reference anchors: parser dialect corpus GffParserSpec.scala:43-69,
negative test :71-77, dot-as-null/quoting edge cases :9-41 — here the
dialect variants are the html template family and the edge-case pages
(FIXTURES.md §1)."""

from __future__ import annotations

import pyarrow.parquet as pq

from gfftoneo4j_ray.functions.text import extract_text, extract_text_safe
from gfftoneo4j_ray.gen.pages import gen_page, render_html


def test_roundtrip_all_dialect_variants():
    texts = [
        "Plain sentence one. Plain sentence two.",
        "With <angle> brackets & ampersands.",
        'Quotes "inside"; semicolons; and\ttabs.',
        "Non-ASCII: весна, 東京, café.",
        "Multi\n\npara\n\ntext with three paragraphs.",
        "",
    ]
    for variant in range(6):
        for t in texts:
            html = render_html(t, f"t{variant}", variant)
            assert extract_text(html) == t, (variant, t)


def test_generated_pages_byte_identical():
    n_checked = 0
    for i in range(0, 500):
        row, _ = gen_page(i)
        got, reason = extract_text_safe(row["html"])
        if reason is None:
            assert got == row["text"], row["url"]
            n_checked += 1
    assert n_checked > 450


def test_quarantine_bad_utf8():
    row, triples = gen_page(210)  # i % 211 == 210 → invalid utf-8
    got, reason = extract_text_safe(row["html"])
    assert reason is not None and "utf-8" in reason
    assert triples == []


def test_empty_and_boilerplate_pages():
    row, _ = gen_page(100)  # i % 101 == 100 → empty article
    assert row["text"] == ""
    assert extract_text(row["html"]) == ""
    # html with no article at all
    assert extract_text(b"<html><body><p>nav only</p></body></html>") == ""


def test_distributed_extraction_matches_column(ray_session, tiny_corpus):
    import pyarrow.compute as pc
    import ray

    from gfftoneo4j_ray.stages import extract_text as stage

    pages = ray.data.read_parquet(f"{tiny_corpus}/pages")
    extracted = stage.apply(pages)
    clean, quar = stage.split_quarantine(extracted)

    tbl = clean.to_arrow_refs()
    got = pq.read_table  # noqa: F841  (silence unused import pattern)
    out = clean.to_pandas()
    src = pq.read_table(f"{tiny_corpus}/pages", columns=["url", "text"]).to_pandas()
    merged = out.merge(src, on="url", suffixes=("_got", "_want"))
    assert len(merged) == len(out)
    assert (merged["text_got"] == merged["text_want"]).all()

    qdf = quar.to_pandas()
    assert (qdf["url"].str.contains("/p/")).all()
    # exactly the i % 211 == 210 page in 240 rows
    assert len(qdf) == 1 and qdf["url"].iloc[0].endswith("/p/210")
    assert pc is not None
