"""Hyperlink extraction + host-level link graph (stages/links.py)."""

from __future__ import annotations

import pyarrow as pa

from gfftoneo4j_ray.stages.links import (extract_links, host_of_array,
                                         link_host_graph)


def test_extract_links_crafted():
    html = pa.array([
        '<a href="https://A.com/x">1</a> <a href="HTTP://WWW.B.org:80/y/">2',
        "no links here",
        None,
        '<a href="/relative/only">r</a> <a href="https://c.net/z?utm_c=1">',
        '<a href="https://unterminated.example/never',   # no closing quote
        "single quotes <a href='https://sq.example/'>s</a>",   # not matched
        "",
    ], pa.string())
    urls, parents = extract_links(html)
    assert list(zip(parents.to_pylist(), urls.to_pylist())) == [
        (0, "https://A.com/x"), (0, "HTTP://WWW.B.org:80/y/"),
        (3, "/relative/only"), (3, "https://c.net/z?utm_c=1"),
    ]


def test_host_of_array():
    got = host_of_array(pa.array([
        "https://a.com/x", "http://b.org:8080/y", "/relative", None,
        "mailto:x@y", "ftp://f.example", "https://"]))
    assert got.to_pylist() == [
        "a.com", "b.org:8080", None, None, None, "f.example", ""]


def test_link_host_graph_matches_reference(ray_session):
    """Distributed host graph == a plain-Python reference over pages
    whose markup mixes absolute, relative, tracking-param'd,
    messy-cased, and unterminated links; partitioning-invariant."""
    import re

    import pandas as pd
    import ray

    from gfftoneo4j_ray.compat.seqref import sequential_canonical_url

    rows = []
    for i in range(300):
        url = f"https://www.Site{i % 5}.Example.com/p/{i}"
        html = (f'<a href="https://dst{(i * 3) % 4}.example/a/{i}?utm_c=1">'
                f'x</a> <a href="HTTP://WWW.Other{i % 2}.ORG:80/q/">y</a> '
                f'<a href="/rel/{i}">r</a>')
        if i % 9 == 0:
            html += ' <a href="https://never.example/tail'
        rows.append((url, html))
    t = pa.table({"url": [u for u, _ in rows],
                  "html_text": [h for _, h in rows]})
    got = link_host_graph(
        ray.data.from_arrow(t).repartition(7), num_buckets=4) \
        .to_pandas().sort_values(["src_host", "dst_host"]) \
        .reset_index(drop=True)

    def host(u):
        c = sequential_canonical_url(u)
        m = re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", c)
        return m.group(1) if m else None

    ref: dict[tuple, int] = {}
    for u, h in rows:
        sh = host(u)
        for m in re.finditer(r'href="([^"]*)"', h):
            dh = host(m.group(1))
            if sh is not None and dh is not None:
                ref[(sh, dh)] = ref.get((sh, dh), 0) + 1
    refdf = pd.DataFrame(
        [(a, b, n) for (a, b), n in sorted(ref.items())],
        columns=["src_host", "dst_host", "n_links"])
    pd.testing.assert_frame_equal(got, refdf)
    # the edge cases were actually present
    assert not any("never.example" in h for h in got["dst_host"])
    assert got["n_links"].sum() == 600   # 2 real links per page


def test_extract_anchors_crafted():
    from gfftoneo4j_ray.stages.links import extract_anchors

    html = pa.array([
        '<a href="http://a.example/x">Alpha  Beta</a> '
        '<a href="http://b.example/y">G &amp; S &lt;co&gt;</a>',
        '<a href="http://c.example/z"><b>bold lead</b> tail</a>'
        '<a href="http://d.example/w"></a>'          # empty anchor: drop
        '<a href="http://e.example/u">   </a>',      # ws-only: drop
        "no links here",
        None,
    ])
    urls, anchors, parents = extract_anchors(html)
    # entities decoded, whitespace collapsed; the nested-markup anchor
    # ('<b' immediately after '>') has an empty leading text run, so it
    # drops together with the empty/ws-only ones — the documented spec
    assert urls.to_pylist() == ["http://a.example/x", "http://b.example/y"]
    assert anchors.to_pylist() == ["Alpha Beta", 'G & S <co>']
    assert parents.to_pylist() == [0, 0]


def test_anchor_dictionary_matches_reference(ray_session):
    import html as _h
    import re

    import pandas as pd
    import ray

    from gfftoneo4j_ray.functions.url import canonical_url
    from gfftoneo4j_ray.stages.links import anchor_dictionary

    pages = []
    for i in range(200):
        tgt = f"HTTP://Site{i % 5}.Example.com:80/p/{i % 7}#frag"
        pages.append(
            f'<p><a href="{tgt}">Entity {i % 3}</a>'
            f'<a href="{tgt}">  entity   {i % 3} </a>'
            f'<a href="relative/{i}">skip me</a></p>')
    ds = ray.data.from_arrow(pa.table({"html_text": pa.array(pages)})) \
        .repartition(5)
    got = anchor_dictionary(ds, num_buckets=4).to_pandas() \
        .sort_values(["surface", "target_url"]).reset_index(drop=True)

    ref: dict[tuple, int] = {}
    for h in pages:
        for m in re.finditer(r'href="([^"]*)"[^>]*>([^<]*)', h):
            anchor = re.sub(r"\s+", " ", _h.unescape(m.group(2))).strip()
            if not anchor:
                continue
            tgt = canonical_url(pa.array([m.group(1)]))[0].as_py()
            if tgt is None or not re.match(
                    r"^[A-Za-z][A-Za-z0-9+.\-]*://", tgt):
                continue  # absolute targets only, like the kernel
            key = (anchor.lower(), tgt)
            ref[key] = ref.get(key, 0) + 1
    refdf = pd.DataFrame(
        [(s, t, n) for (s, t), n in sorted(ref.items())],
        columns=["surface", "target_url", "n"])
    pd.testing.assert_frame_equal(got, refdf)
    # both raw spellings folded into one normalized surface
    assert set(got["surface"]) == {"entity 0", "entity 1", "entity 2"}
    # relative targets never made it in
    assert not any("skip" in s for s in got["surface"])


def test_anchor_dictionary_min_count(ray_session):
    import ray

    from gfftoneo4j_ray.stages.links import anchor_dictionary

    pages = ['<a href="http://x.example/1">rare</a>',
             '<a href="http://x.example/2">common</a>',
             '<a href="http://x.example/2">common</a>']
    ds = ray.data.from_arrow(pa.table({"html_text": pa.array(pages)}))
    got = anchor_dictionary(ds, num_buckets=2, min_count=2).to_pandas()
    assert list(got["surface"]) == ["common"] and list(got["n"]) == [2]
