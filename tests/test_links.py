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
