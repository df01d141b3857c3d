"""robots.txt policy parsing + fetch-plan filtering (sources/robots.py).

Parser cases follow RFC 9309 §2 (group selection, longest-match,
allow-on-tie, wildcards, $ anchor); the distributed filter is pinned
against a per-url sequential application of the same parsed rules.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from gfftoneo4j_ray.sources.robots import (
    _decide, _rule_regex, filter_allowed, parse_robots, policy_table)

ROBOTS = """
# corpus-bot policy
User-agent: megacrawler
Disallow: /

User-agent: raykgbot
User-agent: otherbot
Allow: /public/
Disallow: /public/tmp/
Disallow: /private
Allow: /private/press$
Disallow: /*.pdf$

User-agent: *
Disallow: /search
"""


def test_group_selection_and_rules():
    rules = parse_robots(ROBOTS, agent="raykgbot")
    assert ("/public/", True, 8) in rules
    assert ("/private", False, 8) in rules
    assert len(rules) == 5
    # unknown agent falls to the * group
    star = parse_robots(ROBOTS, agent="nobody")
    assert star == [("/search", False, 7)]
    # longest contained token wins: 'megacrawler' over '*'
    mega = parse_robots(ROBOTS, agent="MegaCrawler/2.0")
    assert mega == [("/", False, 1)]
    # no groups at all → allow everything
    assert parse_robots("", agent="raykgbot") == []
    # multi-agent group shares its rules
    assert parse_robots(ROBOTS, agent="otherbot") == rules


def test_longest_match_semantics():
    import numpy as np

    rules = parse_robots(ROBOTS, agent="raykgbot")
    paths = np.array([
        "/public/a.html",        # allow /public/ (8) beats nothing
        "/public/tmp/x",         # disallow /public/tmp/ (12) wins
        "/private/docs",         # disallow /private (8)
        "/private/press",        # allow /private/press$ (15) wins
        "/private/press2",       # $ anchor: no allow match → disallow
        "/docs/report.pdf",      # /*.pdf$ disallow
        "/docs/report.pdf.html", # $ again: allowed
        "/",                     # no rule matches → allow
    ], dtype=object)
    got = _decide(paths, rules).tolist()
    assert got == [True, False, False, True, False, False, True, True]


def test_tie_breaks_to_allow():
    import numpy as np

    rules = [("/page", True, 5), ("/page", False, 5)]
    assert _decide(np.array(["/page/x"], dtype=object), rules).tolist() \
        == [True]


def test_rule_regex_escaping():
    import re

    # regex metacharacters in paths are literal per the RFC
    pat = _rule_regex("/a+b(c)?.d")
    assert re.match(pat, "/a+b(c)?.d/e")
    assert not re.match(pat, "/aab(c)Xd")


def test_filter_allowed_end_to_end(ray_session):
    robots = ray.data.from_arrow(pa.table({
        "host": pa.array(["ruled.example.com", "empty.example.com"]),
        "body": pa.array([ROBOTS, ""]),
    }))
    policy = policy_table(robots, agent="raykgbot")

    urls = [
        "https://ruled.example.com/public/ok.html",      # keep
        "https://ruled.example.com/public/tmp/x",        # drop
        "https://ruled.example.com/private/docs",        # drop
        "https://ruled.example.com/private/press",       # keep ($)
        "https://ruled.example.com/paper.pdf",           # drop (*.pdf$)
        "https://ruled.example.com",                     # keep (path /)
        "https://empty.example.com/anything",            # keep: no rules
        "https://norobots.example.com/x",                # keep: no host row
    ]
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(urls),
        "tag": pa.array([f"t{i}" for i in range(len(urls))]),
    })).repartition(3)
    got = filter_allowed(ds, policy, num_buckets=4).to_pandas() \
        .sort_values("tag").reset_index(drop=True)
    keep = [0, 3, 5, 6, 7]
    assert list(got["tag"]) == [f"t{i}" for i in keep]
    assert list(got["url"]) == [urls[i] for i in keep]
    assert list(got.columns) == ["url", "tag"]   # helpers stripped


def test_filter_composes_with_cdx_plan(ray_session, tmp_path):
    """The crawl-planning composition: CDX plan → robots filter."""
    import json
    import os

    from gfftoneo4j_ray.sources.cdx import plan_fetch, read_cdx

    lines = []
    for i, (path, dig) in enumerate([("/public/a", "D1"),
                                     ("/private/b", "D2")]):
        lines.append(
            f"com,ruled)/{i} 2024010100000{i} " + json.dumps({
                "url": f"https://ruled.example.com{path}",
                "mime": "text/html", "status": "200", "digest": dig,
                "filename": "w.warc.gz", "offset": str(i * 100),
                "length": "90"}))
    p = os.path.join(tmp_path, "cdx")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    robots = ray.data.from_arrow(pa.table({
        "host": pa.array(["ruled.example.com"]),
        "body": pa.array([ROBOTS])}))
    plan = plan_fetch(read_cdx(p), num_buckets=2)
    allowed = filter_allowed(plan, policy_table(robots, agent="raykgbot"),
                             num_buckets=2).to_pandas()
    assert list(allowed["digest"]) == ["D1"]     # /private/b filtered
