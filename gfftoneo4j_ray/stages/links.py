"""Hyperlink extraction and host-level link-graph construction — the
web-graph side of KG building (the reference links records via typed
edges, SURVEY.md §2.3; for web corpora the analogous structure is the
href graph, the substrate of crawl scheduling, host-level quality
priors, and link-spam detection at Common-Crawl scale).

All kernels are vectorized Arrow/RE2 — no Python per row, no HTML
parser dependency. Extraction spec (documented, deliberately narrow):

  * links = the values of double-quoted ``href="..."`` attributes
    (case-sensitive attribute name, no whitespace around ``=``) — the
    overwhelmingly dominant form in real markup and the one an
    HTML-parser-free engine can commit to exactly;
  * unterminated attributes (no closing quote) are dropped;
  * targets are canonicalized with :func:`functions.url.canonical_url`
    and reduced to their netloc; targets with no ``scheme://netloc``
    (relative links — no base-resolution pass) yield no host and are
    dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.url import canonical_url

_NETLOC_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<netloc>[^/?#]*)"


def extract_links(html):
    """All ``href="..."`` values of a string array, vectorized.

    Returns ``(urls, parents)`` — a flat string array and the row index
    each link came from. One split pass + offset arithmetic; nulls and
    link-free rows contribute nothing."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    parts = pc.split_pattern(html, 'href="')
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts)
    # drop each row's first element — the prefix before any href
    lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    starts = np.r_[0, np.cumsum(lengths)[:-1]]
    keep = np.ones(int(lengths.sum()), bool)
    keep[starts[lengths > 0]] = False
    kept = flat.filter(pa.array(keep))
    kpar = parents.filter(pa.array(keep))
    # a legitimate link has a closing quote; truncate there
    has_q = pc.match_substring(kept, '"')
    kept = kept.filter(has_q)
    kpar = kpar.filter(has_q)
    urls = pc.replace_substring_regex(kept, r'"[\s\S]*$', "")
    return urls, kpar


def host_of_array(urls) -> pa.Array:
    """netloc of each url (null where no ``scheme://netloc`` prefix),
    vectorized."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parts = pc.extract_regex(urls, _NETLOC_RE)
    return pc.struct_field(parts, "netloc")


def link_host_graph(pages_ds, url_col: str = "url",
                    html_col: str = "html_text", *,
                    num_buckets: int = 16):
    """(page url, html) rows → the weighted host-level link graph
    (src_host, dst_host, n_links).

    Map side does everything per batch — link extraction, target
    canonicalization, host reduction of BOTH endpoints, and a local
    (src_host, dst_host) combiner — so the exchange carries per-batch
    host-pair partial counts (bounded by the host-pair diversity of a
    batch), never the links themselves. The final merge is one
    two-phase hash aggregate: the whole pipeline is a single shuffle
    of slim rows, the right shape at crawl scale."""
    from ..ops.hashagg import hash_aggregate

    def partial(t: pa.Table) -> pa.Table:
        src_host = host_of_array(canonical_url(t[url_col]))
        urls, parents = extract_links(t[html_col])
        dst_host = host_of_array(canonical_url(urls))
        pairs = pa.table({"src_host": src_host.take(parents),
                          "dst_host": dst_host})
        pairs = pairs.filter(pc.and_kleene(
            pc.is_valid(pairs["src_host"]),
            pc.is_valid(pairs["dst_host"])))
        g = pairs.group_by(["src_host", "dst_host"]).aggregate(
            [("dst_host", "count")])
        return g.rename_columns(["src_host", "dst_host", "n_links"])

    return hash_aggregate(
        pages_ds.map_batches(partial, batch_format="pyarrow"),
        ["src_host", "dst_host"], [("n_links", "sum", "n_links")],
        num_buckets=num_buckets)
