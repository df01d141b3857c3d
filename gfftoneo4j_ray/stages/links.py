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


def extract_anchors(html):
    """All ``href="..."`` links WITH their anchor text, vectorized.

    Returns ``(urls, anchors, parents)``. Anchor spec (documented,
    deliberately narrow like the href spec above): the text between
    the anchor tag's closing ``>`` and the next ``<`` — plain-text
    anchors in full; an anchor wrapping nested markup contributes its
    leading text run only. The five named ASCII entities are decoded
    vectorized; whitespace is collapsed; empty anchors are dropped."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    parts = pc.split_pattern(html, 'href="')
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts)
    lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    starts = np.r_[0, np.cumsum(lengths)[:-1]]
    keep = np.ones(int(lengths.sum()), bool)
    keep[starts[lengths > 0]] = False
    kept = flat.filter(pa.array(keep))
    kpar = parents.filter(pa.array(keep))
    m = pc.extract_regex(kept, r'^(?P<url>[^"]*)"[^>]*>(?P<anchor>[^<]*)')
    ok = pc.is_valid(m)
    m = m.filter(ok)
    kpar = kpar.filter(ok)
    urls = pc.struct_field(m, "url")
    anchor = pc.struct_field(m, "anchor")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")):  # amp LAST
        anchor = pc.replace_substring(anchor, ent, ch)
    anchor = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(anchor, r"\s+", " "))
    nonempty = pc.not_equal(anchor, "")
    return (urls.filter(nonempty), anchor.filter(nonempty),
            kpar.filter(nonempty))


def anchor_dictionary(pages_ds, html_col: str = "html_text", *,
                      num_buckets: int = 16, min_count: int = 1):
    """(pages) → the anchor-text alias dictionary
    ``(surface, target_url, n)``: how often each normalized anchor
    string points at each canonical target across the corpus — the
    classic alias-dictionary builder for entity linking (the
    dictionary the linker's T1 index is loaded from; profile surface
    ``dictionary_builder``). Surfaces are lowercased.

    Same exchange shape as :func:`link_host_graph`: the map side
    extracts, canonicalizes and pre-aggregates per batch, so only
    slim (surface, target, partial n) rows shuffle — one two-phase
    hash aggregate end-to-end."""
    from ..ops.hashagg import hash_aggregate

    def partial(t: pa.Table) -> pa.Table:
        urls, anchors, _ = extract_anchors(t[html_col])
        target = canonical_url(urls)
        pairs = pa.table({"surface": pc.utf8_lower(anchors),
                          "target_url": target})
        # absolute targets only (same no-base-resolution contract as
        # link_host_graph: a relative href cannot name an entity)
        pairs = pairs.filter(pc.and_kleene(
            pc.is_valid(pairs["target_url"]),
            pc.match_substring_regex(pairs["target_url"], _NETLOC_RE)))
        g = pairs.group_by(["surface", "target_url"]).aggregate(
            [("target_url", "count")])
        return g.rename_columns(["surface", "target_url", "n"])

    agg = hash_aggregate(
        pages_ds.map_batches(partial, batch_format="pyarrow"),
        ["surface", "target_url"], [("n", "sum", "n")],
        num_buckets=num_buckets)
    if min_count > 1:
        agg = agg.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t["n"], pa.scalar(min_count, pa.int64()))),
            batch_format="pyarrow")
    return agg
