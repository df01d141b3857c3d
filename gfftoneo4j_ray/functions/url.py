"""URL canonicalization — the standard first step of crawl-corpus
dedup (SURT-style normalization; cf. Common Crawl / Dolma URL dedup).

One documented, deterministic spec, implemented twice:

  * :func:`canonical_url` here — fully vectorized pyarrow.compute
    (RE2) kernel, zero Python per row: the engine path.
  * ``compat.seqref.sequential_canonical_url`` — an independent
    stdlib ``re`` + str-methods implementation: the test reference.
    (Not ``urllib.urlsplit``: it raises on unbalanced brackets, e.g.
    ``http://[`` — found by the hypothesis sweep — while the spec and
    the never-raising vectorized kernel treat them as ordinary netloc
    characters.)

Canonicalization spec (applies to each url; nulls stay null):

  1. strip the fragment (everything from the first ``#``);
  2. if the remainder does not match ``scheme://netloc...``, stop —
     the fragment-stripped string IS the canonical form;
  3. lowercase the scheme and the netloc; strip ALL leading ``www.``
     labels from the netloc; drop explicit default ports (``:80`` for
     http, ``:443`` for https — repeated, so canonicalization is
     idempotent: the output is a fixed point, a requirement for a
     dedup key);
  4. drop tracking query parameters (``utm_*``, ``gclid``,
     ``fbclid``) and empty params; keep the rest in original order;
     drop the ``?`` when nothing is left;
  5. strip all trailing ``/`` from the path; an empty path becomes
     ``/``.

Reference anchor: the reference normalizes record ids before keying
nodes (SURVEY.md §2.3 T5 — ID-strategy combinators); URL
canonicalization is the web-corpus instance of the same idea.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PARTS_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
             r"(?P<netloc>[^/?#]*)(?P<path>[^?#]*)(?:\?(?P<query>.*))?$")
_TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid)(=|$)"


def _filtered_query(query: pa.Array) -> pa.Array:
    """Per-row '&'-joined query with tracking/empty params dropped.

    Null in → null out (row had no '?'). All list work rides Arrow
    kernels + one numpy searchsorted for the offset rebuild."""
    ql = pc.split_pattern(query, "&")
    flat = pc.list_flatten(ql)
    parents = pc.list_parent_indices(ql).to_numpy(zero_copy_only=False)
    keep = pc.and_(
        pc.invert(pc.match_substring_regex(flat, _TRACKING_RE)),
        pc.not_equal(flat, ""))
    kept = flat.filter(keep)
    kpar = parents[keep.to_numpy(zero_copy_only=False)]
    n = len(query)
    offsets = np.searchsorted(kpar, np.arange(n + 1)).astype(np.int32)
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets), kept), "&")
    # restore nulls for rows that had no query at all
    return pc.if_else(pc.is_valid(query), joined, pa.scalar(None, pa.string()))


def canonical_url(url) -> pa.Array:
    """Vectorized canonicalization of a string array per the module
    spec. Accepts Array/ChunkedArray, returns a string Array the same
    length (nulls preserved)."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    if pa.types.is_large_string(url.type):
        url = url.cast(pa.string())
    # [\s\S] so an (illegitimate but possible) newline inside a
    # fragment still strips — RE2 '.' does not match newline
    u = pc.replace_substring_regex(url, r"#[\s\S]*$", "")
    parts = pc.extract_regex(u, _PARTS_RE)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    netloc = pc.utf8_lower(pc.struct_field(parts, "netloc"))
    netloc = pc.replace_substring_regex(netloc, r"^(www\.)+", "")
    netloc = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(netloc, r"(:80)+$", ""),
        pc.if_else(pc.equal(scheme, "https"),
                   pc.replace_substring_regex(netloc, r"(:443)+$", ""),
                   netloc))
    path = pc.replace_substring_regex(
        pc.struct_field(parts, "path"), r"/+$", "")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
    q = _filtered_query(pc.struct_field(parts, "query"))
    suffix = pc.if_else(
        pc.and_kleene(pc.is_valid(q), pc.not_equal(q, "")),
        pc.binary_join_element_wise(pa.scalar("?"), q, ""),
        pa.scalar(""))
    canon = pc.binary_join_element_wise(
        scheme, pa.scalar("://"), netloc, path, suffix, "")
    out = pc.if_else(pc.is_valid(parts), canon, u)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out
