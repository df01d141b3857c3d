"""Exact substring (duplicated-span) dedup vs an independent
pure-Python reference.

The reference below groups windows by their exact token-tuple content
(no hashing), so the engine's 64-bit positional-hash grouping, cover
arithmetic, and both rewrite paths (broadcast and the semi-join +
doc-bucketed exchange) are checked against a second implementation of
the semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from gfftoneo4j_ray.stages import dedup


def reference_substring_dedup(rows: dict, window: int,
                              max_doc_freq: int = 1) -> dict:
    """(doc_id, text) rows → {doc_id: (text, n_removed)} by the spec:
    ban every window-token gram occurring in > max_doc_freq distinct
    docs; drop all covered tokens; re-join with single spaces; docs
    with zero survivors disappear."""
    toks = {d: t.split() for d, t in zip(rows["doc_id"], rows["text"])}
    gram_docs: dict[tuple, set] = {}
    for d, tk in toks.items():
        for i in range(len(tk) - window + 1):
            gram_docs.setdefault(tuple(tk[i:i + window]), set()).add(d)
    banned = {g for g, ds in gram_docs.items() if len(ds) > max_doc_freq}
    out = {}
    for d, tk in toks.items():
        covered = [False] * len(tk)
        for i in range(len(tk) - window + 1):
            if tuple(tk[i:i + window]) in banned:
                for j in range(i, i + window):
                    covered[j] = True
        kept = [t for t, c in zip(tk, covered) if not c]
        if kept:
            out[d] = (" ".join(kept), len(tk) - len(kept))
    return out


@pytest.fixture()
def span_docs(ray_session):
    import ray

    shared = "alpha beta gamma delta epsilon zeta"          # 6 tokens
    rows = {
        "doc_id": list(range(9)),
        "text": [
            f"one two {shared} three four",                  # 0: planted
            f"five six seven {shared} eight",                # 1: planted
            "alpha beta gamma x delta epsilon zeta",         # 2: broken span
            "repeat me repeat me repeat me repeat me",       # 3: within-doc only
            "short doc",                                     # 4: < window
            shared,                                          # 5: fully covered
            "  spaced\tout\ntokens  here   ok now yes ",     # 6: whitespace
            "",                                              # 7: empty
            f"tail tokens then {shared}",                    # 8: span at end
        ],
    }
    return ray.data.from_arrow(pa.table(rows)), rows


def _as_dict(ds) -> dict:
    df = ds.to_pandas()
    return {int(r.doc_id): (r.text, int(r.n_removed))
            for r in df.itertuples()}


@pytest.mark.parametrize("force_join_path", [False, True])
def test_substring_dedup_matches_reference(span_docs, force_join_path):
    ds, rows = span_docs
    window = 4
    kw = {"max_broadcast_banned": 0} if force_join_path else {}
    got = _as_dict(dedup.substring_dedup(ds, window=window, **kw))
    want = reference_substring_dedup(rows, window)
    assert got == want
    # structural expectations of the planted corpus
    assert 5 not in got            # fully covered doc disappears
    assert 7 not in got            # empty doc disappears
    assert got[3][1] == 0          # within-one-doc repeats not banned
    assert got[4] == ("short doc", 0)
    assert got[6][1] == 0          # untouched, whitespace canonicalized
    assert got[6][0] == "spaced out tokens here ok now yes"
    assert got[0][1] >= window     # the planted span is gone
    assert "gamma delta" not in got[0][0]


@pytest.mark.parametrize("force_join_path", [False, True])
def test_substring_dedup_randomized(ray_session, force_join_path):
    import ray

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    planted = "p0 p1 p2 p3 p4"
    texts = []
    for i in range(40):
        n = int(rng.integers(0, 25))
        words = list(rng.choice(vocab, size=n))
        if i % 5 == 0:            # plant a shared span in every 5th doc
            at = int(rng.integers(0, n + 1))
            words[at:at] = planted.split()
        texts.append(" ".join(words))
    rows = {"doc_id": list(range(40)), "text": texts}
    ds = ray.data.from_arrow(pa.table(rows))
    kw = {"max_broadcast_banned": 0} if force_join_path else {}
    for window in (3, 5):
        got = _as_dict(dedup.substring_dedup(ds, window=window, **kw))
        assert got == reference_substring_dedup(rows, window)


def test_substring_dedup_nothing_banned(ray_session):
    import ray

    rows = {"doc_id": [1, 2],
            "text": ["totally unique words here",
                     "other distinct content there"]}
    ds = ray.data.from_arrow(pa.table(rows))
    got = _as_dict(dedup.substring_dedup(ds, window=3))
    assert got == {1: ("totally unique words here", 0),
                   2: ("other distinct content there", 0)}
