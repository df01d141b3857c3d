"""Sequential reference engine — the single-process golden build.

The reference system is a single-threaded JVM ETL (reference:
src/main/scala/corwur/Application.scala:30-40 — read, parse, group,
assemble, sink, all in one heap). This module reproduces that
execution model over the SAME per-record kernels the distributed
engine uses (extract_text_safe, TripleExtractor, EntityLinker, the
content-hash id functions), but with plain dicts/Counters instead of
shuffles, so it is:

  * the independent oracle for the distributed assembly — every
    shuffle, dedup aggregate, canonical merge and mention count in
    pipelines/kg.py must reproduce what one process computes here
    (tested at sf0.001 in tests/test_seqref.py; the sf0.01 golden
    parquet for the driver's kg_nodes / kg_edges oracle is generated
    from this module by tools/make_goldens.py);
  * intentionally NOT scalable — it materializes everything in one
    heap, exactly like the reference. Do not use it beyond golden
    generation.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ..functions.hashing import alias_node_id, entity_node_id, page_node_id
from ..functions.text import extract_text_safe
from ..stages.graph import EDGES_SCHEMA, NODES_SCHEMA, host_of
from ..stages.linker import EntityLinker
from ..stages.triples import TripleExtractor
from ..state.unionfind import UnionFind

_S, _E = "s:", "e:"


def sequential_kg_build(pages: list[dict], dict_table: pa.Table,
                        lang: str = "en"):
    """pages rows (url, warc_ts, html, lang) + dictionary →
    (nodes_table, edges_table), semantically identical to
    pipelines.kg.run over the same input."""
    # stage 1: extract text, quarantine undecodable pages
    clean = []
    for p in pages:
        text, reason = extract_text_safe(p["html"])
        if reason is None:
            clean.append({"url": p["url"], "warc_ts": p["warc_ts"],
                          "text": text, "lang": p["lang"]})

    # stage 2+3: triples (lang-gated) + linking — same kernels, one batch
    en = [p for p in clean if p["lang"] == lang]
    batch = pa.table({
        "url": pa.array([p["url"] for p in en], pa.string()),
        "text": pa.array([p["text"] for p in en], pa.string()),
    })
    linked = EntityLinker(dict_table=dict_table)(TripleExtractor()(batch))

    # stage 4: canonicalization — one union-find over alias pairs
    uf = UnionFind()
    for side in ("subj", "obj"):
        surfs = linked[side].to_pylist()
        keys = linked[f"{side}_key"].to_pylist()
        resolved = linked[f"{side}_resolved"].to_pylist()
        for s, k, r in zip(surfs, keys, resolved):
            if r:
                uf.union(_S + s, _E + k)
    mapping: dict[str, tuple[str, str]] = {}
    for _, members in uf.groups().items():
        ekeys = sorted(x[2:] for x in members if x.startswith(_E))
        surfaces = [x[2:] for x in members if x.startswith(_S)]
        canon = ekeys[0] if ekeys else min(surfaces)
        nid = entity_node_id(canon)
        for s in surfaces:
            mapping[s] = (canon, nid)
        for k in ekeys:
            mapping.setdefault(k, (canon, nid))

    def canon_of(surface: str) -> tuple[str, str]:
        hit = mapping.get(surface)
        return hit if hit is not None else (surface, entity_node_id(surface))

    # stage 5: graph assembly — edge weights via one Counter
    w: Counter = Counter()
    nil_info: dict[str, str] = {}  # node_id -> canon key (NIL entities)
    for i in range(linked.num_rows):
        url = linked["url"][i].as_py()
        subj = linked["subj"][i].as_py()
        obj = linked["obj"][i].as_py()
        pred = linked["pred"][i].as_py()
        s_canon, s_nid = canon_of(subj)
        o_canon, o_nid = canon_of(obj)
        pid = page_node_id(url)
        w[(s_nid, o_nid, "asserts", pred)] += 1
        w[(pid, s_nid, "mentions", "")] += 1
        w[(pid, o_nid, "mentions", "")] += 1
        w[(alias_node_id(subj), s_nid, "alias_of", "")] += 1
        w[(alias_node_id(obj), o_nid, "alias_of", "")] += 1
        nil_info.setdefault(s_nid, s_canon)
        nil_info.setdefault(o_nid, o_canon)

    # order chain: per host, clean pages sorted by (warc_ts, url)
    by_host: dict[str, list] = {}
    for p in clean:
        by_host.setdefault(host_of(p["url"]), []).append(p)
    for host, ps in by_host.items():
        ps.sort(key=lambda p: (p["warc_ts"], p["url"]))
        for a, b in zip(ps, ps[1:]):
            w[(page_node_id(a["url"]), page_node_id(b["url"]),
               "order", "")] += 1

    edges = pa.Table.from_pylist(
        [{"src": k[0], "dst": k[1], "type": k[2], "pred": k[3],
          "weight": int(v)}
         for k, v in sorted(w.items())], schema=EDGES_SCHEMA)

    # nodes: entities + aliases from the mapping, pages, NIL entities
    known = {nid for _, nid in mapping.values()}
    counts: Counter = Counter()
    for (src, dst, typ, pred), wt in w.items():
        if typ == "mentions" and dst in known:
            counts[dst] += wt
    type_of = dict(zip(dict_table.column("entity_key").to_pylist(),
                       dict_table.column("entity_type").to_pylist()))
    by_node: dict[str, tuple[str, set]] = {}
    for surface, (canon, nid) in mapping.items():
        by_node.setdefault(nid, (canon, set()))[1].add(surface)
    rows = []
    for nid, (canon, surfaces) in sorted(by_node.items()):
        rows.append({"node_id": nid, "label": "entity", "key": canon,
                     "entity_type": type_of.get(canon),
                     "surface_forms": sorted(surfaces),
                     "n_mentions": int(counts.get(nid, 0))})
        for s in sorted(surfaces):
            rows.append({"node_id": alias_node_id(s), "label": "alias",
                         "key": s, "entity_type": None,
                         "surface_forms": None, "n_mentions": None})
    for p in clean:
        rows.append({"node_id": page_node_id(p["url"]), "label": "page",
                     "key": p["url"], "entity_type": None,
                     "surface_forms": None, "n_mentions": None})
    for nid, canon in sorted(nil_info.items()):
        if nid in known:
            continue
        rows.append({"node_id": nid, "label": "entity", "key": canon,
                     "entity_type": None, "surface_forms": None,
                     "n_mentions": None})
    nodes = pa.Table.from_pylist(rows, schema=NODES_SCHEMA).sort_by("node_id")
    return nodes, edges


# ---------------------------------------------------------------------------
# Sequential SemDeDup reference (stages/semdedup.py must reproduce it)
# ---------------------------------------------------------------------------

def sequential_semdedup(vec_ids, embeddings, n_clusters=8, iters=4,
                        tau_c=None, seed=23, init_sample=128):
    """Single-process plain-numpy SemDeDup over the WHOLE table —
    the independent oracle for the distributed pipeline
    (stages/semdedup.py): same integer spec (quantize ×2²⁰ half-up,
    int64 Lloyd with global argmin, ascending-id greedy leader scan),
    straight-line code, no Ray, no batching, no exchange. Returns a
    pyarrow table (vec_id, cluster, kept, dup_of)."""
    import numpy as np

    SCALE = 1 << 20
    if tau_c is None:
        tau_c = int(0.35 * (1 << 40))
    order = np.argsort(np.asarray(vec_ids, np.int64), kind="stable")
    ids = np.asarray(vec_ids, np.int64)[order]
    x = np.asarray(embeddings, np.float64)[order]
    nrm = np.sqrt(np.sum(x * x, axis=1, keepdims=True))
    nrm[nrm == 0.0] = 1.0
    q = np.floor(x / nrm * SCALE + 0.5).astype(np.int64)

    samp = q[ids < init_sample]
    rng = np.random.default_rng(seed)
    cent = samp[rng.choice(len(samp), size=min(n_clusters, len(samp)),
                           replace=False)].copy()

    def assign(X):
        score = -2 * (X @ cent.T) + np.sum(cent * cent, axis=1)[None, :]
        return np.argmin(score, axis=1)

    for _ in range(iters):
        a = assign(q)
        new = cent.copy()
        for c in range(len(cent)):
            m = q[a == c]
            if len(m):
                new[c] = np.floor(m.sum(axis=0, dtype=np.int64)
                                  / float(len(m)) + 0.5).astype(np.int64)
        cent = new

    a = assign(q)
    kept = np.zeros(len(q), bool)
    dup_of = np.full(len(q), -1, np.int64)
    for c in range(len(cent)):
        rows = np.flatnonzero(a == c)      # ids ascending already
        leaders = []
        for i in rows:
            hit = -1
            for j in leaders:
                if int(q[j] @ q[i]) >= tau_c:
                    hit = j
                    break
            if hit >= 0:
                dup_of[i] = ids[hit]
            else:
                kept[i] = True
                leaders.append(i)
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "cluster": pa.array(a.astype(np.int64), pa.int64()),
        "kept": pa.array(kept),
        "dup_of": pa.array(dup_of, pa.int64(), mask=dup_of < 0),
    })


def sequential_canonical_url(url: str | None) -> str | None:
    """Independent (stdlib urllib.parse + str methods) implementation
    of the functions/url.py canonicalization spec — the test reference
    the vectorized RE2 kernel is checked against. Deliberately shares
    no code with the engine kernel."""
    import re

    if url is None:
        return None
    u = url.split("#", 1)[0]
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)"
                 r"(?:\?(.*))?$", u, re.DOTALL)
    if m is None:
        return u
    # parse from the spec's own grammar groups, NOT urllib.urlsplit:
    # urlsplit raises on unbalanced brackets ("http://[") — the spec
    # (and the never-raising vectorized kernel) treats brackets as
    # ordinary netloc characters
    scheme = m.group(1).lower()
    netloc = m.group(2).lower()
    while netloc.startswith("www."):
        netloc = netloc[4:]
    if scheme == "http":
        while netloc.endswith(":80"):
            netloc = netloc[:-3]
    elif scheme == "https":
        while netloc.endswith(":443"):
            netloc = netloc[:-4]
    path = m.group(3).rstrip("/") or "/"
    out = f"{scheme}://{netloc}{path}"
    if m.group(4) is not None:
        params = [p for p in m.group(4).split("&")
                  if p and not re.match(r"^(utm_[^=]*|gclid|fbclid)(=|$)",
                                        p)]
        if params:
            out += "?" + "&".join(params)
    return out


def sequential_bpe(texts, n_merges: int, token_re=None):
    """Independent single-process BPE trainer (Sennrich et al. 2016,
    classic dict/Counter formulation) — the reference the distributed
    stages/bpe.py trainer is checked against. Spec shared by both:
    words = lowercased ``[\\w'-]+`` tokens; initial symbols = unicode
    chars + a final ``</w>`` marker; per round merge the (left, right)
    adjacent pair with the highest corpus-weighted count, ties to the
    lexicographically smallest (left, right); stop early when no pairs
    remain. Returns [(rank, left, right, pair_count)]."""
    import re
    from collections import Counter

    tok = token_re or re.compile(r"[\w'-]+")
    words = Counter()
    for t in texts:
        words.update(tok.findall((t or "").lower()))
    vocab = {tuple(w) + ("</w>",): c for w, c in words.items()}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, int(cnt)))
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_replay_segment(word: str, merges) -> tuple:
    """Apply a trained merge list to one word IN TRAINING (rank) order
    — by construction this reproduces exactly the segmentation the
    sequential trainer's final vocab holds for every training word,
    making it the independent reference the distributed greedy
    lowest-rank encoder (stages/bpe.py BPEEncoder) is checked against."""
    sym = list(word)
    sym.append("</w>")
    for row in merges:
        left, right = (row[1], row[2]) if len(row) >= 3 else row
        out, i = [], 0
        while i < len(sym):
            if (i + 1 < len(sym) and sym[i] == left
                    and sym[i + 1] == right):
                out.append(left + right)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return tuple(sym)
