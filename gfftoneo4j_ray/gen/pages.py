"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1-3).

Generates, with NO external data and NO wall-clock/nondeterminism, a
Parquet corpus with the exact `input_hint` schema::

    pages(url: string, warc_ts: timestamp[us], html: binary,
          text: string, lang: string)

plus the two golden side tables tests and the pipeline need:

    dictionary(alias, entity_key, entity_type, prior)        # linker state
    triples_expected(url, sent_idx, subj, pred, obj)         # extractor oracle

Ground-truth construction mirrors the reference's test strategy of a
"conformance corpus in miniature" (reference:
src/test/scala/corwur/gffparser/GffParserSpec.scala:43-69): pages are
generated *from* their expected text, so the byte-identical-text
invariant is exact by construction, and relation sentences are emitted
from known (subject, predicate, object) picks so expected triples are
computable — the GFF-line → expected-gene-tree analogue of
GeneReaderSpec.scala:27-33.

Determinism: every page derives from ``numpy.random.default_rng(seed * 1_000_003 + i)``
— stable across platforms, independent of generation order, so any
slice of the corpus can be regenerated in parallel.
"""

from __future__ import annotations

import html as _html
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

SEED = 42
EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds

# ---------------------------------------------------------------------------
# Entity / relation pools (all deterministic literals)
# ---------------------------------------------------------------------------

_FIRST = [
    "Ada", "Grace", "Alan", "Edsger", "Barbara", "Donald", "Margaret",
    "Tim", "Linus", "Guido", "Bjarne", "Dennis", "Radia", "Frances",
    "Niklaus", "Leslie",
]
_LAST = [
    "Lovelace", "Hopper", "Turing", "Dijkstra", "Liskov", "Knuth",
    "Hamilton", "Lee", "Torvalds", "Rossum", "Stroustrup", "Ritchie",
    "Perlman", "Allen", "Wirth", "Lamport",
]
_ORG_A = [
    "Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Tyrell",
    "Cyberdyne", "Aperture", "Hooli", "Vandelay", "Wonka",
]
_ORG_B = ["Corp", "Labs", "Systems", "Industries", "Group", "Software"]
_PLACE = [
    "Amsterdam", "Berlin", "Cambridge", "Dublin", "Eindhoven", "Florence",
    "Geneva", "Helsinki", "Istanbul", "Jakarta", "Kyoto", "Lisbon",
    "Madrid", "Nairobi", "Oslo", "Prague",
]
_WORK = [
    "The Art Of Computing", "Structured Programming", "A Discipline Of Data",
    "The Mythical Engine", "Patterns Of Scale", "Streams And Tables",
]

# (predicate surface, subject type, object type)
RELATIONS = [
    ("founded", "person", "org"),
    ("works at", "person", "org"),
    ("wrote", "person", "work"),
    ("was born in", "person", "place"),
    ("leads", "person", "org"),
    ("is located in", "org", "place"),
    ("acquired", "org", "org"),
    ("partnered with", "org", "org"),
]

FILLERS = [
    "The quiet study of data continues apace.",
    "Nothing of note happened on that day.",
    "Many readers subscribe to the weekly digest.",
    "Весна пришла рано в этом году.",  # non-ASCII filler (FIXTURES edge case)
    'He said "well; that depends" and\tleft.',  # tab/quote/semicolon edge case
    "Numbers like 3,141 and 2,718 appeared in the margins.",
    "The committee will reconvene after the summer recess.",
]


@dataclass(frozen=True)
class Entity:
    key: str          # canonical surface form (also the dictionary entity_key)
    etype: str        # person | org | place | work
    aliases: tuple    # alias surface forms as they appear in text (capitalized)
    prior: float


def _misspell(name: str) -> str:
    """Deterministic misspelling: drop the 3rd char of the longest token
    (ties → first token), tokens shorter than 4 chars left alone."""
    toks = name.split(" ")
    j = max(range(len(toks)), key=lambda k: len(toks[k]))
    if len(toks[j]) >= 4:
        toks[j] = toks[j][:2] + toks[j][3:]
    return " ".join(toks)


def entity_pool() -> list[Entity]:
    """Fixed entity pool with ≥2 aliases per entity (FIXTURES.md §2).

    Alias design (the FeatureIdReader-combinator analogue, reference:
    src/main/scala/corwur/genereader/FeatureIdReader.scala:15-55):
      * persons: full name, no-dot initial form ("A Lovelace"),
        misspelling; every OTHER person also gets the bare last name —
        which is ambiguous when two persons share it (tests rerank).
      * orgs: full name, first token ("Acme"), misspelling.
      * places/works: full name (+ misspelling for works).
    Transitive-merge chains (SURVEY.md §4.3): aliases only co-occur
    pairwise in different pages, so merging A~B~C requires cross-
    partition union-find.
    """
    ents: list[Entity] = []
    n_person = len(_FIRST)
    for i in range(n_person):
        first, last = _FIRST[i], _LAST[i]
        full = f"{first} {last}"
        aliases = [full, f"{first[0]} {last}", _misspell(full)]
        if i % 2 == 0:
            aliases.append(last)  # bare surname (ambiguous if shared)
        prior = round(1.0 / (1 + i * 0.37), 6)
        ents.append(Entity(full, "person", tuple(aliases), prior))
    for i, a in enumerate(_ORG_A):
        b = _ORG_B[i % len(_ORG_B)]
        full = f"{a} {b}"
        aliases = [full, a, _misspell(full)]
        prior = round(1.0 / (1 + i * 0.29), 6)
        ents.append(Entity(full, "org", tuple(aliases), prior))
    for i, p in enumerate(_PLACE):
        ents.append(Entity(p, "place", (p,), round(1.0 / (1 + i * 0.11), 6)))
    for i, w in enumerate(_WORK):
        ents.append(Entity(w, "work", (w, _misspell(w)), round(0.9 / (1 + i * 0.23), 6)))
    return ents


def dictionary_table(pool: list[Entity] | None = None) -> pa.Table:
    """alias→entity dictionary (lowercased alias key), FIXTURES.md §2."""
    pool = pool or entity_pool()
    alias, key, etype, prior = [], [], [], []
    for e in pool:
        for a in e.aliases:
            alias.append(a.lower())
            key.append(e.key)
            etype.append(e.etype)
            prior.append(e.prior)
    return pa.table({
        "alias": pa.array(alias, pa.string()),
        "entity_key": pa.array(key, pa.string()),
        "entity_type": pa.array(etype, pa.string()),
        "prior": pa.array(prior, pa.float64()),
    })


# ---------------------------------------------------------------------------
# HTML rendering — the byte-identity spec (inverse of functions.text.extract_text)
# ---------------------------------------------------------------------------

_BOILER = [
    # (head_extra, nav, pre_article, footer) dialect variants — the
    # GffParserSpec dialect-corpus analogue; all variation is OUTSIDE
    # the <article> payload so extraction stays exact.
    ("<meta charset=\"utf-8\"><script>var a=1;</script>",
     "<nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav>",
     "<div class=\"ad\">Buy now! 50% off <b>everything</b></div>",
     "<footer>&copy; 2025 example</footer>"),
    ("<meta charset='utf-8'><style>p{margin:0}</style>",
     "<nav class=menu><a href=/>home</a></nav>",
     "<!-- tracking pixel --><img src=\"/pix.gif\" alt=\"\">",
     "<footer>All rights reserved; terms apply.</footer>"),
    ("<script type=\"text/javascript\">function f(){return \"<p>\";}</script>",
     "<nav><ul><li>a</li><li>b</li></ul></nav>",
     "<aside>Related: <a href=\"/x\">x</a></aside>",
     "<footer><!-- build 1234 --></footer>"),
]
_P_OPEN = ["<p>", "<p class=\"body-text\">", "<p data-idx=1>"]
_ARTICLE_OPEN = ["<article>", "<article id=\"main\">", "<article class=post>"]


def render_html(text: str, title: str, variant: int) -> bytes:
    """Render expected ``text`` into template HTML (UTF-8 bytes).

    The extraction spec (functions/text.py) is the exact inverse on
    this template family: paragraphs = text.split("\\n\\n"), each
    HTML-escaped into a <p> element inside one <article>; everything
    else is boilerplate. Empty text → self-closing empty article.
    """
    head, nav, pre, foot = _BOILER[variant % len(_BOILER)]
    p_open = _P_OPEN[variant % len(_P_OPEN)]
    art_open = _ARTICLE_OPEN[variant % len(_ARTICLE_OPEN)]
    if text:
        paras = "\n".join(
            f"{p_open}{_html.escape(p, quote=False)}</p>" for p in text.split("\n\n")
        )
    else:
        paras = ""
    doc = (
        f"<html><head><title>{_html.escape(title, quote=False)}</title>{head}</head>\n"
        f"<body>{nav}\n{pre}\n{art_open}\n{paras}\n</article>\n{foot}</body></html>"
    )
    return doc.encode("utf-8")


# ---------------------------------------------------------------------------
# Page generation
# ---------------------------------------------------------------------------

def normalize_pred(pred: str) -> str:
    return pred.replace(" ", "_")


def _zipf_weights(n: int) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1), 1.1)
    return w / w.sum()


class _Pools:
    """Pre-indexed entity pool views used during generation."""

    def __init__(self) -> None:
        self.pool = entity_pool()
        self.by_type: dict[str, list[Entity]] = {}
        for e in self.pool:
            self.by_type.setdefault(e.etype, []).append(e)
        self.weights = {t: _zipf_weights(len(v)) for t, v in self.by_type.items()}


_POOLS: _Pools | None = None


def _pools() -> _Pools:
    global _POOLS
    if _POOLS is None:
        _POOLS = _Pools()
    return _POOLS


LANGS = ["en"] * 9 + ["de", "fr", "und"]  # ~75% en; non-en tests the lang filter


def gen_page(i: int, seed: int = SEED):
    """Generate page ``i``: returns (row_dict, [triple_rows]).

    Pure function of (i, seed). Edge-case rows at fixed indices:
      i % 101 == 100 → empty text (boilerplate-only page)
      i % 211 == 210 → invalid-UTF-8 html (quarantine path; text "")
    """
    rng = np.random.default_rng(seed * 1_000_003 + i)
    p = _pools()
    url = f"https://site{i % 1000}.example/p/{i}"
    warc_ts = EPOCH_US + i * 7_000_000
    lang = LANGS[int(rng.integers(0, len(LANGS)))]

    if i % 211 == 210:
        return {
            "url": url, "warc_ts": warc_ts,
            "html": b"\xff\xfe\x00broken page\xff", "text": "", "lang": lang,
        }, []
    if i % 101 == 100:
        return {
            "url": url, "warc_ts": warc_ts,
            "html": render_html("", f"empty {i}", i), "text": "", "lang": lang,
        }, []

    n_sent = 6 + int(rng.integers(0, 9))
    sents: list[str] = []
    triples: list[dict] = []
    for s in range(n_sent):
        if rng.random() < 0.65:
            rel = RELATIONS[int(rng.integers(0, len(RELATIONS)))]
            pred, st, ot = rel
            subs = p.by_type[st]
            objs = p.by_type[ot]
            se = subs[int(rng.choice(len(subs), p=p.weights[st]))]
            oe = objs[int(rng.choice(len(objs), p=p.weights[ot]))]
            if se.key == oe.key:  # self-relation → make it filler instead
                sents.append(FILLERS[int(rng.integers(0, len(FILLERS)))])
                continue
            sa = se.aliases[int(rng.integers(0, len(se.aliases)))]
            oa = oe.aliases[int(rng.integers(0, len(oe.aliases)))]
            sents.append(f"{sa} {pred} {oa}.")
            if lang == "en":
                triples.append({
                    "url": url, "sent_idx": s,
                    "subj": sa.lower(), "pred": normalize_pred(pred),
                    "obj": oa.lower(),
                })
        else:
            sents.append(FILLERS[int(rng.integers(0, len(FILLERS)))])

    # paragraphs of 3 sentences joined by a space
    paras = [" ".join(sents[k:k + 3]) for k in range(0, len(sents), 3)]
    text = "\n\n".join(paras)
    row = {
        "url": url, "warc_ts": warc_ts,
        "html": render_html(text, f"page {i}", i), "text": text, "lang": lang,
    }
    return row, triples


PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

TRIPLES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("sent_idx", pa.int32()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
])


def gen_pages(n: int, seed: int = SEED, start: int = 0) -> tuple[pa.Table, pa.Table]:
    """Generate pages [start, start+n) → (pages_table, triples_expected_table)."""
    rows, trows = [], []
    for i in range(start, start + n):
        r, ts = gen_page(i, seed)
        rows.append(r)
        trows.extend(ts)
    pages = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    triples = pa.Table.from_pylist(trows, schema=TRIPLES_SCHEMA)
    return pages, triples


def write_corpus(out_dir: str, n: int, seed: int = SEED, shard_rows: int = 5000) -> str:
    """Write a sharded corpus: pages/part-*.parquet + dictionary + golden triples.

    Sharded so Ray reads it as many blocks (scale: one shard ≈ one
    input partition; resumable generation by shard). Idempotent: skips
    if the _DONE marker matches (n, seed).
    """
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, "_DONE")
    tag = f"{n}:{seed}:{shard_rows}:v4"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == tag:
                return out_dir
    os.makedirs(os.path.join(out_dir, "pages"), exist_ok=True)
    all_triples = []
    for shard, lo in enumerate(range(0, n, shard_rows)):
        cnt = min(shard_rows, n - lo)
        pages, triples = gen_pages(cnt, seed=seed, start=lo)
        pq.write_table(pages, os.path.join(out_dir, "pages", f"part-{shard:05d}.parquet"))
        all_triples.append(triples)
    pq.write_table(dictionary_table(), os.path.join(out_dir, "dictionary.parquet"))
    pq.write_table(pa.concat_tables(all_triples),
                   os.path.join(out_dir, "triples_expected.parquet"))
    with open(marker, "w") as f:
        f.write(tag)
    return out_dir


def corpus_dir(n: int, seed: int = SEED, root: str = "/tmp/raykg_corpus") -> str:
    """Cached corpus for tests/bench: /tmp/raykg_corpus/n{n}-s{seed}."""
    return write_corpus(os.path.join(root, f"n{n}-s{seed}"), n, seed)
