"""Stage 2: rule-based OpenIE-style (subj, pred, obj) triple extraction.

This module is BOTH the single-node oracle and the distributed worker
(SURVEY.md §7.2 step 3) — the role GffParser plays for GFF lines
(reference: src/main/scala/corwur/gffparser/GffParser.scala:102-122):
one deterministic grammar, so P/R of the distributed run vs the
standalone module is measurable by construction.

Grammar (deterministic, closed predicate set):
  * sentence split: paragraphs on "\\n\\n", sentences on
    whitespace following [.!?]; ``sent_idx`` is the page-global index.
  * a triple is  NP  PRED  NP  where NP is a maximal run of
    Capitalized tokens ([A-Z][\\w'-]* joined by single spaces) and PRED
    is one of the fixed predicate surfaces (gen.pages.RELATIONS).
  * subj/obj are lowercased + whitespace-collapsed; pred is
    snake_cased ("works at" → "works_at").

Distributed execution: a callable CLASS → Ray actor pool; the compiled
grammar is built once per actor in ``__init__`` (the
GffLinesRepository-build analogue, reference:
src/main/scala/corwur/genereader/GeneReader.scala:43-63), batches are
processed in ``__call__``.
"""

from __future__ import annotations

import re

import pyarrow as pa

# predicate surfaces, longest-first so "works at" wins over a prefix
PRED_SURFACES = [
    "partnered with", "was born in", "is located in",
    "works at", "founded", "acquired", "wrote", "leads",
]

_NP = r"[A-Z][\w'-]*(?: [A-Z][\w'-]*)*"
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_WS = re.compile(r"\s+")


def _compile():
    preds = "|".join(re.escape(p) for p in
                     sorted(PRED_SURFACES, key=len, reverse=True))
    return re.compile(rf"\b({_NP})\s+({preds})\s+({_NP})")


def split_sentences(text: str) -> list[str]:
    """Page text → sentences with page-global indices (paragraph-aware)."""
    out: list[str] = []
    for para in text.split("\n\n"):
        if not para:
            continue
        out.extend(s for s in _SENT_SPLIT.split(para) if s)
    return out


def extract_triples(text: str, pattern: re.Pattern | None = None) -> list[tuple[int, str, str, str]]:
    """Oracle entry point: text → [(sent_idx, subj, pred, obj)]."""
    pat = pattern or _compile()
    out = []
    for idx, sent in enumerate(split_sentences(text)):
        for m in pat.finditer(sent):
            subj = _WS.sub(" ", m.group(1).lower())
            pred = m.group(2).replace(" ", "_")
            obj = _WS.sub(" ", m.group(3).lower())
            out.append((idx, subj, pred, obj))
    return out


TRIPLES_OUT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("sent_idx", pa.int32()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("sent", pa.string()),  # kept for linker context; dropped at materialize
])


class TripleExtractor:
    """Actor-pool batch worker: (url, text, ...) → triple rows (flat_map shape).

    Stateful-stage pattern: grammar compiled once per actor process in
    ``__init__``; per-batch work in ``__call__`` (SURVEY.md §7.3).
    """

    def __init__(self) -> None:
        self.pattern = _compile()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        o_url, o_idx, o_s, o_p, o_o, o_sent = [], [], [], [], [], []
        for url, text in zip(urls, texts):
            if not text:
                continue
            sents = split_sentences(text)
            for idx, sent in enumerate(sents):
                for m in self.pattern.finditer(sent):
                    o_url.append(url)
                    o_idx.append(idx)
                    o_s.append(_WS.sub(" ", m.group(1).lower()))
                    o_p.append(m.group(2).replace(" ", "_"))
                    o_o.append(_WS.sub(" ", m.group(3).lower()))
                    o_sent.append(sent)
        return pa.table({
            "url": pa.array(o_url, pa.string()),
            "sent_idx": pa.array(o_idx, pa.int32()),
            "subj": pa.array(o_s, pa.string()),
            "pred": pa.array(o_p, pa.string()),
            "obj": pa.array(o_o, pa.string()),
            "sent": pa.array(o_sent, pa.string()),
        })


class CostModeledExtractor(TripleExtractor):
    """TripleExtractor plus an EXPLICITLY MODELED per-page cost.

    ``RAYKG_MODELED_PAGE_COST_MS`` (env, float ms/page; workers inherit
    the driver's env) adds a sleep of cost×rows per batch — openly a
    model of a production extractor's price (GPU OpenIE / cross-encoder
    forward passes run 1-100 ms/page; the sandbox's regex kernel runs
    ~0.1 ms), NOT fake compute pretending to be real. Used by
    ``BENCH_MODE=incremental`` to show how pipeline economics (reuse vs
    recompute) shift with extractor cost; the sleep occupies the actor
    slot exactly like a busy accelerator would."""

    def __init__(self) -> None:
        import os as _os

        super().__init__()
        self.cost_ms = float(
            _os.environ.get("RAYKG_MODELED_PAGE_COST_MS", "0"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.cost_ms > 0:
            import time as _time

            _time.sleep(self.cost_ms * batch.num_rows / 1000.0)
        return super().__call__(batch)


def apply(text_ds, concurrency: int | tuple = (1, 4), batch_size: int = 512,
          lang: str | None = "en", extractor_cls: type | None = None):
    """text Dataset → triples Dataset on an actor pool.

    ``lang`` filters pages before extraction (the header-drop analogue,
    reference: src/main/scala/corwur/Application.scala:49) — vectorized
    mask inside map_batches, not a per-row ds.filter."""
    import pyarrow.compute as pc

    ds = text_ds
    if lang is not None:
        ds = ds.map_batches(
            lambda t, _lang=lang: t.filter(pc.equal(t["lang"], _lang)),
            batch_format="pyarrow")
    return ds.map_batches(extractor_cls or TripleExtractor,
                          batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
