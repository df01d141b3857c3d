"""Pages sources.

Two ways to obtain an `input_hint`-shaped pages table
``(url, warc_ts, html, text, lang)``:

  * :func:`read_pages` — read an existing Parquet corpus (the real
    production source; column-pruned at the read).
  * :func:`derive_pages` — deterministically derive pages from the
    benchmark ``documents`` table: each document becomes one page whose
    text is the document text plus seeded entity/relation sentences
    (from the generator pools), rendered to template HTML. Pure
    function of (doc_id, seed) → usable as a distributed source at any
    scale (derivation runs inside ``map_batches``, no driver loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..gen.pages import (EPOCH_US, FILLERS, RELATIONS, SEED, _pools,
                         render_html)


def read_pages(path: str, columns=("url", "warc_ts", "html", "lang")):
    import ray

    return ray.data.read_parquet(path, columns=list(columns))


def _entity_sentences(doc_id: int, seed: int, n_sent: int) -> list[str]:
    """Seeded relation/filler sentences for one derived page."""
    rng = np.random.default_rng(seed * 2_000_003 + doc_id)
    p = _pools()
    sents = []
    for _ in range(n_sent):
        if rng.random() < 0.7:
            pred, st, ot = RELATIONS[int(rng.integers(0, len(RELATIONS)))]
            subs, objs = p.by_type[st], p.by_type[ot]
            se = subs[int(rng.choice(len(subs), p=p.weights[st]))]
            oe = objs[int(rng.choice(len(objs), p=p.weights[ot]))]
            if se.key == oe.key:
                sents.append(FILLERS[int(rng.integers(0, len(FILLERS)))])
                continue
            sa = se.aliases[int(rng.integers(0, len(se.aliases)))]
            oa = oe.aliases[int(rng.integers(0, len(oe.aliases)))]
            sents.append(f"{sa} {pred} {oa}.")
        else:
            sents.append(FILLERS[int(rng.integers(0, len(FILLERS)))])
    return sents


_SENT_BANKS: dict[int, list[str]] = {}


def _sent_bank(seed: int = SEED, size: int = 4096) -> list[str]:
    """One-time seeded sentence bank (relation + filler sentences).

    Lets large bench corpora derive pages by index arithmetic instead
    of per-page RNG — same statistical workload for the pipeline,
    ~40× faster generation. Deterministic: pure function of seed."""
    if seed not in _SENT_BANKS:
        _SENT_BANKS[seed] = _entity_sentences(0, seed * 31 + 7, size)
    return _SENT_BANKS[seed]


def derive_pages_fast_batch(t: pa.Table, seed: int = SEED,
                            n_rel_sents: int = 6, repeat: int = 1) -> pa.Table:
    """Bank-based derivation: page text = doc text + sentences picked
    from the seeded bank by index arithmetic (deterministic)."""
    bank = _sent_bank(seed)
    nb = len(bank)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_id, text, lang in zip(t["doc_id"].to_pylist(),
                                  t["text"].to_pylist(),
                                  t["lang"].to_pylist()):
        for rep in range(repeat):
            vid = doc_id * repeat + rep
            base = (vid * 2654435761) % nb
            sents = [bank[(base + j * 97) % nb] for j in range(n_rel_sents)]
            page_text = (text or "") + "\n\n" + " ".join(sents)
            urls.append(f"https://docs{vid % 500}.example/d/{vid}")
            tss.append(EPOCH_US + vid * 7_000_000)
            htmls.append(render_html(page_text, f"doc {vid}", vid))
            texts.append(page_text)
            langs.append(lang)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def derive_pages_batch(t: pa.Table, seed: int = SEED,
                       n_rel_sents: int = 6, repeat: int = 1) -> pa.Table:
    """documents batch → pages batch (vectorizable derivation kernel).

    ``repeat`` amplifies the corpus for benchmarking: each document
    yields ``repeat`` pages with distinct urls/seeds."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_id, text, lang in zip(t["doc_id"].to_pylist(),
                                  t["text"].to_pylist(),
                                  t["lang"].to_pylist()):
        for rep in range(repeat):
            vid = doc_id * repeat + rep
            sents = _entity_sentences(vid, seed, n_rel_sents)
            page_text = (text or "") + "\n\n" + " ".join(sents)
            urls.append(f"https://docs{vid % 500}.example/d/{vid}")
            tss.append(EPOCH_US + vid * 7_000_000)
            htmls.append(render_html(page_text, f"doc {vid}", vid))
            texts.append(page_text)
            # documents.lang ∈ {en, de, es, ...}; kept as-is (the lang
            # filter path sees variety); triples only extracted from 'en'
            langs.append(lang)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def derive_pages(sf_dir: str, seed: int = SEED, lang_override: str | None = None,
                 repeat: int = 1, fast: bool = False):
    """documents.parquet → pages Dataset (deterministic, distributed).

    ``fast=True`` uses the sentence-bank kernel (bench corpora)."""
    import functools

    import ray

    kernel = derive_pages_fast_batch if fast else derive_pages_batch
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    pages = ds.map_batches(
        functools.partial(kernel, seed=seed, repeat=repeat),
        batch_format="pyarrow")
    if lang_override is not None:
        pages = pages.map_batches(
            lambda t, _l=lang_override: t.set_column(
                t.schema.get_field_index("lang"), "lang",
                pa.array([_l] * t.num_rows, pa.string())),
            batch_format="pyarrow")
    return pages
