"""Stage 3: dictionary + embedding entity linking on an actor pool.

Reference anchor: the ID-index build + parent lookup
(reference: src/main/scala/corwur/genereader/GeneReader.scala:43-63
``toGffLines`` → ``GffLinesRepository``; :159-163 ``getParentInfo``
hash lookup). There the index is rebuilt per group on the heap; here
the bounded side (the alias dictionary) is **broadcast once** via
``ray.put`` and materialized once per actor in ``__init__`` — never
re-shipped per batch, never shuffled (SURVEY.md §2.3 T1/T2).

Candidate generation: exact lookup of the normalized surface form in
the alias dictionary (alias → [candidate entities]). Rerank:
deterministic hashed bag-of-words embedding of the mention's sentence
vs the candidate's canonical name, combined with a popularity prior:

    score = 0.7 * cosine(ctx_vec, name_vec) + 0.3 * prior

ties broken by lexicographic-min entity_key → fully deterministic.
The scorer is the in-sandbox stand-in for a GPU cross-encoder rerank
actor; the interface (batched score(candidates, contexts)) is shaped
so a model-backed actor (num_gpus=1) drops in without pipeline
changes (SURVEY.md §7.2 step 4).

Mentions whose surface is not in the dictionary are NIL-linked:
``entity_key = surface`` with ``resolved = False`` — the
ParentInfoNotFound analogue (GeneReader.scala:31-37), kept (not
dropped) and accounted for in lineage.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

EMB_DIM = 32
_TOKEN = re.compile(r"[\w'-]+")


def token_vec(token: str) -> np.ndarray:
    """Deterministic unit vector for a token (blake2b bytes → float)."""
    h = hashlib.blake2b(token.encode("utf-8"), digest_size=EMB_DIM).digest()
    v = np.frombuffer(h, dtype=np.uint8).astype(np.float64) - 127.5
    n = np.linalg.norm(v)
    return v / n if n else v


def embed_text(text: str) -> np.ndarray:
    """Bag-of-token-vectors embedding, L2-normalized."""
    toks = _TOKEN.findall(text.lower())
    if not toks:
        return np.zeros(EMB_DIM)
    v = np.zeros(EMB_DIM)
    for t in toks:
        v += token_vec(t)
    n = np.linalg.norm(v)
    return v / n if n else v


def build_alias_index(dict_table: pa.Table) -> dict:
    """alias → list[(entity_key, entity_type, prior, name_vec)] (sorted by key)."""
    idx: dict[str, list] = {}
    aliases = dict_table.column("alias").to_pylist()
    keys = dict_table.column("entity_key").to_pylist()
    types = dict_table.column("entity_type").to_pylist()
    priors = dict_table.column("prior").to_pylist()
    for a, k, t, p in zip(aliases, keys, types, priors):
        idx.setdefault(a, []).append((k, t, p, embed_text(k)))
    for v in idx.values():
        v.sort(key=lambda c: c[0])
    return idx


class EntityLinker:
    """Actor-pool worker: triple rows → linked triple rows.

    ``dict_ref`` is an ``ray.ObjectRef`` to the dictionary Arrow table
    (``ray.put`` once on the driver); the alias index is built ONCE per
    actor here — the stateful-stage pattern (SURVEY.md §7.3)."""

    def __init__(self, dict_ref=None, dict_table: pa.Table | None = None) -> None:
        import ray

        if dict_table is None:
            dict_table = ray.get(dict_ref)
        self.index = build_alias_index(dict_table)
        # unambiguous aliases (the overwhelming majority) resolve to a
        # CONSTANT — precomputed once per actor; the context embedding
        # is only ever computed for ambiguous aliases (lazy rerank)
        self.constant: dict[str, tuple] = {
            a: (c[0][0], c[0][1], True)
            for a, c in self.index.items() if len(c) == 1
        }

    def _link_one(self, surface: str, ctx_vec: np.ndarray):
        cands = self.index.get(surface)
        if not cands:
            return surface, None, 0.0, False
        if len(cands) == 1:
            k, t, p, _ = cands[0]
            return k, t, 1.0, True
        best = None
        best_score = -1e9
        for k, t, p, nv in cands:
            s = 0.7 * float(np.dot(ctx_vec, nv)) + 0.3 * p
            # strict > keeps the lexicographic-min key on exact ties
            if s > best_score + 1e-12:
                best, best_score = (k, t), s
        return best[0], best[1], best_score, True

    def __call__(self, batch: pa.Table) -> pa.Table:
        subs = batch.column("subj").to_pylist()
        objs = batch.column("obj").to_pylist()
        sents = batch.column("sent").to_pylist()
        n = len(subs)
        sk, st, ok_, ot = [None] * n, [None] * n, [None] * n, [None] * n
        sr, orr = [False] * n, [False] * n
        const = self.constant
        ctx_cache: dict[str, np.ndarray] = {}

        def resolve(surface, sent):
            hit = const.get(surface)
            if hit is not None:
                return hit
            if surface not in self.index:
                return surface, None, False
            cv = ctx_cache.get(sent)
            if cv is None:
                cv = embed_text(sent)
                ctx_cache[sent] = cv
            k, t, _, r = self._link_one(surface, cv)
            return k, t, r

        for i in range(n):
            sk[i], st[i], sr[i] = resolve(subs[i], sents[i])
            ok_[i], ot[i], orr[i] = resolve(objs[i], sents[i])
        out = batch.drop_columns(["sent"])
        return (out
                .append_column("subj_key", pa.array(sk, pa.string()))
                .append_column("subj_type", pa.array(st, pa.string()))
                .append_column("subj_resolved", pa.array(sr, pa.bool_()))
                .append_column("obj_key", pa.array(ok_, pa.string()))
                .append_column("obj_type", pa.array(ot, pa.string()))
                .append_column("obj_resolved", pa.array(orr, pa.bool_())))


class FusedExtractLink:
    """One actor = triple extraction + linking (grammar AND alias index
    built once per actor). Halves actor-pool count and removes the
    intermediate block handoff in the streaming hot path; the
    checkpointed pipeline keeps the stages separate for per-stage
    resume granularity."""

    def __init__(self, dict_ref=None, dict_table: pa.Table | None = None,
                 extractor_cls: type | None = None):
        from .triples import TripleExtractor

        self.extract = (extractor_cls or TripleExtractor)()
        self.link = EntityLinker(dict_ref=dict_ref, dict_table=dict_table)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.link(self.extract(batch))


def apply_fused(text_ds, dict_ref=None, dict_table=None,
                concurrency: int | tuple = (1, 4), batch_size: int = 2048,
                lang: str | None = "en", extractor_cls: type | None = None):
    """text Dataset → linked Dataset in ONE actor-pool stage."""
    import pyarrow.compute as pc

    ds = text_ds
    if lang is not None:
        ds = ds.map_batches(
            lambda t, _lang=lang: t.filter(pc.equal(t["lang"], _lang)),
            batch_format="pyarrow")
    kwargs = {"dict_ref": dict_ref} if dict_ref is not None else \
        {"dict_table": dict_table}
    if extractor_cls is not None:
        kwargs["extractor_cls"] = extractor_cls
    return ds.map_batches(FusedExtractLink, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs=kwargs)


def apply(triples_ds, dict_ref=None, dict_table=None,
          concurrency: int | tuple = (1, 4), batch_size: int = 1024):
    """triples Dataset → linked Dataset (actor pool, broadcast dictionary)."""
    kwargs = {}
    if dict_ref is not None:
        kwargs["dict_ref"] = dict_ref
    else:
        kwargs["dict_table"] = dict_table
    return triples_ds.map_batches(
        EntityLinker, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, fn_constructor_kwargs=kwargs)
