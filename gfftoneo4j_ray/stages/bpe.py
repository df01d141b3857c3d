"""Distributed BPE vocabulary training (Sennrich et al. 2016,
arXiv:1508.07909) — the tokenizer-training step of an LLM data
pipeline, run over the corpus the engine just cleaned/deduped.

Scale decomposition (the standard trainer layout):

  * The CORPUS-scale work is exactly ONE tokenize + count pass — the
    same map-side-partials + hash-aggregate shape as heavy hitters —
    producing the distinct-word frequency table. At web scale that is
    trillions of tokens reduced to a few million (word, count) rows.
  * The merge loop then runs over the DISTINCT-WORD table only. Its
    state (symbolized vocab blocks, the per-round pair-count table) is
    vocab-bounded, NOT corpus-bounded: O(distinct words × avg word
    length) pairs — the same state every production trainer
    (SentencePiece, HF tokenizers) holds in one process. Here the
    vocab lives as pinned per-block task state; each round one raw
    task per block computes its pair-count partial (vectorized numpy:
    boundary-masked shifted compare + np.unique/bincount fold), the
    driver folds partials and picks the arg-max pair (ties to the
    lexicographically smallest (left, right) — deterministic), and a
    per-block merge task applies it (greedy left-to-right overlap
    resolution done by run-parity arithmetic, no Python per symbol).

Spec (shared bit-for-bit with the sequential reference
``compat.seqref.sequential_bpe``): words = lowercased ``[\\w'-]+``
tokens (the corpus-wide TOKEN_SPLIT convention); initial symbols =
unicode chars + a final ``</w>``; per round merge the highest
corpus-weighted adjacent pair; stop early when no pairs remain.

Reference anchor: the reference tokenizes GFF attribute values before
keying (SURVEY.md §2.2 P7-P12); subword-vocabulary training is the
web-corpus counterpart required by the §2.9 training-data surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SEP = "\x1f"

MERGES_SCHEMA = pa.schema([
    ("rank", pa.int64()),
    ("left", pa.string()),
    ("right", pa.string()),
    ("pair_count", pa.int64()),
])

_TASKS: dict = {}


def _lazy_tasks():
    """ray.remote wrappers created on first use (module import stays
    ray-free, like ops/exchange.py / stages/semdedup.py)."""
    if _TASKS:
        return
    import ray

    @ray.remote
    def _symbolize(t: pa.Table) -> dict:
        """(word, cnt) block → symbol-position state dict. An all-empty
        corpus yields schemaless 0-row blocks — treat as empty vocab."""
        if t.num_rows == 0 or "word" not in t.column_names:
            return {"flat": np.array([], object),
                    "offsets": np.array([0], np.int64),
                    "cnt": np.array([], np.int64)}
        words = t["word"].to_pylist()
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        syms: list[str] = []
        lengths = np.empty(len(words), np.int64)
        for i, w in enumerate(words):
            s = list(w)
            s.append("</w>")
            syms.extend(s)
            lengths[i] = len(s)
        flat = np.array(syms, dtype=object)
        offsets = np.r_[0, np.cumsum(lengths)]
        return {"flat": flat, "offsets": offsets, "cnt": cnt}

    @ray.remote
    def _pair_counts(state: dict) -> tuple:
        """Vectorized weighted adjacent-pair partial for one block:
        (unique 'l\\x1fr' keys, int64 sums)."""
        flat, offsets, cnt = (state["flat"], state["offsets"],
                              state["cnt"])
        n = len(offsets) - 1
        if len(flat) == 0:
            return (np.array([], object), np.array([], np.int64))
        valid = np.ones(len(flat), bool)
        valid[offsets[1:] - 1] = False      # last symbol of each word
        idx = np.flatnonzero(valid)
        if len(idx) == 0:
            return (np.array([], object), np.array([], np.int64))
        word_id = np.repeat(np.arange(n), np.diff(offsets))
        keys = (flat[idx].astype(object) + _SEP
                + flat[idx + 1].astype(object))
        w = cnt[word_id[idx]]
        uk, inv = np.unique(keys, return_inverse=True)
        sums = np.bincount(inv, weights=w).astype(np.int64)
        return (uk, sums)

    @ray.remote
    def _apply_merge(state: dict, left: str, right: str) -> dict:
        """Merge (left, right) → left+right everywhere in one block,
        greedy left-to-right (run-parity arithmetic resolves
        overlapping candidates exactly like the sequential scan)."""
        flat, offsets, cnt = (state["flat"], state["offsets"],
                              state["cnt"])
        n = len(offsets) - 1
        if len(flat) == 0:
            return state
        valid = np.ones(len(flat), bool)
        valid[offsets[1:] - 1] = False
        cand = np.flatnonzero(valid & (flat == left)
                              & (np.r_[flat[1:], [""]] == right))
        if len(cand) == 0:
            return state
        # consecutive candidates only occur for left == right runs;
        # greedy keeps even offsets within each consecutive run
        run_id = np.cumsum(np.r_[True, np.diff(cand) != 1]) - 1
        run_start = cand[np.r_[0, np.flatnonzero(np.diff(cand) != 1) + 1]]
        kept = cand[(cand - run_start[run_id]) % 2 == 0]
        word_id = np.repeat(np.arange(n), np.diff(offsets))
        new_flat = flat.copy()
        new_flat[kept] = left + right
        drop = np.ones(len(flat), bool)
        drop[kept + 1] = False
        new_lengths = np.diff(offsets) - np.bincount(
            word_id[kept], minlength=n)
        return {"flat": new_flat[drop],
                "offsets": np.r_[0, np.cumsum(new_lengths)],
                "cnt": cnt}

    _TASKS["symbolize"] = _symbolize
    _TASKS["pair_counts"] = _pair_counts
    _TASKS["apply_merge"] = _apply_merge


def train_bpe(docs_ds, text_col: str = "text", *, n_merges: int = 40,
              num_buckets: int = 32) -> pa.Table:
    """Train ``n_merges`` BPE merges over a documents Dataset; returns
    a (rank, left, right, pair_count) arrow table (< n_merges rows iff
    the vocabulary ran out of pairs)."""
    import ray

    from ..ops.analytics import _tokens_flat
    from ..ops.hashagg import hash_aggregate

    def word_partial(t: pa.Table) -> pa.Table:
        flat, _ = _tokens_flat(t[text_col])
        if len(flat) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        g = pa.table({"word": flat}).group_by(["word"]).aggregate(
            [("word", "count")])
        return g.rename_columns(["word", "cnt"])

    vocab = hash_aggregate(
        docs_ds.map_batches(word_partial, batch_format="pyarrow"),
        "word", [("cnt", "sum", "cnt")],
        num_buckets=num_buckets).materialize()

    _lazy_tasks()
    from .semdedup import _pinned_blocks

    block_refs = _pinned_blocks(vocab)
    states = [_TASKS["symbolize"].remote(b) for b in block_refs]

    ranks, lefts, rights, counts = [], [], [], []
    for rank in range(n_merges):
        partials = ray.get([_TASKS["pair_counts"].remote(s)
                            for s in states])
        uk = np.concatenate([p[0] for p in partials]) \
            if partials else np.array([], object)
        if len(uk) == 0:
            break
        sums = np.concatenate([p[1] for p in partials])
        gk, inv = np.unique(uk, return_inverse=True)
        gs = np.bincount(inv, weights=sums).astype(np.int64)
        # arg-max count, ties to lexicographically smallest key — gk is
        # sorted, so the first index attaining the max IS the tie winner
        best = int(np.flatnonzero(gs == gs.max())[0])
        left, right = gk[best].split(_SEP, 1)
        ranks.append(rank)
        lefts.append(left)
        rights.append(right)
        counts.append(int(gs[best]))
        states = [_TASKS["apply_merge"].remote(s, left, right)
                  for s in states]
    return pa.table({"rank": pa.array(ranks, pa.int64()),
                     "left": pa.array(lefts, pa.string()),
                     "right": pa.array(rights, pa.string()),
                     "pair_count": pa.array(counts, pa.int64())},
                    schema=MERGES_SCHEMA)


# ---------------------------------------------------------------------------
# Corpus encoding with a trained merge table
# ---------------------------------------------------------------------------

def _merge_pairs(merges) -> list:
    """Merge table (arrow MERGES_SCHEMA table or [(l, r), ...] /
    [(rank, l, r, cnt), ...] rows) → [(left, right)] in rank order."""
    if isinstance(merges, pa.Table):
        t = merges.sort_by("rank") if "rank" in merges.column_names \
            else merges
        return list(zip(t["left"].to_pylist(), t["right"].to_pylist()))
    out = []
    for row in merges:
        out.append((row[1], row[2]) if len(row) >= 3 else tuple(row))
    return out


class BPEEncoder:
    """Actor-pool map_batches kernel: apply a trained merge table to a
    text column (canonical greedy lowest-rank-first apply — the
    subword-nmt / SentencePiece-BPE encode order, which reproduces the
    trainer's final segmentation on every training word).

    Scale shape: the merge table is vocab-bounded state handed to each
    actor once at construction; per batch the text tokenizes in one
    RE2 pass, encoding runs over the batch's DISTINCT words only, and
    segmentations cache across batches — per-actor work and memory are
    bounded by the corpus's distinct-word vocabulary (the same bound
    the trainer holds), never token count. The per-distinct-word merge
    loop is per-row by nature (each word carries its own rank
    sequence), the same adjudicated shape as the MinHash/sha1 kernels.
    """

    def __init__(self, merges, text_col: str = "text",
                 id_col: str = "doc_id", emit: str = "n_tokens"):
        pairs = _merge_pairs(merges)
        self.rank = {p: i for i, p in enumerate(pairs)}
        self.text_col, self.id_col, self.emit = text_col, id_col, emit
        self._cache: dict = {}

    def _encode(self, word: str) -> tuple:
        got = self._cache.get(word)
        if got is not None:
            return got
        sym = list(word)
        sym.append("</w>")
        rank = self.rank
        while len(sym) > 1:
            best_r, best_p = None, None
            for p in zip(sym, sym[1:]):
                r = rank.get(p)
                if r is not None and (best_r is None or r < best_r):
                    best_r, best_p = r, p
            if best_p is None:
                break
            left, right = best_p
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
        got = tuple(sym)
        self._cache[word] = got
        return got

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..ops.analytics import _tokens_flat

        flat, parent = _tokens_flat(t[self.text_col])
        words = flat.to_numpy(zero_copy_only=False)
        uw, inv = np.unique(words, return_inverse=True)
        segs = [self._encode(w) for w in uw]
        if self.emit == "tokens":
            # per-doc ordered token lists (debug / small-corpus path —
            # token text re-materializes, n_tokens is the scale emit)
            per_doc: list = [[] for _ in range(t.num_rows)]
            pn = parent.to_numpy(zero_copy_only=False)
            for j, word_idx in enumerate(inv):
                per_doc[pn[j]].extend(segs[word_idx])
            return pa.table({
                self.id_col: t[self.id_col],
                "bpe_tokens": pa.array(per_doc,
                                       pa.list_(pa.string()))})
        lens = np.fromiter((len(s) for s in segs), np.int64, len(uw))
        n = np.bincount(parent.to_numpy(zero_copy_only=False),
                        weights=lens[inv] if len(inv) else None,
                        minlength=t.num_rows).astype(np.int64) \
            if len(words) else np.zeros(t.num_rows, np.int64)
        return pa.table({self.id_col: t[self.id_col],
                         "n_bpe_tokens": pa.array(n, pa.int64())})


def encode_corpus(docs_ds, merges, *, text_col: str = "text",
                  id_col: str = "doc_id", emit: str = "n_tokens",
                  concurrency=(1, 8), batch_size: int = 1024):
    """Per-document BPE token counts (``emit='n_tokens'``, the scale
    path feeding sequence packing / token budgeting) or ordered token
    lists (``emit='tokens'``) under a trained merge table."""
    return docs_ds.map_batches(
        BPEEncoder,
        fn_constructor_kwargs=dict(merges=merges, text_col=text_col,
                                   id_col=id_col, emit=emit),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def token_frequencies(docs_ds, merges, *, text_col: str = "text",
                      num_buckets: int = 32,
                      concurrency=(1, 8)) -> pa.Table:
    """Corpus-wide (token, cnt) frequency table under a trained merge
    table — the unigram distribution a tokenizer report / sampling
    temperature needs. Map-side partials are vocab-bounded (distinct
    words per batch × symbols), globally reduced by the two-phase
    hash aggregate."""
    from ..ops.hashagg import hash_aggregate

    class _Partial(BPEEncoder):
        def __call__(self, t: pa.Table) -> pa.Table:
            from ..ops.analytics import _tokens_flat

            flat, _ = _tokens_flat(t[self.text_col])
            words = flat.to_numpy(zero_copy_only=False)
            if len(words) == 0:
                return pa.table({"token": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64())})
            uw, counts = np.unique(words, return_counts=True)
            toks: list = []
            occ: list = []
            for w, c in zip(uw, counts):
                seg = self._encode(w)
                toks.extend(seg)
                occ.extend([int(c)] * len(seg))
            g = pa.table({"token": pa.array(toks, pa.string()),
                          "cnt": pa.array(occ, pa.int64())}) \
                .group_by(["token"]).aggregate([("cnt", "sum")])
            return g.rename_columns(["token", "cnt"])

    partials = docs_ds.map_batches(
        _Partial, fn_constructor_kwargs=dict(merges=merges,
                                             text_col=text_col),
        batch_format="pyarrow", concurrency=concurrency)
    return hash_aggregate(partials, "token", [("cnt", "sum", "cnt")],
                          num_buckets=num_buckets)
