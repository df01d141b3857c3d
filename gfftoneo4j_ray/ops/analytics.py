"""Corpus-level text analytics — the operators a training-data curation
pipeline runs over a web-text documents table, each as a Ray Data
pipeline with an exact DuckDB oracle (__ray_entry__.oracle_sql).

Tokenization contract (shared with the dedup family and the oracle
SQL): tokens = regexp_extract_all(lower(text), "[a-z0-9_'-]+"); the
engine realizes it as a vectorized RE2 split on the complement class
"[^a-z0-9_'-]+" + empty-string filter (verified equivalent; both
engines run RE2, so class semantics match exactly).

Scale notes per function; shared rules: tokenize once per batch with
Arrow C kernels (never a Python loop over rows), pre-aggregate
map-side so shuffles carry per-batch partials, bound every
corpus-sized sort with a local top-k first.

Reference anchors (semantics, not code): the per-record parse / filter
/ rollup operator classes of SURVEY.md §2.2/§2.4 (GffParser.scala /
GeneReader.scala) re-targeted at the documents table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashagg import append_bucket, hash_aggregate

TOKEN_SPLIT = r"[^a-z0-9_'-]+"


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray

    from .. import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=list(columns))


def _tokens_flat(text_col: pa.ChunkedArray | pa.Array):
    """(flat token array, parent row indices) — one RE2 pass, zero
    Python per-row work. Empty strings (leading/trailing separators)
    are dropped to match regexp_extract_all semantics."""
    toks = pc.split_pattern_regex(pc.utf8_lower(text_col), TOKEN_SPLIT)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    return flat.filter(keep), parent.filter(keep)


# ---------------------------------------------------------------------------
# Heavy hitters (corpus-wide top-k words)
# ---------------------------------------------------------------------------

def q_heavy_hitters(sf_dir: str, k: int = 30):
    """Top-k most frequent words across the corpus (tie-break word asc).

    Map side emits per-batch (word, count) partials — shuffle volume is
    bounded by (batch vocabulary × batches), never token count. The
    global sort is bounded by a per-block top-k (k rows per reduce
    block reach the final sort), so a web-scale vocabulary never feeds
    an unbounded corpus-wide sort."""
    ds = _docs(sf_dir, columns=("text",))

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = _tokens_flat(t["text"])
        g = pa.table({"word": flat}).group_by(["word"]) \
            .aggregate([("word", "count")])
        return g.rename_columns(["word", "n_part"])

    counts = hash_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                            "word", [("n_part", "sum", "n")], num_buckets=32)

    def local_topk(t: pa.Table) -> pa.Table:
        return t.sort_by([("n", "descending"), ("word", "ascending")]) \
            .slice(0, k)

    return counts.map_batches(local_topk, batch_format="pyarrow") \
        .sort(["n", "word"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# TF-IDF (top terms per document)
# ---------------------------------------------------------------------------

def q_tfidf(sf_dir: str, max_doc_id: int = 200, topk: int = 3):
    """Top-k terms per document by tf·idf, idf = ln(N/df) with df from
    the FULL corpus; per-doc output bounded to doc_id < max_doc_id.

    All fact-scale: tf and df are two-phase hash aggregates over the
    exploded token stream, tf⋈df is the distributed bucketed shuffle
    join (ops.join — no vocabulary broadcast: web-scale vocabularies
    don't fit a driver), and the per-doc top-k runs as vectorized
    run-boundary ranking over hash buckets."""
    from .join import hash_join

    ds = _docs(sf_dir)

    def tf_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["doc_id"], max_doc_id))
        flat, parent = _tokens_flat(t["text"])
        g = pa.table({"doc_id": t["doc_id"].take(parent), "w": flat}) \
            .group_by(["doc_id", "w"]).aggregate([("w", "count")])
        return g.rename_columns(["doc_id", "w", "tf_part"])

    # docs never span batches, so per-batch distinct (doc, w) pairs are
    # globally distinct-per-doc — df partials are exact map-side
    def df_partial(t: pa.Table) -> pa.Table:
        flat, parent = _tokens_flat(t["text"])
        pairs = pa.table({"doc_id": t["doc_id"].take(parent), "w": flat}) \
            .group_by(["doc_id", "w"]).aggregate([])
        g = pairs.group_by(["w"]).aggregate([("doc_id", "count")])
        return g.rename_columns(["w", "df_part"])

    n_docs = ds.count()
    tf = hash_aggregate(ds.map_batches(tf_partial, batch_format="pyarrow"),
                        ["doc_id", "w"], [("tf_part", "sum", "tf")],
                        num_buckets=16)
    df = hash_aggregate(ds.map_batches(df_partial, batch_format="pyarrow"),
                        "w", [("df_part", "sum", "df")], num_buckets=16)
    joined = hash_join(
        tf, df, on="w", num_buckets=16,
        left_schema=pa.schema([("doc_id", pa.int64()), ("w", pa.string()),
                               ("tf", pa.int64())]),
        right_schema=pa.schema([("w", pa.string()), ("df", pa.int64())]))

    def score(t: pa.Table) -> pa.Table:
        tf_v = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_v = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = tf_v * np.log(np.float64(n_docs) / df_v)
        out = pa.table({"doc_id": t["doc_id"], "word": t["w"],
                        "score": pa.array(s, pa.float64())})
        return append_bucket(out, ["doc_id"], 16)

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_id", "ascending"), ("score", "descending"),
                       ("word", "ascending")])
        keys = g["doc_id"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.schema([("doc_id", pa.int64()), ("rnk", pa.int64()),
                              ("word", pa.string()),
                              ("score_c", pa.int64())]).empty_table()
        starts = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1]
        rank = np.arange(len(keys)) - np.repeat(
            starts, np.diff(np.r_[starts, len(keys)]))
        kept = g.filter(pa.array(rank < topk))
        sc = kept["score"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": kept["doc_id"],
            "rnk": pa.array(rank[rank < topk] + 1, pa.int64()),
            "word": kept["word"],
            "score_c": pa.array(np.floor(sc * 10000 + 0.5).astype(np.int64)),
        })

    from .exchange import bucketed_map_groups

    # raw-task bucket exchange; per_bucket is 0-row-guarded
    return bucketed_map_groups(
        joined.map_batches(score, batch_format="pyarrow"), 16, per_bucket)


# ---------------------------------------------------------------------------
# Regex scrub / redaction (PII-shaped cleanup)
# ---------------------------------------------------------------------------

def q_redact(sf_dir: str):
    """Scrub digit runs from the events kv-string column (the
    PII-redaction shape: one compiled RE2 replace per batch). Both
    engines run RE2, so replacement semantics match byte-for-byte."""
    import ray

    from .. import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_id", "props"])

    def scrub(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "clean": pc.replace_substring_regex(t["props"], r"\d+", "<NUM>"),
        })

    return ds.map_batches(scrub, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Quality filter (Gopher-style threshold rules)
# ---------------------------------------------------------------------------

def quality_gate_stats(text: pa.Array | pa.ChunkedArray):
    """(keep mask, n_tok, mean_tok_c, alpha_c) for the integer-exact
    quality gates: token count, mean token length (scaled cents),
    alphabetic ratio (scaled 1e4). All three stats come from
    count_substring_regex C kernels; the thresholds compare scaled
    integers so the engine and the SQL oracle can never disagree on a
    boundary float. Shared by the q_quality_filter slot and the
    corpus-export pipeline's gate stage."""
    n_chars = pc.cast(pc.utf8_length(text), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_tok = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    nonspace = pc.cast(pc.count_substring_regex(text, r"\S"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    alpha = pc.cast(pc.count_substring_regex(text, "[a-z]"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    safe_tok = np.maximum(n_tok, 1)
    mean_tok_c = np.floor(
        nonspace.astype(np.float64) / safe_tok * 100 + 0.5).astype(np.int64)
    alpha_c = np.floor(alpha.astype(np.float64)
                       / np.maximum(n_chars, 1) * 10000 + 0.5).astype(np.int64)
    keep = (n_tok >= 20) & (mean_tok_c >= 250) & (mean_tok_c <= 800) \
        & (alpha_c >= 5500)
    return keep, n_tok, mean_tok_c, alpha_c


def q_quality_filter(sf_dir: str):
    """Documents passing the integer-exact quality gates (see
    quality_gate_stats), with their gate stats."""
    ds = _docs(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        keep, n_tok, mean_tok_c, alpha_c = quality_gate_stats(t["text"])
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "n_tokens": pa.array(n_tok[keep], pa.int64()),
            "mean_tok_c": pa.array(mean_tok_c[keep], pa.int64()),
            "alpha_c": pa.array(alpha_c[keep], pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Repetition filter (Gopher-style n-gram repetition rules)
# ---------------------------------------------------------------------------

def _ngram_group_stats(parent: np.ndarray, codes: np.ndarray,
                       tlen: np.ndarray, n: int):
    """Group the word n-grams of every doc in one vectorized pass.

    parent/codes/tlen are the flattened per-token arrays (doc index,
    dictionary code, char length). Returns (group_doc, group_cnt,
    group_chars) where each group is one distinct n-gram within one
    doc, cnt its occurrence count, and chars the summed token char
    length of ONE occurrence. Grouping is an exact lexsort over the
    code tuple — no hashing, so no collision risk vs the oracle."""
    if len(parent) < n:
        e = np.empty(0, np.int64)
        return e, e, e
    valid = np.ones(len(parent) - (n - 1), dtype=bool)
    for j in range(1, n):
        valid &= parent[: len(parent) - (n - 1)] == parent[j:len(parent) - (n - 1) + j]
    idx = np.flatnonzero(valid)
    if not len(idx):
        e = np.empty(0, np.int64)
        return e, e, e
    cols = [codes[idx + j] for j in range(n)]
    glen = tlen[idx].copy()
    for j in range(1, n):
        glen += tlen[idx + j]
    p = parent[idx]
    order = np.lexsort(tuple(reversed(cols)) + (p,))
    p_s = p[order]
    change = p_s[1:] != p_s[:-1]
    for c in cols:
        c_s = c[order]
        change |= c_s[1:] != c_s[:-1]
    bounds = np.concatenate(([0], np.flatnonzero(change) + 1))
    cnt = np.diff(np.append(bounds, len(p_s)))
    return p_s[bounds], cnt.astype(np.int64), glen[order][bounds]


def _per_doc_reduce(group_doc: np.ndarray, vals: np.ndarray,
                    nrows: int, op) -> np.ndarray:
    """Reduce group-level values to one value per doc (groups arrive
    sorted by doc). op is np.maximum or np.add."""
    out = np.zeros(nrows, np.int64)
    if not len(group_doc):
        return out
    db = np.concatenate(([0], np.flatnonzero(group_doc[1:] != group_doc[:-1]) + 1))
    out[group_doc[db]] = op.reduceat(vals, db)
    return out


def q_repetition_filter(sf_dir: str, top2_max_c: int = 1200,
                        dup3_max_c: int = 600):
    """Gopher-style (Rae et al. 2021, public) repetition gates: drop
    docs where the most-repeated word 2-gram covers too many characters
    (top2_frac) or duplicated word 3-grams cover too many (dup3_frac).
    Fractions are over total token chars, scaled to 1e4 integers so the
    engine and the DuckDB oracle can never disagree on a float boundary.
    All per-doc work is C-speed: one RE2 tokenize pass, one dictionary
    encode, one lexsort per n — no Python per row. Reference has no
    corpus analytics; this extends the engine for LLM-data pipelines."""
    ds = _docs(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        nrows = t.num_rows
        flat, parent = _tokens_flat(t["text"])
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parent = np.asarray(parent.to_numpy(zero_copy_only=False), np.int64)
        tlen = pc.cast(pc.utf8_length(flat), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        codes = np.asarray(
            flat.dictionary_encode().indices.to_numpy(zero_copy_only=False),
            np.int64)

        n_tok = np.bincount(parent, minlength=nrows).astype(np.int64)
        total = np.bincount(parent, weights=tlen, minlength=nrows) \
            .astype(np.int64)

        d2, c2, l2 = _ngram_group_stats(parent, codes, tlen, 2)
        top2 = _per_doc_reduce(d2, c2 * l2, nrows, np.maximum)
        d3, c3, l3 = _ngram_group_stats(parent, codes, tlen, 3)
        dup = c3 >= 2
        dup3 = _per_doc_reduce(d3[dup], (c3 * l3)[dup], nrows, np.add)

        den = np.maximum(total, 1).astype(np.float64)
        top2_c = np.floor(top2 / den * 10000 + 0.5).astype(np.int64)
        dup3_c = np.floor(dup3 / den * 10000 + 0.5).astype(np.int64)
        keep = (top2_c <= top2_max_c) & (dup3_c <= dup3_max_c)
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "n_tokens": pa.array(n_tok[keep], pa.int64()),
            "top2_frac_c": pa.array(top2_c[keep], pa.int64()),
            "dup3_frac_c": pa.array(dup3_c[keep], pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap vs a probe/benchmark set)
# ---------------------------------------------------------------------------

def _ngram_weights(n: int, seed: int = 97) -> np.ndarray:
    """Fixed per-position odd multipliers for the rolling n-gram mix."""
    rng = np.random.default_rng(seed)
    return (rng.integers(1, 1 << 62, size=n, dtype=np.uint64) * 2 + 1)


def _tokenize_one(text: str) -> list[str]:
    import re as _re

    return [w for w in _re.split(TOKEN_SPLIT, (text or "").lower()) if w]


def _ngram_hashes(tokens: list[str], n: int,
                  weights: np.ndarray) -> np.ndarray:
    """All n-gram hashes of a token list, vectorized: hash each token
    once (stable_hash64), then combine every length-n window with one
    sliding-window × weights matmul (wrap-around mod 2^64)."""
    from ..functions.hashing import stable_hash64

    if len(tokens) < n:
        return np.empty(0, np.uint64)
    th = stable_hash64(tokens).astype(np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(th, n)
    with np.errstate(over="ignore"):
        return (win * weights[None, :]).sum(axis=1, dtype=np.uint64)


def build_probe_set(probe_texts: list[str], n: int = 8) -> np.ndarray:
    """Benchmark texts → sorted unique n-gram hash array (the broadcast
    side — bounded by the benchmark suite size, not the corpus)."""
    w = _ngram_weights(n)
    hs = [_ngram_hashes(_tokenize_one(t), n, w) for t in probe_texts]
    return np.unique(np.concatenate(hs)) if hs else np.empty(0, np.uint64)


def contamination_flags(docs_ds, probe_texts: list[str], n: int = 8,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Decontamination scan: per document, the number of its n-grams
    that appear in the probe (benchmark) set → (doc_id, n_hits);
    filter ``n_hits > 0`` to drop contaminated documents.

    Scale layout: the probe hash set is built driver-side (bounded by
    the benchmark suite), ``ray.put`` ONCE, and searchsorted inside
    every map task — a pure map-side scan, no shuffle at all; the
    token hashing + window mix is the vectorized kernel above."""
    return docs_ds.map_batches(
        make_contamination_scan(probe_texts, n, text_col, id_col),
        batch_format="pyarrow")


def make_contamination_scan(probe_texts: list[str], n: int = 8,
                            text_col: str = "text",
                            id_col: str = "doc_id"):
    """contamination_flags' per-batch kernel as a reusable function
    (probe set built and ``ray.put`` at construction) — fused
    pipelines compose it with other map-side kernels over ONE scan."""
    import ray

    from ..functions.hashing import stable_hash64

    w = _ngram_weights(n)
    probe_ref = ray.put(build_probe_set(probe_texts, n))

    def scan(t: pa.Table) -> pa.Table:
        from ..stages.dedup import _cached_get

        probe = _cached_get(probe_ref)
        texts = t[text_col].to_pylist()
        n_docs = len(texts)
        # tokenizer stays _tokenize_one (MUST match the probe build
        # exactly); hashing + window mix + probe lookup run ONCE over
        # the whole batch's concatenated token stream, with windows
        # crossing a document boundary masked out
        tok_lists = [_tokenize_one(x) for x in texts]
        counts = np.fromiter((len(tl) for tl in tok_lists), np.int64,
                             n_docs)
        all_toks = [tok for tl in tok_lists for tok in tl]
        hits = np.zeros(n_docs, np.int64)
        if all_toks and len(all_toks) >= n and probe.size:
            th = stable_hash64(all_toks).astype(np.uint64)
            win = np.lib.stride_tricks.sliding_window_view(th, n)
            with np.errstate(over="ignore"):
                gh = (win * w[None, :]).sum(axis=1, dtype=np.uint64)
            ends = np.cumsum(counts)
            doc_of = np.repeat(np.arange(n_docs), counts)[:len(gh)]
            valid = (np.arange(len(gh)) + n) <= ends[doc_of]
            pos = np.searchsorted(probe, gh)
            hit = (probe[np.minimum(pos, probe.size - 1)] == gh) & valid
            hits = np.bincount(doc_of, weights=hit,
                               minlength=n_docs).astype(np.int64)
        return pa.table({id_col: t[id_col],
                         "n_hits": pa.array(hits, pa.int64())})

    return scan


# ---------------------------------------------------------------------------
# Sequence packing + deterministic mixture sampling (training-batch prep)
# ---------------------------------------------------------------------------

def pack_sequences(docs_ds, budget_tokens: int = 2048,
                   text_col: str = "text", id_col: str = "doc_id",
                   num_buckets: int = 32, counts_col: str | None = None):
    """Pack documents into fixed token-budget training sequences:
    first-fit-decreasing WITHIN each hash bucket of documents →
    (pack_id, doc_id, n_tokens). Every document appears exactly once;
    each pack's token total is ≤ budget unless it holds a single
    oversized document (emitted alone — splitting is the tokenizer's
    concern). pack_id = bucket * 2^32 + bin index (deterministic, no
    coordination across buckets).

    Partitioning assumption (documented per the custom-operator rule):
    packing is bucket-local, so cross-bucket consolidation is traded
    for a shuffle-free scale-out — the fill loss is bounded by one
    partially-filled pack per bucket. Token counts are the shared
    whitespace-token kernel (textstats), computed map-side; only
    (doc_id, n_tokens) rows enter the exchange. Pass ``counts_col`` to
    pack by a precomputed per-doc token-count column instead (e.g.
    ``n_bpe_tokens`` from stages/bpe.encode_corpus — the corpus-export
    pipeline's path); ``text_col`` is then unused."""
    from ..functions.textstats import text_stats_batch
    from .exchange import bucketed_map_groups

    def sizes(t: pa.Table) -> pa.Table:
        if counts_col is not None:
            out = pa.table({id_col: t[id_col],
                            "n_tokens": pc.cast(t[counts_col],
                                                pa.int64())})
        else:
            s = text_stats_batch(t, text_col=text_col, id_col=id_col)
            out = s.select([id_col, "n_tokens"])
        return append_bucket(out, [id_col], num_buckets)

    def pack_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["n_tokens", id_col],
                                       ascending=[False, True],
                                       kind="mergesort")
        if len(df) == 0:
            return pa.schema([("pack_id", pa.int64()),
                              (id_col, pa.int64()),
                              ("n_tokens", pa.int64())]).empty_table()
        # the bucket id was stripped by the exchange; recover it from
        # any member (all rows share it by construction)
        from ..ops.hashagg import _bucket_column
        b = int(_bucket_column(g.slice(0, 1), [id_col],
                               num_buckets)[0].as_py())
        fills: list[int] = []     # current token total per open bin
        assign: list[int] = []
        for n in df["n_tokens"]:
            n = int(n)
            for i, f in enumerate(fills):  # first fit
                if f + n <= budget_tokens:
                    fills[i] = f + n
                    assign.append(i)
                    break
            else:
                fills.append(n)
                assign.append(len(fills) - 1)
        return pa.table({
            "pack_id": pa.array((np.int64(b) << np.int64(32))
                                + np.asarray(assign, np.int64), pa.int64()),
            id_col: pa.array(df[id_col].to_numpy(np.int64), pa.int64()),
            "n_tokens": pa.array(df["n_tokens"].to_numpy(np.int64),
                                 pa.int64()),
        })

    return bucketed_map_groups(
        docs_ds.map_batches(sizes, batch_format="pyarrow"),
        num_buckets, pack_bucket)


def mixture_sample(ds, rates_by_key: dict, key_col: str,
                   id_col: str, scale: int = 10000):
    """Deterministic stratified mixture sampling: keep a row iff
    hash(id) % scale < rate(key) × scale — the data-mixing step of a
    training pipeline (e.g. downsample low-quality buckets, keep all
    high-quality). Pure map-side, reproducible under any partitioning;
    unknown keys default to rate 0.0 (dropped)."""
    return ds.map_batches(
        make_mixture_keep(rates_by_key, key_col, id_col, scale),
        batch_format="pyarrow")


def make_mixture_keep(rates_by_key: dict, key_col: str, id_col: str,
                      scale: int = 10000):
    """mixture_sample's per-batch kernel as a reusable function for
    fused single-scan pipelines."""
    from ..functions.hashing import stable_hash64

    thresholds = {k: int(round(v * scale)) for k, v in rates_by_key.items()}

    def keep(t: pa.Table) -> pa.Table:
        h = stable_hash64(t[id_col].to_pylist()) % np.uint64(scale)
        keys = t[key_col].to_pylist()
        thr = np.fromiter((thresholds.get(k, 0) for k in keys),
                          np.int64, len(keys))
        return t.filter(pa.array(h.astype(np.int64) < thr))

    return keep


# ---------------------------------------------------------------------------
# DSIR-style importance selection (target-distribution data selection)
# ---------------------------------------------------------------------------

def q_dsir_select(sf_dir: str, target_max_id: int = 50, k: int = 200,
                  hash_buckets: int | None = None):
    """Select the ``k`` raw documents whose unigram distribution best
    matches a target corpus — Data Selection via Importance Resampling
    (Xie et al. 2023, NeurIPS; arXiv:2302.03169) with bag-of-words
    features and add-1-smoothed unigram LMs.

    Model: λ(w) = ln p_target(w) − ln p_raw(w) with
    p(w) = (c(w)+1)/(total+|V|) over the joint (= raw, since target ⊆
    raw) vocabulary; a document's log importance weight is
    Σ_w n_w(doc)·λ(w). λ is pre-rounded to a per-word integer
    (×10⁴, half-up) so the per-doc sum is EXACT integer arithmetic —
    the oracle-convention trick that makes a floating-point model
    hash-comparable across engines. Docs with zero tokens carry no
    weight rows and are never selected (both engines agree).

    Scale shape (the tf⋈df layout): target/raw counts are two-phase
    hash aggregates over the exploded token stream; λ is a vocab-scale
    LEFT join (raw ⋖ target — no vocabulary broadcast); doc scores are
    a bucketed shuffle join of (doc, w, n) against λ(w) plus one more
    hash aggregate; the final sort is bounded by per-block top-k. The
    three model scalars (token totals, |V|) are reduce aggregates, not
    driver materializations. ``hash_buckets``: replace words by
    blake2-hashed feature buckets (the paper's fixed-dimension variant
    for 10¹²-token vocabularies); the exact-word config is the oracle-
    checked one.

    Returns (doc_id, score_c) — the selected docs, score descending.
    """
    from .join import hash_join

    ds = _docs(sf_dir)

    def featurize(flat: pa.Array) -> pa.Array:
        if hash_buckets is None:
            return flat
        import hashlib as _h

        uniq = pc.unique(flat)
        m = {w: str(int.from_bytes(_h.blake2b(
            w.encode(), digest_size=8).digest(), "big") % hash_buckets)
            for w in uniq.to_pylist()}
        return pa.array([m[w] for w in flat.to_pylist()], pa.string())

    def tgt_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["doc_id"], target_max_id))
        flat, _ = _tokens_flat(t["text"])
        g = pa.table({"w": featurize(flat)}).group_by(["w"]) \
            .aggregate([("w", "count")])
        return g.rename_columns(["w", "ct_part"])

    def raw_partial(t: pa.Table) -> pa.Table:
        flat, _ = _tokens_flat(t["text"])
        g = pa.table({"w": featurize(flat)}).group_by(["w"]) \
            .aggregate([("w", "count")])
        return g.rename_columns(["w", "cr_part"])

    tgt = hash_aggregate(ds.map_batches(tgt_partial, batch_format="pyarrow"),
                         "w", [("ct_part", "sum", "ct")], num_buckets=16)
    raw = hash_aggregate(ds.map_batches(raw_partial, batch_format="pyarrow"),
                         "w", [("cr_part", "sum", "cr")], num_buckets=16)
    t_total = tgt.sum("ct") or 0
    r_total = raw.sum("cr") or 0
    v_size = raw.count()
    ln_tv = float(np.log(np.float64(t_total + v_size)))
    ln_rv = float(np.log(np.float64(r_total + v_size)))

    lam = hash_join(
        raw, tgt, on="w", how="left", num_buckets=16,
        left_schema=pa.schema([("w", pa.string()), ("cr", pa.int64())]),
        right_schema=pa.schema([("w", pa.string()), ("ct", pa.int64())]))

    def lam_c(t: pa.Table) -> pa.Table:
        ct = t["ct"].to_numpy(zero_copy_only=False)
        ct = np.where(np.isnan(ct.astype(np.float64)), 0.0,
                      ct.astype(np.float64))
        cr = t["cr"].to_numpy(zero_copy_only=False).astype(np.float64)
        # EXACT expression mirrored in the SQL oracle, term for term
        lam = np.log(ct + 1.0) - ln_tv - np.log(cr + 1.0) + ln_rv
        return pa.table({
            "w": t["w"],
            "lam_c": pa.array(np.floor(lam * 10000.0 + 0.5)
                              .astype(np.int64))})

    def doc_counts(t: pa.Table) -> pa.Table:
        flat, parent = _tokens_flat(t["text"])
        g = pa.table({"doc_id": t["doc_id"].take(parent),
                      "w": featurize(flat)}) \
            .group_by(["doc_id", "w"]).aggregate([("w", "count")])
        return g.rename_columns(["doc_id", "w", "n"])

    weighted = hash_join(
        ds.map_batches(doc_counts, batch_format="pyarrow"),
        lam.map_batches(lam_c, batch_format="pyarrow"),
        on="w", num_buckets=16,
        left_schema=pa.schema([("doc_id", pa.int64()), ("w", pa.string()),
                               ("n", pa.int64())]),
        right_schema=pa.schema([("w", pa.string()),
                                ("lam_c", pa.int64())]))

    def contrib(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        lc = t["lam_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "part": pa.array(n * lc, pa.int64())})

    scores = hash_aggregate(
        weighted.map_batches(contrib, batch_format="pyarrow"),
        "doc_id", [("part", "sum", "score_c")], num_buckets=16)

    def local_topk(t: pa.Table) -> pa.Table:
        return t.sort_by([("score_c", "descending"),
                          ("doc_id", "ascending")]).slice(0, k)

    return scores.map_batches(local_topk, batch_format="pyarrow") \
        .sort(["score_c", "doc_id"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2019, arXiv:1911.00359)
# ---------------------------------------------------------------------------

def q_perplexity_buckets(sf_dir: str, target_max_id: int = 50):
    """Score every document by an add-1-smoothed BIGRAM language model
    trained on a target subcorpus (doc_id < ``target_max_id`` — the
    'Wikipedia' stand-in), then bucket the corpus into head / middle /
    tail by per-token negative log likelihood tertiles — the CCNet
    quality-partitioning recipe.

    Model: per doc, bigrams ((<s>, w₁), (w₁, w₂), …) over the
    corpus-wide token convention; p(w₂|w₁) = (c₁₂+1)/(c₁+|V|) with
    target bigram counts c₁₂, target context counts c₁ = Σ_w c₁ᵥ, and
    |V| = distinct target words. Per-bigram term = ln(c₁+|V|) −
    ln(c₁₂+1), pre-rounded to an int (×10⁴, half-up — the engine/
    oracle exactness convention; DuckDB and numpy share libm ln
    bit-for-bit, same as q_dsir_select); per-doc nll_c = the
    count-weighted integer mean, half-up. Zero-token docs carry no LM
    evidence and are excluded (both engines agree).

    Scale shape: the target LM is two vocab-scale hash aggregates
    (contexts derived FROM the bigram table — no second corpus pass);
    doc bigrams are formed map-side inside each batch (locality
    contractual: a row is a whole doc); scoring is two bucketed LEFT
    joins against the LM tables (no vocabulary broadcast) plus one
    per-doc hash aggregate; the tertile thresholds come from
    :func:`ops.statsops.quantile_select` (2-3 slim passes); the final
    labeling is one map-side compare against two broadcast ints.

    Returns (doc_id, nll_c, bucket ∈ head|middle|tail).
    """
    from .join import hash_join
    from .statsops import quantile_select

    ds = _docs(sf_dir).materialize()   # consumed by 2 partials + scoring

    def bigram_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        flat, parent = _tokens_flat(t["text"])
        if len(flat) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        w2 = flat.to_numpy(zero_copy_only=False)
        par = parent.to_numpy(zero_copy_only=False)
        w1 = np.empty_like(w2)
        w1[0] = "<s>"
        w1[1:] = w2[:-1]
        w1[np.r_[True, par[1:] != par[:-1]]] = "<s>"
        g = pa.table({
            "doc_id": t["doc_id"].take(parent),
            "w1": pa.array(w1, pa.string()),
            "w2": flat,
        }).group_by(["doc_id", "w1", "w2"]).aggregate([("w2", "count")])
        return g.rename_columns(["doc_id", "w1", "w2", "n"])

    doc_bg = ds.map_batches(bigram_partial, batch_format="pyarrow") \
        .materialize()   # feeds the target aggregates AND the scoring

    def tgt_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["doc_id"], target_max_id)) \
            .select(["w1", "w2", "n"])

    bg = hash_aggregate(
        doc_bg.map_batches(tgt_only, batch_format="pyarrow"),
        ["w1", "w2"], [("n", "sum", "c12")], num_buckets=16).materialize()
    ctx = hash_aggregate(bg, "w1", [("c12", "sum", "c1")], num_buckets=16)
    v_size = hash_aggregate(
        bg.map_batches(
            lambda t: pa.table({"w2": pc.unique(t["w2"])}),
            batch_format="pyarrow"),
        "w2", [("w2", "count", "_c")], num_buckets=16).count()

    j1 = hash_join(
        doc_bg, bg, on=["w1", "w2"], how="left", num_buckets=16,
        left_schema=pa.schema([("doc_id", pa.int64()), ("w1", pa.string()),
                               ("w2", pa.string()), ("n", pa.int64())]),
        right_schema=pa.schema([("w1", pa.string()), ("w2", pa.string()),
                                ("c12", pa.int64())]))
    j2 = hash_join(
        j1, ctx, on="w1", how="left", num_buckets=16,
        left_schema=pa.schema([("doc_id", pa.int64()), ("w1", pa.string()),
                               ("w2", pa.string()), ("n", pa.int64()),
                               ("c12", pa.int64())]),
        right_schema=pa.schema([("w1", pa.string()), ("c1", pa.int64())]))

    def term_partial(t: pa.Table, V=v_size) -> pa.Table:
        c12 = t["c12"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        c12 = np.where(np.isnan(c12), 0.0, c12)
        c1 = np.where(np.isnan(c1), 0.0, c1)
        n = t["n"].to_numpy(zero_copy_only=False)
        # EXACT expression mirrored in the SQL oracle, term for term
        term_c = np.floor((np.log(c1 + V) - np.log(c12 + 1.0))
                          * 10000.0 + 0.5).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "s": pa.array(n * term_c, pa.int64()),
                         "m": pa.array(n, pa.int64())})

    sums = hash_aggregate(
        j2.map_batches(term_partial, batch_format="pyarrow"),
        "doc_id", [("s", "sum", "s"), ("m", "sum", "m")],
        num_buckets=16)

    def nll(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "k": pa.array(np.full(t.num_rows, "all", object), pa.string()),
            "vc": pa.array((s + m // 2) // m, pa.int64()),
        })

    scored = sums.map_batches(nll, batch_format="pyarrow").materialize()

    th = quantile_select(scored, "k",
                         qs=(("p33", 1, 3), ("p67", 2, 3)))
    tmap = {r["q"]: r["value_c"] for r in th.to_pylist()}
    t33, t67 = tmap["p33"], tmap["p67"]

    def label(t: pa.Table, t33=t33, t67=t67) -> pa.Table:
        v = t["vc"].to_numpy(zero_copy_only=False)
        b = np.where(v <= t33, "head",
                     np.where(v <= t67, "middle", "tail"))
        return pa.table({"doc_id": t["doc_id"],
                         "nll_c": t["vc"],
                         "bucket": pa.array(b.astype(object), pa.string())})

    return scored.map_batches(label, batch_format="pyarrow")
