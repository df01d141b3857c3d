"""Distributed linear quality-classifier training + scoring.

The model-based quality filter of modern LLM corpus pipelines (CCNet's
fastText LM filter, Brown et al. 2020 §A "high-quality" LR filter over
hashed features): train a logistic-regression classifier over
hashed bag-of-words features with full-batch gradient descent, then
score every document — both phases distributed.

Engine realization (the repo-wide exactness convention, see
stages/semdedup.py): the only cross-task float reduction — the
gradient — is made ORDER-INDEPENDENT by quantizing each document's
per-component gradient contribution to int64 (``×2²⁴``, half-up) and
summing integers: per-bucket partials via ``np.add.at`` (exact int64),
driver-side bucket fold in bucket order (exact int64). Distributed
training is therefore bit-identical to a sequential reference however
blocks or buckets are laid out. Overflow bound: ``|c| ≤ 2²⁴`` per
nonzero, so int64 is safe past 2³⁹ gradient nonzeros per component —
beyond any single training run here (document-scale: re-shard the
reduce hierarchically, same layout as ops/hashagg two-phase).

Scale shape:
  * featurization is one ``map_batches`` pass (RE2 tokenize + hashing
    trick), emitting SLIM csr rows ``(doc_id, idx list<int32>,
    val list<float64>, y)`` — the 100-TB text never travels again;
  * the feature table is exchanged ONCE into ``num_buckets`` pinned
    object-store CSR shards (raw-task exchange, ops/exchange.py);
    every GD iteration is then one wave of ``num_buckets`` tasks over
    pinned shards + an O(dim) driver fold — the iteration cost is
    model-sized, not corpus-sized (the T1 bounded-model pattern);
  * scoring broadcasts the final O(dim) weight vector and is one
    map-side pass.

Reference anchor (semantics): the per-format predicate gate P14
(SURVEY.md §2; reference GeneReader.isExon filter) upgraded from a
rule to a trained model — the "filter by learned quality" stage a
reference user running corpus prep would add first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash64

GRAD_SCALE = 1 << 24        # int64 gradient quantum (half-up)
SCORE_SCALE = 1_000_000     # sigmoid scores as ints, 1e-6 quantum


# ---------------------------------------------------------------------------
# Featurization: hashing trick → slim CSR rows
# ---------------------------------------------------------------------------

def featurize_batch(t: pa.Table, dim: int, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """(doc rows) → (id, idx list<int32>, val list<float64>): hashed
    bag-of-words, token counts L2-normalized per doc, plus a constant
    bias feature at index ``dim`` (so weight vectors have ``dim + 1``
    components). Pure per-doc arithmetic — no cross-doc floats."""
    from .analytics import _tokens_flat

    t = t.combine_chunks()
    n = t.num_rows
    flat, parent = _tokens_flat(t[text_col])
    if len(flat):
        hidx = (stable_hash64(flat.to_pandas()) % np.uint64(dim)) \
            .astype(np.int64)
        par = parent.to_numpy(zero_copy_only=False).astype(np.int64)
        key = par * dim + hidx
        uk, counts = np.unique(key, return_counts=True)
        doc_of = uk // dim
        feat_of = (uk % dim).astype(np.int32)
        cnt = counts.astype(np.float64)
        # per-doc L2 norm over token counts (uk sorted → doc_of
        # non-decreasing; exact per-doc accumulate, empty docs → 1)
        sq = np.zeros(n, np.float64)
        np.add.at(sq, doc_of, cnt * cnt)
        nnz = np.bincount(doc_of, minlength=n).astype(np.int64)
        norm = np.sqrt(np.where(nnz > 0, sq, 1.0))
        val = cnt / np.repeat(norm, nnz)
    else:
        feat_of = np.empty(0, np.int32)
        val = np.empty(0, np.float64)
        nnz = np.zeros(n, np.int64)

    # append the bias feature (idx=dim, val=1.0) to every doc —
    # vectorized stitch: bias slots are the last position of each
    # output row
    total = len(val) + n
    out_off = np.concatenate([[0], np.cumsum(nnz)]) + np.arange(n + 1)
    token_mask = np.ones(total, bool)
    token_mask[out_off[1:] - 1] = False
    out_idx = np.full(total, dim, np.int32)
    out_val = np.ones(total, np.float64)
    out_idx[token_mask] = feat_of
    out_val[token_mask] = val
    offsets = pa.array(out_off, pa.int32())
    return pa.table({
        id_col: t[id_col],
        "idx": pa.ListArray.from_arrays(offsets, pa.array(out_idx)),
        "val": pa.ListArray.from_arrays(offsets, pa.array(out_val)),
    })


def featurize(docs_ds, dim: int = 512, text_col: str = "text",
              id_col: str = "doc_id"):
    """docs Dataset → slim CSR feature Dataset (one map pass)."""
    return docs_ds.map_batches(
        lambda t: featurize_batch(t, dim, text_col, id_col),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Planted labels (deterministic separable task for tests/goldens)
# ---------------------------------------------------------------------------

def planted_weights(dim: int) -> np.ndarray:
    """Deterministic ±1-ish planted weight vector (Knuth-hash per
    index, no RNG state): the label oracle for the self-supervised
    driver leg and the tests."""
    j = np.arange(dim + 1, dtype=np.uint64)
    w = ((j * np.uint64(2654435761)) % np.uint64(1 << 32)).astype(
        np.float64) / float(1 << 31) - 1.0
    w[dim] = 0.0  # unbiased plant: labels split on the token signal
    return w


def _csr_of(t: pa.Table, id_col: str):
    """feature table → (ids, indptr, idx, val[, y]) numpy CSR views."""
    t = t.combine_chunks()
    ids = t[id_col].to_numpy(zero_copy_only=False)
    idx_col = t["idx"].combine_chunks()
    indptr = idx_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    idx = idx_col.values.to_numpy(zero_copy_only=False).astype(np.int64)
    val = t["val"].combine_chunks().values.to_numpy(zero_copy_only=False)
    return ids, indptr, idx, val


def _dots(indptr, idx, val, w) -> np.ndarray:
    """per-doc dense dot x·w over CSR rows (segmented sum)."""
    prod = val * w[idx]
    if not len(prod):
        return np.zeros(len(indptr) - 1)
    acc = np.concatenate([[0.0], np.cumsum(prod)])
    return acc[indptr[1:]] - acc[indptr[:-1]]


def plant_labels(feat_ds, dim: int, id_col: str = "doc_id"):
    """Add ``y`` (int8 0/1) from the planted rule sign(x·w*): a
    deterministic, linearly separable task — per-doc float only."""
    wstar = planted_weights(dim)

    def lab(t: pa.Table) -> pa.Table:
        _, indptr, idx, val = _csr_of(t, id_col)
        y = (_dots(indptr, idx, val, wstar) > 0).astype(np.int8)
        return t.append_column("y", pa.array(y, pa.int8()))

    return feat_ds.map_batches(lab, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Training: pinned-shard full-batch GD with int64-exact gradient
# ---------------------------------------------------------------------------

def _grad_partial(indptr, idx, val, y, w, dim: int):
    """One shard's quantized gradient/loss partial (pure numpy).

    Per-doc residual r = σ(x·w) − y; each nonzero's contribution
    ``val·r`` is quantized to int64 (×2²⁴ half-up — round BEFORE the
    sum, so the sum is order-free), accumulated with exact int64
    ``np.add.at``. Loss = Σ softplus(−margin) quantized the same way;
    n_correct counts sign agreement (ties → predict 0)."""
    z = _dots(indptr, idx, val, w)
    p = 1.0 / (1.0 + np.exp(-z))
    yf = y.astype(np.float64)
    r = p - yf
    nnz = np.diff(indptr)
    contrib = val * np.repeat(r, nnz)
    cq = np.floor(contrib * GRAD_SCALE + 0.5).astype(np.int64)
    grad = np.zeros(dim + 1, np.int64)
    np.add.at(grad, idx, cq)
    # numerically stable per-doc nll: softplus(-(2y-1)·z)
    m = (2.0 * yf - 1.0) * z
    nll = np.logaddexp(0.0, -m)
    loss = int(np.floor(nll * GRAD_SCALE + 0.5).astype(np.int64).sum())
    correct = int(((z > 0).astype(np.int8) == y).sum())
    return grad, loss, correct, len(y)


def train_logreg(feat_ds, dim: int, *, iters: int = 40, lr: float = 2.0,
                 l2: float = 0.0, momentum: float = 0.9,
                 num_buckets: int = 16, id_col: str = "doc_id"):
    """Full-batch GD over a labeled feature Dataset (columns: id, idx,
    val, y) → (weights float64[dim+1], history list of per-iteration
    dicts). Deterministic: bit-identical to :func:`sequential ref
    <tests.test_classifier>` at any block/bucket layout.

    One exchange pins per-bucket CSR shards in the object store; each
    iteration is ``num_buckets`` shard tasks + an O(dim) driver fold
    (ints summed in bucket order — exact), then the float64 update
    ``w ← w − lr·(∇/n + l2·w)`` computed once, driver-side."""
    import ray

    from .exchange import reduce_refs, split_refs
    from .hashagg import append_bucket

    bucketed = feat_ds.map_batches(
        lambda t: append_bucket(t, [id_col], num_buckets),
        batch_format="pyarrow")

    def pin(b: int, t: pa.Table | None):
        if t is None or t.num_rows == 0:
            return None
        _, indptr, idx, val = _csr_of(t, id_col)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.int8)
        return indptr, idx, val, y

    shard_refs = reduce_refs(
        split_refs(bucketed, num_buckets, bucket_col="bucket"),
        num_buckets, pin)

    @ray.remote
    def shard_grad(shard, w):
        if shard is None:
            return np.zeros(dim + 1, np.int64), 0, 0, 0
        indptr, idx, val, y = shard
        return _grad_partial(indptr, idx, val, y, w, dim)

    w = np.zeros(dim + 1, np.float64)
    vel = np.zeros(dim + 1, np.float64)
    history = []
    for it in range(iters):
        wref = ray.put(w)
        parts = ray.get([shard_grad.remote(s, wref) for s in shard_refs])
        grad = np.zeros(dim + 1, np.int64)
        loss_q = correct = n = 0
        for g, lq, c, cnt in parts:  # bucket order — exact int64 fold
            grad += g
            loss_q += lq
            correct += c
            n += cnt
        if n == 0:
            break
        gf = grad.astype(np.float64) / GRAD_SCALE / n + l2 * w
        # classical momentum — driver-side float64, deterministic
        vel = momentum * vel - lr * gf
        w = w + vel
        history.append({"iter": it, "loss": loss_q / GRAD_SCALE / n,
                        "accuracy": correct / n, "n": n})
    return w, history


# ---------------------------------------------------------------------------
# Scoring: broadcast weights, one map pass
# ---------------------------------------------------------------------------

def score_logreg(feat_ds, w: np.ndarray, id_col: str = "doc_id"):
    """feature Dataset + weights → (id, score_c int64, pred int8):
    ``score_c = ⌊σ(x·w)·10⁶ + ½⌋`` (scaled-integer convention so the
    distributed output is hash-comparable)."""
    import ray

    wref = ray.put(np.asarray(w, np.float64))

    class Scorer:
        def __init__(self):
            self.w = ray.get(wref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, indptr, idx, val = _csr_of(t, id_col)
            z = _dots(indptr, idx, val, self.w)
            p = 1.0 / (1.0 + np.exp(-z))
            sc = np.floor(p * SCORE_SCALE + 0.5).astype(np.int64)
            cols = {
                id_col: pa.array(ids),
                "score_c": pa.array(sc, pa.int64()),
                "pred": pa.array((z > 0).astype(np.int8), pa.int8()),
            }
            if "y" in t.column_names:  # label passthrough (eval runs)
                cols["y"] = t["y"]
            return pa.table(cols)

    return feat_ds.map_batches(Scorer, batch_format="pyarrow",
                               concurrency=(1, 4), batch_size=8192)


# ---------------------------------------------------------------------------
# The packaged pipeline (the driver leg): plant → train → score
# ---------------------------------------------------------------------------

def q_quality_classifier(sf_dir: str, dim: int = 256, iters: int = 100,
                         lr: float = 8.0):
    """documents → (doc_id, score_c, pred, y) on the planted separable
    task: featurize once (materialized — consumed by training AND
    scoring), train distributed, score distributed. Deterministic
    end-to-end (golden-oracle comparable)."""
    import ray

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    feats = plant_labels(featurize(docs, dim), dim).materialize()
    w, _hist = train_logreg(feats, dim, iters=iters, lr=lr)
    return score_logreg(feats, w)
