"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540, public): k-means
cluster the corpus embeddings, then within each cluster drop
near-duplicate vectors by cosine similarity, keeping one
representative per duplicate group.

Engine realization — every stage is EXACT integer arithmetic so the
distributed result is bit-identical to a sequential reference no
matter how blocks are sized or ordered:

  * **Quantize once.** Embeddings are L2-normalized in float64 and
    quantized to int64 (×2²⁰, half-up: ``floor(x/‖x‖·2²⁰ + 0.5)``)
    in the first map_batches. All later dots/distances are int64 —
    order-independent sums, no float tie ambiguity. Component
    magnitude ≤ 2²⁰ bounds every partial sum: overflow needs > 2⁴³
    rows per cluster.
  * **k-means (Lloyd) over the FULL corpus** — not a driver sample
    (that is :func:`stages.similarity.ivf_centroids`'s bounded-model
    shortcut; SemDeDup's clusters ARE the output geometry, so they
    are trained distributed): per round one ``map_batches`` emits
    per-batch (cluster, count, component-sum) partials, a two-phase
    :func:`ops.hashagg.hash_aggregate` folds them to k rows, and the
    driver re-quantizes the k×(d+1) model (bounded model state, the
    T1 pattern). Assignment is integer argmin of squared Euclidean
    distance — on unit-norm inputs ≡ cosine argmax — ties → lowest
    cluster id. The quantized dataset is materialized once and
    re-scanned per round (at 100-TB scale swap the materialize for a
    parquet checkpoint, exactly like ``ops.graph_algos.pagerank``'s
    ``checkpoint_dir`` rounds).
  * **Within-cluster dedup** — one bucketed raw-task exchange keyed
    on the cluster id (dense ints in [0, k), so the fixed-partition
    exchange applies), then the deterministic greedy leader scan per
    cluster: vec_ids ascending, a vector is KEPT iff no already-kept
    vector in its cluster has scaled dot ≥ ``tau_c``; a dropped
    vector records ``dup_of`` = the lowest-id kept leader over the
    threshold. The scan is chunked — whole chunks are cleared
    against prior leaders with one int64 matmul; only intra-chunk
    survivors fall back to the (inherently sequential) leader loop.

Reference anchors (semantics, not code): the exactly-one-distinct /
dedup operator family of SURVEY.md §2 (Neo4JUtils.scala:43 edge
CREATE-UNIQUE) re-targeted at embedding space; extends the engine's
dedup family (stages/dedup.py) with the model-embedding scale path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 1 << 20
# dot of two quantized unit vectors ≈ cos × 2^40
SIM_ONE = 1 << 40


def _list_matrix(col, dtype) -> np.ndarray:
    """list<numeric> column → (n, dim) matrix without a Python list
    round-trip: one flatten + reshape (all rows share the embedding
    dim — the column's construction invariant)."""
    ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(ca) == 0:
        return np.empty((0, 0), dtype)
    flat = ca.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    return flat.reshape(len(ca), -1)


def _matrix_list(m: np.ndarray) -> pa.ListArray:
    """(n, dim) int64 matrix → list<int64> array, one offsets+values
    construction (no per-row Python)."""
    n, d = m.shape
    if n == 0 or d == 0:
        return pa.array([[]] * n, pa.list_(pa.int64()))
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, pa.array(m.reshape(-1)))


def quantize_embeddings(t: pa.Table, emb_col: str = "embedding") -> pa.Table:
    """(vec_id, q: list<int64>) — L2-normalize float64, quantize ×2²⁰
    half-up. Zero vectors quantize to the zero vector."""
    x = _list_matrix(t[emb_col], np.float64)
    n = np.sqrt(np.sum(x * x, axis=1, keepdims=True))
    n[n == 0.0] = 1.0
    q = np.floor(x / n * SCALE + 0.5).astype(np.int64)
    return pa.table({
        "vec_id": t["vec_id"],
        "q": _matrix_list(q),
    })


def _qmatrix(col) -> np.ndarray:
    return _list_matrix(col, np.int64)


def _assign(X: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Exact integer argmin of ‖x−c‖² = (‖x‖²) − 2x·c + ‖c‖² — the
    x-constant term drops; ties break to the lowest cluster id
    (np.argmin picks the first minimum)."""
    score = -2 * (X @ cent.T) + np.sum(cent * cent, axis=1)[None, :]
    return np.argmin(score, axis=1).astype(np.int64)


def _init_pick(x: np.ndarray, n_clusters: int, seed: int) -> np.ndarray:
    """The seeded choice-without-replacement over the vec_id-ascending
    sample matrix — shared by both init paths so they are bit-equal."""
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)
    return x[pick].copy()


def init_centroids(qds, n_clusters: int, init_sample: int,
                   seed: int) -> np.ndarray:
    """Seeded deterministic init: choice without replacement from the
    lowest-vec_id sample (stable under any partitioning — the same
    rule as stages/similarity.ivf_centroids)."""
    import pyarrow.compute as pc

    def grab(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["vec_id"], pa.scalar(init_sample)))

    df = qds.map_batches(grab, batch_format="pyarrow").to_pandas()
    df = df.sort_values("vec_id")
    x = np.array(df["q"].to_list(), dtype=np.int64)
    return _init_pick(x, n_clusters, seed)


# Per-Lloyd-round reduce path gate: each block's partial is one
# (k counts, k × d sums) pair, so folding the partials on the driver
# touches ≤ n_blocks × k rows — bounded by the block count, never the
# corpus. Below this budget the rounds run as one raw Ray task per
# pinned block (the engine's bounded-model-state layout — see
# ops/exchange.py and stages/canonicalize.launch_pair_partials) with a
# driver numpy fold, skipping per-round Dataset-job fixed costs; at
# cluster scale (many blocks × large k) the Dataset map + two-phase
# hash_aggregate takes over — same exact integer sums either way.
DRIVER_FOLD_BUDGET_ROWS = 1 << 18


def _lazy_tasks():
    """ray.remote wrappers created on first use (keeps module import
    free of a ray dependency, like ops/exchange.py)."""
    global _INIT_TASK, _ROUND_TASK
    if "_ROUND_TASK" in globals():
        return
    import ray

    @ray.remote
    def _init_task(init_sample, blk):
        import pyarrow.compute as pc
        return blk.filter(pc.less(blk["vec_id"], pa.scalar(init_sample)))

    @ray.remote
    def _round_task(cent, n_clusters, blk):
        X = _qmatrix(blk["q"])
        if not len(X):
            return None
        a = _assign(X, cent)
        cnt = np.bincount(a, minlength=n_clusters).astype(np.int64)
        sums = np.zeros((n_clusters, X.shape[1]), np.int64)
        np.add.at(sums, a, X)
        return cnt, sums

    _INIT_TASK, _ROUND_TASK = _init_task, _round_task


def _pinned_blocks(qds) -> list:
    """Block refs of a materialized dataset (kept alive by the list)."""
    refs = []
    for bundle in qds.iter_internal_ref_bundles():
        for blk, _ in bundle.blocks:
            refs.append(blk)
    return refs


def kmeans_fit(qds, n_clusters: int = 8, iters: int = 4,
               init_sample: int = 128, seed: int = 23) -> np.ndarray:
    """Distributed Lloyd over the full quantized corpus; returns the
    int64 (k × d) codebook. Per round the driver folds k aggregate
    rows (≤ n_blocks × k partial rows under the gate) — never the
    corpus."""
    import ray

    from ..ops.hashagg import hash_aggregate

    try:
        n_blocks = qds.num_blocks()
    except Exception:  # non-materialized input: Dataset path
        n_blocks = None
    driver_fold = (n_blocks is not None
                   and n_blocks * n_clusters <= DRIVER_FOLD_BUDGET_ROWS)

    if driver_fold:
        _lazy_tasks()
        refs = _pinned_blocks(qds)
        grabbed = [t for t in ray.get(
            [_INIT_TASK.remote(init_sample, r) for r in refs])
            if t.num_rows]
        samp = (pa.concat_tables(grabbed).sort_by([("vec_id", "ascending")])
                if grabbed else None)
        cent = _init_pick(
            _qmatrix(samp["q"]) if samp is not None
            else np.empty((0, 0), np.int64), n_clusters, seed)
    else:
        refs = None
        cent = init_centroids(qds, n_clusters, init_sample, seed)
    if not len(cent):
        return cent
    dim = cent.shape[1]
    scols = [f"s{i}" for i in range(dim)]

    for _ in range(iters):
        c_now = cent  # bind per round for the closure
        new = cent.copy()

        if driver_fold:
            cent_ref = ray.put(c_now)
            outs = ray.get([_ROUND_TASK.remote(cent_ref, n_clusters, r)
                            for r in refs])
            cnt = np.zeros(n_clusters, np.int64)
            sums = np.zeros((n_clusters, dim), np.int64)
            for o in outs:
                if o is not None:
                    cnt += o[0]
                    sums += o[1]
            nz = np.flatnonzero(cnt)
            new[nz] = np.floor(
                sums[nz] / cnt[nz, None].astype(np.float64)
                + 0.5).astype(np.int64)
            cent = new
            continue

        def partial(t: pa.Table) -> pa.Table:
            X = _qmatrix(t["q"])
            if not len(X):
                return pa.table(
                    {"cluster": pa.array([], pa.int64()),
                     "cnt": pa.array([], pa.int64()),
                     **{s: pa.array([], pa.int64()) for s in scols}})
            a = _assign(X, c_now)
            cnt = np.bincount(a, minlength=n_clusters).astype(np.int64)
            sums = np.zeros((n_clusters, X.shape[1]), np.int64)
            np.add.at(sums, a, X)
            nz = np.flatnonzero(cnt)
            return pa.table({
                "cluster": pa.array(nz, pa.int64()),
                "cnt": pa.array(cnt[nz], pa.int64()),
                **{s: pa.array(sums[nz, i], pa.int64())
                   for i, s in enumerate(scols)}})

        agg = hash_aggregate(
            qds.map_batches(partial, batch_format="pyarrow"),
            "cluster", [("cnt", "sum", "n")]
            + [(s, "sum", s) for s in scols],
            num_buckets=min(8, n_clusters))
        rows = agg.take_all()  # ≤ k rows: bounded model state
        for r in rows:
            c = int(r["cluster"])
            n = float(r["n"])
            v = np.array([r[s] for s in scols], dtype=np.float64)
            new[c] = np.floor(v / n + 0.5).astype(np.int64)
        cent = new
    return cent


def _greedy_keep(X: np.ndarray, ids: np.ndarray, tau_c: int,
                 chunk: int = 256):
    """The deterministic leader scan over one cluster's rows (sorted
    by vec_id ascending). Returns (kept bool[n], dup_of int64[n];
    dup_of = −1 for kept rows). Whole chunks are cleared against the
    prior leaders vectorized; only intra-chunk survivors run the
    sequential leader loop."""
    n = len(X)
    kept = np.zeros(n, bool)
    dup_of = np.full(n, -1, np.int64)
    lead_rows: list[int] = []
    for s in range(0, n, chunk):
        C = X[s:s + chunk]
        m = len(C)
        if lead_rows:
            L = X[lead_rows]
            hits = C @ L.T >= tau_c            # (m × n_leaders) int64
            any_hit = hits.any(axis=1)
            first = np.argmax(hits, axis=1)    # leaders appended id-asc
        else:
            any_hit = np.zeros(m, bool)
            first = np.zeros(m, np.int64)
        n_prior = len(lead_rows)
        for j in range(m):
            i = s + j
            if any_hit[j]:
                dup_of[i] = ids[lead_rows[first[j]]]
                continue
            # check the leaders added within this chunk only
            fresh = lead_rows[n_prior:]
            if fresh:
                sims = X[fresh] @ X[i]
                hit = np.flatnonzero(sims >= tau_c)
                if len(hit):
                    dup_of[i] = ids[fresh[hit[0]]]
                    continue
            kept[i] = True
            lead_rows.append(i)
    return kept, dup_of


def semdedup(emb_ds, n_clusters: int = 8, iters: int = 4,
             tau_c: int = int(0.35 * SIM_ONE), seed: int = 23,
             init_sample: int = 128, emb_col: str = "embedding"):
    """Full SemDeDup: returns a Dataset of (vec_id, cluster, kept,
    dup_of) — one row per input vector; ``dup_of`` is null for kept
    rows. ``tau_c`` is the cosine threshold ×2⁴⁰ (default tuned to
    the synthetic table's similarity scale; the paper's ε plays the
    same role)."""
    from ..ops.exchange import bucketed_map_groups

    qds = emb_ds.map_batches(
        lambda t: quantize_embeddings(t, emb_col),
        batch_format="pyarrow").materialize()
    cent = kmeans_fit(qds, n_clusters=n_clusters, iters=iters,
                      init_sample=init_sample, seed=seed)

    def tag(t: pa.Table) -> pa.Table:
        X = _qmatrix(t["q"])
        a = (_assign(X, cent) if len(X)
             else np.empty(0, np.int64))
        out = t.append_column("cluster", pa.array(a, pa.int64()))
        return out.append_column(
            "bucket", pa.array(a.astype(np.int32), pa.int32()))

    empty = pa.schema([
        ("vec_id", pa.int64()), ("cluster", pa.int64()),
        ("kept", pa.bool_()), ("dup_of", pa.int64())])

    def per_cluster(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty.empty_table()
        g = g.sort_by([("vec_id", "ascending")])
        X = _qmatrix(g["q"])
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kept, dup_of = _greedy_keep(X, ids, tau_c)
        return pa.table({
            "vec_id": g["vec_id"],
            "cluster": g["cluster"],
            "kept": pa.array(kept),
            "dup_of": pa.array(dup_of, pa.int64(),
                               mask=dup_of < 0),
        })

    return bucketed_map_groups(
        qds.map_batches(tag, batch_format="pyarrow"),
        max(n_clusters, 1), per_cluster, empty_schema=empty)
