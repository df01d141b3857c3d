"""Similarity search over an embedding column (list<float>).

Two paths (training-data-pipeline scope):
  * brute-force cosine top-k — numpy matmul per batch against a
    broadcast query matrix (``ray.put`` once); exact, the baseline and
    the oracle-checkable path.
  * LSH-bucketed ANN — random-hyperplane signatures bucket the corpus;
    a query only scans its bucket (+ multi-probe neighbors). The scale
    path: bucket assignment is a map-side transform, the scan is a
    per-bucket ``map_groups`` — no all-pairs work.

All scores are emitted as ``floor(cos * 10000 + 0.5)`` scaled ints
(the shared exact-compare convention with the DuckDB oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(emb_ds, query_ids: list[int], k: int = 5,
                     scale: int = 10000, concurrency=(1, 4)):
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding all query ids). → (query_id, neighbor_id, rank,
    cos_c) with deterministic ordering (cos_c desc, neighbor_id asc).

    The query matrix is broadcast once; each corpus batch computes a
    (batch × queries) matmul and emits its local top-k per query; the
    driver merges the tiny per-batch top-k lists (k × queries ×
    n_batches rows) — no corpus materialization."""
    import ray

    qset = set(int(q) for q in query_ids)

    def grab_queries(t: pa.Table) -> pa.Table:
        mask = pa.array([v in qset for v in t["vec_id"].to_pylist()],
                        pa.bool_())
        return t.filter(mask)

    qdf = emb_ds.map_batches(grab_queries, batch_format="pyarrow").to_pandas()
    qdf = qdf.sort_values("vec_id")
    qmat = _normalize_rows(np.array(qdf["embedding"].to_list(), dtype=np.float64))
    qids = qdf["vec_id"].to_numpy(dtype=np.int64)
    ref = ray.put((qmat, qids))

    class LocalTopK:
        def __init__(self, r, _k, _scale):
            import ray as _ray
            self.qmat, self.qids = _ray.get(r)
            self.qid_set = set(int(q) for q in self.qids)
            self.k, self.scale = _k, _scale

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
            keep = np.array([i not in self.qid_set for i in ids])
            if not keep.any():
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "cos_c": pa.array([], pa.int64())})
            mat = _normalize_rows(np.array(t["embedding"].to_pylist(),
                                           dtype=np.float64))[keep]
            ids = ids[keep]
            sims = self.qmat @ mat.T  # (q, b)
            simc = np.floor(sims * self.scale + 0.5).astype(np.int64)
            qq, nn, cc = [], [], []
            kk = min(self.k, simc.shape[1])
            for qi in range(simc.shape[0]):
                # local top-k: sort by (-cos, id) for determinism
                order = np.lexsort((ids, -simc[qi]))[:kk]
                qq.extend([int(self.qids[qi])] * len(order))
                nn.extend(ids[order].tolist())
                cc.extend(simc[qi][order].tolist())
            return pa.table({"query_id": pa.array(qq, pa.int64()),
                             "neighbor_id": pa.array(nn, pa.int64()),
                             "cos_c": pa.array(cc, pa.int64())})

    partial = emb_ds.map_batches(
        LocalTopK, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"r": ref, "_k": k, "_scale": scale})

    # merge per-batch top-k lists per query (rows ≤ q × k × n_batches)
    def merge(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["neighbor_id"].to_pylist(), dtype=np.int64)
        cc = np.asarray(g["cos_c"].to_pylist(), dtype=np.int64)
        order = np.lexsort((ids, -cc))[:k]
        n = len(order)
        return pa.table({
            "query_id": g["query_id"].slice(0, n),
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int64), pa.int64()),
            "neighbor_id": pa.array(ids[order], pa.int64()),
            "cos_c": pa.array(cc[order], pa.int64()),
        })

    # coalesce the tiny per-batch top-k partials before the merge
    # exchange: sort emits one (possibly EMPTY) partition per input
    # block, and empty partitions surface as schema-less blocks (the
    # Ray 2.49 "RefBundle with a different schema" log noise)
    return partial.repartition(4).groupby("query_id") \
        .map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def lsh_bucket_batch(planes: np.ndarray):
    """Returns a map_batches fn adding a `bucket` column (int64 signature)."""
    def fn(t: pa.Table) -> pa.Table:
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        bits = (m @ planes.T) > 0
        bucket = np.zeros(len(m), dtype=np.int64)
        for b in range(planes.shape[0]):
            bucket |= bits[:, b].astype(np.int64) << b
        return t.append_column("bucket", pa.array(bucket, pa.int64()))
    return fn


def lsh_topk(emb_ds, query_ids: list[int], k: int = 5, n_bits: int = 8,
             scale: int = 10000):
    """Approximate top-k: queries only scan their own hyperplane-LSH
    bucket. Recall < 1 by design; recall vs brute force is measured in
    tests. Buckets are hash-partitioned (groupby) — each bucket scan is
    an independent task, the web-scale layout (bucket ≈ IVF cell)."""
    dim = len(emb_ds.take(1)[0]["embedding"])
    planes = _hyperplanes(dim, n_bits)

    bucketed = emb_ds.map_batches(lsh_bucket_batch(planes),
                                  batch_format="pyarrow")
    qset = set(query_ids)

    def per_bucket(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["vec_id"].to_pylist(), dtype=np.int64)
        mat = _normalize_rows(np.array(g["embedding"].to_pylist(),
                                       dtype=np.float64))
        is_q = np.array([i in qset for i in ids])
        if not is_q.any() or is_q.all():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cos_c": pa.array([], pa.int64())})
        qmat, qids = mat[is_q], ids[is_q]
        cmat, cids = mat[~is_q], ids[~is_q]
        sims = qmat @ cmat.T
        simc = np.floor(sims * scale + 0.5).astype(np.int64)
        qq, rr, nn, cc = [], [], [], []
        for qi in np.argsort(qids):
            order = np.lexsort((cids, -simc[qi]))[:k]
            qq.extend([int(qids[qi])] * len(order))
            rr.extend(range(1, len(order) + 1))
            nn.extend(cids[order].tolist())
            cc.extend(simc[qi][order].tolist())
        return pa.table({"query_id": pa.array(qq, pa.int64()),
                         "rank": pa.array(rr, pa.int64()),
                         "neighbor_id": pa.array(nn, pa.int64()),
                         "cos_c": pa.array(cc, pa.int64())})

    return bucketed.groupby("bucket").map_groups(per_bucket,
                                                 batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF ANN (inverted-file index — the second scale path)
# ---------------------------------------------------------------------------

def ivf_centroids(emb_ds, n_cells: int = 16, sample: int = 2048,
                  iters: int = 8, seed: int = 13) -> np.ndarray:
    """Deterministic IVF codebook: seeded k-means over a deterministic
    sample (lowest vec_ids — stable under any partitioning).

    Driver-side by design: the codebook is model state (bounded by
    n_cells × dim), trained once and broadcast — the T1 pattern."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    def grab(t: pa.Table) -> pa.Table:
        return t.filter(_pc.less(t["vec_id"], _pa.scalar(sample)))

    df = emb_ds.map_batches(grab, batch_format="pyarrow").to_pandas()
    df = df.sort_values("vec_id")
    x = _normalize_rows(np.array(df["embedding"].to_list(), dtype=np.float64))
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n:
                    cent[c] = v / n
    return cent


def ivf_topk(emb_ds, query_ids: list[int], k: int = 5, n_cells: int = 16,
             n_probe: int = 4, scale: int = 10000):
    """IVF search: corpus vectors bucketed by nearest centroid; each
    query scans only its ``n_probe`` nearest cells. Recall < 1 by
    design (measured in tests vs brute force).

    Scale layout: cell assignment is a map-side matmul against the
    broadcast codebook; each cell is one shuffle partition scanned
    independently — the IVF-cell ≈ hash-bucket layout of web-scale
    vector dedup."""
    import ray

    cent = ivf_centroids(emb_ds, n_cells=n_cells)
    qset = set(int(q) for q in query_ids)

    def grab_queries(t: pa.Table) -> pa.Table:
        mask = pa.array([v in qset for v in t["vec_id"].to_pylist()],
                        pa.bool_())
        return t.filter(mask)

    qdf = emb_ds.map_batches(grab_queries, batch_format="pyarrow").to_pandas()
    qdf = qdf.sort_values("vec_id")
    qmat = _normalize_rows(np.array(qdf["embedding"].to_list(),
                                    dtype=np.float64))
    qids = qdf["vec_id"].to_numpy(dtype=np.int64)
    # per-query probe cells (deterministic)
    probe = np.argsort(-(qmat @ cent.T), axis=1)[:, :n_probe]
    cell_to_queries: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in probe[qi]:
            cell_to_queries.setdefault(int(c), []).append(qi)
    ref = ray.put((cent, qmat, qids, cell_to_queries))

    def assign(t: pa.Table) -> pa.Table:
        m = _normalize_rows(np.array(t["embedding"].to_pylist(),
                                     dtype=np.float64))
        cells = np.argmax(m @ cent.T, axis=1).astype(np.int64)
        return t.append_column("cell", pa.array(cells, pa.int64()))

    def per_cell(g: pa.Table) -> pa.Table:
        import ray as _ray

        c_mat, q_mat, q_ids, c2q = _ray.get(ref)
        cell = int(g["cell"][0].as_py())
        probing = c2q.get(cell, [])
        ids = np.asarray(g["vec_id"].to_pylist(), dtype=np.int64)
        keep = np.array([i not in qset for i in ids])
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "cos_c": pa.array([], pa.int64())})
        if not probing or not keep.any():
            return empty
        mat = _normalize_rows(np.array(g["embedding"].to_pylist(),
                                       dtype=np.float64))[keep]
        ids = ids[keep]
        sub = q_mat[probing]
        sims = sub @ mat.T
        simc = np.floor(sims * scale + 0.5).astype(np.int64)
        qq, nn, cc = [], [], []
        kk = min(k, simc.shape[1])
        for r, qi in enumerate(probing):
            order = np.lexsort((ids, -simc[r]))[:kk]
            qq.extend([int(q_ids[qi])] * len(order))
            nn.extend(ids[order].tolist())
            cc.extend(simc[r][order].tolist())
        return pa.table({"query_id": pa.array(qq, pa.int64()),
                         "neighbor_id": pa.array(nn, pa.int64()),
                         "cos_c": pa.array(cc, pa.int64())})

    partial = emb_ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("cell").map_groups(per_cell, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["neighbor_id"].to_pylist(), dtype=np.int64)
        cc = np.asarray(g["cos_c"].to_pylist(), dtype=np.int64)
        # a neighbor can surface from several probed cells — dedup
        seen: dict[int, int] = {}
        for i, c in zip(ids, cc):
            seen[int(i)] = max(seen.get(int(i), -10**9), int(c))
        items = sorted(seen.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        n = len(items)
        return pa.table({
            "query_id": g["query_id"].slice(0, n),
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int64), pa.int64()),
            "neighbor_id": pa.array([i for i, _ in items], pa.int64()),
            "cos_c": pa.array([c for _, c in items], pa.int64()),
        })

    return partial.repartition(4).groupby("query_id") \
        .map_groups(merge, batch_format="pyarrow")


def recall_vs_bruteforce(approx_df, exact_df) -> float:
    """Fraction of exact top-k pairs recovered by the approximate path."""
    a = set(map(tuple, approx_df[["query_id", "neighbor_id"]].itertuples(index=False)))
    e = set(map(tuple, exact_df[["query_id", "neighbor_id"]].itertuples(index=False)))
    return len(a & e) / max(1, len(e))
