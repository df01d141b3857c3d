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


def _emb_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix without a Python
    list round-trip: one flatten + reshape (all rows share the
    embedding dim — the column's construction invariant)."""
    ca = col.combine_chunks()
    n = len(ca)
    if n == 0:
        return np.empty((0, 0), np.float64)
    flat = ca.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


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

    # stateless TASK pool, not an actor pool: the broadcast query
    # matrix is fetched once per worker process via the module-level
    # plasma-ref cache (dedup._cached_get), so there is no per-actor
    # spin-up to amortize — measured as the dominant cost of this
    # query at bench scale
    def local_topk(t: pa.Table) -> pa.Table:
        from .dedup import _cached_get

        qmat, qids = _cached_get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ~np.isin(ids, qids)
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cos_c": pa.array([], pa.int64())})
        mat = _normalize_rows(_emb_matrix(t["embedding"]))[keep]
        ids = ids[keep]
        sims = qmat @ mat.T  # (q, b)
        simc = np.floor(sims * scale + 0.5).astype(np.int64)
        qq, nn, cc = [], [], []
        kk = min(k, simc.shape[1])
        for qi in range(simc.shape[0]):
            # local top-k: sort by (-cos, id) for determinism
            order = np.lexsort((ids, -simc[qi]))[:kk]
            qq.extend([int(qids[qi])] * len(order))
            nn.extend(ids[order].tolist())
            cc.extend(simc[qi][order].tolist())
        return pa.table({"query_id": pa.array(qq, pa.int64()),
                         "neighbor_id": pa.array(nn, pa.int64()),
                         "cos_c": pa.array(cc, pa.int64())})

    partial = emb_ds.map_batches(local_topk, batch_format="pyarrow")

    # merge per-batch top-k lists (rows ≤ q × k × n_batches) through
    # the raw-task bucket exchange; one vectorized run-boundary pass
    # ranks every query in the bucket
    from ..ops.exchange import bucketed_map_groups
    from ..ops.hashagg import append_bucket

    def merge_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([("query_id", "ascending"), ("cos_c", "descending"),
                       ("neighbor_id", "ascending")])
        q = g["query_id"].to_numpy(zero_copy_only=False)
        if len(q) == 0:
            return pa.schema([("query_id", pa.int64()),
                              ("rank", pa.int64()),
                              ("neighbor_id", pa.int64()),
                              ("cos_c", pa.int64())]).empty_table()
        starts = np.r_[0, np.flatnonzero(q[1:] != q[:-1]) + 1]
        rank = np.arange(len(q)) - np.repeat(
            starts, np.diff(np.r_[starts, len(q)]))
        kept = g.filter(pa.array(rank < k))
        return pa.table({
            "query_id": kept["query_id"],
            "rank": pa.array(rank[rank < k] + 1, pa.int64()),
            "neighbor_id": kept["neighbor_id"],
            "cos_c": kept["cos_c"],
        })

    return bucketed_map_groups(
        partial.map_batches(lambda t: append_bucket(t, ["query_id"], 8),
                            batch_format="pyarrow"), 8, merge_bucket)


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

    qarr = np.asarray(sorted(qset), dtype=np.int64)

    def per_bucket(g: pa.Table) -> pa.Table:
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize_rows(_emb_matrix(g["embedding"]))
        is_q = np.isin(ids, qarr)
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

    # the signature IS a dense int in [0, 2^n_bits): run the raw-task
    # bucket exchange with bucket == signature (one scan task per
    # occupied signature; size n_bits so 2^n_bits ≈ 2× cluster cores
    # at scale). per_bucket is 0-row-safe.
    from ..ops.exchange import bucketed_map_groups

    return bucketed_map_groups(bucketed, 1 << n_bits, per_bucket)


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
        if t.num_rows == 0:
            return t.replace_schema_metadata(None).append_column(
                "cell", pa.array([], pa.int64()))
        m = _normalize_rows(_emb_matrix(t["embedding"]))
        cells = np.argmax(m @ cent.T, axis=1).astype(np.int64)
        return t.replace_schema_metadata(None).append_column(
            "cell", pa.array(cells, pa.int64()))

    qarr = np.asarray(sorted(qset), dtype=np.int64)

    def per_cell(cell: int, g: pa.Table | None) -> pa.Table:
        from .dedup import _cached_get

        c_mat, q_mat, q_ids, c2q = _cached_get(ref)
        probing = c2q.get(int(cell), [])
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "cos_c": pa.array([], pa.int64())})
        if g is None or g.num_rows == 0:
            return empty
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ~np.isin(ids, qarr)
        if not probing or not keep.any():
            return empty
        mat = _normalize_rows(_emb_matrix(g["embedding"]))[keep]
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

    # cell is a dense int in [0, n_cells): the raw-task exchange's
    # bucket id IS the cell id, so per_cell receives it directly (no
    # cell column read, 0-row/None cells handled explicitly)
    from ..ops.exchange import bucket_exchange_ds, bucketed_map_groups
    from ..ops.hashagg import append_bucket

    partial = bucket_exchange_ds(
        emb_ds.map_batches(assign, batch_format="pyarrow"),
        n_cells, per_cell, bucket_col="cell")

    def merge_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        # a neighbor can surface from several probed cells — dedup per
        # (query, neighbor) keeping max cos, then rank per query
        df = g.to_pandas()
        if len(df):
            df = df.groupby(["query_id", "neighbor_id"], as_index=False,
                            sort=False)["cos_c"].max()
            df = df.sort_values(["query_id", "cos_c", "neighbor_id"],
                                ascending=[True, False, True],
                                kind="mergesort").reset_index(drop=True)
            q = df["query_id"].to_numpy()
            starts = np.r_[0, np.flatnonzero(q[1:] != q[:-1]) + 1]
            rank = np.arange(len(q)) - np.repeat(
                starts, np.diff(np.r_[starts, len(q)]))
            df = df[rank < k].assign(rank=rank[rank < k] + 1)
        else:
            df = df.assign(rank=np.array([], np.int64))
        return pa.table({
            "query_id": pa.array(df["query_id"].to_numpy(np.int64),
                                 pa.int64()),
            "rank": pa.array(df["rank"].to_numpy(np.int64), pa.int64()),
            "neighbor_id": pa.array(df["neighbor_id"].to_numpy(np.int64),
                                    pa.int64()),
            "cos_c": pa.array(df["cos_c"].to_numpy(np.int64), pa.int64()),
        })

    return bucketed_map_groups(
        partial.map_batches(lambda t: append_bucket(t, ["query_id"], 8),
                            batch_format="pyarrow"), 8, merge_bucket)


def recall_vs_bruteforce(approx_df, exact_df) -> float:
    """Fraction of exact top-k pairs recovered by the approximate path."""
    a = set(map(tuple, approx_df[["query_id", "neighbor_id"]].itertuples(index=False)))
    e = set(map(tuple, exact_df[["query_id", "neighbor_id"]].itertuples(index=False)))
    return len(a & e) / max(1, len(e))
