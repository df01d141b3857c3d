"""Similarity search: brute-force exactness, LSH recall, determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from gfftoneo4j_ray.stages import similarity


@pytest.fixture()
def emb_ds(ray_session):
    import ray

    rng = np.random.default_rng(9)
    # 3 well-separated clusters so LSH recall is meaningful
    centers = rng.standard_normal((3, 24)) * 5
    vecs, ids = [], []
    for i in range(120):
        c = centers[i % 3]
        vecs.append((c + 0.3 * rng.standard_normal(24)).tolist())
        ids.append(i)
    return ray.data.from_arrow(pa.table({"vec_id": ids, "embedding": vecs}))


def _exact_numpy(emb_ds, query_ids, k):
    df = emb_ds.to_pandas().sort_values("vec_id")
    mat = np.array(df["embedding"].to_list(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    out = []
    for q in query_ids:
        qi = np.where(ids == q)[0][0]
        sims = mat @ mat[qi]
        simc = np.floor(sims * 10000 + 0.5).astype(np.int64)
        mask = ~np.isin(ids, query_ids)
        cand_ids, cand_sims = ids[mask], simc[mask]
        order = np.lexsort((cand_ids, -cand_sims))[:k]
        for r, j in enumerate(order, 1):
            out.append((q, r, int(cand_ids[j]), int(cand_sims[j])))
    return out


def test_brute_force_matches_numpy(emb_ds):
    got = similarity.brute_force_topk(emb_ds, query_ids=[0, 1, 2], k=4) \
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = _exact_numpy(emb_ds, [0, 1, 2], 4)
    got_t = list(map(tuple, got[["query_id", "rank", "neighbor_id", "cos_c"]]
                     .itertuples(index=False)))
    assert got_t == want


def test_brute_force_partition_invariant(emb_ds):
    a = similarity.brute_force_topk(emb_ds.repartition(2), [5], k=3).to_pandas()
    b = similarity.brute_force_topk(emb_ds.repartition(11), [5], k=3).to_pandas()
    cols = ["query_id", "rank", "neighbor_id", "cos_c"]
    assert a.sort_values(cols).reset_index(drop=True)[cols] \
        .equals(b.sort_values(cols).reset_index(drop=True)[cols])


def test_lsh_recall_on_clustered_data(emb_ds):
    exact = similarity.brute_force_topk(emb_ds, [0, 1, 2], k=5).to_pandas()
    approx = similarity.lsh_topk(emb_ds, [0, 1, 2], k=5, n_bits=4).to_pandas()
    rec = similarity.recall_vs_bruteforce(approx, exact)
    # same-cluster neighbors share hyperplane signs with high probability
    assert rec >= 0.6, rec


def test_ivf_recall_on_clustered_data(emb_ds):
    exact = similarity.brute_force_topk(emb_ds, [0, 1, 2], k=5).to_pandas()
    approx = similarity.ivf_topk(emb_ds, [0, 1, 2], k=5, n_cells=8,
                                 n_probe=3).to_pandas()
    rec = similarity.recall_vs_bruteforce(approx, exact)
    assert rec >= 0.8, rec  # 3 well-separated clusters, 3 probes


def test_ivf_deterministic(emb_ds):
    a = similarity.ivf_topk(emb_ds.repartition(3), [7], k=4).to_pandas()
    b = similarity.ivf_topk(emb_ds.repartition(9), [7], k=4).to_pandas()
    cols = ["query_id", "rank", "neighbor_id", "cos_c"]
    assert a.sort_values(cols).reset_index(drop=True)[cols] \
        .equals(b.sort_values(cols).reset_index(drop=True)[cols])
