"""SemDeDup (stages/semdedup.py): the distributed integer k-means +
within-cluster greedy cosine dedup must reproduce the sequential
plain-numpy reference (compat/seqref.sequential_semdedup) bit-for-bit
under any partitioning, and its output must satisfy the leader-set
properties (maximality, threshold, lowest-id attribution)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_df():
    return duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).fetchdf()


@pytest.fixture(scope="module")
def golden(emb_df):
    from gfftoneo4j_ray.compat.seqref import sequential_semdedup

    return sequential_semdedup(
        emb_df["vec_id"].to_numpy(),
        np.array(emb_df["embedding"].to_list())).to_pandas()


def _run(num_blocks: int) -> pd.DataFrame:
    import ray

    from gfftoneo4j_ray.stages.semdedup import semdedup

    ds = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"],
        override_num_blocks=num_blocks)
    return semdedup(ds).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)


@pytest.mark.parametrize("num_blocks", [1, 3, 8])
def test_distributed_equals_sequential(ray_session, golden, num_blocks):
    got = _run(num_blocks)
    want = golden.sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(str), want.astype(str))


def test_semdedup_is_nontrivial(ray_session, golden):
    """τ must actually bite on this table (else the golden is vacuous)
    without collapsing it."""
    n_drop = int((~golden["kept"]).sum())
    assert 0 < n_drop < len(golden)
    assert golden["cluster"].nunique() > 1


def test_leader_set_properties(ray_session, golden, emb_df):
    """Exact leader-scan invariants, recomputed from raw embeddings:
    (1) no two KEPT rows in one cluster are ≥ τ similar; (2) every
    dropped row's dup_of is a kept, same-cluster, ≥ τ leader — and the
    LOWEST-id one; (3) ids below their cluster's first row are kept."""
    from gfftoneo4j_ray.stages.semdedup import SCALE

    tau_c = int(0.35 * (1 << 40))
    x = np.array(emb_df["embedding"].to_list(), np.float64)
    nrm = np.sqrt(np.sum(x * x, axis=1, keepdims=True))
    nrm[nrm == 0.0] = 1.0
    q = np.floor(x / nrm * SCALE + 0.5).astype(np.int64)
    byid = {int(v): i for i, v in enumerate(emb_df["vec_id"])}

    for cl, grp in golden.groupby("cluster"):
        grp = grp.sort_values("vec_id")
        kept_ids = grp.loc[grp["kept"], "vec_id"].to_list()
        K = q[[byid[int(i)] for i in kept_ids]]
        if len(K) > 1:
            sims = K @ K.T
            np.fill_diagonal(sims, 0)
            assert (sims < tau_c).all(), f"kept pair over τ in {cl}"
        for _, row in grp[~grp["kept"]].iterrows():
            v = q[byid[int(row.vec_id)]]
            hits = [i for i in kept_ids
                    if i < row.vec_id and int(q[byid[int(i)]] @ v) >= tau_c]
            assert hits, f"dropped {row.vec_id} has no kept leader"
            assert int(row.dup_of) == min(hits)


def test_kmeans_paths_bit_equal(ray_session, monkeypatch):
    """kmeans_fit has two reduce layouts — raw-task per pinned block +
    driver numpy fold (small block counts) and Dataset map + two-phase
    hash_aggregate (cluster scale). Both must produce the SAME int64
    codebook, bit for bit, since both compute exact integer sums."""
    import ray

    from gfftoneo4j_ray.stages import semdedup as sd

    ds = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"],
        override_num_blocks=5)
    qds = ds.map_batches(sd.quantize_embeddings,
                         batch_format="pyarrow").materialize()
    assert qds.num_blocks() * 8 <= sd.DRIVER_FOLD_BUDGET_ROWS
    cent_fold = sd.kmeans_fit(qds)
    monkeypatch.setattr(sd, "DRIVER_FOLD_BUDGET_ROWS", 0)
    cent_agg = sd.kmeans_fit(qds)
    np.testing.assert_array_equal(cent_fold, cent_agg)
    assert cent_fold.dtype == np.int64 and len(cent_fold) == 8


def test_quantize_zero_and_empty(ray_session):
    """Zero vectors quantize to zero (no div-by-zero); empty batches
    pass through with the right schema."""
    import pyarrow as pa

    from gfftoneo4j_ray.stages.semdedup import quantize_embeddings

    t = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.0, 0.0], [3.0, 4.0]],
                              pa.list_(pa.float32())),
    })
    out = quantize_embeddings(t)
    q = np.array(out["q"].to_pylist())
    assert (q[0] == 0).all()
    # 3-4-5 triangle: (0.6, 0.8) × 2^20, rounded half-up
    want = [int(np.floor(0.6 * (1 << 20) + 0.5)),
            int(np.floor(0.8 * (1 << 20) + 0.5))]
    assert q[1].tolist() == want
    empty = quantize_embeddings(t.slice(0, 0))
    assert empty.num_rows == 0 and empty.column_names == ["vec_id", "q"]
